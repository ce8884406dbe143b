"""Chemistry UDF surface (SURVEY §2.8).

The reference's RDKit kernels (U1-U8): SMILES canonicalisation,
neutralisation, PARITY/MCS scoring. RDKit is NOT in this container, so
each UDF is import-gated: with RDKit present the real computation runs;
without it a clearly-marked deterministic fallback keeps the Spark-side
plumbing (schemas, batching, caching, timeouts) real and testable.

All UDFs are Arrow-batched pandas UDFs — per-batch library import, never
per-row Python.
"""

from __future__ import annotations

import hashlib

try:  # pragma: no cover - not available in the build container
    from rdkit import Chem  # type: ignore

    HAVE_RDKIT = True
except ImportError:
    Chem = None
    HAVE_RDKIT = False

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _canon_fallback(smiles: str | None) -> str | None:
    """DETERMINISTIC FAKE canonicalisation (no RDKit): uppercase-insensitive
    atom-token normalization is NOT chemically meaningful — it only
    guarantees a stable dedup key with the same equality behavior for
    identical inputs. Marked fake on purpose."""
    if smiles is None or smiles == "":
        return None
    return smiles.strip()


@F.pandas_udf(T.StringType())
def canonical_smiles(s: pd.Series) -> pd.Series:
    """U4: canonical (non-isomeric) SMILES — the cognate-ligand dedup key
    (`get_ec_information.py:285-289`)."""
    if HAVE_RDKIT:

        def canon(x):
            if x is None:
                return None
            mol = Chem.MolFromSmiles(x)
            return Chem.MolToSmiles(mol, isomericSmiles=False) if mol else None

        return s.map(canon)
    return s.map(_canon_fallback)


@F.pandas_udf(T.BooleanType())
def is_parseable_smiles(s: pd.Series) -> pd.Series:
    """U5: MolFromSmiles validity filter (`process_all_pdb_contacts.py:43-44`).
    Fallback: non-empty strings with balanced brackets count as parseable."""
    if HAVE_RDKIT:
        return s.map(lambda x: x is not None and Chem.MolFromSmiles(x) is not None)

    def ok(x):
        if not x:
            return False
        return x.count("(") == x.count(")") and x.count("[") == x.count("]")

    return s.map(ok)


def _parity_fallback(a: str | None, b: str | None) -> float:
    """DETERMINISTIC FAKE PARITY score (no RDKit): Jaccard of character
    bigrams of the two SMILES. In [0,1], symmetric, 1.0 for identical
    strings — preserves the score-algebra the downstream plan needs
    (thresholding, best-per-group, tie handling) without chemistry."""
    if not a or not b:
        return 0.0
    ba = {a[i : i + 2] for i in range(len(a) - 1)} or {a}
    bb = {b[i : i + 2] for i in range(len(b) - 1)} or {b}
    inter = len(ba & bb)
    return round(inter / (len(ba) + len(bb) - inter), 6)


PARITY_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("pdb_smiles", T.StringType()),
        T.StructField("cognate_smiles", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("pdbl_subparity", T.DoubleType()),
        T.StructField("bl_subparity", T.DoubleType()),
        T.StructField("parity_smarts", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def score_pairs_batch(pdf: pd.DataFrame, *, timeout_s: int = 40) -> pd.DataFrame:
    """Score a batch of (pdb_smiles, cognate_smiles) pairs — the body of
    the PARITY mapInPandas stage (`get_pdb_parity.py:86-107`: permissive
    MCS + atom-map maximization, per-pair timeout 40 s).

    With RDKit: rdFMCS.FindMCS(timeout=...) based PARITY. Without:
    deterministic fallback (see `_parity_fallback`).
    """
    rows = []
    for a, b in zip(pdf["pdb_smiles"], pdf["cognate_smiles"]):
        try:
            if HAVE_RDKIT:
                score, sub_a, sub_b, smarts = _parity_rdkit(a, b, timeout_s)
            else:
                score = _parity_fallback(a, b)
                sub_a = sub_b = score
                smarts = None
            rows.append((a, b, score, sub_a, sub_b, smarts, None))
        except Exception as exc:  # dead-letter row, never a task failure
            rows.append((a, b, 0.0, 0.0, 0.0, None, str(exc)[:200]))
    return pd.DataFrame(
        rows,
        columns=[
            "pdb_smiles", "cognate_smiles", "score", "pdbl_subparity",
            "bl_subparity", "parity_smarts", "error",
        ],
    )


def _parity_rdkit(a: str, b: str, timeout_s: int):  # pragma: no cover
    """Real PARITY (only with RDKit): maximum common substructure atom
    mapping / max(atoms) — the published PARITY method the reference
    implements at `get_pdb_parity.py:53-107`."""
    from rdkit.Chem import rdFMCS

    ma, mb = Chem.MolFromSmiles(a), Chem.MolFromSmiles(b)
    if ma is None or mb is None:
        return 0.0, 0.0, 0.0, None
    mcs = rdFMCS.FindMCS(
        [ma, mb], timeout=timeout_s, completeRingsOnly=True,
        atomCompare=rdFMCS.AtomCompare.CompareAny,
        bondCompare=rdFMCS.BondCompare.CompareAny,
    )
    matching = mcs.numAtoms
    score = matching / max(ma.GetNumAtoms(), mb.GetNumAtoms())
    return (
        round(score, 6),
        round(matching / ma.GetNumAtoms(), 6),
        round(matching / mb.GetNumAtoms(), 6),
        mcs.smartsString or None,
    )


# U6: molecular descriptor calculator (`get_ec_information.py:23,294-295`
# imports MolecularDescriptorCalculator). Descriptor struct computed with
# RDKit when present; otherwise from a direct SMILES token parse — heavy
# atoms, ring closures, and a heavy-atom molecular weight are derivable
# from the string itself (implicit hydrogens are NOT counted, which the
# field name makes explicit).

_ATOMIC_WEIGHTS = {
    "H": 1.008, "B": 10.811, "C": 12.011, "N": 14.007, "O": 15.999,
    "F": 18.998, "Na": 22.990, "Mg": 24.305, "P": 30.974, "S": 32.06,
    "Cl": 35.45, "K": 39.098, "Ca": 40.078, "Fe": 55.845, "Zn": 65.38,
    "Br": 79.904, "I": 126.904,
}

DESCRIPTOR_SCHEMA = T.StructType(
    [
        T.StructField("heavy_molwt", T.DoubleType()),
        T.StructField("n_heavy_atoms", T.IntegerType()),
        T.StructField("n_rings", T.IntegerType()),
    ]
)


def _descriptors_from_smiles(smiles: str | None):
    """Token-parse descriptors (no RDKit): two-letter organic-subset
    symbols first, then single letters (aromatic lowercase included);
    ring count = ring-closure digit pairs."""
    import re

    if not smiles:
        return (None, None, None)
    body = re.sub(r"\[[^\]]*\]", "X", smiles)  # bracket atoms -> 1 heavy atom
    toks = re.findall(r"Cl|Br|Na|Mg|Ca|Fe|Zn|[BCNOPSFIKX]|[bcnops]", body)
    closures = re.findall(r"%\d{2}|\d", re.sub(r"\[[^\]]*\]", "", smiles))
    wt = 0.0
    n = 0
    for t_ in toks:
        n += 1
        wt += _ATOMIC_WEIGHTS.get(t_.upper() if len(t_) == 1 else t_, 12.011)
    return (round(wt, 3), n, len(closures) // 2)


@F.pandas_udf(DESCRIPTOR_SCHEMA)
def molecular_descriptors(s: pd.Series) -> pd.DataFrame:
    """U6: per-molecule descriptor struct (heavy-atom molwt, heavy atom
    count, ring count). RDKit path uses Descriptors/ring info; fallback
    parses the SMILES string directly."""
    if HAVE_RDKIT:

        def desc(x):
            mol = Chem.MolFromSmiles(x) if x else None
            if mol is None:
                return (None, None, None)
            from rdkit.Chem import Descriptors

            return (
                round(Descriptors.HeavyAtomMolWt(mol), 3),
                mol.GetNumHeavyAtoms(),
                mol.GetRingInfo().NumRings(),
            )

        rows = [desc(x) for x in s]
    else:
        rows = [_descriptors_from_smiles(x) for x in s]
    return pd.DataFrame(rows, columns=["heavy_molwt", "n_heavy_atoms", "n_rings"])


def stable_id_from_string(col):
    """Deterministic 63-bit id from a natural key — replaces the
    reference's order-dependent `reset_index`/`ngroup` dense ids
    (SURVEY §1.3) with a rerun-stable hash id at any parallelism."""
    return F.abs(F.xxhash64(col))


def sha1_mod(value: str, mod: int) -> int:
    """Driver-side stable hash helper for tests."""
    return int(hashlib.sha1(value.encode()).hexdigest(), 16) % mod


# --- U7: cofactor priority resolution ---------------------------------------

COFACTOR_SUBGROUPS = ("Coenzyme", "Prosthetic Group", "Siderophore")


def select_cofactor(classes):
    """U7: collapse a per-ligand SET of cofactor-class labels into one
    display label, mirroring the reference's priority rule
    (`get_ec_information.py:332-342`):

    1. singleton set -> its element (even if that element is ``"N"``);
    2. otherwise discard ``"N"``; if exactly ONE of the specific
       subgroups {Coenzyme, Prosthetic Group, Siderophore} remains,
       return it (the specific class outranks the generic "Cofactor");
    3. otherwise the sorted ``/``-join of the remaining labels
       (empty set -> empty string, as in the reference).

    Pure column algebra over an ``array<string>`` — runs inside
    whole-stage codegen, no Python.
    """
    s = F.array_distinct(classes)
    denulled = F.array_remove(s, "N")
    sub = F.array_intersect(
        denulled, F.array(*[F.lit(x) for x in COFACTOR_SUBGROUPS])
    )
    return (
        F.when(F.size(s) == 1, F.element_at(s, 1))
        .when(F.size(sub) == 1, F.element_at(sub, 1))
        .otherwise(F.array_join(F.array_sort(denulled), "/"))
    )


def resolve_cofactor_classes(cognate_ligands, chebi_cofactors):
    """U7 full stage (`get_ec_information.py:673-691`): pull every
    ``CHEBI:<id>`` xref out of the ligand's ``ligand_db`` string,
    classify each against the ChEBI ``has_role`` table
    (``FINAL_ID`` -> Cofactor/Coenzyme/Prosthetic Group/Siderophore),
    default unmatched ligands to ``"N"``, and collapse the per-ligand
    class set with :func:`select_cofactor`.

    Scale shape: the role table is a few thousand rows -> broadcast
    join; the explode fans out only by xrefs-per-ligand (bounded
    small); one hash aggregation back to ligand grain. Any prior
    ``isCofactor`` column is replaced (the reference computes it from
    scratch here too).
    """
    keys = [c for c in cognate_ligands.columns if c != "isCofactor"]
    # Join numerically: the reference normalizes both sides to float
    # (get_ec_information.py:682-687). A string-vs-string join breaks
    # when FINAL_ID arrives as double from CSV inference ('11.0' never
    # equals '11') or when an xref carries leading zeros ('CHEBI:0011')
    # — cast both sides to long so 11.0, '0011', and '11' all meet.
    roles = chebi_cofactors.select(
        F.col("FINAL_ID").cast("long").alias("chebi_match"),
        F.col("isCofactor").alias("_role"),
    )
    matches = cognate_ligands.select(
        *keys,
        F.explode_outer(
            F.expr(
                r"transform(regexp_extract_all(ligand_db,"
                r" 'CHEBI:([0-9]+)', 1), x -> cast(x AS bigint))"
            )
        ).alias("chebi_match"),
    )
    classed = matches.join(F.broadcast(roles), "chebi_match", "left").select(
        *keys, F.coalesce(F.col("_role"), F.lit("N")).alias("_cls")
    )
    return (
        classed.groupBy(*keys)
        .agg(F.collect_set("_cls").alias("_cls_set"))
        .withColumn("isCofactor", select_cofactor(F.col("_cls_set")))
        .drop("_cls_set")
    )
