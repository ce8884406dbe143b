"""UDTF-style file-format sources (SURVEY §2.1 S5-S8, S10, S12).

The reference parses these formats single-node with gemmi / ElementTree /
Bio.ExPASy / rdfreader; here each is a pure-stdlib record parser applied
distributively: a manifest of whole-file texts (``spark.read.text(...,
wholetext=True)``) flows through ``mapInPandas``, one parser call per
file, emitting typed rows. At 100 TB the manifest is millions of files;
parallelism is per-file, the natural unit (each structure/archive is
independent), and the parsers never hold more than one file in memory.

Per-format notes (reference behavior being reproduced, not code):

- S5 mmCIF: category tables (`_entity`, `_struct_asym`, ...) as rows —
  reference uses gemmi (`process_pdb_structure.py:28-121`); here a
  minimal CIF reader handling key-value and ``loop_`` forms.
- S6 SIFTS XML: per-residue CATH/Pfam/SCOP/SCOP2B/SCOP2 + InterPro
  (SSF/G3DSA evidence only) xrefs and the listDB version table
  (`process_pdb_contacts.py:220-292`).
- S7 arpeggio JSON: gzipped per-structure contact records under a
  dynamic pdb-id key, with bgn/end selector structs and a contact-type
  array (`process_pdb_contacts.py:97-121`).
- S8 InterPro XML: (accession, short_name) pairs (`utils.py:188-208`).
- S10 EXPASY: enzyme.dat ``ID/DE/AN/CA//``-terminated records with
  transfer detection, and enzclass.txt regex lines (`utils.py:17-48`).
- S12 RHEA RD: ``$RXN`` reaction records with reactant/product
  molblocks; SMILES conversion is RDKit-gated (absent here), the
  record/metadata structure is parsed for real (`preprocess_rhea.py:26-77`).
"""

from __future__ import annotations

import json
import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# generic wholetext → rows plumbing


def _wholetext_source(
    spark: SparkSession,
    paths: str | list[str],
    parse_one,
    schema: T.StructType,
) -> DataFrame:
    """Distribute ``parse_one(path, text) -> list[dict]`` over files.

    Each input file is one row of (path, value) — whole-file strings —
    and one Arrow batch row in; the parser emits any number of typed
    rows out (UDTF shape). File-level parallelism: Spark assigns files
    to tasks, so a million-file manifest fans out across the cluster.

    Malformed-source dead-letter contract (the reference's own pattern:
    a failing structure exits 120-127 and becomes a status row,
    `process_pdb_structure.py:154-163` — it never kills the batch): a
    file whose parse raises contributes ZERO data rows instead of
    crashing the whole task (one truncated download in a million-file
    manifest must not fail the stage). The failing files are served as
    queryable status rows by ``read_source_status`` over the same
    parser — route that face to the dead-letter sink.
    """
    files = spark.read.text(paths, wholetext=True).withColumn(
        "path", F.input_file_name()
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in schema.fields]
        for pdf in batches:
            out: list[dict] = []
            for path, text in zip(pdf["path"], pdf["value"]):
                try:
                    out.extend(parse_one(path, text))
                except Exception:  # noqa: BLE001 — dead-letter, never crash
                    continue
            yield pd.DataFrame(out, columns=cols)

    return files.mapInPandas(run, schema=schema)


SOURCE_STATUS_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("error", T.StringType()),
    ]
)


def read_source_status(
    spark: SparkSession, paths: str | list[str], parse_one
) -> DataFrame:
    """Per-file parse status face shared by every wholetext source —
    the dead-letter table for the malformed-source contract: one row
    per input file with status ``ok`` / ``empty`` / ``parse_error``
    (+ the exception text). Run it over the same manifest as the data
    face to audit what the data face silently skipped.

    Built on ``sc.wholeTextFiles``, NOT the DataFrame text source: the
    file index behind ``spark.read.text`` prunes zero-length files, so
    a download truncated to nothing would vanish from the audit — the
    status face must account for EVERY file in the manifest (parser
    fuzz sweep finding, round 12). A zero-byte file reports ``empty``.
    """
    src = paths if isinstance(paths, str) else ",".join(paths)
    files = spark.createDataFrame(
        spark.sparkContext.wholeTextFiles(src),
        schema=T.StructType(
            [
                T.StructField("path", T.StringType()),
                T.StructField("value", T.StringType()),
            ]
        ),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in SOURCE_STATUS_SCHEMA.fields]
        for pdf in batches:
            out = []
            for path, text in zip(pdf["path"], pdf["value"]):
                try:
                    n = len(parse_one(path, text))
                    out.append(
                        {
                            "path": path,
                            "status": "ok" if n else "empty",
                            "n_rows": n,
                            "error": None,
                        }
                    )
                except Exception as e:  # noqa: BLE001
                    out.append(
                        {
                            "path": path,
                            "status": "parse_error",
                            "n_rows": 0,
                            "error": f"{type(e).__name__}: {e}"[:500],
                        }
                    )
            yield pd.DataFrame(out, columns=cols)

    return files.mapInPandas(run, schema=SOURCE_STATUS_SCHEMA)


# ---------------------------------------------------------------------------
# S5 — minimal mmCIF category reader


def parse_cif_categories(text: str, categories: set[str]) -> dict[str, list[dict]]:
    """Extract requested categories (e.g. ``_entity``) from an mmCIF
    block as row dicts. Handles both the key-value form::

        _entity.id 1

    and the ``loop_`` table form. Values may be quoted or multi-line
    (``;``-delimited). Not a full CIF grammar — the subset the
    reference's gemmi calls touch (named categories, one data block).
    """
    rows: dict[str, list[dict]] = {c: [] for c in categories}
    kv: dict[str, dict[str, str]] = {}
    lines = text.splitlines()
    i = 0

    def read_value(i: int, first: str) -> tuple[str, int]:
        # multi-line ;-delimited value
        if first == "" and i < len(lines) and lines[i].startswith(";"):
            buf = [lines[i][1:]]
            i += 1
            while i < len(lines) and not lines[i].startswith(";"):
                buf.append(lines[i])
                i += 1
            return "\n".join(buf).strip(), i + 1
        return first, i

    def tokenize(line: str) -> list[str]:
        return re.findall(r"'[^']*'|\"[^\"]*\"|\S+", line)

    def unquote(tok: str) -> str:
        if len(tok) >= 2 and tok[0] in "'\"" and tok[-1] == tok[0]:
            return tok[1:-1]
        return tok

    while i < len(lines):
        line = lines[i].strip()
        if line.startswith("loop_"):
            i += 1
            hdr: list[tuple[str, str]] = []
            while i < len(lines) and lines[i].strip().startswith("_"):
                cat, _, item = lines[i].strip().partition(".")
                hdr.append((cat, item))
                i += 1
            cats = {c for c, _ in hdr}
            want = bool(cats & categories)
            vals: list[str] = []
            while i < len(lines):
                s = lines[i].strip()
                if s.startswith(("_", "loop_", "data_", "#")) and not s.startswith(";"):
                    break
                if s.startswith(";"):
                    v, i = read_value(i + 0, "")
                    # read_value expects index at the ';' line
                    vals.append(v)
                    continue
                if s:
                    vals.extend(unquote(t) for t in tokenize(s))
                i += 1
            if want and hdr:
                for off in range(0, len(vals) - len(hdr) + 1, len(hdr)):
                    row = {
                        f"{c}.{it}": vals[off + j] for j, (c, it) in enumerate(hdr)
                    }
                    cat = hdr[0][0]
                    if cat in categories:
                        rows[cat].append(row)
            continue
        if line.startswith("_"):
            cat, _, rest = line.partition(".")
            item, _, raw = rest.partition(" ")
            raw = raw.strip()
            val, i2 = read_value(i + 1, unquote(raw))
            i = i2 - 1 if raw == "" else i
            if cat in categories:
                kv.setdefault(cat, {})[f"{cat}.{item}"] = val
        i += 1
    for cat, d in kv.items():
        if d:
            rows[cat].append(d)
    return rows


def read_cif_category(
    spark: SparkSession, paths: str | list[str], category: str, items: list[str]
) -> DataFrame:
    """mmCIF category table as a DataFrame: one row per category entry
    per file, columns = requested items + source path."""
    schema = T.StructType(
        [T.StructField("path", T.StringType())]
        + [T.StructField(it, T.StringType()) for it in items]
    )

    def parse_one(path: str, text: str) -> list[dict]:
        out = []
        for row in parse_cif_categories(text, {category}).get(category, []):
            rec = {"path": path}
            for it in items:
                rec[it] = row.get(f"{category}.{it}")
            out.append(rec)
        return out

    return _wholetext_source(spark, paths, parse_one, schema)


# ---------------------------------------------------------------------------
# S6 — SIFTS XML per-residue xrefs + DB versions

SIFTS_XREF_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("proteinStructAsymID", T.StringType()),
        T.StructField("seq_range_chain", T.StringType()),
        T.StructField("xref_db", T.StringType()),
        T.StructField("xref_db_acc", T.StringType()),
        T.StructField("derived_from", T.StringType()),
    ]
)

_SIFTS_DOMAIN_DBS = {"CATH", "Pfam", "SCOP", "SCOP2B", "SCOP2"}


def parse_sifts_xrefs(path: str, text: str) -> list[dict]:
    """Per-residue domain xrefs with the reference's selection rules:
    the five domain DBs pass through; InterPro rows only when the
    evidence is a SUPERFAMILY (SSF*) or Gene3D (G3DSA*) signature, with
    the InterPro accession kept as ``derived_from``."""
    root = ET.fromstring(text)
    out: list[dict] = []
    # per-record salvage under the malformed-source contract: an
    # element missing a required attribute is a malformed RECORD —
    # skip it and keep the rest of the file (the file-level
    # dead-letter only fires when the document itself won't parse)
    for entity in root.findall(".//{*}entity"):
        entity_id = entity.attrib.get("entityId")
        if entity_id is None:
            continue
        for segment in entity.findall(".//{*}segment"):
            for residue in segment.findall(".//{*}residue"):
                resnum = residue.attrib.get("dbResNum")
                if resnum is None:
                    continue
                for xref in residue.findall(".//{*}crossRefDb"):
                    src = xref.attrib.get("dbSource")
                    if src in _SIFTS_DOMAIN_DBS:
                        acc, derived = xref.attrib.get("dbAccessionId"), None
                    elif src == "InterPro":
                        ev = xref.attrib.get("dbEvidence", "")
                        if not ev.startswith(("SSF", "G3DSA")):
                            continue
                        acc, derived = ev, xref.attrib.get("dbAccessionId")
                    else:
                        continue
                    if acc is None:
                        continue
                    out.append(
                        {
                            "path": path,
                            "proteinStructAsymID": entity_id,
                            "seq_range_chain": resnum,
                            "xref_db": src,
                            "xref_db_acc": acc,
                            "derived_from": derived,
                        }
                    )
    return out


def read_sifts_xrefs(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    return _wholetext_source(spark, paths, parse_sifts_xrefs, SIFTS_XREF_SCHEMA)


def normalize_domain_xrefs(df: DataFrame) -> DataFrame:
    """Map raw SIFTS xref rows onto the engine's DomainKind keys
    (`process_pdb_contacts.py:196-203,300-336`):

    - InterPro rows whose accession is a Gene3D signature become
      ``xref_db='G3DSA'`` with the ``G3DSA:`` prefix stripped, so the
      dotted accession mints the SAME cathTopology/Architecture/Class
      level ids as CATH-sourced domains (the shared cath* chain);
    - InterPro + ``SSF*`` accession → ``SuperFamily``;
    - SCOP2B/SCOP2 rows split on the accession's SF/FA prefix into
      ``SCOP2_SuperFamily`` / ``SCOP2_Family``, recording SCOP2B
      provenance in ``derived_from`` and stripping the
      ``SF-DOMID:`` / ``FA-DOMID:`` wrappers.

    All predicates evaluate against the ORIGINAL columns (the SF/FA
    test must see the un-stripped accession), then the renames land in
    one select — pure column algebra, no shuffle.
    """
    db, acc = F.col("xref_db"), F.col("xref_db_acc")
    new_db = (
        F.when((db == "InterPro") & acc.startswith("G3DSA"), F.lit("G3DSA"))
        .when((db == "InterPro") & acc.startswith("SSF"), F.lit("SuperFamily"))
        .when(
            db.isin("SCOP2B", "SCOP2") & acc.startswith("SF"),
            F.lit("SCOP2_SuperFamily"),
        )
        .when(
            db.isin("SCOP2B", "SCOP2") & acc.startswith("FA"), F.lit("SCOP2_Family")
        )
        .otherwise(db)
    )
    # strip wrappers only where the mapping actually fires — a row that
    # stays unmapped passes through byte-identical (property-tested)
    strips = ((db == "InterPro") & acc.startswith("G3DSA:")) | (
        db.isin("SCOP2B", "SCOP2")
        & (acc.startswith("SF-DOMID:") | acc.startswith("FA-DOMID:"))
    )
    new_acc = F.when(
        strips, F.regexp_replace(acc, r"^(G3DSA:|SF-DOMID:|FA-DOMID:)", "")
    ).otherwise(acc)
    prior_derived = (
        F.col("derived_from")
        if "derived_from" in df.columns
        else F.lit(None).cast("string")
    )
    new_derived = F.when(db == "SCOP2B", F.lit("SCOP2B")).otherwise(prior_derived)
    others = [
        c for c in df.columns if c not in ("xref_db", "xref_db_acc", "derived_from")
    ]
    return df.select(
        *others,
        new_db.alias("xref_db"),
        new_acc.alias("xref_db_acc"),
        new_derived.alias("derived_from"),
    )


SIFTS_DB_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("xref_db", T.StringType()),
        T.StructField("xref_db_version", T.StringType()),
    ]
)


def parse_sifts_db_versions(path: str, text: str) -> list[dict]:
    """listDB version rows; SCOP2 is split into the SuperFamily/Family
    variants the graph schema uses (`process_pdb_contacts.py:288-292`)."""
    root = ET.fromstring(text)
    out = []
    for db_list in root.findall(".//{*}listDB"):
        for db in db_list:
            src, ver = db.attrib.get("dbSource"), db.attrib.get("dbVersion")
            if src is None or ver is None:  # malformed record: skip
                continue
            names = (
                ["SCOP2_SuperFamily", "SCOP2_Family"] if src == "SCOP2" else [src]
            )
            for n in names:
                out.append({"path": path, "xref_db": n, "xref_db_version": ver})
    return out


def read_sifts_db_versions(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    return _wholetext_source(spark, paths, parse_sifts_db_versions, SIFTS_DB_SCHEMA)


# ---------------------------------------------------------------------------
# S7 — arpeggio contact JSON (dynamic pdb-id key)

ARPEGGIO_SCHEMA = T.StructType(
    [
        T.StructField("pdb_id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("bgn_auth_asym_id", T.StringType()),
        T.StructField("bgn_auth_seq_id", T.LongType()),
        T.StructField("bgn_auth_atom_id", T.StringType()),
        T.StructField("end_auth_asym_id", T.StringType()),
        T.StructField("end_auth_seq_id", T.LongType()),
        T.StructField("end_auth_atom_id", T.StringType()),
        T.StructField("contact", T.ArrayType(T.StringType())),
        T.StructField("interacting_entities", T.StringType()),
        T.StructField("distance", T.DoubleType()),
    ]
)


def parse_arpeggio_json(path: str, text: str) -> list[dict]:
    """Contacts from one per-structure record. The payload is
    ``{"status": ..., "<pdb_id>": [contact, ...]}`` — the pdb id is a
    dynamic key, which is why this is a parser UDTF rather than
    ``spark.read.json`` with a static schema. Timeout / failure statuses
    yield a single status row (the dead-letter pattern, SURVEY §5.4)."""
    def dead(pdb_id, status):
        # full-width row: missing keys would pandas-fill as NaN, which
        # Arrow rejects for the array-typed `contact` column
        return [
            {f.name: None for f in ARPEGGIO_SCHEMA.fields}
            | {"pdb_id": pdb_id, "status": status}
        ]

    try:
        doc = json.loads(text)
    except ValueError:
        # truncated download / mid-record EOF / non-JSON bytes: the
        # schema HAS a status column, so this source dead-letters
        # IN-BAND (same row shape as the tool's own timeout records)
        return dead(None, "malformed_json")
    if not isinstance(doc, dict):
        return dead(None, "malformed_json")
    status = doc.get("status")
    pdb_id = next((k for k in doc if k != "status"), None)
    if status in ("timeout", "arpeggio_failure") or pdb_id is None:
        return dead(pdb_id, status or "no_contacts_record")
    contacts = doc[pdb_id]
    if not isinstance(contacts, list):
        return dead(pdb_id, "malformed_json")

    def as_long(v):
        try:
            return int(v) if v is not None and not isinstance(v, bool) else None
        except (TypeError, ValueError):
            return None

    def as_double(v):
        try:
            return float(v) if v is not None and not isinstance(v, bool) else None
        except (TypeError, ValueError):
            return None

    def as_str(v):
        return v if isinstance(v, str) else None

    def as_str_list(v):
        return [str(x) for x in v] if isinstance(v, list) else None

    out = []
    for rec in contacts:
        if not isinstance(rec, dict):  # malformed record: skip, keep file
            continue
        bgn, end = rec.get("bgn"), rec.get("end")
        bgn = bgn if isinstance(bgn, dict) else {}
        end = end if isinstance(end, dict) else {}
        out.append(
            {
                "pdb_id": pdb_id,
                "status": "ok",
                "bgn_auth_asym_id": as_str(bgn.get("auth_asym_id")),
                "bgn_auth_seq_id": as_long(bgn.get("auth_seq_id")),
                "bgn_auth_atom_id": as_str(bgn.get("auth_atom_id")),
                "end_auth_asym_id": as_str(end.get("auth_asym_id")),
                "end_auth_seq_id": as_long(end.get("auth_seq_id")),
                "end_auth_atom_id": as_str(end.get("auth_atom_id")),
                "contact": as_str_list(rec.get("contact")),
                "interacting_entities": as_str(rec.get("interacting_entities")),
                "distance": as_double(rec.get("distance")),
            }
        )
    return out or dead(pdb_id, "no_contacts_record")


def read_arpeggio_contacts(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    return _wholetext_source(
        spark,
        paths,
        lambda p, s: parse_arpeggio_json(p, s),
        ARPEGGIO_SCHEMA,
    )


# ---------------------------------------------------------------------------
# S8 — InterPro XML id → short_name

INTERPRO_SCHEMA = T.StructType(
    [
        T.StructField("interpro_accession", T.StringType()),
        T.StructField("interpro_name", T.StringType()),
    ]
)


def parse_interpro_xml(path: str, text: str) -> list[dict]:
    root = ET.fromstring(text)
    return [
        {
            "interpro_accession": ip.attrib["id"],
            "interpro_name": ip.attrib["short_name"],
        }
        for ip in root.findall(".//interpro")
        # malformed record (missing required attribute): skip, keep file
        if "id" in ip.attrib and "short_name" in ip.attrib
    ]


def read_interpro_names(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    return _wholetext_source(spark, paths, parse_interpro_xml, INTERPRO_SCHEMA)


# ---------------------------------------------------------------------------
# S10 — EXPASY enzyme.dat records + enzclass.txt lines

ENZYME_SCHEMA = T.StructType(
    [
        T.StructField("ID", T.StringType()),
        T.StructField("DE", T.StringType()),
        T.StructField("AN", T.ArrayType(T.StringType())),
        T.StructField("CA", T.StringType()),
        T.StructField("CF", T.StringType()),
        T.StructField("transferred_to", T.ArrayType(T.StringType())),
    ]
)

_TRANSFER_RE = re.compile(r"Transferred entry:\s*(.+)")
_EC_RE = re.compile(r"\d+\.\d+\.\d+\.\d+")


def parse_enzyme_dat(text: str) -> list[dict]:
    """``//``-terminated EXPASY records. Continuation lines of the same
    field concatenate; ``DE   Transferred entry: x.y.z.w`` marks a
    transfer whose targets feed the fixpoint chase in operators.ec
    (`utils.py:70-84`)."""
    out = []
    rec: dict = {}
    for line in text.splitlines():
        if line.startswith("//"):
            if rec.get("ID"):
                de = rec.get("DE", "")
                m = _TRANSFER_RE.search(de)
                rec["transferred_to"] = _EC_RE.findall(m.group(1)) if m else []
                out.append(
                    {
                        "ID": rec.get("ID"),
                        "DE": rec.get("DE", "").rstrip("."),
                        "AN": rec.get("AN", []),
                        "CA": rec.get("CA"),
                        "CF": rec.get("CF"),
                        "transferred_to": rec["transferred_to"],
                    }
                )
            rec = {}
            continue
        code, _, val = line.partition("   ")
        val = val.strip()
        if code == "ID":
            rec["ID"] = val
        elif code == "DE":
            rec["DE"] = (rec.get("DE", "") + " " + val).strip()
        elif code == "AN":
            rec.setdefault("AN", []).append(val.rstrip("."))
        elif code in ("CA", "CF"):
            rec[code] = (rec.get(code, "") + " " + val).strip()
    return out


def read_enzyme_dat(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    return _wholetext_source(
        spark, paths, lambda p, s: parse_enzyme_dat(s), ENZYME_SCHEMA
    )


ENZCLASS_LINE_RE = re.compile(r"^(\d)\.\s*(\d+|-)\.\s*(\d+|-)\.\s*(-)\s+(.*)$")


def parse_enzclass(text: str) -> list[dict]:
    """enzclass.txt description lines: ``1. 2. 3.-  Description.`` →
    (EC prefix, description) (`utils.py:38-48`)."""
    out = []
    for line in text.splitlines():
        m = ENZCLASS_LINE_RE.match(line.strip())
        if m:
            ec = ".".join(m.group(i) for i in range(1, 5)).replace(" ", "")
            out.append({"EC": ec, "description": m.group(5).strip().rstrip(".")})
    return out


ENZCLASS_SCHEMA = T.StructType(
    [T.StructField("EC", T.StringType()), T.StructField("description", T.StringType())]
)


def read_enzclass(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    return _wholetext_source(
        spark, paths, lambda p, s: parse_enzclass(s), ENZCLASS_SCHEMA
    )


# ---------------------------------------------------------------------------
# S12 — RHEA RD reaction records

RD_SCHEMA = T.StructType(
    [
        T.StructField("reaction_id", T.StringType()),
        T.StructField("mol_type", T.StringType()),
        T.StructField("compound_id", T.StringType()),
        T.StructField("molblock", T.StringType()),
        T.StructField("smiles", T.StringType()),
        T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
    ]
)


def parse_rd_records(path: str, text: str) -> list[dict]:
    """RD-file reactions: each ``$RFMT`` record holds a ``$RXN`` block
    (counts line → N reactant + M product ``$MOL`` molblocks) and
    ``$DTYPE``/``$DATUM`` property pairs. Molblock → SMILES needs RDKit
    (absent in this container): `smiles` is RDKit-gated and None
    otherwise; ids, roles, molblocks, and properties parse for real."""
    try:  # pragma: no cover - not available in the build container
        from rdkit import Chem  # type: ignore
    except ImportError:
        Chem = None

    out: list[dict] = []
    records = re.split(r"^\$RFMT.*$", text, flags=re.M)
    for rec in records:
        if "$RXN" not in rec:
            continue
        rxn_match = re.search(r"\$RXN\n(.*?)\n", rec)
        reaction_id = rxn_match.group(1).strip() if rxn_match else None
        counts = re.search(r"^\s*(\d+)\s+(\d+)\s*$", rec, flags=re.M)
        n_react = int(counts.group(1)) if counts else 0
        mols = re.split(r"^\$MOL\s*$", rec, flags=re.M)[1:]
        props: dict[str, str] = {}
        for m in re.finditer(r"^\$DTYPE (.+)$\n^\$DATUM (.+)$", rec, flags=re.M):
            props[m.group(1).strip()] = m.group(2).strip()
        for idx, mol in enumerate(mols):
            lines = mol.strip("\n").splitlines()
            name = lines[0].strip() if lines else None
            molblock = "\n".join(lines)
            smiles = None
            if Chem is not None:  # pragma: no cover
                m = Chem.MolFromMolBlock(molblock, sanitize=False)
                if m is not None:
                    smiles = Chem.MolToSmiles(m)
            out.append(
                {
                    "reaction_id": reaction_id,
                    "mol_type": "reactant" if idx < n_react else "product",
                    "compound_id": name,
                    "molblock": molblock,
                    "smiles": smiles,
                    "properties": props,
                }
            )
    return out


def read_rd_reactions(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    return _wholetext_source(spark, paths, parse_rd_records, RD_SCHEMA)


def parse_text_column(
    df: DataFrame,
    *,
    key_col: str,
    text_col: str,
    parse_one,
    schema: T.StructType,
) -> DataFrame:
    """UDTF over an in-DataFrame text column — the same parser kernels
    as the file-based sources, applied to e.g. the stdout of the
    distributed external-tool stage without a filesystem round-trip."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in schema.fields]
        for pdf in batches:
            out: list[dict] = []
            for key, text in zip(pdf[key_col], pdf[text_col]):
                out.extend(parse_one(str(key), text if text is not None else ""))
            yield pd.DataFrame(out, columns=cols)

    return df.mapInPandas(run, schema=schema)


def arpeggio_from_tool_output(
    tool_df: DataFrame,
    *,
    id_col: str,
    stdout_col: str = "tool_stdout",
    status_col: str = "status",
) -> DataFrame:
    """Compose the distributed external-tool stage (operators.external.
    run_external_tool) with the S7 arpeggio parser: the full
    RUN_ARPEGGIO analog (`nextflow/bin/run_arpeggio.sh:11` +
    `main.nf:45`). Successful invocations parse their stdout as the
    contact payload; timeouts/failures and unparseable output become
    dead-letter rows with the status carried through — the reference's
    errorStrategy-as-data, so a flaky tool never fails the job."""

    def parse_one(key: str, text: str) -> list[dict]:
        try:
            return parse_arpeggio_json(key, text)
        except Exception:
            return [
                {f.name: None for f in ARPEGGIO_SCHEMA.fields}
                | {"pdb_id": key, "status": "parse_failure"}
            ]

    ok = tool_df.filter(F.col(status_col) == "ok")
    parsed = parse_text_column(
        ok, key_col=id_col, text_col=stdout_col, parse_one=parse_one,
        schema=ARPEGGIO_SCHEMA,
    )
    dead = tool_df.filter(F.col(status_col) != "ok").select(
        *[
            F.col(id_col).cast("string").alias("pdb_id")
            if f.name == "pdb_id"
            else (
                F.col(status_col).alias("status")
                if f.name == "status"
                else F.lit(None).cast(f.dataType).alias(f.name)
            )
            for f in ARPEGGIO_SCHEMA.fields
        ]
    )
    return parsed.unionByName(dead)
