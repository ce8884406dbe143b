"""Parser-face robustness sweep (round-11 verdict item 5).

The S5-S12 parser family (mmCIF, SIFTS XML, InterPro XML, EXPASY
enzyme.dat/enzclass, CATH CDDF, KEGG flat records, RHEA RD, arpeggio
JSON) is pytest-green on well-formed and dress-rehearsal inputs but —
unlike every query-layer operator — had no fuzz axis. This sweep feeds
truncated records, broken quoting/namespaces, stripped attributes,
mid-record EOF, binary garbage, and type-confused JSON through every
parser on BOTH faces and asserts the malformed-source dead-letter
contract (the reference's own 120-127 pattern,
`process_pdb_structure.py:154-163`):

1. DIRECT face: the pure parser functions never hang (10 s alarm) and
   only raise the document-level errors the reader boundary catches —
   line-oriented parsers (enzyme/enzclass/KEGG/CDDF/CIF/RD) must not
   raise at all on any corruption; XML parsers may raise only
   ET.ParseError (whole-document malformation); the arpeggio parser
   (in-band status column) must NEVER raise and must emit a status row
   for whole-file malformation.
2. READER face: every `read_*` over a directory mixing well-formed and
   corrupted files completes without an exception (malformed files
   contribute zero rows / in-band status rows), and
   `read_source_status` over the same directory yields EXACTLY one row
   per file, each with status in {ok, empty, parse_error}.

Usage:
    python tools/parser_fuzz_sweep.py

Exit status is the number of contract violations (0 == robust).
"""

from __future__ import annotations

import json
import os
import signal
import sys
import textwrap
import traceback
import xml.etree.ElementTree as ET

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---------------------------------------------------------------------------
# seeds (the well-formed shapes the pytest fixtures use)

SIFTS_XML = """<?xml version="1.0" encoding="UTF-8"?>
<entry xmlns="http://www.ebi.ac.uk/pdbe/docs/sifts/eFamily.xsd">
  <listDB>
    <db dbSource="CATH" dbVersion="4.3"/>
    <db dbSource="SCOP2" dbVersion="2022"/>
  </listDB>
  <entity entityId="A">
    <segment>
      <listResidue>
        <residue dbResNum="10">
          <crossRefDb dbSource="CATH" dbAccessionId="1.10.510.10"/>
          <crossRefDb dbSource="InterPro" dbAccessionId="IPR000719"
                      dbEvidence="SSF56112"/>
        </residue>
        <residue dbResNum="11">
          <crossRefDb dbSource="Pfam" dbAccessionId="PF00069"/>
        </residue>
      </listResidue>
    </segment>
  </entity>
</entry>
"""

CIF_TEXT = textwrap.dedent("""\
    data_1abc
    _entry.id 1ABC
    _entity.details
    ;a multi-line
    value block
    ;
    loop_
    _entity.id
    _entity.type
    _entity.pdbx_description
    1 polymer 'Protein kinase'
    2 non-polymer "ATP molecule"
    3 water .
    loop_
    _struct_asym.id
    _struct_asym.entity_id
    A 1
    B 2
    """)

ENZYME_DAT = textwrap.dedent("""\
    ID   1.1.1.1
    DE   Alcohol dehydrogenase.
    AN   Aldehyde reductase.
    CA   A primary alcohol + NAD(+) = an aldehyde + NADH.
    CF   Zn(2+).
    //
    ID   1.1.1.2
    DE   Transferred entry: 1.1.1.1 and 1.1.1.71.
    //
    """)

ENZCLASS = textwrap.dedent("""\
    1. -. -.-  Oxidoreductases.
    1. 1. -.-  Acting on the CH-OH group of donors.
    1. 1. 1.-  With NAD(+) or NADP(+) as acceptor.
    """)

INTERPRO_XML = """<interprodb>
  <interpro id="IPR000719" short_name="Prot_kinase_dom" type="Domain"/>
  <interpro id="IPR008271" short_name="Ser/Thr_kinase_AS" type="Active_site"/>
</interprodb>
"""

RD_TEXT = textwrap.dedent("""\
    $RDFILE 1
    $DATM 2024
    $RFMT $RIREG 10001
    $RXN
    10001

      RHEA

      1  1
    $MOL
    CHEBI:15377
      Mrv

      0  0  0  0  0  0            999 V2000
    M  END
    $MOL
    CHEBI:16234
      Mrv

      0  0  0  0  0  0            999 V2000
    M  END
    $DTYPE EC
    $DATUM 1.1.1.1
    """)

ARPEGGIO_JSON = json.dumps(
    {
        "status": "complete",
        "1abc": [
            {
                "bgn": {"auth_asym_id": "B", "auth_seq_id": 1, "auth_atom_id": "C1"},
                "end": {"auth_asym_id": "A", "auth_seq_id": 10, "auth_atom_id": "CA"},
                "contact": ["hbond", "proximal"],
                "interacting_entities": "INTER",
                "distance": 3.2,
            }
        ],
    }
)

KEGG_TEXT = (
    "ENTRY       R00001      Reaction\n"
    "DEFINITION  polyphosphate + H2O\n"
    "EQUATION    C00890 + C00001\n"
    "ENZYME      3.6.1.10\n"
    "///\n"
    "ENTRY       R00002      Reaction\n"
    "ENZYME      1.1.1.1\n"
    "///\n"
)

CDDF_TEXT = (
    "# header\n"
    "FORMAT    CDDF1.0\n"
    "DOMAIN    1abcA01\n"
    "CATHCODE  1.10.8.10\n"
    "SEGMENT   1abcA:1-10\n"
    "//\n"
    "DOMAIN    2xyzB02\n"
    "CATHCODE  2.40.50.100\n"
    "SEGMENT   2xyzB:5-50\n"
    "//\n"
)

# ---------------------------------------------------------------------------
# corruption operators


def corruptions(seed: str, kind: str) -> dict[str, str]:
    """Corrupted variants of one seed: generic truncations/garbage plus
    format-targeted edits (broken XML namespace/closing tag, stripped
    required attributes, unbalanced quotes, JSON type confusion)."""
    out: dict[str, str] = {}
    n = len(seed)
    for frac, name in ((0.1, "t10"), (0.33, "t33"), (0.5, "t50"), (0.9, "t90")):
        out[f"trunc_{name}"] = seed[: int(n * frac)]
    out["trunc_minus1"] = seed[:-1]
    out["empty"] = ""
    out["ws_only"] = "  \n\t \n"
    out["bom"] = "﻿" + seed
    out["binary_garbage"] = "\x00\x01�\x7f" + seed[: n // 2] + "\x00\xff"
    out["doubled"] = seed + seed
    out["mid_record_paste"] = seed[: n // 2] + seed
    if kind == "xml":
        out["no_close"] = seed.replace("</entry>", "").replace(
            "</interprodb>", ""
        )
        out["bad_entity"] = seed.replace("CATH", "CA&nope;TH", 1)
        out["stray_lt"] = seed[: n // 2] + "<<<" + seed[n // 2 :]
        out["strip_attr"] = (
            seed.replace('entityId="A"', "")
            .replace('dbResNum="10"', "")
            .replace('dbSource="CATH"', "")
            .replace('id="IPR000719"', "")
            .replace('short_name="Prot_kinase_dom"', "")
        )
        out["no_ns"] = seed.replace(
            ' xmlns="http://www.ebi.ac.uk/pdbe/docs/sifts/eFamily.xsd"', ""
        )
    if kind == "json":
        out["non_dict_list"] = "[1, 2, 3]"
        out["non_dict_scalar"] = '"just a string"'
        out["contacts_not_list"] = json.dumps({"1abc": {"a": 1}})
        out["record_not_dict"] = json.dumps({"1abc": ["x", 17, None]})
        out["typed_confusion"] = json.dumps(
            {
                "1abc": [
                    {
                        "bgn": "not-a-dict",
                        "end": {"auth_seq_id": "NaN-ish", "auth_atom_id": 9},
                        "contact": "hbond",
                        "interacting_entities": ["INTER"],
                        "distance": "3.2 A",
                    }
                ]
            }
        )
        out["seq_id_object"] = json.dumps(
            {"1abc": [{"bgn": {"auth_seq_id": {"v": 1}}, "end": {}}]}
        )
    if kind == "quoted":
        out["unbalanced_quote"] = seed.replace("'Protein kinase'", "'Protein kinase", 1)
        out["dangling_semicolon"] = seed + ";never closed\nmore text\n"
    return out


# ---------------------------------------------------------------------------
# direct-face harness (hang alarm + allowed-exception classes)


class Hang(Exception):
    pass


def _alarm(signum, frame):  # pragma: no cover - only fires on a hang
    raise Hang("parser exceeded 10s — possible infinite loop")


def direct_sweep(violations: list[str]) -> int:
    from procoggraph_spark.sources import parsers as P
    from procoggraph_spark.sources.readers import (
        parse_cddf_records,
        parse_kegg_record,
    )

    families = [
        # (name, fn(text), seed, kind, allowed exception types)
        ("cif", lambda s: P.parse_cif_categories(s, {"_entity", "_struct_asym"}),
         CIF_TEXT, "quoted", ()),
        ("sifts_xrefs", lambda s: P.parse_sifts_xrefs("f.xml", s),
         SIFTS_XML, "xml", (ET.ParseError,)),
        ("sifts_dbs", lambda s: P.parse_sifts_db_versions("f.xml", s),
         SIFTS_XML, "xml", (ET.ParseError,)),
        ("interpro", lambda s: P.parse_interpro_xml("f.xml", s),
         INTERPRO_XML, "xml", (ET.ParseError,)),
        ("arpeggio", lambda s: P.parse_arpeggio_json("f.json", s),
         ARPEGGIO_JSON, "json", ()),
        ("enzyme_dat", P.parse_enzyme_dat, ENZYME_DAT, "line", ()),
        ("enzclass", P.parse_enzclass, ENZCLASS, "line", ()),
        ("rd", lambda s: P.parse_rd_records("f.rd", s), RD_TEXT, "line", ()),
        ("kegg", parse_kegg_record, KEGG_TEXT, "line", ()),
        ("cddf", parse_cddf_records, CDDF_TEXT, "line", ()),
    ]
    n_cases = 0
    for name, fn, seed, kind, allowed in families:
        cases = {"seed": seed} | corruptions(seed, kind)
        for case, text in cases.items():
            n_cases += 1
            signal.signal(signal.SIGALRM, _alarm)
            signal.alarm(10)
            try:
                rows = fn(text)
                if name == "arpeggio" and case != "seed":
                    # in-band dead-letter: whole-file malformation must
                    # surface as a status row, not an empty result
                    flat = rows if isinstance(rows, list) else []
                    if case in (
                        "trunc_t10", "trunc_t33", "trunc_t50", "trunc_t90",
                        "trunc_minus1", "empty", "ws_only", "binary_garbage",
                        "non_dict_list", "non_dict_scalar", "contacts_not_list",
                    ) and not any(
                        r.get("status") != "ok" for r in flat
                    ):
                        violations.append(f"direct:{name}:{case}:no-status-row")
                        print(f"VIOLATION direct {name} {case}: no status row")
            except allowed:
                pass  # document-level error the reader boundary catches
            except Exception as e:  # noqa: BLE001
                violations.append(f"direct:{name}:{case}:{type(e).__name__}")
                print(f"VIOLATION direct {name} {case}: {type(e).__name__}: {e}")
                traceback.print_exc(limit=2)
            finally:
                signal.alarm(0)
    return n_cases


# ---------------------------------------------------------------------------
# reader-face harness (Spark over a mixed well-formed/corrupted dir)


def reader_sweep(violations: list[str]) -> int:
    import tempfile

    from procoggraph_spark.session import get_spark
    from procoggraph_spark.sources import parsers as P

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    readers = [
        ("sifts_xrefs", P.read_sifts_xrefs, P.parse_sifts_xrefs, SIFTS_XML, "xml"),
        ("sifts_dbs", P.read_sifts_db_versions, P.parse_sifts_db_versions,
         SIFTS_XML, "xml"),
        ("interpro", P.read_interpro_names,
         P.parse_interpro_xml, INTERPRO_XML, "xml"),
        ("arpeggio", P.read_arpeggio_contacts,
         P.parse_arpeggio_json, ARPEGGIO_JSON, "json"),
        ("enzyme_dat", P.read_enzyme_dat,
         lambda p, s: P.parse_enzyme_dat(s), ENZYME_DAT, "line"),
        ("enzclass", P.read_enzclass,
         lambda p, s: P.parse_enzclass(s), ENZCLASS, "line"),
        ("rd", P.read_rd_reactions, P.parse_rd_records, RD_TEXT, "line"),
    ]
    n_files = 0
    for name, read_fn, parse_one, seed, kind in readers:
        d = tempfile.mkdtemp(prefix=f"parser_fuzz_{name}_")
        cases = {"seed": seed} | corruptions(seed, kind)
        for case, text in cases.items():
            with open(os.path.join(d, f"{case}.txt"), "w") as fh:
                fh.write(text)
        n_files += len(cases)
        try:
            data_rows = read_fn(spark, d).collect()
            assert data_rows is not None
        except Exception as e:  # noqa: BLE001
            violations.append(f"reader:{name}:{type(e).__name__}")
            print(f"VIOLATION reader {name}: {type(e).__name__}: {e}")
            continue
        try:
            status = P.read_source_status(spark, d, parse_one).collect()
            if len(status) != len(cases):
                violations.append(f"status:{name}:row-count")
                print(
                    f"VIOLATION status {name}: {len(status)} rows "
                    f"for {len(cases)} files"
                )
            bad = [
                r for r in status
                if r["status"] not in ("ok", "empty", "parse_error")
            ]
            if bad:
                violations.append(f"status:{name}:bad-status")
                print(f"VIOLATION status {name}: unexpected statuses {bad[:3]}")
        except Exception as e:  # noqa: BLE001
            violations.append(f"status:{name}:{type(e).__name__}")
            print(f"VIOLATION status {name}: {type(e).__name__}: {e}")
    return n_files


def main() -> int:
    violations: list[str] = []
    n_direct = direct_sweep(violations)
    n_reader = reader_sweep(violations)
    print(
        json.dumps(
            {
                "metric": "parser_fuzz_sweep",
                "direct_cases": n_direct,
                "reader_files": n_reader,
                "violations": violations,
            }
        )
    )
    print(f"{len(violations)} violations / {n_direct} direct cases "
          f"+ {n_reader} reader files")
    return len(violations)


if __name__ == "__main__":
    sys.exit(main())
