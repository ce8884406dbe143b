"""Fixture tests for the UDTF-style format sources (SURVEY §2.1
S5-S8, S10, S12): tiny synthetic files through the real Spark
wholetext→mapInPandas path, asserting typed rows."""

from __future__ import annotations

import json
import os
import textwrap

import pytest

from procoggraph_spark.sources import parsers as P

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
          <crossRefDb dbSource="UniProt" dbAccessionId="P12345"/>
          <crossRefDb dbSource="InterPro" dbAccessionId="IPR000719"
                      dbEvidence="SSF56112"/>
          <crossRefDb dbSource="InterPro" dbAccessionId="IPR999999"
                      dbEvidence="PF00069"/>
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
    some header line that should be ignored
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


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("fmt")
    (d / "sifts.xml").write_text(SIFTS_XML)
    (d / "entry.cif").write_text(CIF_TEXT)
    (d / "enzyme.dat").write_text(ENZYME_DAT)
    (d / "enzclass.txt").write_text(ENZCLASS)
    (d / "interpro.xml").write_text(INTERPRO_XML)
    (d / "rhea.rd").write_text(RD_TEXT)
    arp = {
        "status": "complete",
        "1abc": [
            {
                "bgn": {"auth_asym_id": "B", "auth_seq_id": 1, "auth_atom_id": "C1"},
                "end": {"auth_asym_id": "A", "auth_seq_id": 10, "auth_atom_id": "CA"},
                "contact": ["hbond", "proximal"],
                "interacting_entities": "INTER",
                "distance": 3.2,
            },
            {
                "bgn": {"auth_asym_id": "B", "auth_seq_id": 1, "auth_atom_id": "C2"},
                "end": {"auth_asym_id": "A", "auth_seq_id": 11, "auth_atom_id": "CB"},
                "contact": ["proximal"],
                "interacting_entities": "INTER",
                "distance": 4.5,
            },
        ],
    }
    (d / "1abc.json").write_text(json.dumps(arp))
    (d / "timeout.json").write_text(json.dumps({"status": "timeout", "9xyz": []}))
    return d


def test_sifts_xrefs(spark, files):
    rows = P.read_sifts_xrefs(spark, str(files / "sifts.xml")).collect()
    got = {(r["xref_db"], r["xref_db_acc"], r["seq_range_chain"], r["derived_from"])
           for r in rows}
    # CATH + Pfam direct; InterPro kept only via SSF evidence (derived_from
    # = the InterPro acc); UniProt and PF-evidence InterPro dropped
    assert got == {
        ("CATH", "1.10.510.10", "10", None),
        ("InterPro", "SSF56112", "10", "IPR000719"),
        ("Pfam", "PF00069", "11", None),
    }
    assert all(r["proteinStructAsymID"] == "A" for r in rows)


def test_sifts_db_versions(spark, files):
    rows = P.read_sifts_db_versions(spark, str(files / "sifts.xml")).collect()
    got = {(r["xref_db"], r["xref_db_version"]) for r in rows}
    assert got == {
        ("CATH", "4.3"),
        ("SCOP2_SuperFamily", "2022"),
        ("SCOP2_Family", "2022"),
    }


def test_cif_category_loop_and_quotes(spark, files):
    rows = P.read_cif_category(
        spark, str(files / "entry.cif"), "_entity", ["id", "type", "pdbx_description"]
    ).collect()
    got = {(r["id"], r["type"], r["pdbx_description"]) for r in rows}
    assert got == {
        ("1", "polymer", "Protein kinase"),
        ("2", "non-polymer", "ATP molecule"),
        ("3", "water", "."),
    }
    asym = P.read_cif_category(
        spark, str(files / "entry.cif"), "_struct_asym", ["id", "entity_id"]
    ).collect()
    assert {(r["id"], r["entity_id"]) for r in asym} == {("A", "1"), ("B", "2")}


def test_arpeggio_contacts(spark, files):
    df = P.read_arpeggio_contacts(
        spark, [str(files / "1abc.json"), str(files / "timeout.json")]
    )
    rows = df.collect()
    ok = [r for r in rows if r["status"] == "ok"]
    assert len(ok) == 2
    assert {r["pdb_id"] for r in ok} == {"1abc"}
    assert sorted(ok, key=lambda r: r["distance"])[0]["contact"] == [
        "hbond",
        "proximal",
    ]
    dead = [r for r in rows if r["status"] != "ok"]
    assert len(dead) == 1 and dead[0]["status"] == "timeout"
    # P4 downstream filter: any contact type outside the proximal set
    from pyspark.sql import functions as F

    real = df.filter(
        F.exists(
            "contact", lambda c: ~c.isin("proximal", "vdw_clash", "clash")
        )
    ).collect()
    assert len(real) == 1 and real[0]["bgn_auth_atom_id"] == "C1"


def test_enzyme_dat(spark, files):
    rows = {r["ID"]: r for r in P.read_enzyme_dat(spark, str(files / "enzyme.dat")).collect()}
    assert rows["1.1.1.1"]["DE"] == "Alcohol dehydrogenase"
    assert rows["1.1.1.1"]["AN"] == ["Aldehyde reductase"]
    assert rows["1.1.1.1"]["CF"] == "Zn(2+)."
    assert rows["1.1.1.1"]["transferred_to"] == []
    assert rows["1.1.1.2"]["transferred_to"] == ["1.1.1.1", "1.1.1.71"]


def test_enzclass(spark, files):
    rows = {r["EC"]: r["description"] for r in P.read_enzclass(spark, str(files / "enzclass.txt")).collect()}
    assert rows == {
        "1.-.-.-": "Oxidoreductases",
        "1.1.-.-": "Acting on the CH-OH group of donors",
        "1.1.1.-": "With NAD(+) or NADP(+) as acceptor",
    }


def test_interpro(spark, files):
    rows = {r["interpro_accession"]: r["interpro_name"]
            for r in P.read_interpro_names(spark, str(files / "interpro.xml")).collect()}
    assert rows == {
        "IPR000719": "Prot_kinase_dom",
        "IPR008271": "Ser/Thr_kinase_AS",
    }


def test_rd_reactions(spark, files):
    rows = P.read_rd_reactions(spark, str(files / "rhea.rd")).collect()
    assert len(rows) == 2
    by_id = {r["compound_id"]: r for r in rows}
    assert by_id["CHEBI:15377"]["mol_type"] == "reactant"
    assert by_id["CHEBI:16234"]["mol_type"] == "product"
    for r in rows:
        assert r["reaction_id"] == "10001"
        assert r["properties"] == {"EC": "1.1.1.1"}
        assert "V2000" in r["molblock"]
        assert r["smiles"] is None  # RDKit absent in this container


# ---------------------------------------------------------------------------
# malformed-source dead-letter contract (round-12 parser fuzz campaign;
# full corpus in tools/parser_fuzz_sweep.py — these pin the contract)


def test_arpeggio_malformed_json_dead_letters_in_band(spark, tmp_path):
    """Truncated / non-JSON / type-confused arpeggio payloads must
    surface as IN-BAND status rows (the schema has a status column —
    same row shape as the tool's own timeout records), never crash the
    reader, and never poison the Arrow hop with un-coerced types."""
    d = tmp_path / "arp"
    d.mkdir()
    (d / "trunc.json").write_text('{"status": "complete", "1abc": [{"bg')
    (d / "notdict.json").write_text("[1, 2, 3]")
    (d / "types.json").write_text(json.dumps({
        "2xyz": [{
            "bgn": "not-a-dict",
            "end": {"auth_seq_id": "NaN-ish", "auth_atom_id": 9},
            "contact": "hbond",
            "interacting_entities": ["INTER"],
            "distance": "3.2 A",
        }]
    }))
    rows = P.read_arpeggio_contacts(spark, str(d)).collect()
    by_status: dict = {}
    for r in rows:
        by_status.setdefault(r["status"], []).append(r)
    # two whole-file malformations -> two malformed_json status rows
    assert len(by_status.get("malformed_json", [])) == 2
    # the type-confused record still parses: strings/objects in typed
    # slots degrade to NULL instead of crashing the Arrow conversion
    ok = by_status["ok"]
    assert len(ok) == 1 and ok[0]["pdb_id"] == "2xyz"
    assert ok[0]["bgn_auth_seq_id"] is None
    assert ok[0]["end_auth_seq_id"] is None
    assert ok[0]["end_auth_atom_id"] is None  # int in a string slot
    assert ok[0]["contact"] is None  # string in an array slot
    assert ok[0]["distance"] is None  # non-numeric string


def test_reader_face_survives_malformed_files(spark, tmp_path):
    """A directory mixing well-formed and broken files: the data face
    completes (malformed files contribute zero rows — one truncated
    download in a million-file manifest must not fail the stage) and
    the status face reports every file, INCLUDING zero-byte ones the
    DataFrame text source prunes from its file index."""
    d = tmp_path / "sifts"
    d.mkdir()
    (d / "good.xml").write_text(SIFTS_XML)
    (d / "trunc.xml").write_text(SIFTS_XML[: len(SIFTS_XML) // 3])
    (d / "empty.xml").write_text("")
    (d / "garbage.xml").write_text("\x00\x01 not xml <<<")

    rows = P.read_sifts_xrefs(spark, str(d)).collect()
    assert {r["xref_db"] for r in rows} == {"CATH", "Pfam", "InterPro"}
    assert all(r["path"].endswith("good.xml") for r in rows)

    status = {
        os.path.basename(r["path"]): r
        for r in P.read_source_status(
            spark, str(d), P.parse_sifts_xrefs
        ).collect()
    }
    assert set(status) == {"good.xml", "trunc.xml", "empty.xml", "garbage.xml"}
    assert status["good.xml"]["status"] == "ok"
    assert status["good.xml"]["n_rows"] == len(rows)
    assert status["trunc.xml"]["status"] == "parse_error"
    assert status["empty.xml"]["status"] == "parse_error"  # ET: no element
    assert status["garbage.xml"]["status"] == "parse_error"
    assert "ParseError" in status["trunc.xml"]["error"]


def test_xml_record_salvage_on_stripped_attributes():
    """An element missing a required attribute is a malformed RECORD:
    skip it, keep the rest of the file (file-level dead-letter only
    fires when the document itself won't parse)."""
    stripped = SIFTS_XML.replace('dbResNum="10"', "").replace(
        'dbSource="CATH" dbVersion="4.3"', ""
    )
    rows = P.parse_sifts_xrefs("f.xml", stripped)
    # residue 10's xrefs are gone (no dbResNum); residue 11's Pfam stays
    assert {r["seq_range_chain"] for r in rows} == {"11"}
    dbs = P.parse_sifts_db_versions("f.xml", stripped)
    assert {(r["xref_db"], r["xref_db_version"]) for r in dbs} == {
        ("SCOP2_SuperFamily", "2022"),
        ("SCOP2_Family", "2022"),
    }
