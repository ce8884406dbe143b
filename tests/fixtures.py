"""Miniature ProCogGraph-shaped fixtures (FIXTURES.md §1-§6): golden
inputs exercising the classifier boundaries, bestCognate ties, EC
transfer/partial edge cases."""

from __future__ import annotations

from pyspark.sql import SparkSession


def atom_contacts(spark: SparkSession):
    """Atom-level contacts for pipeline/contacts.py: entity be1 with two
    CATH domains (d1: 4 residues incl. inscode + hbond; d2: 3 residues),
    a sub-cutoff domain d3 (2 residues — must drop), a proximal-only
    contact (must drop), and hetCode 'NA' sodium surviving."""
    rows = []

    def c(uid, dom, res, ins, types, lig_res=401):
        rows.append(
            (
                "1abc", uid, "B", lig_res, "A_1", res, ins, types, "CATH", dom,
            )
        )

    # d1: residues 99, 100_A, 101, 102 (4 distinct), one hbond
    c("1abc_bm1_B", "1abc:A:d1", 100, "A", ["hbond"])
    c("1abc_bm1_B", "1abc:A:d1", 99, None, ["vdw"])
    c("1abc_bm1_B", "1abc:A:d1", 101, None, ["covalent"])
    c("1abc_bm1_B", "1abc:A:d1", 102, None, ["polar"])
    # extra contact on an existing residue (counts, not a new residue)
    c("1abc_bm1_B", "1abc:A:d1", 99, None, ["polar"])
    # d2: 3 residues, exactly at cutoff
    c("1abc_bm1_B", "1abc:A:d2", 200, None, ["vdw"])
    c("1abc_bm1_B", "1abc:A:d2", 201, None, ["vdw"])
    c("1abc_bm1_B", "1abc:A:d2", 202, None, ["polar"])
    # d3: below cutoff (2 residues) → dropped
    c("1abc_bm1_B", "1abc:A:d3", 300, None, ["vdw"])
    c("1abc_bm1_B", "1abc:A:d3", 301, None, ["vdw"])
    # proximal-only contact → dropped before counting
    c("1abc_bm1_B", "1abc:A:d1", 150, None, ["proximal"])
    return spark.createDataFrame(
        rows,
        schema=(
            "pdb_id string, uniqueID string, bound_ligand_struct_asym_id string,"
            " ligand_residue int, assembly_chain_id_protein string,"
            " protein_residue int, protein_inscode string,"
            " contact_types array<string>, xref_db string, domain_accession string"
        ),
    )


def combined_contacts(spark: SparkSession):
    """Pre-aggregated per-(entity, domain) stats → FIXTURES §1. Counts
    chosen to hit every classifier boundary (1.0 / 0.9 / 0.5 / 0.1 and
    the (0.1,0.5)&non_minor==1 NULL hole)."""
    rows = [
        # uniqueID, xref_db, domain_accession, acc, contact, hbond, cov
        ("u1", "CATH", "1abc:A:c1", "1.10.10.10", 10, 2, 0),      # 1.0 exclusive
        ("u2", "CATH", "1abc:A:c1", "1.10.10.10", 90, 0, 0),      # 0.9 dominant
        ("u2", "CATH", "1abc:A:c2", "2.40.50.60", 10, 0, 0),      # 0.1 minor
        ("u3", "CATH", "1abc:A:c1", "1.10.10.10", 50, 0, 0),      # 0.5 major_partner
        ("u3", "CATH", "1abc:A:c2", "2.40.50.60", 50, 0, 0),      # 0.5 major_partner
        ("u4", "CATH", "1abc:A:c1", "1.10.10.10", 85, 0, 0),      # 0.85 major
        ("u4", "CATH", "1abc:A:c2", "2.40.50.60", 10, 0, 0),      # minor
        ("u4", "CATH", "1abc:A:c3", "3.30.30.30", 5, 0, 0),       # minor
        ("u5", "CATH", "1abc:A:c1", "1.10.10.10", 60, 0, 0),      # 0.6 major_partner
        ("u5", "CATH", "1abc:A:c2", "2.40.50.60", 40, 0, 0),      # 0.4 partner
        # the reference's NaN hole: 0.4 with everything else minor
        ("u6", "CATH", "1abc:A:c1", "1.10.10.10", 40, 0, 0),
        ("u6", "CATH", "1abc:A:c2", "2.40.50.60", 10, 0, 0),
        ("u6", "CATH", "1abc:A:c3", "3.30.30.30", 10, 0, 0),
        ("u6", "CATH", "1abc:A:c4", "4.10.10.10", 10, 0, 0),
        ("u6", "CATH", "1abc:A:c5", "5.10.10.10", 10, 0, 0),
        ("u6", "CATH", "1abc:A:c6", "6.10.10.10", 10, 0, 0),
        ("u6", "CATH", "1abc:A:c7", "7.10.10.10", 10, 0, 0),
        # same entity u1 in a second xref_db: independent totals
        ("u1", "Pfam", "1abc:A:p1", "PF00001", 7, 0, 0),
    ]
    return spark.createDataFrame(
        rows,
        schema=(
            "uniqueID string, xref_db string, domain_accession string,"
            " xref_db_acc string, domain_contact_counts long,"
            " domain_hbond_counts long, domain_covalent_counts long"
        ),
    )


def graph_inputs(spark: SparkSession):
    """Full combined_contacts + parity + cognate fixtures feeding
    pipeline.build_graph (FIXTURES §1-§4, §6)."""
    cc_rows = [
        # pdb, desc, title, kw, uid, xref_db, acc, domacc, hetCode, descr,
        # description, type, chain, contact, hbond, cov, lig_res, dom_res, ecList
        ("1abc", "d", "t", "k", "1abc_bm1_A", "CATH", "2.40.110.10", "1abc:A:c1",
         "ATP", "CC(=O)N", "adenosine triphosphate", "ligand", "A_1",
         8, 1, 0, "401|402", "99|100_A|101", ["1.1.1.1"]),
        ("1abc", "d", "t", "k", "1abc_bm1_A", "CATH", "3.20.20.100", "1abc:A:c2",
         "ATP", "CC(=O)N", "adenosine triphosphate", "ligand", "A_1",
         2, 0, 0, "401|402", "200|201|202", ["1.1.1.1"]),
        ("2xyz", "d", "t", "k", "2xyz_bm1_A", "CATH", "2.40.110.10", "2xyz:A:c1",
         "NAD", "OC1CCC1", "nicotinamide", "ligand", "A_1",
         10, 0, 1, "500", "300|301|302", ["2.2.2.4"]),
        ("2xyz", "d", "t", "k", "2xyz_bm2_B", "Pfam", "PF00001", "2xyz:B:p1",
         "NA", "[Na+]", "sodium", "ligand", "B_1",
         5, 0, 0, "600", "400|401|402", ["1.1.1.1"]),
        # bound entity with NO cognate match (drives Best/Any/All "All")
        ("3pqr", "d", "t", "k", "3pqr_bm1_A", "CATH", "2.40.110.10", "3pqr:A:c1",
         "XYZ", "CCCC", "mystery ligand", "ligand", "A_1",
         6, 0, 0, "700", "500|501|502", ["9.9.9.9"]),
    ]
    cc = spark.createDataFrame(
        cc_rows,
        schema=(
            "pdb_id string, pdb_descriptor string, pdb_title string,"
            " pdb_keywords string, uniqueID string, xref_db string,"
            " xref_db_acc string, domain_accession string, hetCode string,"
            " descriptor string, description string, type string,"
            " assembly_chain_id_protein string, domain_contact_counts long,"
            " domain_hbond_counts long, domain_covalent_counts long,"
            " bound_ligand_residue_interactions string,"
            " domain_residue_interactions string, ecList array<string>"
        ),
    )
    from procoggraph_spark.operators.ownership import assign_ownership

    cc = assign_ownership(cc, unique_id="uniqueID", database_type="xref_db")

    from procoggraph_spark.functions.chem import stable_id_from_string
    from pyspark.sql import functions as F

    # chemotype ids must match build_bound_descriptor_nodes' hash
    chem = spark.createDataFrame(
        [("ATP", "CC(=O)N", "adenosine triphosphate"),
         ("NAD", "OC1CCC1", "nicotinamide"),
         ("NA", "[Na+]", "sodium"),
         ("XYZ", "CCCC", "mystery ligand")],
        "hetCode string, descriptor string, description string",
    ).withColumn(
        "lid",
        stable_id_from_string(F.concat_ws("", "hetCode", "description", "descriptor")),
    )
    ids = {r["hetCode"]: r["lid"] for r in chem.collect()}

    parity_rows = [
        # ec, pdb_ligand(chemotype id), cognate, score, subparity, smarts, error
        ("1.1.1.1", ids["ATP"], 101, 0.80, 0.75, "smarts1", None),   # tie →
        ("1.1.1.1", ids["ATP"], 102, 0.80, 0.70, "smarts2", None),   # both Y
        ("1.1.1.1", ids["ATP"], 103, 0.55, 0.50, "smarts3", None),   # N
        ("1.1.1.1", ids["ATP"], 104, 0.30, 0.20, None, None),        # < cutoff
        ("2.2.2.4", ids["NAD"], 101, 0.95, 0.90, "smarts4", None),
        ("2.2.2.4", ids["NAD"], 105, 0.90, 0.80, None, "timeout"),   # errored
        ("1.1.1.1", ids["NA"], 106, 0.45, 0.40, None, None),
    ]
    parity = spark.createDataFrame(
        parity_rows,
        schema=(
            "ec string, pdb_ligand long, cognate_ligand long, score double,"
            " pdbl_subparity double, parity_smarts string, error string"
        ),
    )
    cognate = spark.createDataFrame(
        [
            (101, "OCC1OC(O)C(O)C1O", "alpha-D-glucose", "KEGG:C00031", "R1", "N"),
            (102, "OCC1OC(O)C(O)C1N", "beta-D-thing", "KEGG:C00032", "R2", "N"),
            (103, "CC(=O)C(=O)O", "pyruvate", "KEGG:C00022", "R3", "N"),
            (104, "OC(=O)CCC(=O)O", "succinate", "KEGG:C00042", "R4", "N"),
            (105, "NC(=O)c1ccccc1", "amide", "KEGG:C00099", "R5", "Cofactor"),
            (106, "[Cl-]", "chloride", "CHEBI:17996", "R6", "N"),
        ],
        schema=(
            "uniqueID long, canonical_smiles string, compound_name string,"
            " ligand_db string, compound_reaction string, isCofactor string"
        ),
    )
    ec_records = spark.createDataFrame(
        [
            ("1.1.1.1", "Alcohol dehydrogenase."),
            ("1.1.1.2", "Transferred entry: 1.1.1.3."),
            ("1.1.1.3", "Something else."),
            ("2.2.2.2", "Transferred entry: 2.2.2.3."),
            ("2.2.2.3", "Transferred entry: 2.2.2.4."),
            ("2.2.2.4", "Terminal enzyme."),
            ("3.3.3.3", "Deleted entry."),
            ("9.9.9.9", "Mystery enzyme."),
        ],
        "ID string, DE string",
    )
    return cc, parity, cognate, ec_records
