"""Source readers (SURVEY §2.1 S1-S3, S9, S11).

The reference reads a zoo of flat-file dialects with pandas; here each
becomes a Spark reader that preserves the quirks that matter:

- S1: TSV with custom NA discipline — hetCode "NA" (sodium!) must
  survive, so only literal "NaN"/"None" are nulls
  (`process_all_pdb_contacts.py:145`, `produce_neo4j_files.py:105-111`).
- S2: multi-char / exotic separators (cath-names 4-space, scop2 space)
  via spark.read.text + split (`process_all_pdb_contacts.py:272`).
- S3: comment/skip-rows readers (`download_mmcif.py:182`).
- S9/S11: record-format files (CATH CDDF stanzas, KEGG ENTRY///
  records) as UDTF-style parsers over whole-record text splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_tsv(
    spark: SparkSession,
    path: str,
    *,
    sep: str = "\t",
    header: bool = True,
    comment: str | None = None,
    schema=None,
) -> DataFrame:
    """S1/S3: CSV/TSV with the NA-protection discipline: ONLY the
    literal strings "NaN" and "None" are nulls — never "NA"."""
    reader = (
        spark.read.option("sep", sep)
        .option("header", header)
        .option("nullValue", "NaN")
        .option("nanValue", "__never_nan__")  # keep textual "NA" intact
        .option("emptyValue", "")
    )
    if comment:
        reader = reader.option("comment", comment)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.csv(path)
    # second null literal ("None") — CSV reader supports one nullValue
    for c in df.columns:
        df = df.withColumn(c, F.when(F.col(c) == "None", None).otherwise(F.col(c)))
    return df


def read_multichar_sep(
    spark: SparkSession,
    path: str,
    *,
    sep_regex: str,
    columns: list[str],
    comment: str | None = "#",
    max_split: int | None = None,
) -> DataFrame:
    """S2: exotic-separator flat files (e.g. cath-names' 4-space sep,
    `process_all_pdb_contacts.py:272`) — text read + regex split, since
    the CSV datasource only supports single-char separators."""
    text = spark.read.text(path)
    if comment:
        text = text.filter(~F.col("value").startswith(comment))
    limit = max_split if max_split is not None else len(columns)
    parts = F.split(F.col("value"), sep_regex, limit)
    return text.select(
        *[parts.getItem(i).alias(c) for i, c in enumerate(columns)]
    )


def read_skip_rows(
    spark: SparkSession, path: str, *, skip: int, sep: str = "\t", columns: list[str]
) -> DataFrame:
    """S3: skiprows=N readers (`download_mmcif.py:182` skiprows=1) —
    zipWithIndex-free: tag line numbers per file via a window on a
    monotonically increasing id is overkill for header-skips; instead
    read as text, drop the first ``skip`` rows per file with a window."""
    from pyspark.sql import Window

    text = spark.read.text(path).withColumn("_file", F.input_file_name())
    w = Window.partitionBy("_file").orderBy(F.monotonically_increasing_id())
    body = text.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") > skip)
    parts = F.split(F.col("value"), sep)
    return body.select(*[parts.getItem(i).alias(c) for i, c in enumerate(columns)])


def read_cath_names(spark: SparkSession, path: str) -> DataFrame:
    """cath-names.txt: ``cath_code<4sp>representative_domain<4sp>:name``
    with '#' comments; the leading ':' on the name is stripped
    (`process_all_pdb_contacts.py:272-273`). Returns the generic
    level-description shape (accession, description) consumed by
    ``build_classification_hierarchy(level_names=...)``."""
    raw = read_multichar_sep(
        spark,
        path,
        sep_regex=r" {4}",
        columns=["cath_code", "representative_domain", "name"],
    )
    return raw.filter(F.col("cath_code").isNotNull()).select(
        F.col("cath_code").alias("accession"),
        F.regexp_replace("name", r"^:", "").alias("description"),
    )


def read_scop_descriptions(spark: SparkSession, path: str) -> DataFrame:
    """dir.des.scop.txt: TSV with '#' comments, columns sunid / level /
    sccs / sid / description (`utils.py:224`). ``scop_level_names``
    projects it to the (accession, description) shape keyed by sccs."""
    return read_tsv(
        spark,
        path,
        header=False,
        comment="#",
        schema=(
            "level_sunid string, level string, level_sccs string,"
            " level_sid string, level_description string"
        ),
    )


def scop_level_names(des: DataFrame) -> DataFrame:
    """(accession, description) for the sccs-keyed SCOP hierarchy levels
    (cl/cf/sf/fa — the dotted chain this engine derives); dm/sp/px rows
    and placeholder sccs values are dropped."""
    return (
        des.filter(F.col("level").isin("cl", "cf", "sf", "fa"))
        .filter(F.col("level_sccs").isNotNull() & (F.col("level_sccs") != "-"))
        .select(
            F.col("level_sccs").alias("accession"),
            F.col("level_description").alias("description"),
        )
        .dropDuplicates(["accession"])
    )


def read_scop2_descriptions(spark: SparkSession, path: str) -> DataFrame:
    """SCOP2 node descriptions: ``<node_id> <name>`` lines with '#'
    comments (`utils.py:393-400`) → (accession, description)."""
    text = spark.read.text(path).filter(~F.col("value").startswith("#"))
    return text.select(
        F.regexp_extract("value", r"^(\d+) (.+)", 1).alias("accession"),
        F.regexp_extract("value", r"^(\d+) (.+)", 2).alias("description"),
    ).filter(F.col("accession") != "")


def read_record_format(
    spark: SparkSession,
    path: str,
    *,
    record_sep: str = "///",
    parse_record,
    schema,
) -> DataFrame:
    """S11: KEGG-style flat records (ENTRY.../// blocks,
    `get_ec_information.py:28-91`) — lineSep splits whole records, a
    mapInPandas UDTF parses each into typed rows. ``parse_record`` is
    ``str -> list[dict]``."""
    import pandas as pd

    records = spark.read.option("lineSep", record_sep).text(path)

    def parse_batch(it):
        for pdf in it:
            rows = []
            for rec in pdf["value"]:
                if rec and rec.strip():
                    rows.extend(parse_record(rec))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return records.mapInPandas(parse_batch, schema=schema)


def parse_kegg_record(rec: str) -> list[dict]:
    """Minimal KEGG flat-record parser: ENTRY / NAME / DEFINITION /
    EQUATION / ENZYME fields (`get_ec_information.py:118-161`)."""
    out: dict[str, str | None] = {
        "entry": None, "name": None, "definition": None,
        "equation": None, "enzyme": None,
    }
    current = None
    for line in rec.splitlines():
        if not line.strip():
            continue
        field = line[:12].strip()
        value = line[12:].strip()
        if field:
            current = field.lower()
        if current in out and value:
            out[current] = (out[current] + " " + value) if out[current] else value
    if out["entry"]:
        out["entry"] = out["entry"].split()[0]
        return [out]
    return []


def parse_cddf_records(text: str) -> list[dict]:
    """S9: CATH CDDF stanza parser (`utils.py:284-338`): DOMAIN /
    CATHCODE / SEGMENT records separated by // lines."""
    out = []
    domain, cathcode, segments = None, None, []
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("#"):
            continue
        if line.startswith("//"):
            if domain:
                out.append(
                    {"domain": domain, "cathcode": cathcode, "n_segments": len(segments)}
                )
            domain, cathcode, segments = None, None, []
        elif line.startswith("DOMAIN"):
            domain = line[10:].strip()
        elif line.startswith("CATHCODE"):
            cathcode = line[10:].strip()
        elif line.startswith("SEGMENT"):
            segments.append(line[10:].strip())
    if domain:
        out.append({"domain": domain, "cathcode": cathcode, "n_segments": len(segments)})
    return out


# Pfam clan-info file layout (the headerless 16-column TSV the reference
# reads at `utils.py:235`); only acc/description/comment feed the graph.
PFAM_CLAN_INFO_COLUMNS = [
    "clan_acc", "clan_id", "previous_id", "clan_description", "clan_author",
    "deposited_by", "clan_comment", "updated", "created", "version",
    "number_structures", "number_archs", "number_species", "number_sequences",
    "competed", "uniprot_competed",
]


def pfam_annotations(
    spark: SparkSession,
    pfam_a_path: str,
    clan_membership_path: str,
    clan_info_path: str,
) -> DataFrame:
    """Pfam annotation assembly (`utils.py:232-241` get_pfam_annotations):
    pfam-A accessions/names/descriptions left-joined with clan
    membership and clan info. All three inputs are headerless TSVs
    ('#' comments in clan info); textual "NA" survives (S1 discipline).
    Output: one row per Pfam accession with its clan columns, null
    where unclanned — the frame the clan node/edge builders consume.
    Clan tables are dimension-sized → broadcast joins, no shuffle."""
    pfam_a = read_tsv(
        spark,
        pfam_a_path,
        header=False,
        comment="#",
        schema=(
            "pfam_accession string, pfam_name string, _unused string,"
            " pfam_description string"
        ),
    ).select("pfam_accession", "pfam_name", "pfam_description")
    membership = read_tsv(
        spark, clan_membership_path, header=False, schema="clan string, pfam string"
    )
    info_schema = ", ".join(f"{c} string" for c in PFAM_CLAN_INFO_COLUMNS)
    clans = read_tsv(
        spark, clan_info_path, header=False, comment="#", schema=info_schema
    ).select("clan_acc", "clan_description", "clan_comment")
    # membership is the authoritative clan assignment; clan_info only
    # decorates. Keying the output on membership.clan (not clan_info's
    # clan_acc) keeps the assignment when the info file lacks the clan
    # row (version skew between the two flat files) — the clan arrives
    # with null description instead of silently vanishing.
    clan_df = membership.join(
        F.broadcast(clans), membership.clan == clans.clan_acc, "left"
    ).select(
        "pfam",
        F.col("clan").alias("clan_acc"),
        "clan_description",
        "clan_comment",
    )
    return pfam_a.join(
        F.broadcast(clan_df), pfam_a.pfam_accession == clan_df.pfam, "left"
    ).select(
        "pfam_accession",
        "pfam_name",
        "pfam_description",
        "clan_acc",
        "clan_description",
        "clan_comment",
    )


def pfam_clan_mapping(annotations: DataFrame) -> DataFrame:
    """Project ``pfam_annotations`` output onto the hierarchy-mapping
    shape ``build_classification_hierarchy`` consumes for Pfam
    (`produce_neo4j_files.py:363-368`: clan nodes keyed clan_acc, named
    by clan_description; clan_comment kept as an extra column for flat
    exports): one row per clanned Pfam accession."""
    return (
        annotations.filter(
            F.col("clan_acc").isNotNull() & (F.col("clan_acc") != "")
        )
        .select(
            F.col("pfam_accession").alias("groupAccession"),
            F.col("clan_acc").alias("pfamClan"),
            F.col("clan_description").alias("pfamClan_description"),
            F.col("clan_comment").alias("pfamClan_comment"),
        )
        .dropDuplicates(["groupAccession", "pfamClan"])
    )


def read_jsonl_corpus(spark, path, schema, *, corrupt_col: str = "_corrupt_record"):
    """JSON-lines corpus ingest with the repo's dead-letter discipline
    (the delivery format of most raw web/text corpora): returns
    ``(good, bad)`` — schema-typed rows, and a frame of the raw
    malformed lines for quarantine — instead of either failing the job
    on one bad line (FAILFAST) or silently nulling it (plain
    PERMISSIVE). Mirrors the arpeggio-JSON and fetcher dead-letter
    semantics (`sources/parsers.py` P4, `sources/fetchers.py`).

    Scale note: the PERMISSIVE read with a corrupt-record column is a
    single splittable scan; Spark requires the frame to be materialized
    before filtering ON the corrupt column alone (SPARK-21610), so the
    parsed frame is lazily localCheckpoint-ed — one pass, both outputs
    served from it.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    full = T.StructType(list(schema.fields) + [T.StructField(corrupt_col, T.StringType())])
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
        .localCheckpoint(eager=False)
    )
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return good, bad
