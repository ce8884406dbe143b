"""Streaming-face differential fuzz: drain every availableNow-drainable
batch/stream twin over the SAME dirty corpus `fuzz_sweep.py` builds,
and report divergences between the two execution faces.

The batch fuzz differential (fuzz_sweep.py) proves the batch operators
agree with their SQL oracles on degenerate data; the streaming
equality pytests prove stream==batch on clean or hand-constructed
data. This tool closes the remaining face: the stream twins must equal
their batch twins on the FULL dirty corpus — NULL/out-of-band/colliding
event times through watermarks and state stores, NaN/Inf/negative/-0.0
values through the stateful cents fold, NULL user ids through
session/total state keys, dirty dimension rows through the
stream-static broadcast join, replayed ids through the dedup gate.

Round 11 extends the sweep to the foreachBatch monitor family
(streaming_scd2 / data_card / volume / SRM / CMS / the IVF+PQ index
feed): each monitor drains the dirty corpus in TWO micro-batches (so
the versioned-state MERGE path runs on fuzzed data, not just the
bootstrap insert), its served read must equal the batch operator over
the union, then two crash-replays must leave the state byte-identical —
an empty re-drain, and a FORCED REDELIVERY of the last micro-batch
(its commit marker + checksum sidecar deleted from the checkpoint, so
Spark genuinely re-runs the merge and the version-swap skip path must
fire).

Usage:
    python tools/fuzz_sweep.py --regen     # build the corpus first
    python tools/streaming_fuzz_sweep.py   # then sweep the stream faces

Exit status is the number of divergent twins (0 == converged).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.fuzz_sweep import FUZZ_DIR, normalize  # noqa: E402


def _drain(df, name: str, mode: str, spark):
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}")


def _rows(df):
    return normalize(
        [tuple(r) for r in df.collect()], df.columns
    )


def sweep(spark) -> int:
    from pyspark.sql import functions as F

    from procoggraph_spark.queries.common import t
    from procoggraph_spark.streaming import windows as W

    ev = t(spark, FUZZ_DIR, "events")
    # The corpus parquet stores TIMESTAMP_NTZ (written raw, outside
    # t()'s ntz normalization) and watermarks demand TIMESTAMP — restage
    # with a value-preserving NTZ->LTZ cast (UTC session), keeping the
    # dirty clocks INTACT so the stream-side valid_ts gate is the one
    # that handles them.
    raw_path = os.path.join(FUZZ_DIR, "events_stream_inbox.parquet")
    raw = spark.read.parquet(os.path.join(FUZZ_DIR, "events.parquet"))
    raw = raw.withColumn("ts", raw["ts"].cast("timestamp"))
    raw.write.mode("overwrite").parquet(raw_path)
    raw_schema = spark.read.parquet(raw_path).schema

    divergent: list[str] = []

    def check(name: str, stream_df, batch_df, *, last_wins_key=None):
        try:
            got_df = _drain(stream_df, f"sfz_{name}", MODES[name], spark)
            if last_wins_key:
                # keep the key exact through pandas: a nullable int64
                # key goes float64 and collapses 2^61-scale ids
                got_df = got_df.withColumn(
                    last_wins_key, F.col(last_wins_key).cast("string")
                )
                batch_df = batch_df.withColumn(
                    last_wins_key, F.col(last_wins_key).cast("string")
                )
                pdf = got_df.toPandas().drop_duplicates(
                    last_wins_key, keep="last"
                )
                got = normalize(
                    [tuple(r) for r in pdf.itertuples(index=False, name=None)],
                    list(pdf.columns),
                )
                # batch through the same pandas hop (NULL double -> NaN
                # identically on both sides)
                bdf = batch_df.toPandas()
                want = normalize(
                    [tuple(r) for r in bdf.itertuples(index=False, name=None)],
                    list(bdf.columns),
                )
            else:
                got = _rows(got_df)
                want = _rows(batch_df)
        except Exception as e:  # noqa: BLE001 — a crash IS a divergence
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:140]}")
            divergent.append(name)
            return
        if got != want:
            diffs = [(a, b) for a, b in zip(got, want) if a != b][:3]
            print(f"MISMATCH {name} {len(got)} vs {len(want)} rows; {diffs}")
            divergent.append(name)
        else:
            print(f"ok {name} ({len(got)} rows)")

    MODES = {
        "tumbling": "complete",
        "session": "complete",
        "stateful_totals": "update",
        "funnel_join": "append",
        "static_enrich": "complete",
        "dedup_gate": "append",
        "chunker": "append",
        "classifier_scoring": "append",
        "bloom_gate": "append",
        "ingest_gate": "append",
    }

    check(
        "tumbling",
        W.streaming_tumbling_counts(spark, raw_path, raw_schema),
        W.tumbling_counts(ev),
    )
    # session windows: the native streaming formulation (state-store
    # merged windows, watermark required) vs the gaps-and-islands batch
    # twin — one availableNow batch, so the watermark drops nothing
    sess_stream = (
        W._events_stream(spark, raw_path, raw_schema)
        .withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
    # the batch twin reports [min_ts, max_ts]; the native form reports
    # [min_ts, max_ts + gap) — align on the session key fields
    sess_batch = W.session_windows_batch(ev).select(
        "session_start",
        (F.col("session_end") + F.expr("INTERVAL 30 MINUTES")).alias(
            "session_end"
        ),
        "user_id",
        "n_events",
    )
    check("session", sess_stream, sess_batch)
    check(
        "stateful_totals",
        W.stateful_user_totals(
            W._events_stream(spark, raw_path, raw_schema)
        ),
        W.batch_user_totals(ev),
        last_wins_key="user_id",
    )
    check(
        "funnel_join",
        W.streaming_funnel_join(spark, raw_path, raw_schema),
        W.funnel_join_batch(ev).select("first_id", "then_id", "user_id"),
    )
    cust = t(spark, FUZZ_DIR, "customer")
    check(
        "static_enrich",
        W.streaming_enriched_counts(spark, raw_path, raw_schema, cust),
        W.enriched_counts_batch(ev, cust),
    )
    # dedup gate: replayed event ids (the corpus carries bit-exact and
    # payload-edited replays) must each survive exactly once — compare
    # the admitted id SET and its size against the batch distinct
    dedup_stream = W.streaming_dedup(spark, raw_path, raw_schema).select(
        "event_id"
    )
    check(
        "dedup_gate",
        dedup_stream,
        ev.select("event_id").distinct(),
        last_wins_key="event_id",
    )

    # ---- document-family twins over the dirty documents table (empty/
    # NULL/unicode/multi-MB texts, replayed ids, boilerplate blankets,
    # 2^61 ids) — stateless column algebra plus the stateful ingest gate
    from procoggraph_spark.operators.classifier import (
        featurize,
        score,
        train_logreg,
    )
    from procoggraph_spark.operators.dedup import incremental_ingest_dedup
    from procoggraph_spark.operators.sketches import bloom_build, bloom_probe
    from procoggraph_spark.operators.text import (
        chunk_documents,
        corpus_keep_decision,
    )

    docs = t(spark, FUZZ_DIR, "documents")
    docs_path = os.path.join(FUZZ_DIR, "documents.parquet")
    docs_schema = spark.read.parquet(docs_path).schema

    def doc_stream():
        return spark.readStream.schema(docs_schema).parquet(docs_path)

    check(
        "chunker",
        chunk_documents(
            doc_stream(), id_col="doc_id", text_col="text",
            chunk_size=60, overlap=10,
        ),
        chunk_documents(
            docs, id_col="doc_id", text_col="text",
            chunk_size=60, overlap=10,
        ),
    )
    labeled = featurize(
        docs.withColumn(
            "label", corpus_keep_decision(F.col("text")).cast("int")
        )
    ).localCheckpoint(eager=True)
    wts, bias = train_logreg(labeled, iters=5, lr=2.0)
    check(
        "classifier_scoring",
        score(featurize(doc_stream()), wts, bias).select(
            "doc_id", F.round("prob", 6).alias("prob")
        ),
        score(featurize(docs), wts, bias).select(
            "doc_id", F.round("prob", 6).alias("prob")
        ),
        # stateless append op over a bag table (replayed ids carry
        # EDITED texts): full bag equality, no keyed dedup
    )
    blocklist = docs.filter(F.col("doc_id") % 10 == 0).select("text")
    check(
        "bloom_gate",
        W.streaming_bloom_gate(
            spark, docs_path, docs_schema, blocklist
        ).select("doc_id", "blocked"),
        # batch face: same bitmap, same probe
        bloom_probe(
            docs, "text", bloom_build(blocklist, "text"), flag_col="blocked"
        ).select("doc_id", "blocked"),
    )
    # ingest gate: admitted content-KEY set equality (which duplicate
    # survives is the stream's documented arrival-order contract)
    history = docs.filter(F.col("doc_id") % 3 == 0)
    arrivals = docs.filter(F.col("doc_id") % 3 != 0)
    arrivals_path = os.path.join(FUZZ_DIR, "ingest_inbox.parquet")
    arrivals.write.mode("overwrite").parquet(arrivals_path)
    ingest_key = F.coalesce(F.md5(F.col("text")), F.lit("__NULL_TEXT__"))
    batch_new = (
        incremental_ingest_dedup(history, arrivals)
        .filter(F.col("decision") == "new")
        .select("doc_id")
        .join(arrivals, "doc_id")
        .select(ingest_key.alias("_k"))
        .distinct()
    )
    check(
        "ingest_gate",
        W.streaming_incremental_ingest(
            spark,
            arrivals_path,
            spark.read.parquet(arrivals_path).schema,
            history,
        ).select("_k"),
        batch_new,
        last_wins_key="_k",
    )

    # ---- foreachBatch monitor family (round-10 verdict item 2): the
    # atomic-version-swap monitors drained over the SAME dirty corpus,
    # in two micro-batches (so the state MERGE path runs on dirty data,
    # not just the bootstrap insert), with a crash-replay re-drain from
    # the checkpoint in the loop — the r10 sweep axis that caught the
    # epoch-zero dedup loss, extended to the stateful-on-disk operators
    # whose pytest pins only cover clean fixtures.
    import shutil

    n_base_twins = len(MODES)
    mon_root = os.path.join(FUZZ_DIR, "_monitor_sweep")
    if os.path.exists(mon_root):
        shutil.rmtree(mon_root)
    os.makedirs(mon_root)
    n_monitors = 0

    def check_monitor(name, batches, start_fn, read_fn, want_df, ckpt=None):
        """Drain `batches` (appended to the monitor's inbox by the
        caller-provided start_fn closure) one availableNow run each,
        compare the served state against the batch operator, then
        crash-replay twice: an empty re-drain, and — when `ckpt` is
        given — a FORCED REDELIVERY of the last micro-batch (its commit
        marker deleted, so Spark re-runs the merge and the version-swap
        skip path must fire). State must not move either time."""
        nonlocal n_monitors
        n_monitors += 1
        try:
            for write_batch in batches:
                write_batch()
                q = start_fn()
                q.awaitTermination(300)
            got = _rows(read_fn())
            want = _rows(want_df)
            if got != want:
                diffs = [(a, b) for a, b in zip(got, want) if a != b][:3]
                print(
                    f"MISMATCH {name} {len(got)} vs {len(want)} rows; {diffs}"
                )
                divergent.append(name)
                return
            q = start_fn()
            q.awaitTermination(300)
            again = _rows(read_fn())
            if again != got:
                print(f"REPLAY-DRIFT {name}: state moved on an empty drain")
                divergent.append(f"{name}(replay)")
                return
            if ckpt is not None:
                commits = os.path.join(ckpt, "commits")
                numeric = (
                    [f for f in os.listdir(commits) if f.isdigit()]
                    if os.path.isdir(commits)
                    else []
                )
                if not numeric:
                    # a checkpoint with no numeric commit files is a
                    # harness/path problem, not an engine divergence —
                    # report it as such instead of letting the broad
                    # except below mislabel it (round-11 advisory)
                    print(
                        f"HARNESS-ERROR {name}: no commit files under "
                        f"{commits} — redelivery leg skipped"
                    )
                    divergent.append(f"{name}(harness:no-commits)")
                    return
                last = max(numeric, key=int)
                os.remove(os.path.join(commits, last))
                crc = os.path.join(commits, f".{last}.crc")
                if os.path.exists(crc):  # orphaned checksum sidecar
                    os.remove(crc)       # blocks the re-commit rename
                q = start_fn()
                q.awaitTermination(300)
                again = _rows(read_fn())
                if again != got:
                    print(
                        f"REPLAY-DRIFT {name}: redelivered batch {last} "
                        "re-applied instead of skipping"
                    )
                    divergent.append(f"{name}(redelivery)")
                    return
            print(f"ok {name} ({len(got)} rows, replay-stable)")
        except Exception as e:  # noqa: BLE001 — a crash IS a divergence
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:140]}")
            divergent.append(name)

    def appender(df, inbox):
        return lambda: df.coalesce(1).write.mode("append").parquet(inbox)

    from procoggraph_spark.operators.analytics import (
        ab_assignment_srm,
        volume_anomaly,
    )
    from procoggraph_spark.operators.temporal import (
        scd2_apply,
        scd2_from_snapshot,
    )
    from procoggraph_spark.operators.text import curation_data_card

    # scd2: CDC over the dirty customer dim — batch 2 rewrites every
    # third key's attribute to the (dirty, unicode-bearing) c_name AND
    # carries a conflicting second row per sixth key (same key, a
    # different attr in one delta — resolved deterministically to the
    # greatest value on both faces), so changed/unchanged/insert and
    # within-delta conflict paths all run on fuzzed strings
    cdc1 = cust.select(
        F.col("c_custkey").alias("k"), F.col("c_mktsegment").alias("attr")
    )
    cdc2 = cust.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("k"), F.col("c_name").alias("attr")
    ).unionByName(
        cust.filter(F.col("c_custkey") % 6 == 0).select(
            F.col("c_custkey").alias("k"),
            F.upper(F.col("c_name")).alias("attr"),
        )
    )
    scd2_inbox = os.path.join(mon_root, "scd2_inbox")
    scd2_hist = os.path.join(mon_root, "scd2_history")
    scd2_ckpt = os.path.join(mon_root, "scd2_ckpt")
    empty_hist = scd2_from_snapshot(
        spark.createDataFrame([], cdc1.schema), key_col="k", attr_col="attr"
    )
    check_monitor(
        "scd2_monitor",
        [appender(cdc1, scd2_inbox), appender(cdc2, scd2_inbox)],
        lambda: W.streaming_scd2(
            spark, scd2_inbox, cdc1.schema, scd2_hist,
            key_col="k", attr_col="attr", checkpoint=scd2_ckpt,
        ),
        lambda: spark.read.parquet(scd2_hist),
        scd2_apply(
            scd2_apply(empty_hist, cdc1, key_col="k", attr_col="attr"),
            cdc2, key_col="k", attr_col="attr",
        ),
        ckpt=scd2_ckpt,
    )

    # data card: dirty documents (NULL/empty/multi-MB/unicode texts,
    # replayed ids) split by id parity so per-source counts MERGE
    card_inbox = os.path.join(mon_root, "card_inbox")
    card_dir = os.path.join(mon_root, "card_state")
    card_ckpt = os.path.join(mon_root, "card_ckpt")
    d_b1 = docs.filter(F.coalesce(F.col("doc_id") % 2 == 0, F.lit(True)))
    d_b2 = docs.filter(F.col("doc_id") % 2 == 1)
    check_monitor(
        "data_card_monitor",
        [appender(d_b1, card_inbox), appender(d_b2, card_inbox)],
        lambda: W.streaming_data_card(
            spark, card_inbox, docs_schema, card_dir,
            checkpoint=card_ckpt,
        ),
        lambda: W.read_data_card(spark, card_dir),
        curation_data_card(docs).select(
            "source", "n_docs", "n_drop_lang", "n_drop_quality",
            "n_drop_repetition", "n_kept", "kept_rate",
        ),
        ckpt=card_ckpt,
    )

    # volume monitor: dirty event clocks through the hourly-count merge
    # (valid_ts gates inside _events_stream on the stream face and
    # inside t() on the batch face); id-parity split makes most hours
    # span BOTH batches, so same-hour counts must fold, not append
    vol_inbox = os.path.join(mon_root, "vol_inbox")
    vol_state = os.path.join(mon_root, "vol_state")
    vol_ckpt = os.path.join(mon_root, "vol_ckpt")
    e_b1 = raw.filter(F.coalesce(F.col("event_id") % 2 == 0, F.lit(True)))
    e_b2 = raw.filter(F.col("event_id") % 2 == 1)
    check_monitor(
        "volume_monitor",
        [appender(e_b1, vol_inbox), appender(e_b2, vol_inbox)],
        lambda: W.streaming_volume_monitor(
            spark, vol_inbox, raw_schema, vol_state,
            checkpoint=vol_ckpt,
        ),
        lambda: W.read_volume_anomalies(spark, vol_state),
        volume_anomaly(ev),
        ckpt=vol_ckpt,
    )

    # SRM monitor: dirty assignment log (replayed ids land in both
    # batches; padded/case-variant sources group as their own segments
    # on both faces per the r10 label-hygiene finding)
    srm_inbox = os.path.join(mon_root, "srm_inbox")
    srm_state = os.path.join(mon_root, "srm_state")
    srm_ckpt = os.path.join(mon_root, "srm_ckpt")
    assign = docs.select("doc_id", "source")
    check_monitor(
        "srm_monitor",
        [
            appender(
                assign.filter(
                    F.coalesce(F.col("doc_id") % 2 == 0, F.lit(True))
                ),
                srm_inbox,
            ),
            appender(assign.filter(F.col("doc_id") % 2 == 1), srm_inbox),
        ],
        lambda: W.streaming_srm_monitor(
            spark, srm_inbox, assign.schema, srm_state,
            checkpoint=srm_ckpt,
        ),
        lambda: W.read_srm_monitor(spark, srm_state),
        ab_assignment_srm(assign),
        ckpt=srm_ckpt,
    )

    # CMS maintenance (the version-swap archetype): sketch the dirty
    # event_type labels (padded / case-variant / empty / NULL) — the
    # merged two-batch sketch must equal the one-shot batch sketch
    # cell-for-cell (mergeability), survive an empty re-drain AND a
    # forced redelivery of the last batch
    from procoggraph_spark.operators.sketches import cms_build

    cms_inbox = os.path.join(mon_root, "cms_inbox")
    cms_state = os.path.join(mon_root, "cms_sketch")
    cms_ckpt = os.path.join(mon_root, "cms_ckpt")
    check_monitor(
        "cms_monitor",
        [appender(e_b1, cms_inbox), appender(e_b2, cms_inbox)],
        lambda: W.streaming_cms(
            spark, cms_inbox, raw_schema, key_col="event_type",
            sketch_dir=cms_state, checkpoint=cms_ckpt, width=32,
        ),
        lambda: spark.read.parquet(cms_state),
        cms_build(
            ev.select(F.col("event_type").cast("string").alias("_k")),
            "_k",
            width=32,
        ),
        ckpt=cms_ckpt,
    )

    # IVF+PQ index maintenance: stateless deterministic encode — the
    # arriving vectors pass the family-wide ingest admission contract
    # (valid_dim at t(), searchable()) on BOTH faces, then the streamed
    # encode must equal the batch build row-for-row on the survivors
    from procoggraph_spark.operators.pq import ivf_pq_index_numpy, train_pq
    from procoggraph_spark.operators.similarity import (
        key_unique,
        searchable,
        train_centroids,
    )

    try:
        # the full ingest admission contract upstream of the index
        # feed: valid_dim (inside t()), searchable, and the keyed
        # id-survivorship the batch builder applies — the STREAM face
        # documents replay handling as the upstream dedup gate's job
        # (dropDuplicatesWithinWatermark / S16 upsert), so the sweep
        # feeds survivors and checks the deterministic encode
        emb = key_unique(
            searchable(
                t(spark, FUZZ_DIR, "embeddings").select(
                    "vec_id", "embedding"
                )
            ),
            "vec_id",
            ["embedding"],
        )
        dim = emb.select(F.size("embedding").alias("d")).first()["d"]
        cents = train_centroids(emb, n_cells=16, iterations=2, metric="l2")
        books = train_pq(emb, m=16, k=16, dim=dim, iterations=2)
        idx_inbox = os.path.join(mon_root, "idx_inbox")
        emb.coalesce(1).write.parquet(idx_inbox)
        MODES["ivf_pq_index"] = "append"
        n_monitors += 1
        codes_str = F.col("pq_codes").cast("string")
        check(
            "ivf_pq_index",
            W.streaming_ivf_pq_index(
                spark, idx_inbox, emb.schema, cents, books
            ).select("vec_id", "cell", codes_str.alias("codes")),
            ivf_pq_index_numpy(emb, cents, books).select(
                "vec_id", "cell", codes_str.alias("codes")
            ),
        )
    except Exception as e:  # noqa: BLE001
        print(f"ERROR ivf_pq_index: {type(e).__name__}: {str(e)[:140]}")
        divergent.append("ivf_pq_index")
        n_monitors += 1

    n_twins = n_base_twins + n_monitors
    print(f"STREAMING-FUZZ divergent: {len(divergent)} of {n_twins}")
    for n in divergent:
        print(f"   {n}")
    return len(divergent)


def main() -> int:
    from pyspark.sql import SparkSession

    if not os.path.isdir(os.path.join(FUZZ_DIR, "events.parquet")):
        print("fuzz corpus missing — run tools/fuzz_sweep.py --regen first")
        return 2
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("streaming_fuzz_sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        return sweep(spark)
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
