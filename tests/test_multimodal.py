"""Multimodal plumbing: binary columns, mapInPandas feature batches,
frame-sample plans, IVF ANN recall. The decode stub stays a stub; the
fake feature extractor is verified against a pure-pandas recomputation."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from procoggraph_spark.operators import multimodal as M
from procoggraph_spark.operators import similarity as S
from procoggraph_spark.queries import star_multimodal as Q
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (0, "image/png", b"\x89PNG" + bytes(range(64))),
        (1, "image/png", b"\x89PNG" + bytes(range(64))),  # exact payload dup
        (2, "audio/wav", b"RIFF" + bytes([7] * 100)),
        (3, "video/mp4", None),  # null payload must not crash the batch
    ]
    return spark.createDataFrame(
        rows, "asset_id long, mime string, payload binary"
    )


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        M.decode_image_batch(pd.DataFrame({"payload": [b"x"]}))


def test_fake_features_match_pandas(assets):
    got = {r["asset_id"]: r for r in M.attach_fake_features(assets).collect()}
    pdf = assets.toPandas()
    want = M._fake_feature_batch(pdf)
    for _, row in want.iterrows():
        g = got[row["asset_id"]]
        assert g["n_bytes"] == row["n_bytes"]
        assert g["features"] == pytest.approx(row["features"])
    # identical payloads → identical features (the near-dup invariant)
    assert got[0]["features"] == got[1]["features"]
    assert got[3]["features"] == [0.0] * M.FEATURE_DIM


def test_frame_sample_plan(spark):
    v = spark.createDataFrame(
        [(1, 90), (2, 1), (3, 0)], "asset_id long, n_frames int"
    )
    rows = sorted(
        (r["asset_id"], r["frame_idx"])
        for r in M.frame_sample_plan(v, every_n=30).collect()
    )
    assert rows == [(1, 0), (1, 30), (1, 60), (2, 0), (3, 0)]


def test_mm_feature_neardup_vs_pandas(spark):
    """The blocked plan (hyperplane SimHash bands + exact rerank) must
    emit EXACTLY the pandas all-pairs ground truth — full recall through
    the blocking stage, exact scores from the rerank — and must not
    contain a cartesian product."""
    import numpy as np

    df = Q.mm_feature_neardup(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan

    got = {(r["id_a"], r["id_b"]): r["cosine_sim"] for r in df.collect()}
    assert got, "expected at least one near-dup pair at sf0.01"
    d = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    d = d[d.doc_id < 100]
    feats = M._fake_feature_batch(
        pd.DataFrame(
            {
                "asset_id": d.doc_id,
                "mime": "application/x-" + d.source,
                "payload": d.text.map(lambda s: s.encode()),
            }
        )
    ).set_index("asset_id")["features"]
    ids = sorted(feats.index)
    want = {}
    for i, a in enumerate(ids):
        va = np.array(feats[a])
        for b in ids[i + 1 :]:
            vb = np.array(feats[b])
            cs = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
            if round(cs, 6) >= 0.9:
                want[(a, b)] = round(cs, 6)
    assert set(got) == set(want)
    for k, sim in got.items():
        assert sim == pytest.approx(want[k], abs=2e-6)


def test_ivf_recall_vs_bruteforce(spark):
    e = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    exact = S.brute_force_topk(e, q, k=10)
    approx = S.ivf_topk(e, q, n_cells=16, n_probe=4, k=10)
    truth = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    found = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(found & truth) / len(truth) >= 0.5
    # every reported neighbor's score must be the exact cosine (rerank is exact)
    exact_all = {
        (r["query_id"], r["neighbor_id"]): r["cosine_sim"]
        for r in S.brute_force_topk(e, q, k=10**9).collect()
    }
    for r in approx.collect():
        assert r["cosine_sim"] == exact_all[(r["query_id"], r["neighbor_id"])]


def test_resize_images_contract(spark):
    """Aspect-preserving fit to max_side; in-bounds assets pass through
    byte-identical; shrunk assets decimate by the exact floor-div
    stride; None payloads survive."""
    from procoggraph_spark.operators.multimodal import resize_images

    rows = [
        (1, "image/png", 100, 50, b"x" * 1000),   # within bounds
        (2, "image/png", 512, 256, b"y" * 1000),  # 2x downscale
        (3, "image/png", 1024, 256, None),        # null payload
    ]
    df = spark.createDataFrame(
        rows, "asset_id long, mime string, width int, height int, payload binary"
    )
    out = {r["asset_id"]: r for r in resize_images(df, max_side=256).collect()}

    assert (out[1]["target_width"], out[1]["target_height"]) == (100, 50)
    assert bytes(out[1]["payload"]) == b"x" * 1000

    assert (out[2]["target_width"], out[2]["target_height"]) == (256, 128)
    # stride = (512*256) // (256*128) = 4 -> ceil(1000/4) = 250 bytes
    assert len(out[2]["payload"]) == 250

    assert out[3]["payload"] is None
