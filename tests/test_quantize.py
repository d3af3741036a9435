"""SQ8 scalar quantization: encode bounds, reconstruction error, ANN recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from consent_based_conversion_adjustments_spark.operators.quantize import (
    sq8_encode,
    sq8_fit,
    sq8_reconstruction_error,
    sq8_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_sq8_codes_in_range_and_recon_bound(spark, emb):
    mins, steps = sq8_fit(emb)
    codes = sq8_encode(emb, mins, steps).collect()
    for r in codes:
        assert all(0 <= c <= 255 for c in r["codes"])
    # dequantization error is bounded by one step per dimension (round,
    # not floor, so the true bound is step/2 + the 1e-9 shift)
    errs = {r["d"]: r["max_abs_err"] for r in sq8_reconstruction_error(emb).collect()}
    for d, st in enumerate(steps):
        assert errs[d] <= st / 2 + 1e-6


def test_sq8_constant_dimension_is_exact(spark):
    rows = [(i, [1.5, float(i)]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mins, steps = sq8_fit(df, dim=2)
    assert steps[0] == 0.0
    out = {r["d"]: r for r in sq8_reconstruction_error(df, dim=2).collect()}
    assert out[0]["max_abs_err"] == 0.0 and out[0]["mse"] == 0.0


def test_sq8_topk_recall_vs_exact(spark, emb):
    out = sq8_topk(
        emb.filter(F.col("vec_id") % 50 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        emb.select(F.col("vec_id").alias("cand_id"), "embedding"),
        5,
    ).collect()
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["cand_id"])
    assert by_q
    hits = total = 0
    for qid, got in by_q.items():
        assert len(got) == 5
        qv = vecs[qid]
        d2 = {
            cid: float(((qv - v) ** 2).sum())
            for cid, v in vecs.items()
            if cid != qid
        }
        exact = set(sorted(d2, key=lambda c: (d2[c], c))[:5])
        hits += len(exact & set(got))
        total += 5
    # per-dim error ≤ step/2: top-5 sets survive quantization nearly intact
    assert hits / total >= 0.8


def test_sq8_topk_query_guard(spark, emb):
    q = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    c = emb.select(F.col("vec_id").alias("cand_id"), "embedding")
    with pytest.raises(ValueError, match="max_query_rows"):
        sq8_topk(q, c, 5, max_query_rows=3)


def test_sq8_empty_candidates(spark):
    empty = spark.createDataFrame([], "cand_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(1, [0.0, 1.0])], "query_id long, embedding array<double>"
    )
    out = sq8_topk(q, empty, 3, dim=2)
    assert out.columns == ["query_id", "cand_id", "sq_dist", "rank"]
    assert out.count() == 0
