"""Optimizer-style column statistics: equi-depth histograms and
histogram-based join cardinality estimation.

What an ANALYZE pass computes and what a cost-based optimizer consumes:
equi-depth (equal-height) histograms — bucket boundaries at the
1/n-quantiles so every bucket holds ~the same row count, which bounds the
estimation error on skewed data (the reason Postgres/Spark CBO use
equi-depth, not equi-width) — and the textbook per-bucket join estimator
|A ⋈ B| ≈ Σ_b n_A(b)·n_B(b)/max(d_A(b), d_B(b)) (containment-of-values
assumption, System-R lineage).

Plan shape: boundaries come from ONE exact-percentile aggregate (bounded:
n_buckets−1 doubles of driver traffic — the repo's accepted scalar
pattern; swap in approx_percentile at extreme scale, same contract
shape), baked back as literals so bucket assignment is a stateless
codegen map (a sum of comparison casts, no CASE chain, no join); the
per-bucket rollup is one map-side-combinable hash agg. The estimator then
joins two BOUNDED histogram tables (≤ n_buckets rows each) — everything
downstream of the scans is O(n_buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "equi_depth_boundaries",
    "bucket_of",
    "equi_depth_histogram",
    "estimate_equijoin_rows",
]


def equi_depth_boundaries(
    df: DataFrame, col: str, n_buckets: int = 8
) -> list[float]:
    """The n_buckets−1 interior quantile boundaries of ``col`` (exact
    percentile — one aggregate, bounded driver traffic)."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.agg(
        F.percentile(F.col(col), F.array(*[F.lit(q) for q in qs])).alias("b")
    ).first()
    return list(row.b)


def bucket_of(col: Column, boundaries: list[float]) -> Column:
    """Bucket index in [0, len(boundaries)]: the number of boundaries
    strictly below the value — a flat sum of comparison casts, fully
    codegen, identical semantics to the SQL twin's list_filter count."""
    b = F.lit(0)
    for x in boundaries:
        b = b + (col > F.lit(float(x))).cast("int")
    return b.cast("long")


def equi_depth_histogram(
    df: DataFrame, col: str, boundaries: list[float]
) -> DataFrame:
    """Per-bucket stats ``(bucket, n_rows, n_distinct, lo, hi)`` — lo/hi
    are the observed (exact, integer-safe) min/max within the bucket, so
    no float boundary value appears in the output."""
    c = F.col(col)
    return (
        df.select(bucket_of(c, boundaries).alias("bucket"), c.alias("__v"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("__v").alias("n_distinct"),
            F.min("__v").alias("lo"),
            F.max("__v").alias("hi"),
        )
    )


def estimate_equijoin_rows(hist_a: DataFrame, hist_b: DataFrame) -> Column:
    """Join the two bounded histogram tables on bucket and fold the
    per-bucket containment estimate; returns a 1-row DataFrame's worth of
    aggregation — callers attach it as a scalar. Buckets present on only
    one side contribute 0 (inner join)."""
    j = hist_a.select(
        "bucket",
        F.col("n_rows").alias("na"),
        F.col("n_distinct").alias("da"),
    ).join(
        hist_b.select(
            "bucket",
            F.col("n_rows").alias("nb"),
            F.col("n_distinct").alias("db"),
        ),
        "bucket",
    )
    return j.agg(
        F.sum(
            F.col("na")
            * F.col("nb")
            / F.greatest(F.col("da"), F.col("db")).cast("double")
        ).alias("est_rows")
    )
