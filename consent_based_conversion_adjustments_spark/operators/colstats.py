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
    "quantile_grid",
    "quantile_calibrate",
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


def quantile_grid(df: DataFrame, col: str, n_points: int = 101) -> list[float]:
    """Exact quantile grid (0, 1/(n−1), …, 1) of ``col`` — one
    aggregate, n_points doubles of driver traffic."""
    qs = [i / (n_points - 1) for i in range(n_points)]
    row = df.agg(
        F.percentile(F.col(col), F.array(*[F.lit(q) for q in qs])).alias("g")
    ).first()
    return [float(v) for v in row.g]


def quantile_calibrate(
    src: DataFrame,
    src_col: str,
    tiebreak_col: str,
    ref_grid: list[float],
    out_col: str = "calibrated",
) -> DataFrame:
    """Quantile mapping (Q-Q calibration): transform ``src_col`` so its
    distribution matches the reference distribution summarized by
    ``ref_grid`` (from ``quantile_grid`` over the reference) — each row
    maps to the reference value at its own percentile, with linear
    interpolation between grid points. The score-calibration /
    distribution-matching primitive for merging heterogeneous quality
    scores onto one scale.

    Percentiles come from the distributed total-order rank
    (``corpus.global_rank`` — never a single-partition window; the
    tiebreak makes rank = row_number = RANK, so ``pct = (r−1)/(N−1)``
    is exactly SQL ``percent_rank``). The grid enters the plan as a
    LITERAL array, so the interpolation is a stateless codegen map:
    ``element_at`` twice + one fma — no join, no second shuffle.
    """
    from .corpus import global_rank

    n_points = len(ref_grid)
    ranked = global_rank(src, [src_col, tiebreak_col], rank_col="__qr")
    total = ranked.agg(F.count(F.lit(1)).alias("__n"))
    grid = F.array(*[F.lit(float(v)) for v in ref_grid])
    pct = (F.col("__qr") - 1) / (F.col("__n") - 1)
    pos = pct * (n_points - 1)
    lo = F.least(F.floor(pos).cast("int"), F.lit(n_points - 2))
    frac = pos - lo
    interp = F.element_at(grid, lo + 1) * (1 - frac) + F.element_at(
        grid, lo + 2
    ) * frac
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(out_col, interp)
        .drop("__qr", "__n")
    )
