"""Skew-mitigation operators.

At 100 TB a handful of hot keys dominate a shuffle; AQE's skew-join split
handles joins, but a skewed ``groupBy`` still funnels each hot key through
one reducer. ``salted_agg`` is the standard two-phase fix: aggregate on
(key, salt) first — spreading a hot key over ``n_salts`` reducers — then
re-aggregate on the key. Results are exactly those of the plain aggregation
(sums/counts are associative), which is what the DuckDB oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column → (kind, input column), kind ∈
    {"sum", "count", "min", "max"} (the re-aggregable kinds; avg = sum/count
    composed by the caller).
    """
    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for out, (kind, col) in aggs.items():
        if kind == "sum":
            partial_exprs.append(F.sum(col).alias(out))
            final_exprs.append(F.sum(out).alias(out))
        elif kind == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(out))
            final_exprs.append(F.sum(out).alias(out))
        elif kind == "min":
            partial_exprs.append(F.min(col).alias(out))
            final_exprs.append(F.min(out).alias(out))
        elif kind == "max":
            partial_exprs.append(F.max(col).alias(out))
            final_exprs.append(F.max(out).alias(out))
        else:
            raise ValueError(f"unsupported agg kind: {kind!r}")
    salted = df.withColumn(
        "__salt", (F.rand(seed=0) * n_salts).cast("int")
    )
    partial = salted.groupBy(*group_cols, "__salt").agg(*partial_exprs)
    return partial.groupBy(*group_cols).agg(*final_exprs)
