"""Bucketed-table layout for co-located joins.

At 100 TB the fact-fact join (lineitem ⋈ orders) is the shuffle that
dominates; bucketing both tables on the join key at write time makes every
subsequent join/aggregation on that key exchange-free — each bucket pair
joins locally. This module wraps the write-side convention; the
no-Exchange property is asserted in tests/test_bucketing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
) -> None:
    (
        df.write.bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys — planner emits
    SortMergeJoin with no shuffle on either side."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
