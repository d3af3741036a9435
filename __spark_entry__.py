"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CoCoA conversion-adjustment query
(consent-split customer table → one-hot feature space → kNN similarity join
→ softmax redistribution) on sf0.001. ``queries()`` / ``oracle_sql()``
aggregate every implemented operator's checkable query from the plans
registry; each Spark callable has a DuckDB oracle twin unless the operator
is genuinely non-SQL-expressible (those run rows-only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from consent_based_conversion_adjustments_spark.plans import (
    cocoa_queries,
    corpus_queries,
    data_queries,
    relational,
)

SF0001 = "/root/testdata/sf0.001"

_REGISTRIES = (
    cocoa_queries.QUERIES,
    relational.QUERIES,
    data_queries.QUERIES,
    corpus_queries.QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return cocoa_queries.knn_adjust(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for registry in _REGISTRIES:
        for name, (fn, _sql) in registry.items():
            out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for registry in _REGISTRIES:
        for name, (_fn, sql) in registry.items():
            if sql is not None:
                out[name] = sql
    return out
