"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CoCoA conversion-adjustment query
(consent-split customer table → one-hot feature space → kNN similarity join
→ softmax redistribution) on sf0.001. ``queries()`` / ``oracle_sql()``
expose every implemented operator for the DuckDB correctness harness.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from consent_based_conversion_adjustments_spark.config import AdjustmentConfig
from consent_based_conversion_adjustments_spark.pipeline import run_adjustment
from consent_based_conversion_adjustments_spark.sources.io import read_table

SF0001 = "/root/testdata/sf0.001"

FLAGSHIP_K = 5


def _consent_split(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """FIXTURES.md F4 casting of the driver testdata onto the CoCoA workload:
    customer rows split ~80/20 on ``c_custkey % 5``; features = one-hot
    c_mktsegment + c_nationkey (as categorical); conversion = c_acctbal."""
    customer = read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
        "c_mktsegment",
        F.col("c_nationkey").cast("string").alias("c_nation_cat"),
    )
    consent = customer.filter(F.col("c_custkey") % 5 != 0)
    noconsent = customer.filter(F.col("c_custkey") % 5 == 0)
    return consent, noconsent


def _flagship_config(**mode) -> AdjustmentConfig:
    if not mode:
        mode = {"number_nearest_neighbors": FLAGSHIP_K}
    return AdjustmentConfig(
        conversion_column="c_acctbal", id_columns=["c_custkey"], **mode
    )


def _round_adjusted(df: DataFrame) -> DataFrame:
    """Round float outputs so Spark and the DuckDB oracle hash identically
    (both sides round; underlying diffs are ~1e-12)."""
    return df.select(
        "c_custkey",
        F.round("c_acctbal", 3).alias("c_acctbal"),
        F.round("adjusted_conversion", 3).alias("adjusted_conversion"),
        F.round("average_distance", 3).alias("average_distance"),
        F.col("n_added_conversions").cast("long").alias("n_added_conversions"),
        F.round("sum_distribution_weights", 3).alias("sum_distribution_weights"),
        F.round("naive_adjusted_conversion", 3).alias("naive_adjusted_conversion"),
    )


def flagship_adjustment(spark: SparkSession, sf_dir: str, impl: str = "sql") -> DataFrame:
    consent, noconsent = _consent_split(spark, sf_dir)
    result = run_adjustment(consent, noconsent, _flagship_config(), impl=impl)
    return _round_adjusted(result.data_adjusted)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_adjustment(spark, SF0001)


# ---------------------------------------------------------------------------
# correctness harness
# ---------------------------------------------------------------------------

_COCOA_ORACLE_PRELUDE = """
WITH base AS (
    SELECT c_custkey,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal,
           c_mktsegment,
           CAST(c_nationkey AS VARCHAR) AS nat,
           (c_custkey % 5 <> 0) AS consent
    FROM customer
    WHERE c_acctbal IS NOT NULL AND c_acctbal > 0
),
probe AS (SELECT * FROM base WHERE NOT consent),
build AS (SELECT * FROM base WHERE consent),
pairs AS (
    SELECT p.c_custkey AS probe_id,
           b.c_custkey AS consent_id,
           p.c_acctbal AS probe_value,
           (CASE WHEN p.c_mktsegment <> b.c_mktsegment THEN 2.0 ELSE 0.0 END
            + CASE WHEN p.nat <> b.nat THEN 2.0 ELSE 0.0 END) AS distance
    FROM probe p CROSS JOIN build b
)
"""


def _oracle_knn_adjust(k: int) -> str:
    return (
        _COCOA_ORACLE_PRELUDE
        + f"""
, topk AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (
            PARTITION BY probe_id ORDER BY distance, consent_id) AS rn
        FROM pairs) WHERE rn <= {k}
),
expd AS (
    SELECT *, exp(-distance - max(-distance) OVER (PARTITION BY probe_id)) AS e
    FROM topk
),
wts AS (
    SELECT probe_id, consent_id, distance, probe_value,
           e / sum(e) OVER (PARTITION BY probe_id) AS weight
    FROM expd
),
aggs AS (
    SELECT consent_id,
           sum(probe_value * weight) AS adjusted_conversion,
           sum(distance) AS sum_distance,
           count(*) AS n_added_conversions,
           sum(weight) AS sum_distribution_weights
    FROM wts GROUP BY consent_id
),
naive AS (
    SELECT sum(c_acctbal) / (SELECT count(*) FROM build) AS smear
    FROM probe WHERE c_custkey IN (SELECT DISTINCT probe_id FROM topk)
)
SELECT b.c_custkey,
       round(b.c_acctbal, 3) AS c_acctbal,
       round(coalesce(a.adjusted_conversion, 0.0), 3) AS adjusted_conversion,
       round(a.sum_distance / a.n_added_conversions, 3) AS average_distance,
       coalesce(a.n_added_conversions, 0) AS n_added_conversions,
       round(coalesce(a.sum_distribution_weights, 0.0), 3)
           AS sum_distribution_weights,
       round(b.c_acctbal + (SELECT smear FROM naive), 3)
           AS naive_adjusted_conversion
FROM build b LEFT JOIN aggs a ON b.c_custkey = a.consent_id
"""
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {
        "cocoa_knn_adjust": lambda spark, sf: flagship_adjustment(spark, sf),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "cocoa_knn_adjust": _oracle_knn_adjust(FLAGSHIP_K),
    }
