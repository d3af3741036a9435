"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CoCoA conversion-adjustment query
(consent-split customer table → one-hot feature space → kNN similarity join
→ softmax redistribution) on sf0.001. ``queries()`` / ``oracle_sql()``
aggregate every implemented operator's checkable query from the plans
registry; each Spark callable has a DuckDB oracle twin unless the operator
is genuinely non-SQL-expressible (those run rows-only).
"""

from __future__ import annotations

import glob
import json
import os
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


def _last_verified_round(record_dir: str | None = None) -> dict[str, int]:
    """Map query name -> most recent round whose CORRECTNESS file recorded it.

    The driver only records the first N registry entries per round, so ordering
    least-recently-verified first rotates the verification window until every
    query has a recent driver row. Queries never recorded sort first (round 0).
    A round whose record shows a FAILURE (hash mismatch or a hard error) does
    not count as verified — the query re-sorts to the front of the next window
    so a fix lands a fresh green row immediately instead of waiting a full
    rotation cycle. Rows-only records (``err == "no_oracle"``) count: they are
    the strongest check those queries support.
    """
    here = record_dir or os.path.dirname(os.path.abspath(__file__))
    seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            rnd = int(os.path.basename(path)[len("CORRECTNESS_r") : -len(".json")])
            records = json.load(open(path))
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        for name, rec in records.items():
            if not isinstance(rec, dict):
                seen[name] = max(seen.get(name, 0), rnd)
                continue
            failed = (
                rec.get("hash_match") is False
                or rec.get("rows_match") is False
                or rec.get("schema_match") is False
                or rec.get("err") not in (None, "no_oracle")
            )
            if not failed:
                seen[name] = max(seen.get(name, 0), rnd)
    return seen


def _ordered_names() -> list[str]:
    registered: list[str] = []
    for registry in _REGISTRIES:
        registered.extend(registry.keys())
    seen = _last_verified_round()
    # Stable sort: never-verified first, then oldest verification round;
    # registration order breaks ties so the rotation is deterministic.
    return sorted(registered, key=lambda n: seen.get(n, 0))


def _flat() -> dict[str, tuple]:
    out: dict[str, tuple] = {}
    for registry in _REGISTRIES:
        out.update(registry)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    flat = _flat()
    return {name: flat[name][0] for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    flat = _flat()
    out: dict[str, str] = {}
    for name in _ordered_names():
        sql = flat[name][1]
        if callable(sql):
            # lazily generated oracles (data-dependent constants, e.g. the
            # IVF centroid literals); may return None → rows-only fallback
            sql = sql()
        if sql is not None:
            out[name] = sql
    return out
