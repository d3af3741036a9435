"""MERGE INTO semantics (lakehouse-style upsert) as one full-outer
equi-join + conditional projection.

ANSI MERGE's three clauses map onto row predicates over the joined
frame: WHEN MATCHED AND <delete> THEN DELETE (filter), WHEN MATCHED
THEN UPDATE SET (source side wins for the update columns), WHEN NOT
MATCHED THEN INSERT (source-only rows keep their values, target-only
columns go null). A source-only row carrying the delete flag is a
no-op, matching MERGE (you cannot delete what is not there).

Scale shape: exactly one shuffle — the equi-join on the merge key. The
source side is typically a small CDC batch, so AQE broadcast-promotes
it and the target is never shuffled; for repeated merges into a large
bucketed target (sources/bucketing.py layout) the join is co-located
and shuffle-free. Nothing here is row-at-a-time: the conditional
projection is pure Catalyst.

reference: the reference engine has no upsert; this extends the
relational surface (SURVEY.md §7 step 7 north-star) with the data-
management primitive every incremental corpus/table pipeline needs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    *,
    delete_col: str | None = None,
) -> DataFrame:
    """Merge ``source`` into ``target`` on ``keys`` (assumed non-null,
    unique in each side — the usual MERGE precondition). Update columns
    are the non-key columns the two frames share; target-only columns
    pass through (null on inserted rows); ``delete_col`` (boolean,
    source-side) marks rows to delete. Output schema == target schema.
    """
    t = target.alias("__t")
    s = source.alias("__s")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"__t.{k}") == F.col(f"__s.{k}") for k in keys],
    )
    j = t.join(s, cond, "full_outer")
    sp = F.col(f"__s.{keys[0]}").isNotNull()
    if delete_col is not None:
        dflag = F.coalesce(F.col(f"__s.{delete_col}"), F.lit(False))
        # matched+flag → DELETE; source-only+flag → no-op (both drop)
        j = j.filter(~(sp & dflag))
    shared = {
        c
        for c in source.columns
        if c not in keys and c != delete_col and c in target.columns
    }
    outs = [
        F.coalesce(F.col(f"__t.{k}"), F.col(f"__s.{k}")).alias(k)
        for k in keys
    ]
    for c in target.columns:
        if c in keys:
            continue
        if c in shared:
            outs.append(
                F.when(sp, F.col(f"__s.{c}"))
                .otherwise(F.col(f"__t.{c}"))
                .alias(c)
            )
        else:
            outs.append(F.col(f"__t.{c}").alias(c))
    return j.select(*outs)
