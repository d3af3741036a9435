"""Distributed 2-D skyline (Pareto frontier) — preference queries.

The skyline of a table under (minimize ``min_col``, maximize ``max_col``)
is the set of rows no other row dominates (q dominates p iff q.min ≤
p.min ∧ q.max ≥ p.max with at least one strict). Spark has no skyline
operator; the naive formulation is a quadratic NOT EXISTS self-join and
the textbook single-node algorithm is a sort + running max — which as a
window (`max() OVER (ORDER BY ...)`) Catalyst plans as a SINGLE-PARTITION
window, the same 100 TB cliff global_rank exists to avoid.

Shape here (the 2-D specialization of sort-filter skyline, distributed
with the global_rank prefix pattern):

1. one hash agg collapses the table to its distinct-``min_col`` profile
   ``(v, gmax = max of max_col at that v)`` — skyline membership only
   depends on this profile, which is orders of magnitude smaller than
   the table;
2. the profile is range-repartitioned on ``v``, sorted within
   partitions, and materialized ONCE (localCheckpoint — range boundaries
   are sampled per execution, the global_rank lesson);
3. one tiny job collects the per-partition max of ``gmax``
   (#partitions rows of driver traffic); the exclusive prefix max is
   broadcast;
4. a single Arrow pass computes each row's ``max_before`` = the largest
   ``gmax`` at any strictly smaller ``v`` (running max within the
   partition seeded by the broadcast prefix);
5. survivors — profile rows with ``gmax > max_before`` — join back
   (equi-join on ``(v, max_col = gmax)``) to emit the full skyline rows,
   duplicates included (equal points never dominate each other).

A row survives iff its ``max_col`` equals its profile's ``gmax`` AND
that gmax strictly exceeds every cheaper profile's gmax: anything at the
same ``v`` below gmax is dominated by the gmax row (strict in max_col),
anything ≤ a cheaper-or-equal gmax is dominated by that row (strict in
min_col). The DuckDB oracle is the quadratic NOT EXISTS — exact, and
only the oracle is quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["skyline_2d"]


def skyline_2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Rows of ``df`` on the (minimize ``min_col``, maximize ``max_col``)
    Pareto frontier, all original columns preserved."""
    from pyspark.sql.types import StructType

    spark = df.sparkSession
    profile = (
        df.groupBy(F.col(min_col).alias("__v"))
        .agg(F.max(F.col(max_col)).alias("__gmax"))
    )
    n = num_partitions or spark.sparkContext.defaultParallelism
    parts = (
        profile.repartitionByRange(n, F.col("__v"))
        .sortWithinPartitions("__v")
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    pmax = sorted(
        (r["__pid"], r["__m"])
        for r in parts.groupBy("__pid")
        .agg(F.max("__gmax").alias("__m"))
        .collect()
    )
    prefix: dict[int, object] = {}
    best = None
    for pid, m in pmax:
        prefix[pid] = best
        best = m if best is None else max(best, m)
    bpre = spark.sparkContext.broadcast(prefix)
    out_schema = StructType(
        [f for f in parts.schema.fields if f.name in ("__v", "__gmax")]
    )

    def running(batches):
        seeded = False
        cur = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if not seeded:
                cur = bpre.value[int(pdf["__pid"].iloc[0])]
                seeded = True
            keep, vals = [], pdf["__gmax"].tolist()
            for g in vals:
                keep.append(cur is None or g > cur)
                cur = g if cur is None else max(cur, g)
            out = pdf.loc[keep, ["__v", "__gmax"]]
            if len(out):
                yield out

    frontier = parts.mapInPandas(running, out_schema)
    return df.join(
        frontier,
        (F.col(min_col) == F.col("__v"))
        & (F.col(max_col) == F.col("__gmax")),
    ).drop("__v", "__gmax")
