"""Streaming second-moment statistics: exact covariance over an
embedding stream via per-epoch Gram partials.

Gram/count/column-sum accumulations are ADDITIVE, so the batch operator
(`operators.linalg.gram_stats`) streams for free: each micro-batch
writes its partial cell rows to a parquet table partitioned by epoch,
and the current mean/covariance is one tiny aggregation over all
epochs' partials — dim·(dim+3)/2+1 rows per epoch, never the vectors.
Unlike windowed/stateful operators there is NO approximation and no
state-store growth: the streaming fit over any prefix of the data
equals the batch fit over the same rows exactly (up to float summation
order — the equivalence test pins ≤1e-9).

Exactly-once: same mechanism as the admission store — the stream
checkpoint makes micro-batch replay at-least-once with the SAME epoch
id, and the sink writes each epoch's partials with dynamic partition
overwrite, so a replay deterministically rewrites its own partition
instead of double-counting. No cross-epoch probe exists to guard
(partials are independent), which makes this the simplest possible
instance of the pattern.

Use case: continuously-maintained whitening/normalization statistics
for an embedding ingest pipeline — `pca_fit`-equivalent axes are
available at any moment from `covariance()` without rescanning the
corpus.

reference: no streaming statistics exist in the reference; this extends
the SURVEY §2 streaming + linalg surfaces.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import linalg as L


class RunningStatsStore:
    """Parquet-backed running Gram partials at ``store_dir``."""

    def __init__(self, store_dir: str, vec_col: str = "embedding"):
        self.store_dir = store_dir
        self.vec_col = vec_col
        self.partials_path = os.path.join(store_dir, "gram_partials")

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        (
            L.gram_stats(batch_df, self.vec_col)
            .withColumn("epoch", F.lit(int(epoch_id)).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(self.partials_path)
        )

    def sink(self, stream_df: DataFrame, checkpoint_path: str, **trigger):
        if not trigger:
            trigger = {"availableNow": True}
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_path)
            .trigger(**trigger)
            .start()
        )

    # -- readback ------------------------------------------------------------

    def totals(self, spark: SparkSession) -> DataFrame:
        """Combined partial cells over every epoch (same shape as
        ``gram_stats`` output)."""
        return (
            spark.read.schema("d1 int, d2 int, s double, epoch long")
            .parquet(self.partials_path)
            .groupBy("d1", "d2")
            .agg(F.sum("s").alias("s"))
        )

    def covariance(
        self, spark: SparkSession
    ) -> tuple[list[float], list[list[float]], int]:
        """(mean, covariance, n) over everything ingested so far —
        identical assembly to the batch ``covariance_fit``."""
        return L.assemble_cov(self.totals(spark).collect())


# -- mergeable distinct-count cube (HLL sketches) -----------------------------


def daily_distinct_sketches(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    lgk: int = 12,
) -> DataFrame:
    """Per-day HLL sketches (Apache DataSketches, ``hll_sketch_agg``) —
    the mergeable distinct-count cube: any date range is answered by
    UNIONING its days' sketches (one tiny agg over #days binary rows)
    instead of rescanning the event log. Sketch rows are additive state
    exactly like the Gram partials above, so the same per-epoch parquet
    + overwrite sink streams the cube with exactly-once replay; at
    100 TB the cube is #days × 2^lgk bytes — effectively free — and the
    one full scan that builds it is map-side combined (sketches merge
    inside the partial aggregate, only binary sketches cross the
    exchange, never keys).

    DuckDB has no DataSketches twin, so the registered range query is
    rows-only; pytest pins (a) the estimate within HLL's error envelope
    of the exact count and (b) merged-daily == direct-range sketching.
    """
    return events.groupBy(F.to_date(ts_col).alias("day")).agg(
        F.hll_sketch_agg(key_col, F.lit(lgk)).alias("sketch"),
        F.count(F.lit(1)).alias("n_events"),
    )


def distinct_over_days(
    sketches: DataFrame, start_day: str, end_day: str
) -> DataFrame:
    """Distinct-key estimate for [start_day, end_day] from the cube:
    filter days (partition-prunable at scale), union, estimate."""
    return (
        sketches.filter(
            (F.col("day") >= F.lit(start_day).cast("date"))
            & (F.col("day") <= F.lit(end_day).cast("date"))
        )
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
                "approx_distinct"
            ),
            F.sum("n_events").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_days"),
        )
    )


def daily_value_sketches(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    k: int = 800,
) -> DataFrame:
    """Per-day KLL quantile sketches (DataSketches,
    ``kll_sketch_agg_double``) — the mergeable QUANTILE cube: latency /
    value percentiles over ANY date range from a union of #days binary
    rows, the pattern behind every SLA dashboard. Same additive-state
    contract as the HLL cube above (per-epoch parquet + overwrite sink
    streams it exactly-once); ``k`` trades sketch size for rank error
    (~1.7%/√(k/200))."""
    return events.groupBy(F.to_date(ts_col).alias("day")).agg(
        F.kll_sketch_agg_double(value_col, F.lit(k)).alias("sketch"),
        F.count(value_col).alias("n_values"),
    )


def value_quantiles_over_days(
    sketches: DataFrame,
    start_day: str,
    end_day: str,
    qs: list[float],
) -> DataFrame:
    """Quantile estimates for [start_day, end_day] from the cube:
    filter days, one merge aggregate, per-q lookups on the merged
    sketch (all driver-free — the sketch never leaves the plan)."""
    merged = (
        sketches.filter(
            (F.col("day") >= F.lit(start_day).cast("date"))
            & (F.col("day") <= F.lit(end_day).cast("date"))
        )
        .agg(
            F.kll_merge_agg_double("sketch").alias("__m"),
            F.sum("n_values").cast("long").alias("n_values"),
            F.count(F.lit(1)).cast("long").alias("n_days"),
        )
    )
    return merged.select(
        *[
            F.kll_sketch_get_quantile_double(F.col("__m"), F.lit(q)).alias(
                f"q_{str(q).replace('.', '_')}"
            )
            for q in qs
        ],
        "n_values",
        "n_days",
    )


def daily_user_theta_sketches(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    lgk: int = 12,
) -> DataFrame:
    """Per-day THETA sketches of the user set (DataSketches,
    ``theta_sketch_agg``) — the mergeable SET-ALGEBRA cube. HLL answers
    only unions; theta sketches intersect and difference, which is what
    retention/churn questions are made of: "how many of March's users
    were still here in April" is |union(A-days) ∩ union(B-days)|, one
    tiny agg over #days binary rows per side instead of two event-log
    rescans. Same additive-state contract as the HLL/KLL cubes (map-side
    combined build, per-epoch parquet + overwrite sink streams it
    exactly-once, #days × 2^lgk·8 bytes at any scale).

    Estimates are exact below the sketch's 2^lgk retention; beyond it
    the intersection error scales with the inverse overlap fraction —
    the pytest envelope pins both regimes (same status as the HLL cube).
    """
    return events.groupBy(F.to_date(ts_col).alias("day")).agg(
        F.theta_sketch_agg(key_col, F.lit(lgk)).alias("sketch"),
        F.count(F.lit(1)).alias("n_events"),
    )


def retained_over_ranges(
    sketches: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
) -> DataFrame:
    """Retention between two date ranges from the theta cube: union each
    range's day sketches, intersect the two unions, estimate. All
    sketch-side — one filtered agg per range (day filters partition-prune
    at scale), a 1×1 broadcast cross, binaries never leave the plan.

    Returns 1 row: (est_a, est_b, est_retained, retention_rate) where
    retention_rate = |A ∩ B| / |A|.
    """

    def range_sketch(start: str, end: str, alias: str) -> DataFrame:
        return sketches.filter(
            (F.col("day") >= F.lit(start).cast("date"))
            & (F.col("day") <= F.lit(end).cast("date"))
        ).agg(F.theta_union_agg("sketch").alias(alias))

    a = range_sketch(a_start, a_end, "__a")
    b = range_sketch(b_start, b_end, "__b")
    est = F.theta_sketch_estimate
    return (
        a.crossJoin(F.broadcast(b))
        .select(
            est(F.col("__a")).alias("__ea"),
            est(F.col("__b")).alias("__eb"),
            est(F.theta_intersection("__a", "__b")).alias("__eboth"),
        )
        .select(
            F.round("__ea", 2).alias("est_a"),
            F.round("__eb", 2).alias("est_b"),
            F.round("__eboth", 2).alias("est_retained"),
            F.round(F.col("__eboth") / F.col("__ea"), 6).alias(
                "retention_rate"
            ),
        )
    )


# -- streaming Count-Min store (additive frequency cells) ----------------------


class CmsStore:
    """Parquet-backed Count-Min counter cells, per-epoch additive — the
    frequency sibling of the Gram-partials store above, with the same
    exactly-once mechanics (epoch-partitioned dynamic overwrite; replay
    rewrites its own partition).

    CMS cells are cell-wise ADDITIVE, so the store's epoch-summed totals
    equal a one-shot batch build over every row ever ingested — no
    approximation drift from micro-batching, which is the property that
    lets a 100 TB/day stream keep per-window frequency state in d·w
    counters instead of an unbounded key table."""

    def __init__(
        self,
        store_dir: str,
        key_col: str = "user_id",
        depth: int | None = None,
        width: int | None = None,
    ):
        from ..operators import sketches as SK

        self.store_dir = store_dir
        self.key_col = key_col
        self.depth = depth or SK.CMS_DEPTH
        self.width = width or SK.CMS_WIDTH
        self.cells_path = os.path.join(store_dir, "cms_cells")

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        from ..operators.sketches import cms_build

        (
            cms_build(
                batch_df, self.key_col, depth=self.depth, width=self.width
            )
            .withColumn("epoch", F.lit(int(epoch_id)).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(self.cells_path)
        )

    def sink(self, stream_df: DataFrame, checkpoint_path: str, **trigger):
        if not trigger:
            trigger = {"availableNow": True}
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_path)
            .trigger(**trigger)
            .start()
        )

    def totals(self, spark: SparkSession) -> DataFrame:
        """Epoch-summed counter table — the (row_i, bucket, cell_n)
        contract of ``sketches.cms_build`` over everything ingested."""
        return (
            spark.read.schema("row_i int, bucket long, cell_n long, epoch long")
            .parquet(self.cells_path)
            .groupBy("row_i", "bucket")
            .agg(F.sum("cell_n").alias("cell_n"))
        )


class SketchCubeStore:
    """The daily-sketch cube (HLL distinct + KLL quantile) as a
    ``foreachBatch`` sink — the concrete streaming half the cube
    docstrings promise ("same additive-state contract as the Gram
    partials"). Each micro-batch writes ITS OWN per-day sketch rows to a
    parquet table partitioned by epoch; a day split across epochs simply
    owns several rows, and every range query already merges rows per day
    (``hll_union_agg`` / ``kll_merge_agg_double``), so multiplicity is
    absorbed by the same aggregation that makes the cube mergeable in the
    first place.

    Exactly-once: identical mechanism to RunningStatsStore — dynamic
    partition overwrite keyed on the epoch makes a replayed micro-batch
    rewrite exactly its own partition. Estimates are replay-stable:
    HLL registers are per-key maxima (merge-order-free), while KLL
    compaction is merge-order-DEPENDENT — two ingestion orders give
    different (equally valid) sketches, so the batch≡stream test pins
    HLL estimates EXACTLY and KLL only within its published rank bound.

    Scale: per-epoch state is #days-in-batch × (2^lgk + O(k)) bytes;
    the store grows by epochs × days rows of bounded binaries —
    ``compact(E)`` folds epochs ≤ E into one sentinel partition (the
    admission store's marker-gated fold and quiet-window guard, reused
    verbatim via ``admission.fold_epoch_partitions`` /
    ``guard_quiet_window``). The fold preserves the sketch-row MULTISET
    — it deliberately does NOT re-merge per day, so
    ``distinct_over``/``quantiles_over`` aggregate exactly the same
    sketch set pre/post-compact and their answers are identical (a
    per-day re-merge would also be CORRECT — the cube is mergeable —
    but KLL compaction is merge-order-dependent, so answers would only
    match within the rank bound instead of exactly).
    """

    def __init__(
        self,
        store_dir: str,
        ts_col: str = "ts",
        key_col: str = "user_id",
        value_col: str = "value",
        lgk: int = 12,
        k: int = 800,
    ):
        self.store_dir = store_dir
        self.ts_col = ts_col
        self.key_col = key_col
        self.value_col = value_col
        self.lgk = lgk
        self.k = k
        self.cube_path = os.path.join(store_dir, "daily_sketches")

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.groupBy(F.to_date(self.ts_col).alias("day"))
            .agg(
                F.hll_sketch_agg(self.key_col, F.lit(self.lgk)).alias(
                    "hll"
                ),
                F.kll_sketch_agg_double(
                    self.value_col, F.lit(self.k)
                ).alias("kll"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .withColumn("epoch", F.lit(int(epoch_id)).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(self.cube_path)
        )

    def sink(self, stream_df: DataFrame, checkpoint_path: str, **trigger):
        """Attach the cube sink. The checkpoint path is remembered so a
        later ``compact`` on this object enforces the quiet-window
        contract without re-supplying it (AdmissionStore.sink's shape)."""
        if not trigger:
            trigger = {"availableNow": True}
        self._checkpoint_path = checkpoint_path
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_path)
            .trigger(**trigger)
            .start()
        )

    def compact(
        self,
        spark: SparkSession,
        up_to_epoch: int,
        checkpoint_path: str | None = None,
    ) -> None:
        """Offline small-file compaction (VERDICT r11 §Next #5): fold
        every ``epoch <= up_to_epoch`` partition into one fresh sentinel
        partition ``-(E+2)``, preserving the sketch-row multiset — the
        admission store's crash-safe marker-gated fold on the cube's
        ``epoch`` column. Enforces the same quiet-window contract when a
        checkpoint is known (passed here or remembered from ``sink``):
        refuses while an epoch is in flight or when ``up_to_epoch``
        reaches uncommitted territory. Range queries are unaffected:
        they merge rows per day, and the fold changes only which epoch
        partition those rows live in."""
        from .admission import fold_epoch_partitions, guard_quiet_window

        cp = checkpoint_path or getattr(self, "_checkpoint_path", None)
        if cp is not None:
            guard_quiet_window(
                spark, cp, up_to_epoch, "SketchCubeStore.compact"
            )
        fold_epoch_partitions(
            spark, self.cube_path, int(up_to_epoch), partition_col="epoch"
        )

    # -- readback ------------------------------------------------------------

    def cube(self, spark: SparkSession) -> DataFrame:
        """All epochs' per-day sketch rows (a day may own several)."""
        return spark.read.schema(
            "day date, hll binary, kll binary, n_events long, epoch long"
        ).parquet(self.cube_path)

    def distinct_over(
        self, spark: SparkSession, start_day: str, end_day: str
    ) -> DataFrame:
        c = self.cube(spark).withColumnRenamed("hll", "sketch")
        return distinct_over_days(c, start_day, end_day)

    def quantiles_over(
        self,
        spark: SparkSession,
        start_day: str,
        end_day: str,
        qs: list[float],
    ) -> DataFrame:
        c = self.cube(spark).select(
            "day",
            F.col("kll").alias("sketch"),
            F.col("n_events").alias("n_values"),
        )
        return value_quantiles_over_days(c, start_day, end_day, qs)
