"""Streaming SCD Type-2 maintenance: the incremental twin of
``operators.merge.scd2_history`` as a Structured Streaming sink.

The store is a parquet CHANGE-POINT log — one row per (key, ts,
tiebreak, state) where the state actually changed — written one
directory per epoch. Each arriving micro-batch is compressed
independently (the same lag-window change-point pass as the batch
operator), then its FIRST change point per key is dropped iff it merely
repeats the key's latest stored state (the cross-batch carry-in), and
the surviving rows are written to ``epoch_<n>/``. Because change-point
compression is idempotent, the full SCD2 table at any moment is just
``scd2_history`` over the accumulated log — version numbers, validity
chaining, and the current flag all derive at read time, so the store
never rewrites history rows in place.

Exactly-once: each epoch writes its OWN directory with overwrite mode,
so a crash-replayed micro-batch (same epoch id, same rows — the file /
kafka source checkpoint contract) deterministically rewrites exactly
its delta instead of appending duplicates — the same mechanism as the
O5 dates sink and the admission store.

Ordering contract: batches must arrive in event-time order per key
(true of a watermarked ts-partitioned source; the registered query
slices by ts range). Out-of-order arrival would silently corrupt
change-point semantics, so ``process_batch`` GUARDS it loudly: any
batch row at or before the key's stored high-water mark raises. For a
genuinely late-data source, buffer behind a watermark upstream
(`events.py` patterns) and emit closed ts ranges.

Scale shape per micro-batch: one window pass keyed on the entity over
the BATCH (not the store), one equi-join of the batch's first-rows
against the store's per-key latest state (computed with max_by over the
log — at production scale, maintain a compacted `latest/` table instead
of re-aggregating the log; the aggregate is one map-side-combinable
pass either way), and one delta write. The store's history is never
shuffled per batch.

reference: no analog — temporal-table upkeep for the north-star
surface, the streaming sibling of merge.scd2_history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.merge import scd2_history


class SCD2Store:
    def __init__(
        self,
        path: str,
        key: str,
        ts_col: str,
        state_col: str,
        tiebreak_col: str,
    ) -> None:
        self.path = path
        self.key = key
        self.ts_col = ts_col
        self.state_col = state_col
        self.tiebreak_col = tiebreak_col
        self._epochs: list[int] = []

    def _log(
        self, spark: SparkSession, before: int | None = None
    ) -> DataFrame | None:
        """The change-point log; ``before`` restricts to strictly
        earlier epochs — process_batch probes with its own epoch id so a
        crash-REPLAYED batch never sees its own half-write (the same
        replay guard as the admission store), which is also what keeps
        the ordering check from misfiring on its own prior rows."""
        dirs = [
            os.path.join(self.path, d)
            for d in sorted(os.listdir(self.path))
            if d.startswith("epoch_")
            and (before is None or int(d.split("_", 1)[1]) < before)
        ] if os.path.isdir(self.path) else []
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        """The ``foreachBatch`` body: compress, carry-in filter, append."""
        k, ts, st, tb = (
            self.key, self.ts_col, self.state_col, self.tiebreak_col
        )
        spark = batch.sparkSession
        w = Window.partitionBy(k).orderBy(
            F.col(ts).asc(), F.col(tb).asc()
        )
        cp = (
            batch.select(k, ts, st, tb)
            .withColumn("__prev", F.lag(st).over(w))
            .withColumn("__rn", F.row_number().over(w))
        )
        log = self._log(spark, before=epoch_id)
        if log is not None:
            latest = log.groupBy(k).agg(
                F.max_by(st, F.struct(ts, tb)).alias("__lstate"),
                F.max(F.struct(ts, tb)).alias("__hwm"),
            )
            cp = cp.join(latest, k, "left")
            # loud ordering guard: one tiny agg over the joined batch
            bad = (
                cp.filter(
                    F.col("__hwm").isNotNull()
                    & (F.struct(ts, tb) <= F.col("__hwm"))
                )
                .limit(1)
                .count()
            )
            if bad:
                raise ValueError(
                    f"epoch {epoch_id}: batch contains rows at or before "
                    f"a key's stored high-water mark — out-of-order "
                    f"micro-batches corrupt SCD2 change points; buffer "
                    f"late data behind a watermark upstream"
                )
        else:
            cp = cp.withColumn("__lstate", F.lit(None).cast("string"))
        keep = cp.filter(
            F.when(
                F.col("__rn") == 1,
                # batch-first row: a change only vs the stored state
                F.col("__lstate").isNull()
                | ~F.col("__lstate").eqNullSafe(F.col(st)),
            ).otherwise(
                F.col("__prev").isNull()
                | ~F.col("__prev").eqNullSafe(F.col(st))
            )
        ).select(k, ts, st, tb)
        keep.write.mode("overwrite").parquet(
            os.path.join(self.path, f"epoch_{epoch_id}")
        )
        self._epochs.append(epoch_id)

    def history(self, spark: SparkSession) -> DataFrame:
        """The full SCD2 table over everything ingested so far —
        identical to running the batch operator over the concatenated
        input (compression is idempotent, carry-ins were filtered)."""
        log = self._log(spark)
        if log is None:
            raise ValueError("empty store: no epochs ingested")
        return scd2_history(
            log, self.key, self.ts_col, self.state_col, self.tiebreak_col
        )
