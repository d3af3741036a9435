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
