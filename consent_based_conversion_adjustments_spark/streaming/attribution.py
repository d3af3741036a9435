"""Streaming multi-touch attribution: the campaign-credit pipeline as an
incremental ``foreachBatch`` store.

`operators.behavior.touch_attribution` is one batch over the whole event
log; this is the production wrapper — touches persist as a parquet table
partitioned by epoch, and each arriving micro-batch credits ONLY its own
conversions against (prior epochs' touches ∪ its own earlier touches),
appending exactly its per-pair credit delta. The event log is never
re-scanned: a micro-batch costs O(batch + matching (user, bin) keys in
the store), the same incremental contract as the dedup admission store.

A conversion's credit is FINAL at its own epoch: the lookback window
ends strictly before the conversion, so with time-ordered epochs no
later touch can change it — per-conversion normalizers (touch count,
decay-weight sum) are computed batch-locally and the stored credit rows
are immutable facts. That finality is what makes the rollup a plain
aggregate over the credits table, with no reprocessing ever.

Exactly-once contract (shared with the admission / SCD2 / Gram-partial
stores): replay of a crashed epoch re-runs with the SAME epoch id, the
probe reads only ``epoch < epoch_id`` partitions (never its own crashed
half-write), and both deltas write with dynamic partition overwrite, so
a replay deterministically rewrites its own partitions.

Ordered-epoch contract: like ``SCD2Store``, batches must be event-time
ranged — a touch arriving AFTER its conversion's epoch would be
silently uncredited, so ``process_batch`` raises loudly when a batch's
minimum timestamp precedes an earlier epoch's maximum (the ``meta``
table stores per-epoch watermarks; one tiny read per batch). Late data
belongs in the batch operator over a corrected log, not in a silent
partial credit.

Scale notes: the touch-store probe is the (user, time-bin) equi-join —
at scale the table would additionally be laid out by bin range so the
probe's bin filter prunes files (the layout module's min/max-skipping
story); per-epoch partitions accumulate small files over thousands of
epochs, with the same offline-compaction note as the admission store.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.rounding import stable_round
from .admission import _table_exists


class AttributionStore:
    """Parquet-backed incremental attribution at ``store_dir``.

    Layout (all partitioned by ``epoch``):
    - ``touches/`` — (user_id, campaign, tt, bin) of every touch event
    - ``credits/`` — per-(touch, conversion) credit rows:
      (campaign, conv_id, conv_value, lin_credit, decay_credit)
    - ``meta/``    — (max_ts,) per epoch: the ordered-epoch watermark
    """

    TOUCH_SCHEMA = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("campaign", T.LongType()),
            T.StructField("tt", T.LongType()),
            T.StructField("bin", T.LongType()),
        ]
    )
    CREDIT_SCHEMA = T.StructType(
        [
            T.StructField("campaign", T.LongType()),
            T.StructField("conv_id", T.LongType()),
            T.StructField("conv_value", T.DoubleType()),
            T.StructField("lin_credit", T.DoubleType()),
            T.StructField("decay_credit", T.DoubleType()),
        ]
    )
    META_SCHEMA = T.StructType([T.StructField("max_ts", T.LongType())])

    def __init__(
        self,
        store_dir: str,
        touch_type: str = "click",
        conversion_type: str = "purchase",
        lookback_seconds: int = 24 * 3600,
        halflife_seconds: int = 6 * 3600,
        bin_seconds: int | None = None,
        campaign_expr=None,
    ):
        self.store_dir = store_dir
        self.touch_type = touch_type
        self.conversion_type = conversion_type
        self.look_us = int(lookback_seconds) * 1_000_000
        self.half_us = float(halflife_seconds) * 1e6
        self.bin_us = int(bin_seconds or lookback_seconds) * 1_000_000
        self.campaign_expr = campaign_expr
        self.touches_path = os.path.join(store_dir, "touches")
        self.credits_path = os.path.join(store_dir, "credits")
        self.meta_path = os.path.join(store_dir, "meta")

    # -- table access ----------------------------------------------------

    def _read_before(self, spark, path, schema, epoch_id) -> DataFrame:
        if not _table_exists(spark, path):
            return spark.createDataFrame([], schema)
        with_epoch = T.StructType(
            list(schema.fields) + [T.StructField("epoch", T.LongType())]
        )
        return (
            spark.read.schema(with_epoch)
            .parquet(path)
            .filter(F.col("epoch").cast("long") < F.lit(int(epoch_id)))
            .drop("epoch")
        )

    def _write_epoch(self, df: DataFrame, path: str, epoch_id: int) -> None:
        (
            df.withColumn("epoch", F.lit(int(epoch_id)).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(path)
        )

    # -- the sink ---------------------------------------------------------

    def _bin_of(self, us_col):
        return F.floor(
            us_col.cast("decimal(20,0)") / F.lit(self.bin_us)
        ).cast("long")

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
        campaign = (
            self.campaign_expr
            if self.campaign_expr is not None
            else F.get_json_object("props", "$.k").cast("long") % 10
        )

        # ordered-epoch guard (the SCD2Store contract): a batch starting
        # before an earlier epoch's watermark would carry touches that
        # arrived after their conversion's epoch — refuse loudly.
        prior_max = (
            self._read_before(
                spark, self.meta_path, self.META_SCHEMA, epoch_id
            )
            .agg(F.max("max_ts"))
            .collect()[0][0]
        )
        bounds = batch_df.agg(
            F.min(us).alias("lo"), F.max(us).alias("hi")
        ).collect()[0]
        if bounds["lo"] is None:
            return  # empty batch: no watermark to advance, nothing to do
        if prior_max is not None and bounds["lo"] < prior_max:
            raise ValueError(
                f"out-of-order batch at epoch {epoch_id}: starts at "
                f"{bounds['lo']} before stored watermark {prior_max}; "
                "attribution epochs must be event-time ranged"
            )

        new_touches = batch_df.filter(
            F.col("event_type") == self.touch_type
        ).select(
            F.col("user_id").cast("long").alias("user_id"),
            campaign.alias("campaign"),
            us.alias("tt"),
            self._bin_of(us).alias("bin"),
        )
        convs = batch_df.filter(
            F.col("event_type") == self.conversion_type
        ).select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("event_id").cast("long").alias("conv_id"),
            us.alias("ct"),
            F.col("value").cast("double").alias("conv_value"),
        )
        store_touches = self._read_before(
            spark, self.touches_path, self.TOUCH_SCHEMA, epoch_id
        )
        all_touches = store_touches.unionByName(new_touches)

        conv_bins = convs.withColumn(
            "bin",
            F.explode(
                F.sequence(
                    self._bin_of(F.col("ct") - F.lit(self.look_us)),
                    self._bin_of(F.col("ct") - F.lit(1)),
                )
            ),
        )
        pairs = all_touches.join(conv_bins, ["user_id", "bin"]).filter(
            (F.col("tt") >= F.col("ct") - F.lit(self.look_us))
            & (F.col("tt") < F.col("ct"))
        )
        weighted = pairs.withColumn(
            "w",
            F.pow(
                F.lit(2.0),
                -((F.col("ct") - F.col("tt")).cast("double"))
                / F.lit(self.half_us),
            ),
        )
        per_conv = weighted.groupBy("conv_id").agg(
            F.count(F.lit(1)).alias("n_touch"),
            F.sum("w").alias("w_sum"),
        )
        credits = (
            weighted.join(per_conv, "conv_id")
            .select(
                "campaign",
                "conv_id",
                "conv_value",
                (F.col("conv_value") / F.col("n_touch")).alias("lin_credit"),
                (
                    F.col("conv_value") * F.col("w") / F.col("w_sum")
                ).alias("decay_credit"),
            )
            # one materialization feeds the write; also cuts the probe
            # lineage so the touch-delta write below can't re-trigger it
            .localCheckpoint()
        )
        self._write_epoch(credits, self.credits_path, epoch_id)
        self._write_epoch(new_touches, self.touches_path, epoch_id)
        self._write_epoch(
            spark.createDataFrame([(int(bounds["hi"]),)], self.META_SCHEMA),
            self.meta_path,
            epoch_id,
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

    # -- readback ----------------------------------------------------------

    def attributed(self, spark: SparkSession) -> DataFrame:
        """Campaign rollup over every epoch's credit rows — the same
        output contract as ``behavior.touch_attribution``."""
        credits = spark.read.schema(
            T.StructType(
                list(self.CREDIT_SCHEMA.fields)
                + [T.StructField("epoch", T.LongType())]
            )
        ).parquet(self.credits_path)
        return (
            credits.groupBy("campaign")
            .agg(
                F.countDistinct("conv_id").cast("long").alias(
                    "n_conversions"
                ),
                F.count(F.lit(1)).cast("long").alias("n_touch_pairs"),
                stable_round(F.sum("lin_credit"), 4).alias(
                    "attributed_linear"
                ),
                stable_round(F.sum("decay_credit"), 4).alias(
                    "attributed_decay"
                ),
            )
            .orderBy("campaign")
        )
