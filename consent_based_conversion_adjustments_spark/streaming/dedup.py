"""Streaming deduplication (exactly-once delivery from at-least-once
sources) via ``dropDuplicatesWithinWatermark``.

The ingestion-side twin of the batch dedup operators: upstream systems
(Kafka producers with retries, file re-drops, multi-region double
writes) deliver events at-least-once; the stream must emit each key
exactly once. Structured Streaming's ``dropDuplicatesWithinWatermark``
keeps per-key state ONLY until the event-time watermark passes the key's
first-seen time + the watermark delay, so state is bounded by
(duplicate-arrival window × key rate) rather than the stream's lifetime
— the property that makes streaming dedup viable at all at 100 TB/day
(a plain ``dropDuplicates`` on a stream retains every key forever).

Contract: duplicates arriving within the watermark delay of the first
copy are suppressed; a copy arriving later than that MAY be re-emitted —
that is the price of bounded state, and the delay is the knob. With a
delay exceeding the source's total event-time span (the fixture runs),
the output is exactly the batch distinct, which is what the oracle
checks.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .events import dedup_stream, stream_events_from_parquet
from ..session import scratch_dir


def dedup_events_streaming(
    spark: SparkSession,
    sf_dir: str,
    *,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "3650 days",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Run the REAL streaming engine's keyed dedup over an at-least-once
    source: the events fixture is read as TWO independent readStream
    legs and unioned — every event arrives (at least) twice, possibly in
    different micro-batches — then ``dropDuplicatesWithinWatermark`` on
    ``key_cols`` must emit each key once.

    The default 3650-day delay exceeds any fixture's event-time span, so
    no dedup state ever evicts during the run and the emitted set equals
    the batch distinct exactly (the oracle). Production tunes the delay
    down to its real duplicate-arrival bound to cap state.

    ``checkpoint_dir``: caller-provided checkpoint location (pytest's
    tmp_path); when None a temp dir is created and removed after the run.
    """
    legs = [
        stream_events_from_parquet(spark, sf_dir, ts_col="ts", watermark=None)
        for _ in range(2)
    ]
    doubled = legs[0].unionAll(legs[1]).withWatermark("ts", watermark)
    deduped = dedup_stream(doubled, key_cols).select(
        "event_id", "user_id", "event_type"
    )
    name = f"ss_dedup_{uuid.uuid4().hex[:12]}"
    owns_ckpt = checkpoint_dir is None
    ckpt = checkpoint_dir or scratch_dir("cocoa_ss_dedup_ckpt_")
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        # awaitTermination returns False on timeout with the query still
        # running — reading the memory sink then would yield a silently
        # partial result and the rmtree below would race the query.
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError(
                "dedup_events_streaming: availableNow run did not finish "
                "within 600s; partial sink discarded"
            )
    finally:
        if owns_ckpt:
            shutil.rmtree(ckpt, ignore_errors=True)
    return (
        spark.table(name)
        .localCheckpoint()
        .orderBy("event_id")
    )
