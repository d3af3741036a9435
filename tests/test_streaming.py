"""Structured Streaming: windowed aggregations over a replayed event stream
must equal the batch computation (the unified-model contract)."""


import pytest
import pyspark.sql.functions as F

from consent_based_conversion_adjustments_spark.sources.io import read_table
from consent_based_conversion_adjustments_spark.streaming.events import (
    session_stats,
    session_window_stats,
    stream_events_from_parquet,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


def test_streaming_tumbling_equals_batch(spark):
    events = read_table(spark, SF, "events")
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in tumbling_counts(events).collect()
    }
    stream = stream_events_from_parquet(spark, SF)
    q = (
        tumbling_counts(stream)
        .writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from tumbling_test").collect()
    }
    assert got == batch


def test_stateful_streaming_user_totals(spark):
    """applyInPandasWithState running totals: after draining the stream the
    per-user state must equal the batch groupBy."""
    from consent_based_conversion_adjustments_spark.streaming.events import (
        streaming_user_totals,
    )

    events = read_table(spark, SF, "events")
    batch = {
        r["user_id"]: (r["n"], round(r["total"], 6))
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce("value", F.lit(0.0))).alias("total"),
        )
        .collect()
    }
    stream = stream_events_from_parquet(spark, SF).drop("props")
    q = (
        streaming_user_totals(stream)
        .writeStream.format("memory")
        .queryName("user_totals_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "select user_id, max(n_events) n_events, max(total_value) total_value "
        "from user_totals_test group by user_id"
    ).collect()
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in rows}
    assert got == batch


def test_session_formulations_agree(spark):
    """The relational gaps-and-islands sessionization must produce the same
    sessions as the built-in session_window operator."""
    events = read_table(spark, SF, "events")
    a = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in session_stats(events).collect()
    }
    b = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in session_window_stats(events).collect()
    }
    assert a == b
