"""End-to-end CDC / temporal-table story over the fixtures — the
composition demo for the data-management layer added in round 7.

One flow from a CDC batch to point-in-time answers, each stage a
registered operator with its own oracle/tests:

1. MERGE      — merge.merge_upsert applies a CDC batch (updates,
   deletes, inserts) to the customer snapshot.
2. DIFF       — merge.table_diff reconciles pre/post images: exactly
   which keys the batch added/removed/changed (the validation half of
   CDC).
3. SCD2       — merge.scd2_history compresses the events change log
   into versioned validity intervals per user.
4. STREAMING  — streaming.scd2.SCD2Store maintains the same history
   incrementally from ts-ranged micro-batches (crash-replay
   idempotent), and the stream result equals the batch operator.
5. DRIFT      — corpus.ks_statistic answers "did the value
   distribution shift between the first and second half of the month?"

Run:  python examples/cdc_temporal_demo.py [sf_dir]
(defaults to /root/testdata/sf0.001; deterministic output).
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402

from consent_based_conversion_adjustments_spark.operators import (  # noqa: E402
    corpus as C,
)
from consent_based_conversion_adjustments_spark.operators.merge import (  # noqa: E402
    merge_upsert,
    scd2_history,
    table_diff,
)
from consent_based_conversion_adjustments_spark.session import get_spark  # noqa: E402
from consent_based_conversion_adjustments_spark.streaming.scd2 import (  # noqa: E402
    SCD2Store,
)


def main(sf_dir: str) -> None:
    spark = get_spark("cdc-temporal-demo")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    # 1. a CDC batch: per-customer spend -> balance updates + deletes
    agg = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice") / 1000, 2).alias("__bal"))
    )
    batch = agg.select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("__bal").alias("c_acctbal"),
        (F.col("o_custkey") % 13 == 0).alias("__del"),
    )
    merged = merge_upsert(cust, batch, ["c_custkey"], delete_col="__del")
    print("1. MERGE: ", merged.count(), "rows after the batch")

    # 2. reconcile: what did the batch actually touch?
    diff = table_diff(cust, merged, ["c_custkey"])
    diff.groupBy("change_type").count().orderBy("change_type").show()

    # 3. batch SCD2 over the event log
    hist = scd2_history(
        ev.withColumn("ts", F.col("ts").cast("timestamp")),
        "user_id",
        "ts",
        "event_type",
        "event_id",
    )
    print("3. SCD2: ", hist.count(), "versions;")
    hist.orderBy("user_id", "version").show(6)

    # 4. the same history maintained incrementally
    store = SCD2Store(
        tempfile.mkdtemp(prefix="demo_scd2_"),
        "user_id",
        "ts",
        "event_type",
        "event_id",
    )
    mid = "2024-01-15"
    e = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    store.process_batch(e.filter(F.col("ts") < mid), 0)
    store.process_batch(e.filter(F.col("ts") >= mid), 1)
    stream_hist = store.history(spark)
    same = stream_hist.count() == hist.count()
    print("4. streaming SCD2 == batch:", same)

    # 5. drift: first-half vs second-half value distributions
    ks = C.ks_statistic(
        e.filter(F.col("ts") < mid),
        e.filter(F.col("ts") >= mid),
        "value",
        "event_id",
    ).collect()[0]
    print(
        f"5. KS drift first-half vs second-half: D={ks.ks_d:.4f} "
        f"(n_a={ks.n_a}, n_b={ks.n_b})"
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
