"""AQE skew-join A/B (round 8): measure the session default that has
been claimed since round 1 (`spark.sql.adaptive.skewJoin.enabled`).

Setup: ev64 with a manufactured hot key — 25% of the 6.4M events
reassigned to user_id 0 — shuffle-joined (broadcast disabled, so the
exchange actually happens) against a per-user dimension derived from the
same table. Without skew handling the hot key's entire partition lands
on ONE reducer; with AQE skew splitting the oversized partition is split
and the dim side replicated.

Legs: skewJoin on / off × 2 reps, fresh JVM each, disk local dirs.
Results -> tools/scale/results_skew_ab.json.
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PREP = r'''
import sys
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from consent_based_conversion_adjustments_spark.session import get_spark
spark = get_spark("skew-prep")
ev = spark.read.parquet("/tmp/scale64/ev64/events.parquet")
skewed = ev.withColumn(
    "user_id",
    F.when(F.pmod(F.col("event_id"), F.lit(4)) == 0, F.lit(0))
     .otherwise(F.col("user_id")))
skewed.write.mode("overwrite").parquet("/tmp/scale64/ev64_skew/events.parquet")
dim = (skewed.select("user_id").distinct()
       .withColumn("segment", F.pmod(F.col("user_id"), F.lit(7))))
dim.write.mode("overwrite").parquet("/tmp/scale64/ev64_skew/users.parquet")
print("prep done", skewed.filter(F.col("user_id") == 0).count())
'''

SNIPPET = r'''
import time, sys
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from consent_based_conversion_adjustments_spark.session import get_spark
spark = get_spark("skew-leg", extra_conf={{
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "0",
    "spark.sql.adaptive.skewJoin.enabled": "{skew}",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "{thresh}",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "{advisory}",
}})
import bench
bench.warmup(spark)
ev = spark.read.parquet("/tmp/scale64/ev64_skew/events.parquet")
dim = spark.read.parquet("/tmp/scale64/ev64_skew/users.parquet")
t0 = time.time()
out = (ev.join(dim, "user_id")
         .groupBy("segment", "event_type")
         .agg(F.sum("value"), F.count(F.lit(1))))
out.write.format("noop").mode("overwrite").save()
print("RESULT %.3f" % (time.time() - t0))
'''


def run(skew: str, thresh: str = "256m", advisory: str = "64m") -> dict:
    env = dict(os.environ, SPARK_LOCAL_DIRS="/tmp/spark-local-scale")
    out = subprocess.run(
        ["python", "-u", "-c",
         SNIPPET.format(skew=skew, thresh=thresh, advisory=advisory)],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    rec: dict = {"skew_join": skew, "threshold": thresh}
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            rec["sec"] = float(line.split()[1])
    if "sec" not in rec:
        rec["error"] = out.stderr[-1500:]
    return rec


if __name__ == "__main__":
    from run_scale_r8 import build_tiles

    build_tiles()
    env = dict(os.environ, SPARK_LOCAL_DIRS="/tmp/spark-local-scale")
    prep = subprocess.run(
        ["python", "-u", "-c", PREP], capture_output=True, text=True,
        timeout=1800, env=env,
    )
    print(prep.stdout[-300:])
    rows = []
    for skew, thresh, advisory in (
        ("false", "256m", "64m"),
        ("true", "256m", "64m"),   # defaults: hot partition under threshold
        ("true", "8m", "4m"),      # forced: the split itself, measured
    ):
        for rep in range(2):
            rec = {**run(skew, thresh, advisory), "rep": rep}
            print(json.dumps(rec), flush=True)
            rows.append(rec)
    with open("/root/repo/tools/scale/results_skew_ab.json", "w") as f:
        json.dump(rows, f, indent=1)
