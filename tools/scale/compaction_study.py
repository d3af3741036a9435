"""Small-files compaction study (round 8): what fragmentation actually
costs a scan, and what one compaction pass buys back.

Setup: ev64 (6.4M events) written three ways — 2,048 tiny files
(~the per-epoch-sink worst case), compacted round-robin at 128 MB, and
compacted range-layout on user_id. Measured: a full-scan aggregate
(value quantiles per type) and a selective single-user probe (where the
range layout's min/max skipping should bite). Fresh JVM per leg, 2 reps.
Results -> tools/scale/results_compaction.json.
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PREP = r'''
import sys
sys.path.insert(0, "/root/repo")
from consent_based_conversion_adjustments_spark.session import get_spark
from consent_based_conversion_adjustments_spark.sources.compaction import compact_parquet
spark = get_spark("compact-prep")
ev = spark.read.parquet("/tmp/scale64/ev64/events.parquet")
ev.repartition(2048).write.mode("overwrite").parquet("/tmp/scale64/ev64_frag")
print(compact_parquet(spark, "/tmp/scale64/ev64_frag",
                      "/tmp/scale64/ev64_rr", 128))
print(compact_parquet(spark, "/tmp/scale64/ev64_frag",
                      "/tmp/scale64/ev64_range", 128, layout_col="user_id"))
'''

SNIPPET = r'''
import time, sys
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from consent_based_conversion_adjustments_spark.session import get_spark
spark = get_spark("compact-leg")
import bench
bench.warmup(spark)
ev = spark.read.parquet("{path}")
t0 = time.time()
if "{probe}" == "scan":
    out = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5), F.percentile("value", 0.99),
        F.count(F.lit(1)))
else:
    out = ev.filter(F.col("user_id") == 777).agg(
        F.sum("value"), F.count(F.lit(1)))
out.write.format("noop").mode("overwrite").save()
print("RESULT %.3f" % (time.time() - t0))
'''


def run(path: str, probe: str) -> dict:
    env = dict(os.environ, SPARK_LOCAL_DIRS="/tmp/spark-local-scale")
    out = subprocess.run(
        ["python", "-u", "-c", SNIPPET.format(path=path, probe=probe)],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    rec: dict = {"path": path.rsplit("/", 1)[-1], "probe": probe}
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
    print(prep.stdout[-500:])
    rows = []
    for path in ("/tmp/scale64/ev64_frag", "/tmp/scale64/ev64_rr",
                 "/tmp/scale64/ev64_range"):
        for probe in ("scan", "probe"):
            for rep in range(2):
                rec = {**run(path, probe), "rep": rep}
                print(json.dumps(rec), flush=True)
                rows.append(rec)
    with open("/root/repo/tools/scale/results_compaction.json", "w") as f:
        json.dump(rows, f, indent=1)
