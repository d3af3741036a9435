"""Bin-size sensitivity A/B for the attribution range join (round 8).

The (user, time-bin) equi-join trades two costs against each other:
- LARGE bins (= the lookback): each conversion explodes to ≤ 2 bin rows
  (minimal shuffle volume), but a (user, bin) candidate group spans the
  whole lookback of that user's touches — the exact filter discards
  little, and a hot user's group is as big as it can get.
- SMALL bins: conversions explode to lookback/bin (+1) rows each (more
  shuffle volume), but candidate groups tighten toward the true match
  set and a hot user's state splits across many keys (AQE-friendly).

This measures campaign attribution on ev64 (6.4M events) at bin =
lookback (24h), 6h, 1h, 10min. Fresh JVM per leg, disk local dirs, noop
sink. Results -> tools/scale/results_attr_bin_ab.json.
"""
import json
import os
import subprocess

SNIPPET = r'''
import time, sys
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from consent_based_conversion_adjustments_spark.session import get_spark
from consent_based_conversion_adjustments_spark.sources.io import read_table
from consent_based_conversion_adjustments_spark.operators.behavior import touch_attribution
spark = get_spark("attr-bin-ab")
import bench
bench.warmup(spark)
ev = read_table(spark, "/tmp/scale64/ev64", "events")
t0 = time.time()
out = touch_attribution(
    ev,
    group_expr=F.get_json_object("props", "$.k").cast("long") % 10,
    group_name="campaign",
    bin_seconds={bin_s},
)
out.write.format("noop").mode("overwrite").save()
print("RESULT %.3f" % (time.time() - t0))
'''


def run(bin_s: int) -> dict:
    env = dict(os.environ, SPARK_LOCAL_DIRS="/tmp/spark-local-scale")
    out = subprocess.run(
        ["python", "-u", "-c", SNIPPET.format(bin_s=bin_s)],
        capture_output=True,
        text=True,
        timeout=3600,
        env=env,
    )
    rec: dict = {"bin_seconds": bin_s}
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            rec["sec"] = float(line.split()[1])
    if "sec" not in rec:
        rec["error"] = out.stderr[-2000:]
    return rec


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from run_scale_r8 import build_tiles

    build_tiles()
    rows = []
    for bin_s in (24 * 3600, 6 * 3600, 3600, 600):
        for rep in range(2):
            rec = {**run(bin_s), "rep": rep}
            print(json.dumps(rec), flush=True)
            rows.append(rec)
    with open(
        "/root/repo/tools/scale/results_attr_bin_ab.json", "w"
    ) as f:
        json.dump(rows, f, indent=1)
