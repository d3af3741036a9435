"""Deep-scale rung for the prefix-scan family and sketch cubes (round
7f): weighted quantiles + Gini exercise global_running_sum/global_rank
at 38.4M rows (li64) — the deepest test of the range-exchange + Arrow
scan primitive so far — and KS / KLL cube / streaming SCD2 run on ev64.

Protocol: fresh JVM per leg, disk local dirs, noop sink.
Results -> tools/scale/results_r7f.json.
"""
import json
import os
import subprocess

SNIPPET = r'''
import time, sys
sys.path.insert(0, "/root/repo")
from consent_based_conversion_adjustments_spark.session import get_spark
spark = get_spark("scale-r7f")
import bench
bench.SF_DIR = "/root/testdata/sf0.1"
bench.warmup(spark)
import __spark_entry__ as e
name, sf = "{name}", "{sf}"
fn = e.queries()[name]
t0 = time.time()
fn(spark, sf).write.format("noop").mode("overwrite").save()
print("RESULT %.3f" % (time.time() - t0))
print("VOLUME out_rows", fn(spark, sf).count())
'''


def run(name: str, sf: str) -> dict:
    env = dict(os.environ, SPARK_LOCAL_DIRS="/tmp/spark-local-scale")
    out = subprocess.run(
        ["python", "-u", "-c", SNIPPET.format(name=name, sf=sf)],
        capture_output=True,
        text=True,
        timeout=3600,
        env=env,
    )
    rec: dict = {"name": name, "sf": sf}
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            rec["sec"] = float(line.split()[1])
        elif line.startswith("VOLUME"):
            _, key, val = line.split()
            rec[key] = int(val)
    if "sec" not in rec:
        rec["error"] = out.stderr[-2000:]
    return rec


LEGS = [
    ("lineitem_weighted_price_quantiles", "/root/testdata/sf0.1"),
    ("lineitem_weighted_price_quantiles", "/tmp/scale64/li64"),
    ("lineitem_revenue_gini", "/root/testdata/sf0.1"),
    ("lineitem_revenue_gini", "/tmp/scale64/li64"),
    ("click_purchase_ks", "/root/testdata/sf0.1"),
    ("click_purchase_ks", "/tmp/scale64/ev64"),
    ("value_quantiles_window_kll", "/root/testdata/sf0.1"),
    ("value_quantiles_window_kll", "/tmp/scale64/ev64"),
    ("streaming_scd2_history", "/root/testdata/sf0.1"),
    ("streaming_scd2_history", "/tmp/scale64/ev64"),
]

if __name__ == "__main__":
    rows = []
    for name, sf in LEGS:
        rec = run(name, sf)
        print(json.dumps(rec), flush=True)
        rows.append(rec)
    with open("/root/repo/tools/scale/results_r7f.json", "w") as f:
        json.dump(rows, f, indent=1)
