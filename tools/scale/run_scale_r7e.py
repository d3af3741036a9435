"""Deep-scale rung for the round-7e event/statistics operators (TWAP,
MAD anomalies, Q-Q calibration, event paths, winsorize, HLL cube) on
the ev64 tile set (64x events, user space grows 64x, per-user history
length constant — built by run_scale_r7d.build_tiles).

Protocol: fresh JVM per leg, disk local dirs, noop sink, volume
counters. Results -> tools/scale/results_r7e.json.
"""
import json
import os
import subprocess

SNIPPET = r'''
import time, sys
sys.path.insert(0, "/root/repo")
from consent_based_conversion_adjustments_spark.session import get_spark
spark = get_spark("scale-r7e")
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


QUERIES = [
    "events_user_twap",
    "events_value_mad_anomalies",
    "click_value_calibrated",
    "user_event_paths",
    "events_value_winsorized",
    "distinct_users_window_hll",
]

if __name__ == "__main__":
    rows = []
    for name in QUERIES:
        for sf in ("/root/testdata/sf0.1", "/tmp/scale64/ev64"):
            rec = run(name, sf)
            print(json.dumps(rec), flush=True)
            rows.append(rec)
    with open("/root/repo/tools/scale/results_r7e.json", "w") as f:
        json.dump(rows, f, indent=1)
