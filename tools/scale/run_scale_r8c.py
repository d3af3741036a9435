"""Third round-8 rung: the synthesis/profiling queries at 64x
(point-in-time enrichment, association rules, WoW change, the table
profile, unpivot, VARIANT access). Tiles from the earlier rungs.
Results -> tools/scale/results_r8c.json.
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SNIPPET = r'''
import time, sys
sys.path.insert(0, "/root/repo")
from consent_based_conversion_adjustments_spark.session import get_spark
spark = get_spark("scale-r8c")
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
        capture_output=True, text=True, timeout=3600, env=env,
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
    ("purchases_pit_state", "/root/testdata/sf0.1"),
    ("purchases_pit_state", "/tmp/scale64/ev64"),
    ("token_association_rules", "/root/testdata/sf0.1"),
    ("token_association_rules", "/tmp/scale64/docs64p"),
    ("events_wow_change", "/root/testdata/sf0.1"),
    ("events_wow_change", "/tmp/scale64/ev64"),
    ("orders_table_profile", "/root/testdata/sf0.1"),
    ("orders_table_profile", "/tmp/scale64/ord64"),
    ("lineitem_unpivot_stats", "/root/testdata/sf0.1"),
    ("lineitem_unpivot_stats", "/tmp/scale64/li64"),
    ("events_props_variant", "/root/testdata/sf0.1"),
    ("events_props_variant", "/tmp/scale64/ev64"),
    ("vocab_zipf_fit", "/root/testdata/sf0.1"),
    ("vocab_zipf_fit", "/tmp/scale64/docs64p"),
    ("events_interarrival_stats", "/root/testdata/sf0.1"),
    ("events_interarrival_stats", "/tmp/scale64/ev64"),
]

if __name__ == "__main__":
    from run_scale_r7b import build_li64
    from run_scale_r8 import build_tiles
    from run_scale_r8b import build_ord64

    build_tiles()
    build_li64()
    build_ord64()
    rows = []
    for name, sf in LEGS:
        rec = run(name, sf)
        print(json.dumps(rec), flush=True)
        rows.append(rec)
    with open("/root/repo/tools/scale/results_r8c.json", "w") as f:
        json.dump(rows, f, indent=1)
