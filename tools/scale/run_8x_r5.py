"""Round-5 fresh-JVM scaling rows: per-(query, scale) subprocess, same
method as the round-3/4 studies (PERF.md)."""
import json
import subprocess
import sys
import time

QUERIES = [
    "incremental_dedup_admission",
    "dsir_importance",
    "embedding_neardup",
    "embedding_dedup_ids",
]
SNIPPET = r'''
import time, sys
sys.path.insert(0, "/root/repo")
from consent_based_conversion_adjustments_spark.session import get_spark
spark = get_spark("scale-study")
import bench
bench.SF_DIR = "{sf}"
bench.warmup(spark)
fn = dict((n, f) for n, f in bench.HEADLINE).get("{name}")
if fn is None:
    import __spark_entry__ as e
    fn = e.queries()["{name}"]
t0 = time.time()
fn(spark, "{sf}").write.format("noop").mode("overwrite").save()
print("RESULT %.3f" % (time.time() - t0))
'''
out = {}
for name in QUERIES:
    row = {}
    for label, sf in (("sf0.1", "/root/testdata/sf0.1"), ("x8", "/tmp/scale8/sf0.8")):
        p = subprocess.run(
            [sys.executable, "-c", SNIPPET.format(sf=sf, name=name)],
            capture_output=True, text=True, cwd="/root/repo", timeout=1800,
        )
        val = None
        for line in p.stdout.splitlines():
            if line.startswith("RESULT "):
                val = float(line.split()[1])
        row[label] = val
        print(name, label, val, flush=True)
        # settle: the previous subprocess's JVM-exit shuffle cleanup must
        # not land inside the next timed window (observed 4x outliers)
        time.sleep(8)
        if val is None:
            print(p.stdout[-2000:], p.stderr[-2000:], flush=True)
    out[name] = row
json.dump(out, open("/tmp/scale_r5.json", "w"), indent=1)
