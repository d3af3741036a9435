"""Round-6 fresh-JVM confirmation of the two ~1.2x bench regressions the
r5 verdict flagged as presumed run-order noise (`embedding_dedup_ids`
2.91->3.50 s, `tfidf_top_terms` 1.53->1.87 s vs their r4 records).

Protocol: each (query, rep) in its own JVM at sf0.1 with the bench
warmup, machine otherwise idle; report min/median of 3 reps. The min of
a fresh-JVM set is the contention-free truth the shared-session bench
approximates.
"""
import json
import statistics
import subprocess
import sys

SNIPPET = r'''
import time, sys
sys.path.insert(0, "/root/repo")
from consent_based_conversion_adjustments_spark.session import get_spark
spark = get_spark("confirm-r6")
import bench
bench.warmup(spark)
import __spark_entry__ as e
fn = e.queries()["{name}"]
t0 = time.time()
fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
print("RESULT %.3f" % (time.time() - t0))
'''

out = {}
for name in ("embedding_dedup_ids", "tfidf_top_terms"):
    times = []
    for rep in range(3):
        p = subprocess.run(
            [sys.executable, "-c", SNIPPET.format(name=name)],
            capture_output=True, text=True, cwd="/root/repo", timeout=1200,
        )
        for line in p.stdout.splitlines():
            if line.startswith("RESULT "):
                times.append(float(line.split()[1]))
    out[name] = {
        "reps": times,
        "min": min(times),
        "median": statistics.median(times),
    }
    print(name, out[name], flush=True)
json.dump(out, open("/tmp/confirm_r6.json", "w"), indent=1)
