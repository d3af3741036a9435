"""Final A/B for the in-join size-compatibility conjunct (round 6): after
the plan fix (size check AND jaccard as ONE join-residual conjunction —
two sequential filters split the predicates and let every size-compatible
pair exit the attach join carrying both token arrays), re-measure
`dedup_minhash` at the 64x rung, alternating variants in the same window
so box drift cancels: off, on, off, on.
"""
import json
import subprocess
import sys

SNIPPET = r'''
import time, sys, functools
sys.path.insert(0, "/root/repo")
from consent_based_conversion_adjustments_spark.session import get_spark
from consent_based_conversion_adjustments_spark.operators import dedup as D
spark = get_spark("ab64r6")
import bench
bench.SF_DIR = "/root/testdata/sf0.1"
bench.warmup(spark)
import __spark_entry__ as e
if "{variant}" == "noprefilter":
    D._verify_pairs_jaccard = functools.partial(
        D._verify_pairs_jaccard, size_prefilter=False
    )
fn = e.queries()["dedup_minhash"]
t0 = time.time()
fn(spark, "/tmp/scale64/sf6.4").write.format("noop").mode("overwrite").save()
print("RESULT %.3f" % (time.time() - t0))
'''

out = []
for variant in ("noprefilter", "prefilter", "noprefilter", "prefilter"):
    p = subprocess.run(
        [sys.executable, "-c", SNIPPET.format(variant=variant)],
        capture_output=True, text=True, cwd="/root/repo", timeout=3600,
    )
    t = None
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            t = float(line.split()[1])
    out.append({"variant": variant, "sec": t})
    print(variant, t, flush=True)
    if t is None:
        print(p.stdout[-2000:], p.stderr[-2000:], flush=True)
    json.dump(out, open("/tmp/ab_r6.json", "w"), indent=1)
