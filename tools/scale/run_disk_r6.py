"""Round-6 64x rows under DISK-backed local dirs.

The round's measurement-hygiene finding: session.py's tmpfs local-dir
default (right for the sf0.1 bench, whose shuffles are a few GB) turns
into a variance source at the 64x rung — the verify join's shuffle
competes with the 48 GB JVM heap for the same 128 GB of RAM, and
identical x64 legs measured 261–746 s with the prefilter A/B flipping
sign between repetitions. With local dirs on disk the alternating legs
were stable. All round-6 x64 rows are therefore measured with
SPARK_LOCAL_DIRS on disk (the cluster guidance is the same: local dirs
on real local storage, never RAM-backed, once shuffle volume is a
nontrivial fraction of executor RAM).

Legs:
  1-2. incremental_dedup_admission and image_phash_neardup at x64 — the
       VERDICT r5 ask-#3 rows. Volume counts (relations / pairs /
       distinct hashes) were taken in the earlier study and are
       data-exact, so these legs re-measure time only.
  3-4. dedup_minhash at x64 with ALL broadcast joins disabled — the
       100 TB regime, where no verify side fits a broadcast: checks
       whether the AQE SMJ->SHJ conversion (session.py) fires at depth
       and what the rung costs there, with and without the in-row size
       conjunct. Prints the final adaptive plan's join mix.
"""
import json
import os
import shutil
import subprocess
import sys
import time

LOCAL_DIR = "/tmp/spark-local-r6"

SNIPPET = r'''
import time, sys, functools
sys.path.insert(0, "/root/repo")
from consent_based_conversion_adjustments_spark.session import get_spark
from consent_based_conversion_adjustments_spark.operators import dedup as D
extra = {{}}
if "{nobroadcast}" == "yes":
    extra = {{"spark.sql.autoBroadcastJoinThreshold": "-1",
              "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1"}}
spark = get_spark("disk64r6", extra_conf=extra)
import bench
bench.SF_DIR = "/root/testdata/sf0.1"
bench.warmup(spark)
import __spark_entry__ as e
if "{variant}" == "noprefilter":
    D._verify_pairs_jaccard = functools.partial(
        D._verify_pairs_jaccard, size_prefilter=False
    )
fn = e.queries()["{name}"]
df = fn(spark, "/tmp/scale64/sf6.4")
t0 = time.time()
df.write.format("noop").mode("overwrite").save()
print("RESULT %.3f" % (time.time() - t0))
p = df._jdf.queryExecution().executedPlan().toString()
print("PLAN SMJ:%d SHJ:%d BHJ:%d" % (
    p.count("SortMergeJoin"), p.count("ShuffledHashJoin"),
    p.count("BroadcastHashJoin")))
'''

RUNS = [
    # (query, variant, nobroadcast)
    ("incremental_dedup_admission", "prefilter", "no"),
    ("image_phash_neardup", "prefilter", "no"),
    ("dedup_minhash", "prefilter", "yes"),
    ("dedup_minhash", "noprefilter", "yes"),
]

out = {}
if os.path.exists("/tmp/disk64_r6.json"):
    out = json.load(open("/tmp/disk64_r6.json"))
for name, variant, nobroadcast in RUNS:
    if f"{name}/x64-disk/{variant}/nobroadcast={nobroadcast}" in out:
        continue
    shutil.rmtree(LOCAL_DIR, ignore_errors=True)
    os.makedirs(LOCAL_DIR, exist_ok=True)
    env = dict(os.environ, SPARK_LOCAL_DIRS=LOCAL_DIR)
    p = subprocess.run(
        [sys.executable, "-c",
         SNIPPET.format(name=name, variant=variant, nobroadcast=nobroadcast)],
        capture_output=True, text=True, cwd="/root/repo", timeout=5400,
        env=env,
    )
    vals = {}
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            vals["result"] = float(line.split()[1])
        if line.startswith("PLAN "):
            vals["plan"] = line[5:]
    key = f"{name}/x64-disk/{variant}/nobroadcast={nobroadcast}"
    out[key] = vals
    print(key, vals, flush=True)
    if "result" not in vals:
        print(p.stdout[-3000:], p.stderr[-3000:], flush=True)
    json.dump(out, open("/tmp/disk64_r6.json", "w"), indent=1)
    time.sleep(15)  # settle: let the exiting JVM's cleanup finish
shutil.rmtree(LOCAL_DIR, ignore_errors=True)
