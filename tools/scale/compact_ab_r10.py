"""Round-10 A/B: AdmissionStore.compact's small-files effect.

The admission store accumulates one parquet partition per epoch; a
long-running stream leaves thousands of tiny files whose listing and
task-scheduling overhead grows even though probe SEMANTICS are
unaffected. `AdmissionStore.compact` (new this round) folds epochs <= E
into one partition offline. This script quantifies the win at the shape
that matters — MANY epochs, small deltas:

  build: sf0.1 documents (5k docs) split into 48 micro-batches through
  process_batch -> 48 epoch partitions per store table;
  legs:  one further admission round (epoch 48, a fresh 49th batch) on
         a pristine COPY of the store, fresh JVM per rep, 2 reps each
         for the uncompacted store and the compact(47)ed store.

Reported per leg: probe-round wall time + per-table file counts.
Run on an IDLE host:  python tools/scale/compact_ab_r10.py
Results: tools/scale/results_compact_ab_r10.json
"""

import json
import os
import shutil
import subprocess

STORE = "/tmp/scale64/admstore_r10"
N_EPOCHS = 48

BUILD_SNIPPET = r'''
import sys
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from consent_based_conversion_adjustments_spark.session import get_spark
from consent_based_conversion_adjustments_spark.streaming.admission import (
    AdmissionStore)
spark = get_spark("compact-build")
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
store = AdmissionStore("{store}", threshold=0.6)
for epoch in range({n}):
    batch = docs.filter(F.col("doc_id") % ({n} + 1) == epoch).select(
        "doc_id", "text")
    store.process_batch(batch, epoch)
print("BUILT", store.admitted(spark).count(), flush=True)
'''

COMPACT_SNIPPET = r'''
import sys, time
sys.path.insert(0, "/root/repo")
from consent_based_conversion_adjustments_spark.session import get_spark
from consent_based_conversion_adjustments_spark.streaming.admission import (
    AdmissionStore)
spark = get_spark("compact-run")
store = AdmissionStore("{store}", threshold=0.6)
t0 = time.time()
store.compact(spark, {up_to})
print("RESULT %.3f" % (time.time() - t0), flush=True)
'''

PROBE_SNIPPET = r'''
import sys, time
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from consent_based_conversion_adjustments_spark.session import get_spark
from consent_based_conversion_adjustments_spark.streaming.admission import (
    AdmissionStore)
spark = get_spark("compact-probe")
import bench
bench.SF_DIR = "/root/testdata/sf0.1"
bench.warmup(spark)
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
batch = docs.filter(F.col("doc_id") % ({n} + 1) == {n}).select(
    "doc_id", "text")
store = AdmissionStore("{store}", threshold=0.6)
t0 = time.time()
store.process_batch(batch, {n})
print("RESULT %.3f" % (time.time() - t0), flush=True)
print("VOLUME admitted", store.admitted(spark).count(), flush=True)
print("VOLUME relations", store.relations(spark).count(), flush=True)
'''


def run_snippet(code: str, timeout: int = 1800) -> dict:
    rec: dict = {}
    out = subprocess.run(
        ["python", "-c", code], capture_output=True, text=True,
        timeout=timeout,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            rec["sec"] = float(line.split()[1])
        elif line.startswith("VOLUME"):
            _, key, val = line.split()
            rec[key] = int(val)
        elif line.startswith("BUILT"):
            rec["built_admitted"] = int(line.split()[1])
    if not rec:
        rec["error"] = out.stderr[-2000:]
    return rec


def file_counts(store_dir: str) -> dict:
    counts = {}
    for table in ("signatures", "token_hashes", "relations"):
        n = 0
        for _, _, files in os.walk(os.path.join(store_dir, table)):
            n += sum(1 for f in files if f.endswith(".parquet"))
        counts[table] = n
    return counts


if __name__ == "__main__":
    os.makedirs("/tmp/scale64", exist_ok=True)
    if not os.path.exists(STORE):
        rec = run_snippet(BUILD_SNIPPET.format(store=STORE, n=N_EPOCHS))
        print(f"build: {rec}", flush=True)
        if "error" in rec:
            raise RuntimeError(rec["error"])

    compacted = STORE + "_compacted"
    results = {"n_epochs": N_EPOCHS}
    if not os.path.exists(compacted):
        shutil.copytree(STORE, compacted)
        rec = run_snippet(
            COMPACT_SNIPPET.format(store=compacted, up_to=N_EPOCHS - 1)
        )
        print(f"compact: {rec}", flush=True)
        results["compact_sec"] = rec.get("sec")
    results["files_uncompacted"] = file_counts(STORE)
    results["files_compacted"] = file_counts(compacted)

    for tag, src in (("uncompacted", STORE), ("compacted", compacted)):
        reps = []
        for rep in range(2):
            leg = f"/tmp/scale64/admstore_r10_leg_{tag}_{rep}"
            if os.path.exists(leg):
                shutil.rmtree(leg)
            shutil.copytree(src, leg)
            rec = run_snippet(
                PROBE_SNIPPET.format(store=leg, n=N_EPOCHS)
            )
            print(f"probe[{tag}] rep{rep}: {rec}", flush=True)
            reps.append(rec)
            shutil.rmtree(leg, ignore_errors=True)
        results[f"probe_{tag}"] = reps

    with open(
        "/root/repo/tools/scale/results_compact_ab_r10.json", "w"
    ) as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)
