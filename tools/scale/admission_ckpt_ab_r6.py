"""Round-6 A/B: admit_batch's per-round checkpoint strategy at the 64x rung.

Question: should `admit_batch(checkpoint_store=True)` localCheckpoint the
FULL updated store union (O(store) write per round, one compact scan leg)
or only the admitted DELTA (O(batch) write, store returned as
``store ∪ delta_ckpt``)?

Measured answer (disk-backed local dirs, fresh JVM per leg, alternating
variants, `admission_round` at /tmp/scale64/sf6.4): full-union 882/867 s,
delta 1382/1127 s — full-union wins 1.4-1.6x at depth (sf0.1 is a wash:
34-44 vs 37.3/37.4 s). The next round probes the store through ~19 joins
(16 band joins, two verify attach joins, the vocab probe); one compact
materialized copy scanned ~19x beats re-scanning a union of the prior
store's (disk-spilled) cache legs, and the O(store) write is paid once.
The engine keeps full-union; the delta arm lives here as a monkeypatch
so the A/B stays reproducible.

Usage: python tools/scale/admission_ckpt_ab_r6.py {full|delta} [tag]
(results accumulate in /tmp/adm64_ab.json; alternate the variants and
compare position-matched legs — same-variant legs on this host spread
up to 1.3x even on disk.)
"""
import json
import os
import shutil
import subprocess
import sys
import time

LOCAL_DIR = "/tmp/spark-local-adm64"

SNIPPET = r'''
import time, sys
sys.path.insert(0, "/root/repo")
from consent_based_conversion_adjustments_spark.session import get_spark
spark = get_spark("adm64")
import bench
bench.warmup(spark)

if "{variant}" == "delta":
    # the losing arm: checkpoint only the admitted O(batch) delta and
    # return the store as union(store, delta_ckpt) — scan legs pile up
    from consent_based_conversion_adjustments_spark.operators import dedup as D

    def delta_admit_batch(new, store_sigs, store_hashes, text_col, id_col,
                          threshold=0.6, n_perm=D.N_PERMUTATIONS,
                          band_size=D.BAND_SIZE, checkpoint_store=True):
        new_sigs, new_hashes = D.minhash_store(new, text_col, id_col, n_perm)
        relations = D.incremental_minhash_neardup(
            new, store_sigs, store_hashes, text_col, id_col, threshold,
            n_perm, band_size, new_tables=(new_sigs, new_hashes),
        )
        import pyspark.sql.functions as F
        rejected = relations.select("doc_id").distinct().unionByName(
            store_sigs.select("doc_id"))
        delta_sigs = new_sigs.join(rejected, "doc_id", "left_anti")
        delta_hashes = new_hashes.join(rejected, "doc_id", "left_anti")
        if checkpoint_store:
            relations = relations.localCheckpoint()
            delta_sigs = delta_sigs.localCheckpoint()
            delta_hashes = delta_hashes.localCheckpoint()
            new_sigs.unpersist()
            new_hashes.unpersist()
        return (relations, store_sigs.unionByName(delta_sigs),
                store_hashes.unionByName(delta_hashes))

    D.admit_batch = delta_admit_batch

import __spark_entry__ as e
fn = e.queries()["admission_round"]
t0 = time.time()
df = fn(spark, "/tmp/scale64/sf6.4")
df.write.format("noop").mode("overwrite").save()
print("RESULT %.3f" % (time.time() - t0))
'''


def main() -> None:
    variant = sys.argv[1]
    tag = sys.argv[2] if len(sys.argv) > 2 else variant
    out = {}
    if os.path.exists("/tmp/adm64_ab.json"):
        out = json.load(open("/tmp/adm64_ab.json"))
    if tag in out:
        print(json.dumps(out))
        return
    shutil.rmtree(LOCAL_DIR, ignore_errors=True)
    os.makedirs(LOCAL_DIR, exist_ok=True)
    env = dict(os.environ, SPARK_LOCAL_DIRS=LOCAL_DIR)
    p = subprocess.run(
        [sys.executable, "-c", SNIPPET.format(variant=variant)],
        capture_output=True, text=True, cwd="/root/repo", timeout=5400,
        env=env,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            out[tag] = float(line.split()[1])
    if tag not in out:
        print(p.stdout[-3000:], p.stderr[-3000:])
    json.dump(out, open("/tmp/adm64_ab.json", "w"))
    shutil.rmtree(LOCAL_DIR, ignore_errors=True)
    print(json.dumps(out))
    time.sleep(15)  # settle before the next alternating leg


if __name__ == "__main__":
    main()
