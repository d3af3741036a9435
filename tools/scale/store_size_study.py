"""Incremental-dedup store-size study: FIXED batch, store 1 tile vs 7
tiles (7x the docs). The production claim: probe cost is linear in the
BATCH (plus candidate volume), not in store size — the store's text is
never re-read; only its persisted band/sig/hash tables are equi-joined.
Store build time is excluded (one-time cost, amortized across batches);
the store frames are materialized (count) before the timer starts."""
import subprocess
import sys

SNIPPET = r'''
import time, sys
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from consent_based_conversion_adjustments_spark.session import get_spark
from consent_based_conversion_adjustments_spark.operators import dedup as D
spark = get_spark("store-study")
import bench
bench.SF_DIR = "/tmp/scale8/sf0.8"
bench.warmup(spark)
docs = spark.read.parquet("/tmp/scale8/sf0.8/documents.parquet")
# tiles are id-shifted copies at a 100000 stride (observed layout)
tile = F.floor(F.col("doc_id") / F.lit(100000)).cast("int")
batch = docs.filter(tile == 7)                      # fixed final tile
store_docs = docs.filter(tile < {n_tiles})          # 1 vs 7 tiles
sigs, hashes = D.minhash_store(store_docs, "text", "doc_id")
print("store rows:", sigs.count(), hashes.count())  # materialize the store
t0 = time.time()
out = D.incremental_minhash_neardup(batch, sigs, hashes, "text", "doc_id",
                                    threshold=0.8)
out.write.format("noop").mode("overwrite").save()
print("RESULT %.3f" % (time.time() - t0))
n = out.count()
print("RELATIONS", n)
'''
for n_tiles in (1, 7):
    p = subprocess.run(
        [sys.executable, "-c", SNIPPET.format(n_tiles=n_tiles)],
        capture_output=True, text=True, cwd="/root/repo", timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith(("RESULT", "RELATIONS", "store rows")):
            print(f"store={n_tiles}t", line, flush=True)
    if "RESULT" not in p.stdout:
        print(p.stdout[-3000:], p.stderr[-3000:])
