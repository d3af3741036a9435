"""Round-9 deep-scale rung: SemDeDup (cluster-then-within-cluster dedup).

SemDeDup's scale law is the clustering analog of the LSH bucket-density
law (run_scale_r9.py): the within-cluster pair stage's candidate mass is

    M = sum over clusters |c|^2  ~  n^2 / k   (balanced clusters)

so at FIXED k a Gx corpus growth costs ~G^2 in pair mass, and keeping
per-row work constant requires scaling k with the data — exactly what
the paper does (k ~ 100k clusters for LAION). The A/B leg measures that:
64x rows with the sf0.1 default k=8 vs k scaled by the growth factor
(8*64 = 512). The k-means fit itself stays cheap either way (iters
scans + a k*dim-cell agg per iteration).

Protocol (matches run_scale_r7/r8/r9): each (scale, k) leg in a fresh
JVM, bench warmup, noop-sink timing; volume drivers (rows, cluster-pair
mass, hottest cluster, output pairs) counted in the same JVM. Tiles
reuse run_scale_r9's vec_id-offset embedding tiles (dimension roll,
norm-preserving).
"""

import json
import os
import subprocess

from run_scale_r9 import build_tiles

SNIPPET = r'''
import time, sys
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from consent_based_conversion_adjustments_spark.session import get_spark
spark = get_spark("scale-semdedup-r9")
import bench
bench.SF_DIR = "/root/testdata/sf0.1"
bench.warmup(spark)
sf, k, n_blocks = "{sf}", {k}, {n_blocks}

from consent_based_conversion_adjustments_spark.operators.semdedup import (
    semdedup_pairs)
from consent_based_conversion_adjustments_spark.operators import cluster as C

emb = spark.read.parquet(sf + "/embeddings.parquet")

t0 = time.time()
out = semdedup_pairs(emb, 0.45, k=k, iters=2, n_blocks=n_blocks)
out.write.format("noop").mode("overwrite").save()
print("RESULT %.3f" % (time.time() - t0), flush=True)

# volume drivers, same JVM (second fit: identical deterministic init)
cents = C.kmeans_fit(emb, k, 2)
sizes = C.kmeans_label(emb, cents).groupBy("cluster").count()
row = sizes.agg(
    F.sum(F.col("count") * F.col("count")).alias("mass"),
    F.max("count").alias("hot"),
    F.count(F.lit(1)).alias("nonempty"),
).first()
print("VOLUME rows", emb.count(), flush=True)
print("VOLUME cluster_pair_mass", row["mass"], flush=True)
print("VOLUME hottest_cluster", row["hot"], flush=True)
print("VOLUME nonempty_clusters", row["nonempty"], flush=True)
print("VOLUME out_pairs", out.count(), flush=True)
'''


def run(sf, k, n_blocks=4, timeout=3600):
    code = SNIPPET.format(sf=sf, k=k, n_blocks=n_blocks)
    rec = {"sf": sf, "k": k, "n_blocks": n_blocks}
    # PYTHONPATH must reach the executor-side Python workers: the kmeans
    # assignment kernel is a module-level closure, so cloudpickle ships a
    # module REFERENCE and the worker has to import the package itself
    # (driver-side sys.path.insert never propagates).
    env = dict(os.environ, PYTHONPATH="/root/repo")
    try:
        out = subprocess.run(
            ["python", "-c", code], capture_output=True, text=True,
            timeout=timeout, env=env,
        )
    except subprocess.TimeoutExpired:
        rec["error"] = f"timeout after {timeout}s"
        return rec
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            rec["sec"] = float(line.split()[1])
        elif line.startswith("VOLUME"):
            _, key, val = line.split()
            rec[key] = int(val)
    if "sec" not in rec:
        rec["error"] = out.stderr[-2000:]
    return rec


if __name__ == "__main__":
    emb8 = build_tiles(8, "/tmp/scale64/emb8_r9")
    emb64 = build_tiles(64, "/tmp/scale64/emb64_r9")
    legs = [
        # n_blocks=None exercises the auto task-packing rule
        ("/root/testdata/sf0.1", 8, None),
        (emb8, 8, None),
        (emb8, 64, None),      # k scaled with the 8x growth
        (emb64, 8, None),      # fixed k: the G^2 mass leg
        (emb64, 512, None),    # k scaled with the 64x growth
        (emb64, 512, 4),       # A/B: over-tasked blocking at large k
    ]
    results = []
    for sf, k, nb in legs:
        rec = run(sf, k, nb)
        print(json.dumps(rec), flush=True)
        results.append(rec)
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "results_semdedup_r9.json",
    )
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
        fh.write("\n")
