"""Round-9 deep-scale rung: SQ8 asymmetric ANN.

`sq8_topk`'s scale claim: candidates stream as int8 codes (4× fewer
bytes than float32 at dim 64), the kernel keeps batch-local top-k, and
nothing pairwise survives past it — so cost is one code scan plus
q×rows×dim BLAS-class arithmetic. Legs at 1×/8×/64× embedding tiles
(query set = vec_id % 100, so queries scale with the corpus too: the
pair mass grows G² — 20 queries × 2k rows at sf0.1, 1,280 × 128k at
64× — which is what makes the per-batch top-k cut matter).

Protocol: fresh JVM per leg, bench warmup, noop-sink timing; volume
drivers (query rows, candidate rows) in the same JVM.
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
spark = get_spark("scale-sq8-r9")
import bench
bench.SF_DIR = "/root/testdata/sf0.1"
bench.warmup(spark)
sf = "{sf}"

from consent_based_conversion_adjustments_spark.operators.quantize import sq8_topk

emb = spark.read.parquet(sf + "/embeddings.parquet")
queries = emb.filter(F.col("vec_id") % 100 == 0).select(
    F.col("vec_id").alias("query_id"), "embedding")
cands = emb.select(F.col("vec_id").alias("cand_id"), "embedding")

t0 = time.time()
out = sq8_topk(queries, cands, 5, max_query_rows=100000)
out.write.format("noop").mode("overwrite").save()
print("RESULT %.3f" % (time.time() - t0), flush=True)
print("VOLUME n_queries", queries.count(), flush=True)
print("VOLUME n_candidates", cands.count(), flush=True)
print("VOLUME out_rows", out.count(), flush=True)
'''


def run(sf, timeout=3600):
    code = SNIPPET.format(sf=sf)
    rec = {"sf": sf}
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
    results = []
    for sf in ("/root/testdata/sf0.1", emb8, emb64):
        rec = run(sf)
        print(json.dumps(rec), flush=True)
        results.append(rec)
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "results_sq8_r9.json",
    )
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
        fh.write("\n")
