"""Round-10 rung: recall-vs-mass tradeoff of LSH OR-amplification.

Round 9 established the bucket-density law (candidate mass M ≈
|P|·|B|·n_tables / 2^p) and showed p=10 restores linear growth at the
64x embeddings rung (209.6 → 10.5 s for the kNN-LSH leg). Raising p
cuts per-table recall as collision^p; the LSH docstrings' answer is to
re-buy recall with more tables (OR-amplification: a pair is a candidate
if it collides in ANY table, P = 1 − (1 − match^p)^tables). This script
MEASURES that trade: for each (p, n_tables) config it times the full
64x kNN-LSH join (fresh JVM, bench warmup, noop sink), counts the
candidate mass, and computes recall@k against an exact ground truth.

Ground truth: exact euclidean top-k (self excluded) for a ~1,000-probe
sample against the FULL build side — computed once per corpus with a
chunked BLAS mapInPandas pass (the full-corpus exact join is infeasible
at 64x: 1.28M² pairs) and cached as parquet; each config's recall is
|lsh ∩ exact| / |exact| over the sampled probes. The LSH leg runs with
k+1 and drops self-pairs so both sides rank k non-self neighbors.

Run on an IDLE host:  python tools/scale/run_lsh_recall_r10.py
Results: tools/scale/results_lsh_recall_r10.json (+ PERF.md table).
"""

import json
import os
import subprocess

from run_scale_r9 import build_tiles

K = 5  # FLAGSHIP_K

EXACT_SNIPPET = r'''
import sys, numpy as np
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from pyspark.sql import Window
from consent_based_conversion_adjustments_spark.session import get_spark
spark = get_spark("lsh-exact")
sf, sample_mod, k, out_path = "{sf}", {sample_mod}, {k}, "{out_path}"

emb = spark.read.parquet(sf + "/embeddings.parquet")
feats = emb.select(
    "vec_id",
    F.transform("embedding", lambda x: x.cast("double")).alias("features"),
)
qrows = feats.filter(F.col("vec_id") % sample_mod == 0).collect()
qids = np.asarray([r["vec_id"] for r in qrows])
Qm = np.asarray([list(r["features"]) for r in qrows], dtype=np.float64)
qn = (Qm * Qm).sum(axis=1)

def local_topk(batches):
    import pandas as pd
    for pdf in batches:
        if not len(pdf):
            continue
        C = np.array(pdf["features"].tolist(), dtype=np.float64)
        bids = pdf["vec_id"].to_numpy()
        D = qn[:, None] + (C * C).sum(axis=1)[None, :] - 2.0 * (Qm @ C.T)
        outs = []
        for qi in range(len(qids)):
            idx = np.nonzero(bids != qids[qi])[0]
            if not len(idx):
                continue
            order = np.lexsort((bids[idx], D[qi, idx]))[:k]
            sel = idx[order]
            outs.append(pd.DataFrame({{
                "probe_id": qids[qi], "consent_id": bids[sel],
                "sq_dist": D[qi, sel]}}))
        if outs:
            yield pd.concat(outs)

local = feats.mapInPandas(
    local_topk, "probe_id long, consent_id long, sq_dist double")
w = Window.partitionBy("probe_id").orderBy(
    F.col("sq_dist"), F.col("consent_id"))
exact = (local.withColumn("rn", F.row_number().over(w))
         .filter(F.col("rn") <= k).select("probe_id", "consent_id"))
exact.write.mode("overwrite").parquet(out_path)
print("EXACT_ROWS", spark.read.parquet(out_path).count(), flush=True)
'''

LEG_SNIPPET = r'''
import time, sys
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from consent_based_conversion_adjustments_spark.session import get_spark
spark = get_spark("lsh-recall")
import bench
bench.SF_DIR = "/root/testdata/sf0.1"
bench.warmup(spark)
sf, n_planes, n_tables = "{sf}", {n_planes}, {n_tables}
sample_mod, k, exact_path = {sample_mod}, {k}, "{exact_path}"

emb = spark.read.parquet(sf + "/embeddings.parquet")
feats = emb.select(
    "vec_id",
    F.transform("embedding", lambda x: x.cast("double")).alias("features"),
)
probe = feats.select(F.col("vec_id").alias("probe_id"), "features")
build = feats.select(F.col("vec_id").alias("consent_id"), "features")

from consent_based_conversion_adjustments_spark.operators.similarity_join import (
    knn_join_lsh)
kw = dict(metric="euclidean", probe_id="probe_id", build_id="consent_id",
          n_planes=n_planes, n_tables=n_tables)
t0 = time.time()
out = knn_join_lsh(probe, build, k + 1, 64, **kw).filter(
    F.col("probe_id") != F.col("consent_id"))
out.write.format("noop").mode("overwrite").save()
print("RESULT %.3f" % (time.time() - t0), flush=True)

# untimed: recall vs cached exact sample + candidate-mass count
exact = spark.read.parquet(exact_path)
lsh_sample = out.filter(F.col("probe_id") % sample_mod == 0).select(
    "probe_id", "consent_id")
hits = lsh_sample.join(exact, ["probe_id", "consent_id"]).count()
n_exact = exact.count()
print("VOLUME hits", hits, flush=True)
print("VOLUME n_exact", n_exact, flush=True)

from consent_based_conversion_adjustments_spark.operators.similarity_search import (
    _signature_array)
sig = _signature_array("features", dim=64, n_planes=n_planes,
                       n_tables=n_tables)
def side_counts(df, idc):
    return (df.select(F.col(idc), F.posexplode(sig).alias(
                "table_id", "lsh_sig"))
              .groupBy("table_id", "lsh_sig").count())
p = side_counts(probe, "probe_id").withColumnRenamed("count", "pc")
b = side_counts(build, "consent_id").withColumnRenamed("count", "bc")
m = p.join(b, ["table_id", "lsh_sig"]).select(
    (F.col("pc") * F.col("bc")).alias("mass"))
row = m.agg(F.sum("mass").alias("total")).first()
print("VOLUME candidate_mass", row["total"], flush=True)
'''


def run_snippet(code: str, timeout: int = 2400) -> dict:
    rec: dict = {}
    try:
        out = subprocess.run(
            ["python", "-c", code], capture_output=True, text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return {"error": f"timeout after {timeout}s"}
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            rec["sec"] = float(line.split()[1])
        elif line.startswith("VOLUME"):
            _, key, val = line.split()
            rec[key] = int(val)
        elif line.startswith("EXACT_ROWS"):
            rec["exact_rows"] = int(line.split()[1])
    if not rec:
        rec["error"] = out.stderr[-2000:]
    return rec


def ensure_exact(sf: str, sample_mod: int, tag: str) -> str:
    path = f"/tmp/scale64/exact_knn_{tag}"
    if not os.path.exists(path):
        rec = run_snippet(
            EXACT_SNIPPET.format(
                sf=sf, sample_mod=sample_mod, k=K, out_path=path
            )
        )
        print(f"exact[{tag}]: {rec}", flush=True)
        if "error" in rec:
            raise RuntimeError(rec["error"])
    return path


if __name__ == "__main__":
    emb64 = build_tiles(64, "/tmp/scale64/emb64_r9")
    sf01 = "/root/testdata/sf0.1"
    exact01 = ensure_exact(sf01, 20, "sf01")
    exact64 = ensure_exact(emb64, 1280, "emb64")
    legs = [
        # (sf_dir, exact, sample_mod, n_planes, n_tables)
        (sf01, exact01, 20, 4, 8),        # shipped default at sf0.1
        (emb64, exact64, 1280, 10, 4),    # 64x: p scaled, tables cut
        (emb64, exact64, 1280, 10, 8),    # 64x: p scaled, default tables
        (emb64, exact64, 1280, 10, 16),   # 64x: recall re-bought w/ tables
        (emb64, exact64, 1280, 12, 16),   # 64x: higher p, same tables
    ]
    rows = []
    for sf, exact, mod, planes, tables in legs:
        rec = run_snippet(
            LEG_SNIPPET.format(
                sf=sf, n_planes=planes, n_tables=tables,
                sample_mod=mod, k=K, exact_path=exact,
            )
        )
        rec.update(
            sf=sf, n_planes=planes, n_tables=tables,
            recall=(
                round(rec["hits"] / rec["n_exact"], 4)
                if rec.get("n_exact")
                else None
            ),
        )
        print(json.dumps(rec), flush=True)
        rows.append(rec)
        with open(
            "/root/repo/tools/scale/results_lsh_recall_r10.json", "w"
        ) as f:
            json.dump(rows, f, indent=1)
