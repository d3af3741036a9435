"""Round-9 deep-scale rung: the beyond-broadcast cocoa LSH paths.

`cocoa_knn_lsh_pairs` / `cocoa_radius_lsh_adjust` /
`cocoa_percentile_lsh_adjust` are the engine's claim that the flagship
similarity join survives a build side that outgrows a broadcast
(similarity_join.py knn_join_lsh/radius_join_lsh/percentile_radius_lsh).
They have correctness oracles and sf0.1 bench rows; this script adds the
8x / 64x legs plus the bucket-density law those plans live or die by:

    per-table candidate mass  M = sum over signatures |P_sig|*|B_sig|
    uniform-occupancy law     M ~ |P|*|B| / 2^n_planes

so at fixed n_planes a Gx data growth costs ~G^2 in candidate mass, and
restoring linear growth requires raising n_planes by log2(G) (recall is
then re-bought with n_tables — OR-amplification). The A/B leg measures
exactly that: 64x with the shipped defaults (n_planes=4) vs 64x with
n_planes scaled (+6 = log2(64)).

Protocol (matches run_scale_r7/r8): each (query, scale, variant) in a
fresh JVM, bench warmup, noop-sink timing; volume drivers (probe/build
rows, per-table candidate mass, output rows) counted in the same JVM.
64x corpus: vec_id-offset tiles of sf0.1 embeddings with a per-tile
dimension roll (norm-preserving, so radii keep their meaning).
"""

import json
import os
import subprocess

SNIPPET = r'''
import time, sys
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from consent_based_conversion_adjustments_spark.session import get_spark
spark = get_spark("scale-r9")
import bench
bench.SF_DIR = "/root/testdata/sf0.1"
bench.warmup(spark)
name, sf, n_planes, n_tables = "{name}", "{sf}", {n_planes}, {n_tables}

emb = spark.read.parquet(sf + "/embeddings.parquet")
feats = emb.select(
    "vec_id",
    F.transform("embedding", lambda x: x.cast("double")).alias("features"),
    (F.col("vec_id") % 97 + 1).cast("double").alias("conversion_value"),
)
if name == "cocoa_knn_lsh_pairs":
    probe = feats.select(F.col("vec_id").alias("probe_id"), "features")
    build = feats.select(F.col("vec_id").alias("consent_id"), "features")
else:
    probe = feats.filter(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("probe_id"), "features", "conversion_value")
    build = feats.filter(F.col("vec_id") % 5 != 0).select(
        F.col("vec_id").alias("consent_id"), "features", "conversion_value")

from consent_based_conversion_adjustments_spark.operators.similarity_join import (
    knn_join_lsh, radius_join_lsh, percentile_radius_lsh)
from consent_based_conversion_adjustments_spark.plans.cocoa_queries import (
    _lsh_adjust_tail, FLAGSHIP_K, PERCENTILE)
from consent_based_conversion_adjustments_spark.functions.rounding import (
    stable_round)

kw = dict(metric="euclidean", probe_id="probe_id", build_id="consent_id",
          n_planes=n_planes, n_tables=n_tables)
t0 = time.time()
if name == "cocoa_knn_lsh_pairs":
    out = knn_join_lsh(probe, build, FLAGSHIP_K, 64, **kw)
    out = out.filter(F.col("probe_id") != F.col("consent_id")).select(
        "probe_id", "consent_id", stable_round("distance", 6).alias("distance"))
elif name == "cocoa_radius_lsh_adjust":
    pairs = radius_join_lsh(probe.select("probe_id", "features"),
                            build.select("consent_id", "features"),
                            1.2, 64, **kw)
    out = _lsh_adjust_tail(probe, build, pairs)
elif name == "cocoa_percentile_lsh_adjust":
    radius = percentile_radius_lsh(probe.select("probe_id", "features"),
                                   build.select("consent_id", "features"),
                                   PERCENTILE, 64, **kw)
    pairs = radius_join_lsh(probe.select("probe_id", "features"),
                            build.select("consent_id", "features"),
                            radius, 64, **kw)
    out = _lsh_adjust_tail(probe, build, pairs)
out.write.format("noop").mode("overwrite").save()
print("RESULT %.3f" % (time.time() - t0), flush=True)

# volume drivers, same JVM: rows per side, per-table candidate mass,
# hottest bucket, output rows
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
row = m.agg(F.sum("mass").alias("total"), F.max("mass").alias("hot")).first()
print("VOLUME probe_rows", probe.count(), flush=True)
print("VOLUME build_rows", build.count(), flush=True)
print("VOLUME candidate_mass", row["total"], flush=True)
print("VOLUME hottest_bucket_mass", row["hot"], flush=True)
print("VOLUME out_rows", out.count(), flush=True)
'''


def run(name, sf, n_planes=4, n_tables=8, timeout=3600):
    code = SNIPPET.format(
        name=name, sf=sf, n_planes=n_planes, n_tables=n_tables
    )
    rec = {"name": name, "sf": sf, "n_planes": n_planes,
           "n_tables": n_tables}
    try:
        out = subprocess.run(
            ["python", "-c", code], capture_output=True, text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired as exc:
        rec["error"] = f"timeout after {timeout}s"
        for line in (exc.stdout or b"").decode(errors="replace").splitlines():
            if line.startswith("RESULT"):
                rec["sec"] = float(line.split()[1])
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


def build_tiles(tiles: int, out_dir: str) -> str:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    path = out_dir + "/embeddings.parquet"
    if not os.path.exists(path):
        con = duckdb.connect()
        src = "/root/testdata/sf0.1/embeddings.parquet"
        n = con.execute(f"SELECT COUNT(*) FROM '{src}'").fetchone()[0]
        ts = ", ".join(str(t) for t in range(tiles))
        con.execute(
            f"""
COPY (
  SELECT v.vec_id + t.tile * {n} AS vec_id,
         list_concat(v.embedding[(t.tile % 64) + 1 :],
                     v.embedding[1 : t.tile % 64]) AS embedding,
         v.label
  FROM '{src}' v CROSS JOIN (SELECT unnest([{ts}]) AS tile) t
) TO '{path}' (FORMAT parquet)
"""
        )
    return out_dir


if __name__ == "__main__":
    emb8 = build_tiles(8, "/tmp/scale64/emb8_r9")
    emb64 = build_tiles(64, "/tmp/scale64/emb64_r9")
    legs = [
        # (name, sf_dir, n_planes, n_tables)
        ("cocoa_knn_lsh_pairs", "/root/testdata/sf0.1", 4, 8),
        ("cocoa_knn_lsh_pairs", emb8, 4, 8),
        ("cocoa_knn_lsh_pairs", emb64, 4, 8),
        ("cocoa_knn_lsh_pairs", emb64, 10, 8),   # planes scaled +log2(64)
        ("cocoa_radius_lsh_adjust", "/root/testdata/sf0.1", 4, 8),
        ("cocoa_radius_lsh_adjust", emb8, 4, 8),
        ("cocoa_radius_lsh_adjust", emb64, 4, 8),
        ("cocoa_radius_lsh_adjust", emb64, 10, 8),
        ("cocoa_percentile_lsh_adjust", "/root/testdata/sf0.1", 4, 8),
        ("cocoa_percentile_lsh_adjust", emb64, 10, 8),
    ]
    rows = []
    for name, sf, planes, tables in legs:
        rec = run(name, sf, planes, tables)
        print(json.dumps(rec), flush=True)
        rows.append(rec)
        with open("/root/repo/tools/scale/results_r9.json", "w") as f:
            json.dump(rows, f, indent=1)
