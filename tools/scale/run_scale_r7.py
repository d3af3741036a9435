"""Round-7 deep-scale rung for the new operators.

- `dup_spans` / `dup_span_scrub` at sf0.1 and on the 64x vocabulary-salted
  tiles (tile64.py): the salt bijection keeps within-tile duplicate
  structure exact and cross-tile shingles disjoint, so duplicated-shingle
  volume grows linearly with data — the regime the operators' "linear in
  corpus tokens" claim describes.
- `kmeans_clusters` at sf0.1 and on 64x tiled embeddings (vec_id-offset
  copies with a deterministic per-tile dimension roll so tiles are not
  byte-identical): the fit is assignment passes + one narrow agg per
  iteration, so time should track rows, with the measured fixed
  driver-side analysis cost (~2 s/pass) amortizing away.

Protocol (matches run_64x*.py): each (query, scale) in a fresh JVM,
result written to the noop sink, then the same JVM counts the volume
drivers (shingle positions / duplicated positions / spans; embedding
rows) so per-unit throughput can be reported.
"""
import json
import subprocess

SNIPPET = r'''
import time, sys
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from consent_based_conversion_adjustments_spark.session import get_spark
spark = get_spark("scale-r7")
import bench
bench.SF_DIR = "/root/testdata/sf0.1"
bench.warmup(spark)
name, sf = "{name}", "{sf}"
if name == "kmeans_clusters":
    from consent_based_conversion_adjustments_spark.operators.cluster import (
        kmeans_assign)
    emb = spark.read.parquet(sf + "/embeddings.parquet")
    t0 = time.time()
    kmeans_assign(emb, k=8, iters=3).write.format("noop").mode(
        "overwrite").save()
    print("RESULT %.3f" % (time.time() - t0))
    print("VOLUME rows", emb.count())
else:
    import __spark_entry__ as e
    fn = e.queries()[name]
    t0 = time.time()
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    print("RESULT %.3f" % (time.time() - t0))
    from consent_based_conversion_adjustments_spark.operators.dedup import (
        duplicate_spans)
    from consent_based_conversion_adjustments_spark.operators.text import (
        shingle_hashes)
    docs = spark.read.parquet(sf + "/documents.parquet")
    sh = docs.select(F.posexplode(shingle_hashes("text", 3)).alias(
        "pos", "sh"))
    print("VOLUME positions", sh.count())
    dup = sh.groupBy("sh").count().filter(F.col("count") >= 2)
    print("VOLUME dup_shingle_types", dup.count())
    print("VOLUME spans", duplicate_spans(
        docs, "text", "doc_id").count())
'''


def run(name: str, sf: str) -> dict:
    code = SNIPPET.format(name=name, sf=sf)
    out = subprocess.run(
        ["python", "-c", code], capture_output=True, text=True, timeout=3600
    )
    rec: dict = {"name": name, "sf": sf}
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            rec["sec"] = float(line.split()[1])
        elif line.startswith("VOLUME"):
            _, key, val = line.split()
            rec[key] = int(val)
    if "sec" not in rec:
        rec["error"] = out.stderr[-2000:]
    return rec


def build_emb64() -> str:
    import duckdb

    out = "/tmp/scale64/emb64"
    import os

    os.makedirs(out, exist_ok=True)
    path = out + "/embeddings.parquet"
    if not os.path.exists(path):
        con = duckdb.connect()
        src = "/root/testdata/sf0.1/embeddings.parquet"
        n = con.execute(f"SELECT COUNT(*) FROM '{src}'").fetchone()[0]
        tiles = ", ".join(str(t) for t in range(64))
        # roll each tile's vector by tile%dim positions: cheap, exact,
        # and keeps per-tile geometry (k-means cost is shape-independent)
        con.execute(
            f"""
COPY (
  SELECT v.vec_id + t.tile * {n} AS vec_id,
         list_concat(v.embedding[(t.tile % 64) + 1 :],
                     v.embedding[1 : t.tile % 64]) AS embedding,
         v.label
  FROM '{src}' v CROSS JOIN (SELECT unnest([{tiles}]) AS tile) t
) TO '{path}' (FORMAT parquet)
"""
        )
    return out


if __name__ == "__main__":
    emb64 = build_emb64()
    rows = []
    for name, sf in [
        ("dup_spans", "/root/testdata/sf0.1"),
        ("dup_spans", "/tmp/scale64/sf6.4"),
        ("dup_span_scrub", "/root/testdata/sf0.1"),
        ("dup_span_scrub", "/tmp/scale64/sf6.4"),
        ("kmeans_clusters", "/root/testdata/sf0.1"),
        ("kmeans_clusters", emb64),
    ]:
        rec = run(name, sf)
        print(json.dumps(rec))
        rows.append(rec)
    with open("/tmp/scale_r7.json", "w") as f:
        json.dump(rows, f, indent=1)
