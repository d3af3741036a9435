"""Deep-scale rung for the second round-7b batch (PageRank, skyline,
histogram/cardinality).

- `neardup_pagerank` on sf0.1 and the 64x salted tiles: the dup graph
  grows 64x (within-tile structure preserved, cross-tile edges zero), so
  the per-round equi-join + sum scales on edge volume — the claimed law.
- `skyline_2d` directly over lineitem (minimize l_extendedprice,
  maximize l_quantity) at sf0.1 and the 64x key-offset tiles (li64):
  profile-collapse means the iterative part runs over distinct
  min-values, not rows.
- `orders_custkey_histogram`-shaped stats over li64's l_partkey: one
  percentile agg + one stateless map + one hash agg — scan-bound.

Protocol matches run_scale_r7b.py (fresh JVM, noop sink, volume
counters). Results → tools/scale/results_r7c.json.
"""
import json
import subprocess

SNIPPET = r'''
import time, sys
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from consent_based_conversion_adjustments_spark.session import get_spark
spark = get_spark("scale-r7c")
import bench
bench.SF_DIR = "/root/testdata/sf0.1"
bench.warmup(spark)
name, sf = "{name}", "{sf}"
if name == "neardup_pagerank":
    import __spark_entry__ as e
    fn = e.queries()[name]
    t0 = time.time()
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    print("RESULT %.3f" % (time.time() - t0))
    from consent_based_conversion_adjustments_spark.operators import dedup as D
    docs = spark.read.parquet(sf + "/documents.parquet")
    pairs = D.minhash_neardup(docs, "text", "doc_id", threshold=0.8)
    print("VOLUME edges", pairs.count())
elif name == "lineitem_skyline":
    from consent_based_conversion_adjustments_spark.operators.skyline import (
        skyline_2d)
    li = spark.read.parquet(sf + "/lineitem.parquet")
    t0 = time.time()
    skyline_2d(li, "l_extendedprice", "l_quantity").write.format(
        "noop").mode("overwrite").save()
    print("RESULT %.3f" % (time.time() - t0))
    print("VOLUME rows", li.count())
    print("VOLUME profile", li.select("l_extendedprice").distinct().count())
else:  # lineitem_partkey_histogram
    from consent_based_conversion_adjustments_spark.operators import (
        colstats as S)
    li = spark.read.parquet(sf + "/lineitem.parquet")
    t0 = time.time()
    bounds = S.equi_depth_boundaries(li, "l_partkey", 8)
    S.equi_depth_histogram(li, "l_partkey", bounds).write.format(
        "noop").mode("overwrite").save()
    print("RESULT %.3f" % (time.time() - t0))
    print("VOLUME rows", li.count())
'''


def run(name: str, sf: str) -> dict:
    out = subprocess.run(
        ["python", "-c", SNIPPET.format(name=name, sf=sf)],
        capture_output=True,
        text=True,
        timeout=3600,
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


if __name__ == "__main__":
    rows = []
    for name, sf in [
        ("neardup_pagerank", "/root/testdata/sf0.1"),
        ("neardup_pagerank", "/tmp/scale64/sf6.4"),
        ("lineitem_skyline", "/root/testdata/sf0.1"),
        ("lineitem_skyline", "/tmp/scale64/li64"),
        ("lineitem_partkey_histogram", "/root/testdata/sf0.1"),
        ("lineitem_partkey_histogram", "/tmp/scale64/li64"),
    ]:
        rec = run(name, sf)
        print(json.dumps(rec))
        rows.append(rec)
    with open("/root/repo/tools/scale/results_r7c.json", "w") as f:
        json.dump(rows, f, indent=1)
