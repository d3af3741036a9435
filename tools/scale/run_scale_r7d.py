"""Deep-scale rung for the round-7d operators (SNM dedup, SCD2, fuzzy
join, BM25, table diff).

Tile sets (built idempotently here, DuckDB):
- sf6.4 (existing): 64x vocabulary-salted documents — SNM's sort key and
  match structure are preserved within tiles, cross-tile Jaccard 0.
- docs64p (new): 64x PLAIN document tiles (id offset only, vocabulary
  unchanged) — the BM25 axis: tf/df/dl all grow 64x while the probe
  query stays fixed, the realistic retrieval-at-scale shape.
- ev64 (new): 64x events with per-tile user_id/event_id offsets — user
  count grows 64x, per-user history length constant (the SCD2 law:
  cost ∝ change-log volume, window state per key constant).
- sup64 (new): 64x suppliers with serial-number offsets — name
  format preserved, so the q-gram frequency skew (shared prefixes,
  repeated zeros) is the REAL adversarial shape at depth.
- li64 (existing): 64x key-offset lineitem for the table-diff rung;
  the CDC batch is synthesized in-query (10% quantity mutation, 5%
  deletes by key hash) so diff output grows linearly.

Protocol matches run_scale_r7b/c.py (fresh JVM per measurement, noop
sink, volume counters). Results -> tools/scale/results_r7d.json.
"""
import json
import os
import subprocess

import duckdb


def build_tiles() -> None:
    con = duckdb.connect()
    if not os.path.exists("/tmp/scale64/docs64p/documents.parquet"):
        os.makedirs("/tmp/scale64/docs64p", exist_ok=True)
        src = "/root/testdata/sf0.1/documents.parquet"
        n = con.execute(f"SELECT count(*) FROM '{src}'").fetchone()[0]
        con.execute(
            f"""
COPY (
  SELECT d.doc_id + t.tile * {n} AS doc_id, d.text, d.lang, d.source,
         d.n_chars
  FROM '{src}' d
  CROSS JOIN (SELECT unnest(range(64)) AS tile) t
) TO '/tmp/scale64/docs64p/documents.parquet' (FORMAT parquet)"""
        )
    if not os.path.exists("/tmp/scale64/ev64/events.parquet"):
        os.makedirs("/tmp/scale64/ev64", exist_ok=True)
        src = "/root/testdata/sf0.1/events.parquet"
        n, u = con.execute(
            f"SELECT count(*), max(user_id) + 1 FROM '{src}'"
        ).fetchone()
        con.execute(
            f"""
COPY (
  SELECT e.event_id + t.tile * {n} AS event_id, e.ts,
         e.user_id + t.tile * {u} AS user_id, e.event_type, e.value,
         e.props
  FROM '{src}' e
  CROSS JOIN (SELECT unnest(range(64)) AS tile) t
) TO '/tmp/scale64/ev64/events.parquet' (FORMAT parquet)"""
        )
    if not os.path.exists("/tmp/scale64/sup64/supplier.parquet"):
        os.makedirs("/tmp/scale64/sup64", exist_ok=True)
        src = "/root/testdata/sf0.1/supplier.parquet"
        n = con.execute(f"SELECT count(*) FROM '{src}'").fetchone()[0]
        con.execute(
            f"""
COPY (
  SELECT s.s_suppkey + t.tile * {n} AS s_suppkey,
         'Supplier#' || lpad(CAST(s.s_suppkey + t.tile * {n} AS VARCHAR),
                             9, '0') AS s_name,
         s.s_nationkey, s.s_acctbal
  FROM '{src}' s
  CROSS JOIN (SELECT unnest(range(64)) AS tile) t
) TO '/tmp/scale64/sup64/supplier.parquet' (FORMAT parquet)"""
        )


SNIPPET = r'''
import time, sys
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from consent_based_conversion_adjustments_spark.session import get_spark
spark = get_spark("scale-r7d")
import bench
bench.SF_DIR = "/root/testdata/sf0.1"
bench.warmup(spark)
name, sf = "{name}", "{sf}"
import __spark_entry__ as e
if name == "lineitem_table_diff":
    # the synthetic lineitem does NOT have unique (l_orderkey,
    # l_linenumber) — even at base sf0.1 only 457k of 600k are distinct
    # — and table_diff (like MERGE) requires key uniqueness per side, so
    # the diff runs on a materialized unique row id (written once; both
    # sides read the SAME table so ids agree row-for-row).
    import os
    from consent_based_conversion_adjustments_spark.operators.merge import (
        table_diff)
    rid_path = "/tmp/scale64/rid_" + sf.replace("/", "_")
    if not os.path.exists(rid_path):
        (spark.read.parquet(sf + "/lineitem.parquet")
         .withColumn("rid", F.monotonically_increasing_id())
         .write.mode("overwrite").parquet(rid_path))
    li = spark.read.parquet(rid_path)
    mutated = (
        li.filter(F.col("rid") % 20 != 1)
        .withColumn(
            "l_quantity",
            F.when(F.col("rid") % 10 == 0,
                   F.col("l_quantity") + 1).otherwise(F.col("l_quantity")),
        )
    )
    t0 = time.time()
    out = table_diff(li, mutated, ["rid"])
    out.write.format("noop").mode("overwrite").save()
    print("RESULT %.3f" % (time.time() - t0))
    print("VOLUME rows", li.count())
    print("VOLUME diff_rows", out.count())
else:
    fn = e.queries()[name]
    t0 = time.time()
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    print("RESULT %.3f" % (time.time() - t0))
    print("VOLUME out_rows", fn(spark, sf).count())
'''


def run(name: str, sf: str) -> dict:
    # scale-runner protocol (PERF.md round 6): 64x shuffle volume on
    # tmpfs local dirs competes with the JVM heap and identical legs
    # measured 261-746 s — pin local dirs to disk for scale rungs.
    env = dict(os.environ, SPARK_LOCAL_DIRS="/tmp/spark-local-scale")
    out = subprocess.run(
        ["python", "-u", "-c", SNIPPET.format(name=name, sf=sf)],
        capture_output=True,
        text=True,
        timeout=3600,
        env=env,
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
    import sys

    only = set(sys.argv[1:])
    build_tiles()
    rows = []
    if only and os.path.exists("/root/repo/tools/scale/results_r7d.json"):
        rows = [
            r
            for r in json.load(
                open("/root/repo/tools/scale/results_r7d.json")
            )
            if r["name"] not in only
        ]
    for name, sf in [
        ("dedup_sorted_neighborhood", "/root/testdata/sf0.1"),
        ("dedup_sorted_neighborhood", "/tmp/scale64/sf6.4"),
        ("user_state_history", "/root/testdata/sf0.1"),
        ("user_state_history", "/tmp/scale64/ev64"),
        ("supplier_fuzzy_matches", "/root/testdata/sf0.1"),
        ("supplier_fuzzy_matches", "/tmp/scale64/sup64"),
        ("bm25_search_topk", "/root/testdata/sf0.1"),
        ("bm25_search_topk", "/tmp/scale64/docs64p"),
        ("lineitem_table_diff", "/root/testdata/sf0.1"),
        ("lineitem_table_diff", "/tmp/scale64/li64"),
    ]:
        if only and name not in only:
            continue
        rec = run(name, sf)
        print(json.dumps(rec), flush=True)
        rows.append(rec)
    with open("/root/repo/tools/scale/results_r7d.json", "w") as f:
        json.dump(rows, f, indent=1)
