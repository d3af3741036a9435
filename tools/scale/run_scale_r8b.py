"""Second round-8 rung: the streaming attribution store, the general
as-of join, EWMA, vocab growth, and the single-agg statistics at 64x.

Tiles: ev64 / docs64p (run_scale_r8.build_tiles), li64 (lineitem with
retiled part/supp keys, run_scale_r7b shape), ord64 (orders id-shifted —
built here; o_orderkey/custkey shifted per tile, priorities/status kept
so the grouping-sets/Benford distributions stay realistic).

Protocol: fresh JVM per leg, disk local dirs, noop sink.
Results -> tools/scale/results_r8b.json.
"""
import json
import os
import subprocess
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_ord64() -> None:
    out = "/tmp/scale64/ord64"
    os.makedirs(out, exist_ok=True)
    path = out + "/orders.parquet"
    if not os.path.exists(path):
        con = duckdb.connect()
        src = "/root/testdata/sf0.1/orders.parquet"
        ok_span, ck_span = con.execute(
            f"SELECT max(o_orderkey) + 1, max(o_custkey) + 1 FROM '{src}'"
        ).fetchone()
        tiles = ", ".join(str(t) for t in range(64))
        con.execute(
            f"""
COPY (
  SELECT o.* REPLACE (
    o.o_orderkey + t.tile * {ok_span} AS o_orderkey,
    o.o_custkey + t.tile * {ck_span} AS o_custkey)
  FROM '{src}' o CROSS JOIN (SELECT unnest([{tiles}]) AS tile) t
) TO '{path}' (FORMAT parquet)
"""
        )


SNIPPET = r'''
import time, sys
sys.path.insert(0, "/root/repo")
from consent_based_conversion_adjustments_spark.session import get_spark
spark = get_spark("scale-r8b")
import bench
bench.SF_DIR = "/root/testdata/sf0.1"
bench.warmup(spark)
import __spark_entry__ as e
name, sf = "{name}", "{sf}"
fn = e.queries()[name]
t0 = time.time()
fn(spark, sf).write.format("noop").mode("overwrite").save()
print("RESULT %.3f" % (time.time() - t0))
print("VOLUME out_rows", fn(spark, sf).count())
'''


def run(name: str, sf: str) -> dict:
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


LEGS = [
    ("streaming_attribution_rounds", "/root/testdata/sf0.1"),
    ("streaming_attribution_rounds", "/tmp/scale64/ev64"),
    ("events_next_purchase", "/root/testdata/sf0.1"),
    ("events_next_purchase", "/tmp/scale64/ev64"),
    ("events_value_ewma", "/root/testdata/sf0.1"),
    ("events_value_ewma", "/tmp/scale64/ev64"),
    ("events_funnel_windowed", "/root/testdata/sf0.1"),
    ("events_funnel_windowed", "/tmp/scale64/ev64"),
    ("corpus_vocab_growth", "/root/testdata/sf0.1"),
    ("corpus_vocab_growth", "/tmp/scale64/docs64p"),
    ("lineitem_correlation_matrix", "/root/testdata/sf0.1"),
    ("lineitem_correlation_matrix", "/tmp/scale64/li64"),
    ("orders_benford_audit", "/root/testdata/sf0.1"),
    ("orders_benford_audit", "/tmp/scale64/ord64"),
    ("grouping_sets_order_stats", "/root/testdata/sf0.1"),
    ("grouping_sets_order_stats", "/tmp/scale64/ord64"),
]

if __name__ == "__main__":
    from run_scale_r7b import build_li64
    from run_scale_r8 import build_tiles

    build_tiles()
    build_li64()
    build_ord64()
    rows = []
    for name, sf in LEGS:
        rec = run(name, sf)
        print(json.dumps(rec), flush=True)
        rows.append(rec)
    with open("/root/repo/tools/scale/results_r8b.json", "w") as f:
        json.dump(rows, f, indent=1)
