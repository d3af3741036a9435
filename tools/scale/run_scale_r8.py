"""Deep-scale rung for the round-8 operators (behavioral analytics +
distribution statistics + the stream-stream join).

Tiles (rebuilt if /tmp was wiped; same construction as run_scale_r7d):
- ev64: 64x events, user space grows 64x, per-user history constant —
  attribution pairs and audience rows should scale ~linearly.
- docs64p: 64x documents, plain id-shift tiles (text/source unchanged) —
  JS/chi2 token counts scale 64x uniformly; vocab constant, so the
  bounded-state claim (work linear in tokens, state = vocab) is the
  thing under test.

Protocol: fresh JVM per leg, disk local dirs, noop sink.
Results -> tools/scale/results_r8.json.
"""
import json
import os
import subprocess

import duckdb


def build_tiles() -> None:
    con = duckdb.connect()
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


SNIPPET = r'''
import time, sys
sys.path.insert(0, "/root/repo")
from consent_based_conversion_adjustments_spark.session import get_spark
spark = get_spark("scale-r8")
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
    ("campaign_attribution", "/root/testdata/sf0.1"),
    ("campaign_attribution", "/tmp/scale64/ev64"),
    ("audience_overlap_matrix", "/root/testdata/sf0.1"),
    ("audience_overlap_matrix", "/tmp/scale64/ev64"),
    ("retained_users_window", "/root/testdata/sf0.1"),
    ("retained_users_window", "/tmp/scale64/ev64"),
    ("retained_users_window_theta", "/root/testdata/sf0.1"),
    ("retained_users_window_theta", "/tmp/scale64/ev64"),
    ("events_value_trend", "/root/testdata/sf0.1"),
    ("events_value_trend", "/tmp/scale64/ev64"),
    ("streaming_click_purchase_join", "/root/testdata/sf0.1"),
    ("streaming_click_purchase_join", "/tmp/scale64/ev64"),
    ("source_token_js", "/root/testdata/sf0.1"),
    ("source_token_js", "/tmp/scale64/docs64p"),
    ("token_source_chi2", "/root/testdata/sf0.1"),
    ("token_source_chi2", "/tmp/scale64/docs64p"),
]

if __name__ == "__main__":
    build_tiles()
    rows = []
    for name, sf in LEGS:
        rec = run(name, sf)
        print(json.dumps(rec), flush=True)
        rows.append(rec)
    with open("/root/repo/tools/scale/results_r8.json", "w") as f:
        json.dump(rows, f, indent=1)
