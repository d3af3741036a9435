"""Round-9 deep-scale rung: the composed pretraining cleaning pipeline.

`corpus_pretrain_ids` chains lang-ID → quality → exact fingerprint dedup
→ MinHash near-dup as ONE declarative plan. This rung scales it with
IDENTICAL-COPY tiles (doc_id offset only, text unchanged) — the
re-crawl/re-fetch regime where most of a 64× raw corpus is exact
duplicates: the scan-bound gates (tokenize, lang, quality, fingerprint)
must do 64× the work, while exact dedup collapses the corpus back to
~1× before the (quadratic-prone) MinHash stage ever sees it. That
ordering is the pipeline's scale thesis: the cheap linear stages shield
the expensive one.

(The salted tiles used by the dedup-only rungs are wrong HERE: salting
every token destroys the stopword signal, so the language gate would
drop the entire corpus. The MinHash stage's own 64× behavior is already
pinned by the dedup_minhash rung.)

Protocol: fresh JVM per leg, bench warmup, noop-sink timing for
corpus_pretrain_ids; funnel counts (the volume drivers) from
corpus_pretrain_funnel in the same JVM.
"""

import json
import os
import subprocess

SNIPPET = r'''
import time, sys
sys.path.insert(0, "/root/repo")
from consent_based_conversion_adjustments_spark.session import get_spark
spark = get_spark("scale-pipeline-r9")
import bench
bench.SF_DIR = "/root/testdata/sf0.1"
bench.warmup(spark)
sf = "{sf}"

from consent_based_conversion_adjustments_spark.plans.data_queries import (
    corpus_pretrain_ids, corpus_pretrain_funnel)

t0 = time.time()
corpus_pretrain_ids(spark, sf).write.format("noop").mode("overwrite").save()
print("RESULT %.3f" % (time.time() - t0), flush=True)
for r in corpus_pretrain_funnel(spark, sf).collect():
    print("VOLUME", r["stage"], r["n_docs"], flush=True)
'''


def build_copy_tiles(tiles: int, out_dir: str) -> str:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    path = out_dir + "/documents.parquet"
    if not os.path.exists(path):
        con = duckdb.connect()
        src = "/root/testdata/sf0.1/documents.parquet"
        n = con.execute(f"SELECT COUNT(*) FROM '{src}'").fetchone()[0]
        ts = ", ".join(str(t) for t in range(tiles))
        con.execute(
            f"""
COPY (
  SELECT d.doc_id + t.tile * {n} AS doc_id, d.text, d.lang, d.source,
         d.n_chars
  FROM '{src}' d CROSS JOIN (SELECT unnest([{ts}]) AS tile) t
) TO '{path}' (FORMAT parquet)
"""
        )
    return out_dir


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
    docs8 = build_copy_tiles(8, "/tmp/scale64/docs8_copy_r9")
    docs64 = build_copy_tiles(64, "/tmp/scale64/docs64_copy_r9")
    results = []
    for sf in ("/root/testdata/sf0.1", docs8, docs64):
        rec = run(sf)
        print(json.dumps(rec), flush=True)
        results.append(rec)
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "results_pipeline_r9.json",
    )
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
        fh.write("\n")
