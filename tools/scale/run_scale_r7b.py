"""Deep-scale rung for the round-7b operators (BPE, LM perplexity,
Z-order).

- `bpe_merges` / `doc_lm_perplexity` on sf0.1 and the 64x vocabulary-
  salted tiles (tile64.py). The salt bijection multiplies the DISTINCT
  vocabulary ~64x (every word gains a per-tile variant) — precisely the
  axis BPE training cost scales on (per-round work is proportional to
  the vocab table, not the corpus) and the axis the LM's model tables
  grow on. Corpus token positions also grow 64x (the LM's join side).
- `zorder_pruning_gain` on sf0.1 lineitem and a 64x key-offset tile
  (each tile shifts l_partkey/l_suppkey by tile*span so the key space
  also grows 64x — the bucketing math must stay exact): stateless map +
  one hash agg, expected ~linear.

Protocol (matches run_64x*.py / run_scale_r7.py): each (query, scale)
in a fresh JVM, result to the noop sink, then the same JVM counts the
volume drivers. Results → tools/scale/results_r7b.json.
"""
import json
import os
import subprocess

SNIPPET = r'''
import time, sys
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from consent_based_conversion_adjustments_spark.session import get_spark
spark = get_spark("scale-r7b")
import bench
bench.SF_DIR = "/root/testdata/sf0.1"
bench.warmup(spark)
name, sf = "{name}", "{sf}"
import __spark_entry__ as e
fn = e.queries()[name]
t0 = time.time()
fn(spark, sf).write.format("noop").mode("overwrite").save()
print("RESULT %.3f" % (time.time() - t0))
if name == "zorder_pruning_gain":
    li = spark.read.parquet(sf + "/lineitem.parquet")
    print("VOLUME rows", li.count())
else:
    from consent_based_conversion_adjustments_spark.operators.tokenizer import (
        word_vocab)
    docs = spark.read.parquet(sf + "/documents.parquet")
    v = word_vocab(docs).select(
        F.count(F.lit(1)).alias("w"),
        F.sum(F.size("syms")).alias("s"),
        F.sum("n").alias("t")).first()
    print("VOLUME vocab_words", v.w)
    print("VOLUME vocab_chars", v.s)
    print("VOLUME corpus_tokens", v.t)
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


def build_li64() -> str:
    import duckdb

    out = "/tmp/scale64/li64"
    os.makedirs(out, exist_ok=True)
    path = out + "/lineitem.parquet"
    if not os.path.exists(path):
        con = duckdb.connect()
        src = "/root/testdata/sf0.1/lineitem.parquet"
        pk_span, sk_span = con.execute(
            f"SELECT max(l_partkey), max(l_suppkey) FROM '{src}'"
        ).fetchone()
        tiles = ", ".join(str(t) for t in range(64))
        con.execute(
            f"""
COPY (
  SELECT l.* REPLACE (
    l.l_partkey + t.tile * {pk_span} AS l_partkey,
    l.l_suppkey + t.tile * {sk_span} AS l_suppkey)
  FROM '{src}' l CROSS JOIN (SELECT unnest([{tiles}]) AS tile) t
) TO '{path}' (FORMAT parquet)
"""
        )
    return out


if __name__ == "__main__":
    li64 = build_li64()
    rows = []
    for name, sf in [
        ("bpe_merges", "/root/testdata/sf0.1"),
        ("bpe_merges", "/tmp/scale64/sf6.4"),
        ("doc_lm_perplexity", "/root/testdata/sf0.1"),
        ("doc_lm_perplexity", "/tmp/scale64/sf6.4"),
        ("zorder_pruning_gain", "/root/testdata/sf0.1"),
        ("zorder_pruning_gain", li64),
    ]:
        rec = run(name, sf)
        print(json.dumps(rec))
        rows.append(rec)
    with open("/root/repo/tools/scale/results_r7b.json", "w") as f:
        json.dump(rows, f, indent=1)
