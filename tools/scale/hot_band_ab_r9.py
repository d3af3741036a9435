"""Round-9 adversarial hot-band study for banded-LSH dedup.

Corpus: the sf0.1 documents table with a planted IDENTITY CLIQUE — 10%
of docs replaced by reorderings of one fixed token set (equal token
sets ⇒ equal MinHash signatures ⇒ one band key shared by the whole
clique; the near-dup analog of the AQE skew A/B). This is the web-crawl
boilerplate shape the int64-fold docstring (dedup.minhash_candidates)
reasons about.

Law being pinned: the banding join materializes Σ over band-key groups
of |P_g|·|B_g| rows — an identity clique of size s costs s² through the
widest shuffle AND s² exact verifications, regardless of how cheap each
row is. The mitigation measured here is the identity-class cascade
(`minhash_neardup(collapse_identical=True)`): collapse equal token sets
to one representative first (one hash agg), band representatives, expand
rep pairs at the END (output-bound — any pair-emitting operator is
Ω(output) on a true clique; cluster-level consumers avoid even that).

Legs (fresh JVM each, bench warmup, noop sink):
  1. dedup_minhash            @ sf0.1 (control, no clique)
  2. dedup_minhash_collapsed  @ sf0.1 (cascade overhead on clean data)
  3. dedup_minhash            @ hot corpus (clique size = 10% of docs)
  4. dedup_minhash_collapsed  @ hot corpus
Volume drivers counted in the same JVM: docs, identity classes, clique
size, banded candidate rows (direct form), output pairs.
"""

import json
import os
import subprocess

SNIPPET = r'''
import time, sys
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from consent_based_conversion_adjustments_spark.session import get_spark
spark = get_spark("hotband-r9")
import bench
bench.SF_DIR = "/root/testdata/sf0.1"
bench.warmup(spark)
variant, sf = "{variant}", "{sf}"

import __spark_entry__ as e
fn = e._flat()[variant][0]
t0 = time.time()
out = fn(spark, sf)
out.write.format("noop").mode("overwrite").save()
print("RESULT %.3f" % (time.time() - t0), flush=True)

from consent_based_conversion_adjustments_spark.operators.dedup import (
    _token_hash_set, minhash_signatures, minhash_candidates)
docs = spark.read.parquet(sf + "/documents.parquet")
hashes = _token_hash_set(docs, "text", "doc_id")
classes = hashes.groupBy("tok_hashes").count()
print("VOLUME docs", docs.count(), flush=True)
print("VOLUME identity_classes", classes.count(), flush=True)
print("VOLUME largest_class", classes.agg(F.max("count")).first()[0],
      flush=True)
sigs = minhash_signatures(docs, "text", "doc_id")
print("VOLUME banded_candidates", minhash_candidates(sigs).count(),
      flush=True)
print("VOLUME out_pairs", out.count(), flush=True)
'''


def run(variant, sf, timeout=5400):
    code = SNIPPET.format(variant=variant, sf=sf)
    rec = {"variant": variant, "sf": sf}
    try:
        out = subprocess.run(
            ["python", "-c", code], capture_output=True, text=True,
            timeout=timeout,
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


def build_hot(base: str, frac_pct: int, tag: str) -> str:
    """``base``/documents.parquet with docs at doc_id % (100/frac) == 7
    replaced by a cyclic rotation of one fixed 40-token text: equal token
    SETS (one identity class, so every band key collides clique-wide) but
    distinct byte strings, so byte-exact collapse can't help."""
    import duckdb

    out_dir = f"/tmp/scale64/hotband_r9_{tag}"
    os.makedirs(out_dir, exist_ok=True)
    path = out_dir + "/documents.parquet"
    if not os.path.exists(path):
        con = duckdb.connect()
        src = base + "/documents.parquet"
        words = " ".join(f"boiler{i}" for i in range(40))
        step = 100 // frac_pct
        con.execute(
            f"""
COPY (
  WITH w AS (SELECT string_split('{words}', ' ') AS ws)
  SELECT * EXCLUDE (ws) REPLACE (
         CASE WHEN doc_id % {step} = 7 THEN
              list_aggregate(
                  list_concat(ws[((doc_id // {step}) % 40) + 1 :],
                              ws[1 : (doc_id // {step}) % 40]),
                  'string_agg', ' ')
         ELSE text END AS text)
  FROM '{src}', w
) TO '{path}' (FORMAT parquet)
"""
        )
    return out_dir


if __name__ == "__main__":
    hot01 = build_hot("/root/testdata/sf0.1", 10, "sf01_10pct")
    hot64 = build_hot("/tmp/scale64/docs64p", 1, "docs64_1pct")
    legs = [
        ("dedup_minhash", "/root/testdata/sf0.1"),
        ("dedup_minhash_collapsed", "/root/testdata/sf0.1"),
        ("dedup_minhash", hot01),              # clique 500 of 5,000
        ("dedup_minhash_collapsed", hot01),
        ("dedup_minhash", hot64),              # clique 3,200 of 320,000
        ("dedup_minhash_collapsed", hot64),
    ]
    rows = []
    for variant, sf in legs:
        rec = run(variant, sf)
        print(json.dumps(rec), flush=True)
        rows.append(rec)
        with open("/root/repo/tools/scale/results_hotband_r9.json", "w") as f:
            json.dump(rows, f, indent=1)
