"""Round-5 deep-scale rung: the dedup pipeline at 64x sf0.1 documents.

Tiles are vocabulary-salted (see /tmp/tile64.py): within-tile near-dup
structure identical to sf0.1, cross-tile Jaccard 0 — a natural sharded
corpus, so candidate volume should grow ~linearly (64x) with data. Each
(query, scale) pair runs in a fresh JVM. After the timed noop-write, the
same JVM counts candidates / verified pairs so the per-candidate
throughput exponent can be reported.
"""
import json
import subprocess
import sys

SNIPPET = r'''
import time, sys
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from consent_based_conversion_adjustments_spark.session import get_spark
from consent_based_conversion_adjustments_spark.operators import dedup as D
spark = get_spark("scale64")
import bench
# warmup reads SF_DIR's full table set; the 64x dir carries only
# documents, so warm against sf0.1 and point only the query at {sf}
bench.SF_DIR = "/root/testdata/sf0.1"
bench.warmup(spark)
import __spark_entry__ as e
fn = e.queries()["{name}"]
t0 = time.time()
fn(spark, "{sf}").write.format("noop").mode("overwrite").save()
print("RESULT %.3f" % (time.time() - t0))
docs = spark.read.parquet("{sf}/documents.parquet")
from consent_based_conversion_adjustments_spark.plans.data_queries import JACCARD_THRESHOLD
if "{name}" == "dedup_minhash":
    sigs = D.minhash_signatures(docs, "text", "doc_id")
    print("CANDIDATES", D.minhash_candidates(sigs).count())
    print("VERIFIED", fn(spark, "{sf}").count())
'''

out = {}
for name in ("dedup_minhash", "dedup_clusters", "corpus_canonical_ids"):
    row = {}
    for label, sf in (
        ("sf0.1", "/root/testdata/sf0.1"),
        ("x64", "/tmp/scale64/sf6.4"),
    ):
        p = subprocess.run(
            [sys.executable, "-c", SNIPPET.format(sf=sf, name=name)],
            capture_output=True, text=True, cwd="/root/repo", timeout=3600,
        )
        vals = {}
        for line in p.stdout.splitlines():
            for k in ("RESULT", "CANDIDATES", "VERIFIED"):
                if line.startswith(k + " "):
                    vals[k.lower()] = float(line.split()[1])
        row[label] = vals
        print(name, label, vals, flush=True)
        if "result" not in vals:
            print(p.stdout[-3000:], p.stderr[-3000:], flush=True)
    out[name] = row
json.dump(out, open("/tmp/scale64_study.json", "w"), indent=1)
