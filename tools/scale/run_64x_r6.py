"""Round-6 deep-scale rung: the two queries VERDICT r5 asked to take to
64x (`incremental_dedup_admission`, `image_phash_neardup`) plus a
controlled A/B of the new size-compatibility verify prefilter on
`dedup_minhash` (the general-route verify the 64x corpus exercises).

Same protocol as run_64x.py: vocabulary-salted tiles (tile64.py), each
(query, scale, variant) in a fresh JVM, timed noop write, then the same
JVM counts the volume drivers (candidates / size-compatible candidates /
relations / distinct hashes) so per-unit throughput can be reported.
"""
import json
import subprocess
import sys

SNIPPET = r'''
import time, sys, functools
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from consent_based_conversion_adjustments_spark.session import get_spark
from consent_based_conversion_adjustments_spark.operators import dedup as D
spark = get_spark("scale64r6")
import bench
bench.SF_DIR = "/root/testdata/sf0.1"
bench.warmup(spark)
import __spark_entry__ as e
from consent_based_conversion_adjustments_spark.plans.data_queries import JACCARD_THRESHOLD
variant = "{variant}"
if variant == "noprefilter":
    D._verify_pairs_jaccard = functools.partial(
        D._verify_pairs_jaccard, size_prefilter=False
    )
fn = e.queries()["{name}"]
t0 = time.time()
fn(spark, "{sf}").write.format("noop").mode("overwrite").save()
print("RESULT %.3f" % (time.time() - t0))
docs = spark.read.parquet("{sf}/documents.parquet")
if "{name}" == "dedup_minhash" and "{counts}" == "yes":
    sigs = D.minhash_signatures(docs, "text", "doc_id")
    cands = D.minhash_candidates(sigs)
    print("CANDIDATES", cands.count())
    hashes = D._token_hash_set(docs, "text", "doc_id")
    sz = hashes.select("doc_id", F.size("tok_hashes").alias("n"))
    compat = (
        cands
        .join(sz.select(F.col("doc_id").alias("doc_a"),
                        F.col("n").alias("na")), "doc_a")
        .join(sz.select(F.col("doc_id").alias("doc_b"),
                        F.col("n").alias("nb")), "doc_b")
        .filter(F.least("na", "nb")
                >= F.lit(JACCARD_THRESHOLD) * F.greatest("na", "nb"))
    )
    print("COMPAT", compat.count())
if "{name}" == "incremental_dedup_admission" and "{counts}" == "yes":
    print("RELATIONS", fn(spark, "{sf}").count())
    print("BATCH", docs.filter(F.col("doc_id") % 4 == 0).count())
if "{name}" == "image_phash_neardup" and "{counts}" == "yes":
    out = fn(spark, "{sf}")
    print("PAIRS", out.count())
    from consent_based_conversion_adjustments_spark.operators.multimodal import (
        attach_payloads, extract_features, perceptual_hash)
    feats = extract_features(
        attach_payloads(docs, "text", "doc_id"), fake_decode=True)
    print("DISTINCT_HASHES", feats.select(
        perceptual_hash("feature").alias("h")).distinct().count())
'''

RUNS = [
    # (query, sf_label, sf_dir, variant, counts)
    # Pass 1 measured the JOIN-BASED prefilter: sf0.1 26.6 s vs 11.9 s
    # without (two extra candidate-set shuffles for a ~30% kill rate —
    # candidates 434.8M, size-compatible 306.6M at x64), wash at x64
    # (425 vs 445 s, first leg contended). These legs re-measure with the
    # IN-ROW length filter (no added joins) that replaced it.
    ("dedup_minhash", "sf0.1", "/root/testdata/sf0.1", "prefilter", "no"),
    ("dedup_minhash", "sf0.1", "/root/testdata/sf0.1", "noprefilter", "no"),
    ("dedup_minhash", "x64", "/tmp/scale64/sf6.4", "prefilter", "no"),
    ("dedup_minhash", "x64", "/tmp/scale64/sf6.4", "noprefilter", "no"),
    ("incremental_dedup_admission", "sf0.1", "/root/testdata/sf0.1",
     "prefilter", "yes"),
    ("incremental_dedup_admission", "x64", "/tmp/scale64/sf6.4",
     "prefilter", "yes"),
    ("image_phash_neardup", "sf0.1", "/root/testdata/sf0.1",
     "prefilter", "yes"),
    ("image_phash_neardup", "x64", "/tmp/scale64/sf6.4",
     "prefilter", "yes"),
]

out = {}
for name, label, sf, variant, counts in RUNS:
    p = subprocess.run(
        [sys.executable, "-c",
         SNIPPET.format(sf=sf, name=name, variant=variant, counts=counts)],
        capture_output=True, text=True, cwd="/root/repo", timeout=5400,
    )
    vals = {}
    for line in p.stdout.splitlines():
        for k in ("RESULT", "CANDIDATES", "COMPAT", "RELATIONS", "BATCH",
                  "PAIRS", "DISTINCT_HASHES"):
            if line.startswith(k + " "):
                vals[k.lower()] = float(line.split()[1])
    key = f"{name}/{label}/{variant}"
    out[key] = vals
    print(key, vals, flush=True)
    if "result" not in vals:
        print(p.stdout[-3000:], p.stderr[-3000:], flush=True)
    json.dump(out, open("/tmp/scale64_r6_study.json", "w"), indent=1)
