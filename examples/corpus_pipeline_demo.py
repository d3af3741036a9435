"""End-to-end training-corpus construction over the documents fixture —
the composition story for the LLM-data-pipeline layer.

One pass from raw documents to packed training sequences, each stage a
registered operator with its own oracle/tests:

1. quality gate     — doc_gopher_rules hard filters (Rae et al. 2021)
                      AND text.quality_score floor, composed; the CCNet
                      perplexity tercile labels each survivor
2. exact-substring  — dedup.scrub_duplicate_spans (Lee-et-al-style span
   scrub: corpus-duplicated 3-gram runs removed from surviving docs)
3. near-dup dedup   — minhash graph → connected components → keep each
   cluster's canonical doc
4. leakage-safe splits — train/val/test assigned on the CLUSTER key, so
   no near-dup pair straddles splits
5. weighted sample  — Efraimidis–Spirakis length-weighted subsample of
   the train split (deterministic, replayable)
6. chunk + pack     — overlapping token chunks, FFD-packed to a fixed
   context budget
7. data recipe      — corpus.mixture_waterfill allocates a 2-epoch token
   budget over sources (temperature 0.5, 2.2-epoch cap)

Run:  python examples/corpus_pipeline_demo.py [sf_dir]
(defaults to /root/testdata/sf0.001; deterministic output).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402

from consent_based_conversion_adjustments_spark.operators import (  # noqa: E402
    corpus as C,
    dedup as D,
)
from consent_based_conversion_adjustments_spark.operators.text import (  # noqa: E402
    quality_score,
    tokens,
)
from consent_based_conversion_adjustments_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("corpus-pipeline-demo")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1a. Gopher hard rules (round 11): word count / mean word length /
    # alpha ratio / stop hits / duplicate lines at the paper thresholds
    from consent_based_conversion_adjustments_spark.plans.corpus_queries import (
        ccnet_perplexity_buckets,
        doc_gopher_rules,
    )

    rules = doc_gopher_rules(spark, sf_dir).select("doc_id", "passes")
    # 1b. soft quality floor on the rule survivors
    gated = (
        docs.join(rules.filter(F.col("passes") == 1), "doc_id")
        .withColumn("__q", quality_score("text"))
        .filter(F.col("__q") >= 0.3)
        .drop("passes")
    )
    n1 = gated.count()

    # 1c. CCNet perplexity terciles (labels; a stricter pipeline would
    # drop the per-language tail here)
    buckets = ccnet_perplexity_buckets(spark, sf_dir)
    tail_n = buckets.filter(F.col("ppl_bucket") == "tail").count()

    # 2. exact-substring scrub (duplicated spans removed, text rebuilt)
    scrubbed = (
        D.scrub_duplicate_spans(gated, "text", "doc_id")
        .filter(F.col("n_kept") > 0)
        .withColumnRenamed("scrubbed", "text")
        .select("doc_id", "text", "n_kept")
    )
    n2 = scrubbed.count()

    # 3. near-dup dedup on the scrubbed text: canonical doc per cluster
    pairs = D.minhash_neardup(scrubbed, "text", "doc_id", threshold=0.8)
    cc = D.connected_components(pairs, a_col="doc_a", b_col="doc_b")
    dupes = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    canonical = scrubbed.join(dupes, "doc_id", "left_anti")
    n3 = canonical.count()

    # 4. leakage-safe splits: split key = cluster representative
    keyed = canonical.join(
        cc, canonical["doc_id"] == cc["node"], "left"
    ).select(
        "doc_id",
        "text",
        "n_kept",
        F.coalesce("component", "doc_id").alias("split_key"),
    )
    splits = C.assign_split(keyed, "split_key")
    profile = {
        r["split"]: r["n"]
        for r in splits.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    # 5. length-weighted sample of train (deterministic A-ES)
    train = splits.filter(F.col("split") == "train")
    sampled = C.weighted_sample(
        train, "n_kept", max(1, n3 // 2), id_col="doc_id"
    )
    n5 = sampled.count()

    # 6. chunk + pack to a 64-token context budget
    chunks = C.chunk_documents(sampled, "text", "doc_id", 32, 8)
    packed = C.pack_chunks(chunks, budget=64)
    n_packs = packed.select("group_id", "pack_id").distinct().count()
    util = packed.groupBy("group_id", "pack_id").agg(
        F.sum("n_tokens").alias("t")
    )
    avg_fill = util.agg(F.avg("t")).first()[0]

    # 7. the data recipe over the FINAL corpus: token budget per source
    from consent_based_conversion_adjustments_spark.operators.corpus import (
        mixture_waterfill,
    )
    from consent_based_conversion_adjustments_spark.operators.text import tokens

    counts = (
        splits.withColumn("__t", F.size(tokens("text")))
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.sum("__t").cast("long").alias("t"))
        .collect()
    )
    recipe = mixture_waterfill(sorted((r["source"], int(r["t"])) for r in counts))
    n_capped = sum(r["capped"] for r in recipe)

    print(f"documents            {n0}")
    print(f"after gopher+quality {n1} (ccnet tail would drop {tail_n} more)")
    print(f"after span scrub     {n2} (empty-after-scrub dropped)")
    print(f"after near-dup dedup {n3}")
    print(f"split profile        {profile}")
    print(f"weighted train sample {n5}")
    print(f"packed sequences     {n_packs} (avg fill {avg_fill:.1f}/64 tokens)")
    print(
        f"data recipe          {len(recipe)} sources, {n_capped} capped at "
        f"2.2 epochs, budget 2.0x corpus tokens"
    )
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
