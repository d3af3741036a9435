"""Plan-quality regression guard.

Asserts the physical-plan properties the engine is designed around:
filters pushed to parquet scans, pruned read schemas, broadcast joins on
dimension sides, no shuffle in bucketed co-located joins. Run:

    python tools/audit_plans.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def analyzed_of(df) -> str:
    """Analyzed logical plan — forced broadcasts show up as ResolvedHint
    here regardless of what AQE later picks physically."""
    return df._jdf.queryExecution().analyzed().toString()


def has_unpartitioned_window(p: str) -> bool:
    """True if any Window node in the plan has an empty PARTITION BY —
    the single-task global sort that killed cms_heavy_hitters at scale.
    In the plan string, windowspecdefinition lists partition columns
    FIRST; an unpartitioned spec starts directly with a sort order, so
    the FIRST TOP-LEVEL argument carries ASC/DESC. The split must
    respect nested parentheses: a sort key like
    ``cast(true_n#5L as double) DESC`` hides its direction behind a
    ')' that a naive [^)]* scan stops at."""
    needle = "windowspecdefinition("
    start = 0
    while True:
        i = p.find(needle, start)
        if i < 0:
            return False
        j = i + len(needle)
        depth = 0
        first_arg = []
        while j < len(p):
            c = p[j]
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    break
                depth -= 1
            elif c == "," and depth == 0:
                break
            first_arg.append(c)
            j += 1
        seg = "".join(first_arg)
        if " ASC" in seg or " DESC" in seg:
            return True
        start = j
    return False


def main() -> int:
    from consent_based_conversion_adjustments_spark.plans import (
        cocoa_queries,
        relational,
    )
    from consent_based_conversion_adjustments_spark.session import get_spark

    spark = get_spark("plan-audit")
    failures: list[str] = []

    def check(name: str, ok: bool, detail: str = "") -> None:
        print(f"  [{'OK ' if ok else 'FAIL'}] {name}" + (f" — {detail}" if detail else ""))
        if not ok:
            failures.append(name)

    p = plan_of(relational.q1_pricing_summary(spark, SF))
    check("q1 pushes the shipdate filter", "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p)
    check("q1 prunes unused columns", "l_comment" not in p and "ReadSchema" in p)
    check("q1 partial aggregation", p.count("HashAggregate") >= 2)

    p = plan_of(relational.q3_top_unshipped(spark, SF))
    check("q3 broadcasts dimension sides", p.count("BroadcastHashJoin") == 2)

    p = plan_of(relational.q5_nation_revenue(spark, SF))
    check("q5 all joins broadcast at this SF", p.count("BroadcastHashJoin") == 5)
    check("q5 no sort-merge join", "SortMergeJoin" not in p)

    p = plan_of(relational.q19_disjunctive_revenue(spark, SF))
    check(
        "q19 OR-derived predicates pushed to both scans",
        # part scan: the three-branch brand/size OR; lineitem scan: the
        # union quantity range (plan string truncates long filter lists,
        # so match the stable prefixes)
        "Or(Or(And" in p and "IsNotNull(l_quantity)" in p,
    )
    check("q19 no cartesian", "CartesianProduct" not in p)

    p = plan_of(relational.q13_customer_order_counts(spark, SF))
    check("q13 outer join preserved", "LeftOuter" in p or "left_outer" in p)

    p = plan_of(relational.q4_order_priority_check(spark, SF))
    check("q4 EXISTS is a semi join", "LeftSemi" in p)

    p = plan_of(relational.q21_waiting_suppliers(spark, SF))
    check(
        "q21 decorrelated — no nested-loop or cartesian",
        "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p,
    )

    p = plan_of(cocoa_queries.knn_adjust(spark, SF, impl="sql"))
    check(
        "flagship build side broadcast (nested-loop)",
        "BroadcastNestedLoopJoin" in p,
    )

    p = plan_of(cocoa_queries.knn_adjust(spark, SF, impl="numpy"))
    # the only nested-loop joins allowed are the 1-row scalar attaches for
    # the naive baseline (broadcast of a single aggregate row)
    check("flagship numpy path has no cartesian product", "CartesianProduct" not in p)
    check(
        "flagship numpy path: pair generation is the Arrow kernel, not a join",
        ("MapInPandas" in p or "ArrowEvalPython" in p)
        and p.count("BroadcastNestedLoopJoin") <= 2,
    )

    from consent_based_conversion_adjustments_spark.plans.data_queries import (
        dedup_minhash,
    )

    p = plan_of(dedup_minhash(spark, SF))
    check("minhash has no cartesian product", "CartesianProduct" not in p)
    check(
        "minhash verify has no forced broadcast (AQE decides)",
        "ResolvedHint" not in analyzed_of(dedup_minhash(spark, SF)),
    )

    from consent_based_conversion_adjustments_spark.plans.data_queries import (
        dedup_simhash,
    )

    p = plan_of(dedup_simhash(spark, SF))
    check(
        "simhash pair step is bit-block equi-joins, not all-pairs",
        "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p,
    )

    from consent_based_conversion_adjustments_spark.plans.data_queries import (
        dedup_jaccard,
        dedup_ngram_jaccard,
        embedding_neardup,
    )

    for name, fn in [
        ("jaccard prefix-filter", dedup_jaccard),
        ("ngram-jaccard prefix-filter", dedup_ngram_jaccard),
        ("embedding neardup block kernel", embedding_neardup),
    ]:
        p = plan_of(fn(spark, SF))
        check(
            f"{name} has no quadratic join",
            "CartesianProduct" not in p
            and "BroadcastNestedLoopJoin" not in p,
        )
        check(
            f"{name} has no forced broadcast (AQE decides)",
            "ResolvedHint" not in analyzed_of(fn(spark, SF)),
        )

    from consent_based_conversion_adjustments_spark.plans.corpus_queries import (
        contamination_check,
        tfidf_top_terms,
    )
    from consent_based_conversion_adjustments_spark.plans.data_queries import (
        events_peak_attribution,
    )

    p = plan_of(events_peak_attribution(spark, SF))
    check(
        "interval join is bin equi-join, not nested-loop",
        "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p,
    )

    p = plan_of(contamination_check(spark, SF))
    check(
        "contamination is gram-hash equi-join, not doc×doc",
        "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p,
    )

    p = plan_of(tfidf_top_terms(spark, SF))
    check(
        "tfidf joins shuffled/broadcast, partial aggs present",
        "CartesianProduct" not in p and p.count("HashAggregate") >= 2,
    )

    from consent_based_conversion_adjustments_spark.plans.data_queries import (
        corpus_dup_coverage,
    )

    p = plan_of(corpus_dup_coverage(spark, SF))
    check(
        "dup coverage is shingle-hash aggs + equi-join, not doc×doc",
        "BroadcastNestedLoopJoin" not in p
        and "CartesianProduct" not in p
        and p.count("HashAggregate") >= 4,
    )
    a = analyzed_of(corpus_dup_coverage(spark, SF))
    check(
        "dup coverage has no forced broadcast (AQE decides)",
        "ResolvedHint" not in a,
    )

    from consent_based_conversion_adjustments_spark.operators.similarity_search import (
        cosine_neardup_blas,
    )

    # The exact cosine near-dup path must never materialize the table on
    # the driver: building the plan over a job-free local relation must
    # trigger zero Spark jobs (the old kernel eagerly toPandas'd the full
    # table at plan-build time), and the physical plan must be the
    # cogrouped block-pair kernel with the tiny grid broadcast unhinted.
    local_emb = spark.createDataFrame(
        [(1, [1.0] * 4), (2, [0.5] * 4)], "vec_id long, embedding array<double>"
    )
    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup(None) or [])
    nd = cosine_neardup_blas(local_emb, 0.45)
    jobs_after = len(tracker.getJobIdsForGroup(None) or [])
    p = plan_of(nd)
    check(
        "exact near-dup builds lazily (no driver-side table collect)",
        jobs_after == jobs_before,
        f"jobs during plan build: {jobs_after - jobs_before}",
    )
    check(
        "exact near-dup is the cogrouped block-pair BLAS kernel",
        "FlatMapCoGroupsInPandas" in p,
    )
    check(
        "exact near-dup block grid is broadcast, no cartesian",
        "CartesianProduct" not in p and p.count("BroadcastHashJoin") >= 2,
    )
    check(
        "exact near-dup has no forced broadcast (planner decides)",
        "ResolvedHint" not in analyzed_of(nd),
    )

    # The end-to-end beyond-broadcast adjust: LSH bucket cogroup feeding
    # softmax/scatter-add — no quadratic join anywhere, no forced broadcast,
    # and the bucket kernel is the cogrouped Arrow pass.
    p = plan_of(cocoa_queries.radius_lsh_adjust(spark, SF))
    check(
        "LSH adjust end-to-end: bucket cogroup + no quadratic join",
        "FlatMapCoGroupsInPandas" in p
        and "CartesianProduct" not in p
        and "BroadcastNestedLoopJoin" not in p,
    )
    check(
        "LSH adjust has no forced broadcast (AQE decides)",
        "ResolvedHint" not in analyzed_of(cocoa_queries.radius_lsh_adjust(spark, SF)),
    )

    # Perceptual near-dup: the banded hamming join must run over the
    # DISTINCT-hash aggregate (≤ 2^16 rows), never doc-level rows — on a
    # 16-bit hash the 5-bit block keys take only 32 values, so a doc-level
    # band join would emit ~N²/32 candidates. The distinct aggregate
    # appears as a HashAggregate feeding the block-key join inputs.
    from consent_based_conversion_adjustments_spark.plans import data_queries

    nd16 = data_queries.image_phash_neardup(spark, SF)
    p = plan_of(nd16)
    check(
        "phash near-dup bands over distinct hashes (pre-aggregated)",
        p.count("HashAggregate") >= 2 and "CartesianProduct" not in p,
    )
    check(
        "phash near-dup has no forced broadcast (AQE decides)",
        "ResolvedHint" not in analyzed_of(nd16),
    )

    # Round-7 operators. dup_spans: duplicated-position marking must be a
    # (left-)semi equi-join against the dup-shingle aggregate — never a
    # cartesian/nested-loop pass — and the island windows key on doc_id.
    sp = data_queries.dup_spans(spark, SF)
    p = plan_of(sp)
    check(
        "dup_spans: semi-join marking, no quadratic join",
        ("LeftSemi" in p or "Semi" in p)
        and "CartesianProduct" not in p
        and "BroadcastNestedLoopJoin" not in p,
    )
    # k-means: assignment is the Arrow kernel (vectors never shuffle);
    # exactly the scan feeds it — no Exchange below the kernel.
    km = data_queries.kmeans_clusters(spark, SF)
    check(
        "kmeans: Arrow kernel labeling, no vector shuffle",
        "MapInPandas" in plan_of(km),
    )
    # PQ-ADC search: scoring is the Arrow kernel with batch-local top-k;
    # no pairwise join materializes the candidate set.
    pq = data_queries.ann_pq_topk(spark, SF)
    p = plan_of(pq)
    check(
        "pq-adc topk: Arrow kernel scoring, no quadratic join",
        "MapInPandas" in p
        and "CartesianProduct" not in p
        and "BroadcastNestedLoopJoin" not in p,
    )
    # MERGE upsert: one equi-join (SMJ/SHJ/BHJ all fine), nothing
    # quadratic; the conditional projection stays Catalyst-side.
    mu = relational.customer_merge_upsert(spark, SF)
    p = plan_of(mu)
    check(
        "merge upsert: single equi-join, no quadratic join",
        "CartesianProduct" not in p
        and "BroadcastNestedLoopJoin" not in p
        and "FullOuter" in p,
    )

    # LM perplexity: three equi-joins against bounded model tables + one
    # 1-row broadcast scalar attach; never doc×doc.
    from consent_based_conversion_adjustments_spark.plans import corpus_queries

    lm = corpus_queries.doc_lm_perplexity(spark, SF)
    p = plan_of(lm)
    check(
        "lm perplexity: equi-joins only, scalar attach broadcast",
        "CartesianProduct" not in p
        and p.count("BroadcastNestedLoopJoin") <= 1,  # the 1-row N/V attach
    )
    # BPE pair counting: one hash agg per round over the vocab — the
    # expensive argmax must be TakeOrdered, not a global sort.
    from consent_based_conversion_adjustments_spark.operators import (
        tokenizer as T,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pc = T._pair_counts(T.word_vocab(docs))
    check(
        "bpe pair counts: partial hash agg, no join",
        "HashAggregate" in plan_of(pc) and "Join" not in plan_of(pc),
    )
    # Z-order: bucket+interleave is a stateless map over the scan — the
    # only join anywhere is the 1-row bounds broadcast.
    zf = data_queries.lineitem_zorder_files(spark, SF)
    p = plan_of(zf)
    check(
        "zorder file stats: scalar-attach broadcast + hash agg only",
        p.count("Join") == 1 and "CartesianProduct" not in p,
    )

    # Skyline: the quadratic NOT EXISTS must live only in the oracle —
    # the Spark plan is profile agg + Arrow prefix pass + one equi-join.
    sk = relational.part_skyline(spark, SF)
    p = plan_of(sk)
    check(
        "skyline: Arrow prefix pass + equi-join, no quadratic join",
        "MapInPandas" in p
        and "CartesianProduct" not in p
        and "BroadcastNestedLoopJoin" not in p,
    )
    # PageRank: per-round contribution join is an equi-join; nothing
    # quadratic anywhere in the 3-round plan.
    pr = data_queries.neardup_pagerank(spark, SF)
    p = plan_of(pr)
    check(
        "pagerank: equi-join rounds only, no quadratic join",
        "CartesianProduct" not in p
        and "BroadcastNestedLoopJoin" not in p,
    )

    # Table diff: exactly one join (the full-outer on the key); the
    # NULL-safe column compare and unchanged-filter are in-row.
    td = relational.customer_snapshot_diff(spark, SF)
    p = plan_of(td)
    check(
        "table diff: full-outer equi-joins only, in-row compare",
        "CartesianProduct" not in p
        and "BroadcastNestedLoopJoin" not in p
        and "FullOuter" in p,
    )
    # SCD2: both window passes key on the entity — no empty-partitionBy
    # (single-partition) window anywhere.
    sc = relational.user_state_history(spark, SF)
    p = plan_of(sc)
    check(
        "scd2: entity-keyed windows, one hash exchange, no join",
        "windowspecdefinition(user_id#" in p
        and p.count("Exchange hashpartitioning") == 1
        and "Join" not in p,
    )
    # BM25: term filter pushed below the postings agg (appears in the
    # scan's pushed filters), df/N attaches broadcast, top-k is
    # TakeOrdered (never a global sort).
    bm = corpus_queries.bm25_search_topk(spark, SF)
    p = plan_of(bm)
    check(
        "bm25: TakeOrdered top-k + broadcast attaches",
        "TakeOrderedAndProject" in p
        and "CartesianProduct" not in p
        and "SortMergeJoin" not in p,
    )
    # SNM: candidates via the overlapping-bucket equi-join; the only
    # nested-loop anywhere would be a quadratic bug.
    snm = data_queries.dedup_sorted_neighborhood(spark, SF)
    p = plan_of(snm)
    check(
        "sorted-neighborhood: equi-join candidates, Arrow rank pass",
        "MapInPandas" in p
        and "CartesianProduct" not in p
        and "BroadcastNestedLoopJoin" not in p,
    )
    # Fuzzy join: prefix-gram equi-join + verify; quadratic only in the
    # oracle.
    fz = relational.supplier_fuzzy_matches(spark, SF)
    p = plan_of(fz)
    check(
        "edit-distance join: prefix-gram equi-joins, no quadratic join",
        "CartesianProduct" not in p
        and "BroadcastNestedLoopJoin" not in p,
    )

    # Interval overlap: candidates from ONE equi-join on (key, bin) —
    # an inequality-only formulation would show up as a nested loop.
    ov = relational.order_window_overlaps(spark, SF)
    p = plan_of(ov)
    check(
        "interval overlap: (key, bin) equi-join, no inequality nested loop",
        "CartesianProduct" not in p
        and "BroadcastNestedLoopJoin" not in p,
    )

    # NTILE: the whole point is NO single-partition window — assert no
    # empty-partition windowspec and the Arrow rank pass is present.
    nt = relational.orders_price_ntile(spark, SF)
    p = plan_of(nt)
    check(
        "global ntile: no single-partition window, Arrow rank pass",
        "windowspecdefinition(o_totalprice" not in p
        and "MapInPandas" in p,
    )
    # Spearman: two Arrow rank passes, a scalar agg, zero joins.
    sp_ = relational.lineitem_spearman(spark, SF)
    p = plan_of(sp_)
    # (the first rank pass hides behind global_rank's localCheckpoint —
    # lineage truncation leaves one visible MapInPandas + an RDD scan)
    check(
        "spearman: rank passes + scalar agg, no join",
        p.count("MapInPandas") >= 1 and "Join" not in p,
    )
    # Pair mining: the item-support semi-join is the only join; the pair
    # explode is in-row (no pair-keyed join anywhere).
    pm = corpus_queries.token_pair_mining(spark, SF)
    p = plan_of(pm)
    check(
        "pair mining: single item equi-join, in-row pair explode",
        "CartesianProduct" not in p
        and "BroadcastNestedLoopJoin" not in p
        and "Generate explode" in p,
    )

    # Path mining: the window keys on the user (no single-partition
    # window), the cutoff is TakeOrdered.
    pe = corpus_queries.user_event_paths(spark, SF)
    p = plan_of(pe)
    check(
        "event paths: user-keyed window + TakeOrdered, no join",
        "windowspecdefinition(user_id#" in p
        and "TakeOrderedAndProject" in p
        and "Join" not in p,
    )
    # Winsorize: bounds are literals — the clip agg must contain no
    # join and no exchange beyond the single final aggregate pair.
    wz = corpus_queries.events_value_winsorized(spark, SF)
    p = plan_of(wz)
    check(
        "winsorize: literal bounds, single agg, no join",
        "Join" not in p and p.count("HashAggregate") == 2,
    )
    # HLL cube range query: sketches merge inside partial aggregates
    # (map-side combine), nothing but binary sketches cross the exchange.
    hq = data_queries.distinct_users_window_hll(spark, SF)
    p = plan_of(hq)
    check(
        "hll cube: partial sketch aggregation, no join",
        "Join" not in p and p.count("ObjectHashAggregate") >= 2,
    )

    # TWAP: one user-keyed window + hash agg, no join anywhere.
    tw = data_queries.events_user_twap(spark, SF)
    p = plan_of(tw)
    check(
        "twap: keyed lead window + hash agg, no join",
        "windowspecdefinition(user_id#" in p and "Join" not in p,
    )
    # MAD scan: the two stat attaches are broadcast joins; no window.
    md = data_queries.events_value_mad_anomalies(spark, SF)
    p = plan_of(md)
    # (3 BHJs: the MAD aggregate's subtree re-derives the median attach)
    check(
        "mad anomalies: broadcast stat attaches, no per-group window",
        p.count("BroadcastHashJoin") >= 2
        and "SortMergeJoin" not in p
        and "Window" not in p,
    )
    # Q-Q calibration: literal-grid interpolation — no join beyond the
    # 1-row count attach, no single-partition window.
    qq = data_queries.click_value_calibrated(spark, SF)
    p = plan_of(qq)
    check(
        "qq calibration: rank pass + scalar attach, literal grid",
        "MapInPandas" in p
        and p.count("BroadcastNestedLoopJoin") <= 1
        and "windowspecdefinition" not in p,
    )

    # KS: the prefix scan replaces the single-partition sum-over window;
    # the only windows allowed are none at all.
    ks = data_queries.click_purchase_ks(spark, SF)
    p = plan_of(ks)
    check(
        "ks distance: Arrow prefix scan, no single-partition window",
        "MapInPandas" in p and "windowspecdefinition" not in p,
    )
    # Gini: rank-only derivation — one scalar agg above the rank pass.
    gn = data_queries.lineitem_revenue_gini(spark, SF)
    p = plan_of(gn)
    check(
        "gini: rank pass + scalar agg, no join, no window",
        "Join" not in p and "windowspecdefinition" not in p,
    )

    # Weighted quantiles: the prefix scan + threshold agg — no window,
    # the only nested-loop is the 1-row total attach.
    wq = data_queries.lineitem_weighted_price_quantiles(spark, SF)
    p = plan_of(wq)
    check(
        "weighted quantiles: Arrow scan + threshold agg, no window",
        "MapInPandas" in p
        and "windowspecdefinition" not in p
        and p.count("BroadcastNestedLoopJoin") <= 1,
    )

    # Grouped weighted median: KEYED windows only (partitionBy the
    # group), never an empty-partition window.
    gm = data_queries.flag_weighted_median_price(spark, SF)
    p = plan_of(gm)
    check(
        "grouped weighted median: keyed windows, no join",
        "windowspecdefinition(l_returnflag#" in p and "Join" not in p,
    )

    # Multi-touch attribution: the range join must run as the
    # (user, time-bin) equi-join — never a nested-loop inequality join —
    # and the touch/conversion type filters must reach the parquet scan.
    at = data_queries.campaign_attribution(spark, SF)
    p = plan_of(at)
    check(
        "attribution: binned equi-join, no nested loop",
        "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p,
    )
    check(
        "attribution: event-type filters pushed to the scan",
        "EqualTo(event_type,click)" in p
        and "EqualTo(event_type,purchase)" in p,
    )

    # Audience overlap: the pair explode is in-row over bounded type
    # sets — no user×user join anywhere; totals attach by broadcast.
    ao = data_queries.audience_overlap_matrix(spark, SF)
    p = plan_of(ao)
    check(
        "audience overlap: no quadratic join, broadcast totals",
        "BroadcastNestedLoopJoin" not in p
        and "CartesianProduct" not in p
        and "BroadcastHashJoin" in p,
    )

    # Token JS divergence: ONE term-keyed hash agg with conditional side
    # sums — no join beyond the 1-row totals attach, no window.
    js = corpus_queries.source_token_js(spark, SF)
    p = plan_of(js)
    check(
        "token js: single conditional agg + 1-row attach",
        p.count("BroadcastNestedLoopJoin") <= 1
        and "SortMergeJoin" not in p
        and "windowspecdefinition" not in p,
    )

    # Chi-square scoring: label totals broadcast (L rows), 1-row N
    # attach — never a shuffle join on the label.
    c2 = corpus_queries.token_source_chi2(spark, SF)
    p = plan_of(c2)
    check(
        "token chi2: broadcast label totals, no shuffle join",
        "SortMergeJoin" not in p and "ShuffledHashJoin" not in p,
    )

    # Vocabulary growth: only ids through the range exchange (the text
    # never rides the sort) and the lone window runs over the
    # aggregated k-row frame, after both hash aggs.
    vg = corpus_queries.corpus_vocab_growth(spark, SF)
    p = plan_of(vg)
    check(
        "vocab growth: Arrow rank pass present, window only on k rows",
        # one Window node, three cumulative sums sharing its spec (the
        # plan prints windowspecdefinition once per aggregate)
        "MapInPandas" in p and p.count("windowspecdefinition") == 3,
    )

    # General as-of join: sorted-union + running-last — there must be
    # NO join in the plan at all (the naive inequality formulation
    # plans a nested loop) and one keyed window.
    ap = data_queries.events_next_purchase(spark, SF)
    p = plan_of(ap)
    check(
        "asof join: union + running-last window, zero joins",
        "Join" not in p and "windowspecdefinition(user_id" in p,
    )

    # EWMA: the keyed windows run over the AGGREGATED daily frame
    # (events collapse in a hash agg first); one scan feeds everything.
    ew = data_queries.events_value_ewma(spark, SF)
    p = plan_of(ew)
    check(
        # two scans: the deviation-spread branch recomputes the tiny
        # daily lineage (the MAD scan's agg->broadcast two-pass shape)
        "ewma: keyed window over the daily frame, two-pass shape",
        "windowspecdefinition(event_type" in p
        and p.count("Scan parquet") == 2,
    )

    # Correlation matrix: every pairwise corr in ONE aggregate over one
    # scan — never per-pair scans, never a join.
    cm = data_queries.lineitem_correlation_matrix(spark, SF)
    p = plan_of(cm)
    check(
        "correlation matrix: single agg, single scan, no join",
        p.count("Scan parquet") == 1 and "Join" not in p,
    )

    # Benford: the positivity filter reaches the parquet scan.
    bf = data_queries.orders_benford_audit(spark, SF)
    p = plan_of(bf)
    check(
        "benford: positivity filter pushed to the scan",
        "GreaterThan(o_totalprice,0" in p,
    )

    # Grouping sets: ONE expand + hash aggregate, no union of scans.
    gs = relational.grouping_sets_order_stats(spark, SF)
    p = plan_of(gs)
    check(
        "grouping sets: single expand + agg, one scan",
        "Expand" in p and p.count("Scan parquet") == 1 and "Union" not in p,
    )

    # SQ8 encode: a pure projection — no Exchange, no Python, one scan.
    from consent_based_conversion_adjustments_spark.operators import (
        quantize as Q,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    mins, steps = Q.sq8_fit(emb)
    p = plan_of(Q.sq8_encode(emb, mins, steps))
    check(
        "sq8 encode: stateless codegen projection, no exchange",
        "Exchange" not in p
        and "Scan parquet" in p
        and "ArrowEvalPython" not in p
        and "MapInPandas" not in p,
    )

    # CMS heavy-hitter audit view: the exact top-k must compile to
    # TakeOrderedAndProject (per-partition top-k, k-row merge) — an
    # unpartitioned row_number window here moves the WHOLE distinct-key
    # table to one task (the round-9 verdict's scale-killer).
    from consent_based_conversion_adjustments_spark.operators import (
        sketches as SK,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    p = plan_of(SK.cms_heavy_hitters(ev, "user_id", 10))
    check(
        "cms heavy hitters: TakeOrderedAndProject top-k, no window",
        "TakeOrderedAndProject" in p
        and "Window" not in p
        and not has_unpartitioned_window(p),
    )

    # SemDeDup pair stage: the block-pair grid joins must broadcast the
    # grid (never shuffle the vectors for it) and produce no cartesian.
    from consent_based_conversion_adjustments_spark.operators import (
        semdedup as SDD,
    )

    p = plan_of(SDD.semdedup_pairs(emb, 0.45, k=4, iters=1))
    check(
        "semdedup pairs: grid broadcasts, no cartesian product",
        p.count("BroadcastHashJoin") >= 2
        and "CartesianProduct" not in p
        and "SortMergeJoin" not in p,
    )

    # Incremental admission: both BLAS stages' grids broadcast; the
    # store×store quadratic never exists (no self-join of the store side
    # beyond the batch-internal stage).
    store = emb.filter("vec_id % 4 <> 0")
    batch = emb.filter("vec_id % 4 = 0")
    p = plan_of(SDD.semdedup_admission(store, batch, 0.45, k=4, iters=1))
    check(
        "semdedup admission: grids broadcast, no cartesian product",
        p.count("BroadcastHashJoin") >= 4 and "CartesianProduct" not in p,
    )

    # NB quality classifier: the 1-row totals/priors attach as broadcast
    # nested-loop joins (the accepted scalar-attach pattern), never as a
    # cartesian product. (The vocab-table join's strategy is left to AQE:
    # its size is only known at runtime.)
    from consent_based_conversion_adjustments_spark.plans import (
        corpus_queries as cq,
    )

    p = plan_of(cq.doc_nb_quality(spark, SF))
    check(
        "nb quality: scalar attaches broadcast, no cartesian",
        "BroadcastNestedLoopJoin" in p and "CartesianProduct" not in p,
    )

    # Gopher rule filter: a pure-Catalyst map over ONE scan — any join,
    # Python pass, or second scan means the "cheapest possible
    # pre-filter" claim broke.
    gr = cq.doc_gopher_rules(spark, SF)
    p = plan_of(gr)
    check(
        "gopher rules: single-scan codegen projection, no join/Python",
        p.count("Scan parquet") == 1
        and "Join" not in p
        and "MapInPandas" not in p
        and "ArrowEvalPython" not in p,
    )

    # CCNet buckets: the per-language tercile bounds must come back as a
    # BROADCAST join (5 rows by construction — the hint is deliberate),
    # with no quadratic join and NO window anywhere (the windowless
    # design claim: a per-language ntile would sort near-global
    # partitions).
    cb = cq.ccnet_perplexity_buckets(spark, SF)
    p = plan_of(cb)
    check(
        "ccnet buckets: broadcast bounds, windowless, no quadratic join",
        "BroadcastHashJoin" in p
        and "CartesianProduct" not in p
        and not has_unpartitioned_window(p),
    )

    # GLM d=4 scoring: the pinned feature frame must serve the scoring
    # scan from cache (InMemoryTableScan), with the sigmoid as pure
    # codegen — no join, no Python.
    d4 = cq.doc_logreg_quality_d4(spark, SF)
    p = plan_of(d4)
    check(
        "logreg d4 scoring: cached feature frame, codegen sigmoid",
        "InMemoryTableScan" in p
        and "Join" not in p
        and "MapInPandas" not in p,
    )

    print("ALL OK" if not failures else f"FAILED: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
