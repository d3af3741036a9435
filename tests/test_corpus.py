"""Unit tests for the corpus-construction operators (operators/corpus.py)."""

from math import log as math_log

import pytest
from pyspark.sql import functions as F

from consent_based_conversion_adjustments_spark.operators import corpus as C


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "src0", None),
        (1, "the quick brown fox jumps over the lazy cat", "src0", None),
        (2, "completely different content about spark engines", "src1", None),
        (3, "", "src1", None),
        (4, "one two three four five six seven eight nine ten "
            "eleven twelve thirteen fourteen fifteen sixteen", "src2", None),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )


def test_split_deterministic_and_proportional(spark):
    ids = spark.range(20000).withColumnRenamed("id", "doc_id")
    a = C.assign_split(ids, "doc_id").groupBy("split").count()
    counts = {r["split"]: r["count"] for r in a.collect()}
    assert set(counts) == {"train", "val", "test"}
    # 90/5/5 within a generous tolerance — the mixer must not leave runs
    assert 0.88 <= counts["train"] / 20000 <= 0.92
    assert 0.035 <= counts["val"] / 20000 <= 0.065
    assert 0.035 <= counts["test"] / 20000 <= 0.065
    # stable across repartitions (pure function of the id)
    b = C.assign_split(ids.repartition(7), "doc_id").groupBy("split").count()
    assert {r["split"]: r["count"] for r in b.collect()} == counts


def test_chunks_cover_and_overlap(spark, docs):
    chunks = C.chunk_documents(docs, chunk_tokens=6, overlap=2).collect()
    by_doc = {}
    for r in sorted(chunks, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: 9 tokens, chunk 6 step 4 → starts 1,5 → 2 chunks
    assert [r["n_tokens"] for r in by_doc[0]] == [6, 5]
    toks = "the quick brown fox jumps over the lazy dog".split()
    assert by_doc[0][0]["chunk_text"] == " ".join(toks[0:6])
    assert by_doc[0][1]["chunk_text"] == " ".join(toks[4:9])
    # overlap: last 2 tokens of chunk i = first 2 of chunk i+1
    assert by_doc[0][0]["chunk_text"].split()[-2:] == by_doc[0][1][
        "chunk_text"
    ].split()[:2]
    # blank document still yields exactly one (empty) chunk
    assert len(by_doc[3]) == 1 and by_doc[3][0]["n_tokens"] == 0
    # doc 4: 16 tokens → starts 1,5,9,13 → full coverage, no token lost
    stitched = by_doc[4][0]["chunk_text"].split()
    for r in by_doc[4][1:]:
        stitched.extend(r["chunk_text"].split()[2:])
    assert stitched == [
        "one", "two", "three", "four", "five", "six", "seven", "eight",
        "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
        "fifteen", "sixteen",
    ]


def test_tfidf_ranks_distinctive_terms(spark, docs):
    out = C.tfidf_top_terms(docs.filter("doc_id < 3"), k=3).collect()
    scores = {(r["doc_id"], r["term"]): r["tfidf"] for r in out}
    # within doc 0: 'dog' (df=1) outscores 'quick' (df=2) at equal tf
    doc0 = [r for r in out if r["doc_id"] == 0]
    terms0 = {r["term"]: r for r in doc0}
    assert "dog" in terms0, doc0
    if "quick" in terms0:
        assert terms0["dog"]["tfidf"] > terms0["quick"]["tfidf"]
    # 'the' has tf=2 in doc 0 → highest score despite low idf (raw-count tf)
    assert terms0["the"]["rank"] == 1
    # doc 2's terms are all unique to it → equal scores, term-asc tie-break
    doc2 = sorted(
        (r for r in out if r["doc_id"] == 2), key=lambda r: r["rank"]
    )
    assert [r["term"] for r in doc2] == sorted(r["term"] for r in doc2)
    # every doc got exactly k rows
    from collections import Counter

    assert Counter(r["doc_id"] for r in out) == {0: 3, 1: 3, 2: 3}
    # doc_freq counts documents, not occurrences
    assert scores[(0, "the")] == pytest.approx(
        2 * (math_log(4 / 3) + 1), rel=1e-12
    )


def test_source_quota_cap(spark, docs):
    kept = C.source_quota_sample(docs, quota=1).collect()
    per_src = {}
    for r in kept:
        per_src.setdefault(r["source"], []).append(r["doc_id"])
    # lowest id kept per source
    assert per_src == {"src0": [0], "src1": [2], "src2": [4]}


def test_contamination_detects_planted_overlap(spark, docs):
    train = docs.filter("doc_id = 0")
    eval_ = docs.filter("doc_id IN (1, 2)")
    out = {
        r["doc_id"]: r
        for r in C.ngram_contamination(train, eval_, n=3).collect()
    }
    # doc 1 shares 6 of its 7 trigrams with doc 0 (all but '...lazy cat')
    assert out[1]["n_shared"] == 6
    assert out[1]["n_grams"] == 7
    assert abs(out[1]["contamination"] - 6 / 7) < 1e-12
    # doc 2 shares nothing
    assert out[2]["n_shared"] == 0 and out[2]["contamination"] == 0.0


def test_funnel_requires_strict_order(spark):
    import datetime

    t0 = datetime.datetime(2024, 1, 1)

    def ev(uid, typ, mins):
        return (uid, typ, t0 + datetime.timedelta(minutes=mins))

    rows = [
        # user 1: full ordered funnel
        ev(1, "view", 0), ev(1, "click", 10), ev(1, "purchase", 20),
        # user 2: purchase BEFORE click → stops at step 2
        ev(2, "view", 0), ev(2, "purchase", 5), ev(2, "click", 10),
        # user 3: view only
        ev(3, "view", 0),
        # user 4: click/purchase but never viewed → not in funnel at all
        ev(4, "click", 0), ev(4, "purchase", 10),
    ]
    events = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    row = C.funnel_counts(events).collect()[0]
    assert (row["n_step1"], row["n_step2"], row["n_step3"]) == (3, 2, 1)


def test_temperature_quotas_flatten_sources(spark):
    rows = [(i, f"s{'big' if i < 900 else ('mid' if i < 990 else 'small')}")
            for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = {
        r["source"]: r
        for r in C.temperature_sample_quotas(
            docs, "source", "doc_id", target_total=100
        ).collect()
    }
    # √-weighting flattens: big=900→30, mid=90→9.48, small=10→3.16 docs;
    # quotas are integer floors of 100·w/Σw
    assert out["sbig"]["n_docs"] == 900
    assert out["smid"]["n_docs"] == 90
    assert out["ssmall"]["n_docs"] == 10
    q_big, q_mid, q_small = (
        out["sbig"]["quota"], out["smid"]["quota"], out["ssmall"]["quota"]
    )
    # raw proportional sampling would give 90/9/1; √-temperature gives the
    # small source ~3× its raw share and the big one ~2/3 of its raw share
    assert q_small >= 3 and q_big <= 70
    assert q_big > q_mid > q_small
    # kept counts realize the quotas (every source has enough docs)
    for r in out.values():
        assert r["n_kept"] == min(r["quota"], r["n_docs"])


def test_shuffled_position_is_stable_permutation(spark):
    ids = spark.range(500).withColumnRenamed("id", "doc_id")
    a = [
        r["doc_id"]
        for r in ids.orderBy(
            C.shuffled_position("doc_id"), F.col("doc_id")
        ).collect()
    ]
    b = [
        r["doc_id"]
        for r in ids.repartition(13)
        .orderBy(C.shuffled_position("doc_id"), F.col("doc_id"))
        .collect()
    ]
    assert a == b                      # deterministic across repartitions
    assert a != sorted(a)              # actually permuted
    assert sorted(a) == list(range(500))  # a bijection


def test_pack_chunks_invariants(spark):
    rows = [(d, i, 10 + (d * 7 + i * 13) % 100) for d in range(40)
            for i in range(3)]
    chunks = spark.createDataFrame(
        rows, "doc_id long, chunk_idx long, n_tokens long"
    )
    packed = C.pack_chunks(chunks, budget=128, n_groups=4).collect()
    # every chunk assigned exactly once
    assert len(packed) == len(rows)
    assert {(r["doc_id"], r["chunk_idx"]) for r in packed} == {
        (d, i) for d, i, _ in rows
    }
    # no pack exceeds the budget (all chunks here are <= budget)
    fill = {}
    for r in packed:
        key = (r["group_id"], r["pack_id"])
        fill[key] = fill.get(key, 0) + r["n_tokens"]
    assert all(v <= 128 for v in fill.values()), max(fill.values())
    # FFD packs reasonably densely: no two packs could merge
    # (any half-empty pair would have been merged by first-fit)
    by_group = {}
    for (g, p), v in fill.items():
        by_group.setdefault(g, []).append(v)
    for g, fills in by_group.items():
        fills = sorted(fills)
        if len(fills) >= 2:
            assert fills[-1] + fills[0] > 128 or len(fills) == 1
    # deterministic under repartition
    again = C.pack_chunks(
        chunks.repartition(7), budget=128, n_groups=4
    ).collect()
    key = lambda r: (r["group_id"], r["doc_id"], r["chunk_idx"], r["pack_id"])
    assert sorted(map(key, packed)) == sorted(map(key, again))


def test_pack_chunks_oversized_gets_own_pack(spark):
    chunks = spark.createDataFrame(
        [(0, 0, 500), (0, 1, 60), (0, 2, 60)],
        "doc_id long, chunk_idx long, n_tokens long",
    )
    packed = C.pack_chunks(chunks, budget=128, n_groups=1).collect()
    packs = {}
    for r in packed:
        packs.setdefault(r["pack_id"], []).append(r["n_tokens"])
    # the 500-token chunk is alone; the two 60s share one pack
    assert sorted(map(sorted, packs.values())) == [[60, 60], [500]]


def test_pii_redaction_planted(spark):
    from consent_based_conversion_adjustments_spark.operators.text import (
        pii_count,
        redact_pii,
    )

    df = spark.createDataFrame(
        [
            (0, "mail alice.smith+x@corp.example.org or call 415-5551234"),
            (1, "two mails a@b.io c@d.org and 555-123 555-45"),
            (2, "no pii at all"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            pii_count("text", "email").alias("ne"),
            pii_count("text", "phone").alias("np"),
            redact_pii("text").alias("red"),
        ).collect()
    }
    assert out[0]["ne"] == 1 and out[0]["np"] == 1
    assert out[0]["red"] == "mail [EMAIL] or call [PHONE]"
    # 555-45 has only 2 digits after the dash → not a phone match
    assert out[1]["ne"] == 2 and out[1]["np"] == 1
    assert out[2]["red"] == "no pii at all"


def test_repetition_stats_golden(spark):
    """Hand-computed bigram repetition: 'a b a b a' has bigrams
    [ab, ba, ab, ba] -> total 4, distinct 2, top 2 -> dup 0.5, top 0.5.
    Distinct-bigram and sub-2-token docs covered too."""
    df = spark.createDataFrame(
        [
            (0, "a b a b a"),
            (1, "w x y z"),     # all bigrams distinct
            (2, "solo"),        # no bigrams -> excluded
            (3, "r r r r"),     # one bigram repeated 3x
            (4, "   "),         # blank -> excluded
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["dup_bigram_frac"], r["top_bigram_frac"])
        for r in C.repetition_stats(df, "text", "doc_id").collect()
    }
    assert set(out) == {0, 1, 3}
    assert out[0] == (0.5, 0.5)
    assert out[1] == (0.0, 1.0 / 3.0)
    assert out[3] == (2.0 / 3.0, 1.0)


def test_global_rank_matches_window(spark):
    """Distributed range-partition ranking must reproduce the
    single-partition row_number window exactly — including duplicate sort
    prefixes resolved by the tie-breaking unique key — and be stable
    across runs (sampled range boundaries must not leak into ranks)."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i, i % 17, f"g{i % 5}") for i in range(2000)],
        "id long, key long, grp string",
    )
    got = {
        r["id"]: r["rank"]
        for r in C.global_rank(df, ["key", "id"], num_partitions=8).collect()
    }
    w = Window.orderBy("key", "id")
    want = {
        r["id"]: r["rank"]
        for r in df.withColumn(
            "rank", F.row_number().over(w).cast("long")
        ).collect()
    }
    assert got == want
    again = {
        r["id"]: r["rank"]
        for r in C.global_rank(df, ["key", "id"], num_partitions=8).collect()
    }
    assert again == want


def test_global_rank_single_row_partitions(spark):
    """More partitions than rows: empty partitions contribute zero to the
    prefix offsets and ranks stay 1..n."""
    df = spark.createDataFrame([(3,), (1,), (2,)], "v long")
    got = sorted(
        (r["v"], r["rank"])
        for r in C.global_rank(df, ["v"], num_partitions=8).collect()
    )
    assert got == [(1, 1), (2, 2), (3, 3)]


def test_approx_quantiles_within_rank_epsilon(spark):
    """Greenwald-Khanna approx_percentile vs the exact percentile: each
    approximate quantile must itself be an exact quantile at some rank
    within ±1/accuracy of the requested one (the GK guarantee)."""
    from consent_based_conversion_adjustments_spark.plans.data_queries import (
        events_value_quantiles,
        events_value_quantiles_approx,
    )

    sf = "/root/testdata/sf0.01"
    exact = {
        r["event_type"]: r for r in events_value_quantiles(spark, sf).collect()
    }
    approx = {
        r["event_type"]: r
        for r in events_value_quantiles_approx(spark, sf).collect()
    }
    assert exact.keys() == approx.keys()
    ev = spark.read.parquet(f"{sf}/events.parquet")
    values = {
        t: sorted(
            x["value"] for x in ev.filter(F.col("event_type") == t).collect()
        )
        for t in exact
    }
    eps = 1.0 / 1000
    for t, row in approx.items():
        vals = values[t]
        n = len(vals)
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            lo = vals[max(0, int((q - 2 * eps) * (n - 1)))]
            hi = vals[min(n - 1, int((q + 2 * eps) * (n - 1)) + 1)]
            assert lo - 1e-6 <= row[col] <= hi + 1e-6, (t, col, row[col], lo, hi)


def test_vocab_heavy_hitters_exact_after_cascade(spark):
    """The sketch stage may propose false candidates; the exact stage must
    strip them so output == plain groupBy-HAVING, including when only
    some terms clear the support floor."""
    rows = (
        [(i, "alpha beta common") for i in range(30)]
        + [(100 + i, f"rare{i} common") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["term"], r["n_occurrences"])
        for r in C.vocab_heavy_hitters(df, support=0.2).collect()
    }
    # totals: alpha 30, beta 30, common 40, rare* 1 each; n=130, floor 26
    assert got == {("alpha", 30), ("beta", 30), ("common", 40)}


def test_dsir_importance_prefers_target_like_docs(spark):
    """DSIR weights: documents sharing the target domain's vocabulary must
    outscore documents from a disjoint vocabulary, and weights are a pure
    function of content (same text → same weight)."""
    from consent_based_conversion_adjustments_spark.operators.corpus import (
        dsir_importance_weights,
    )
    import pyspark.sql.functions as F

    target_text = "spark query plan shuffle join agg"
    other_text = "zebra quokka lemur wombat okapi gnu"
    rows = (
        [(i, target_text, "tgt") for i in range(10)]
        + [(100 + i, other_text, "other") for i in range(10)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    target = docs.filter(F.col("source") == "tgt")
    out = {
        r["doc_id"]: r["weight"]
        for r in dsir_importance_weights(docs, target, "text", "doc_id").collect()
    }
    assert len(out) == 20
    tgt_like = [out[i] for i in range(10)]
    other = [out[100 + i] for i in range(10)]
    assert min(tgt_like) > max(other)
    assert len(set(tgt_like)) == 1 and len(set(other)) == 1  # content-pure


def test_vocab_heavy_hitters_tiny_support_clamped(spark):
    """freqItems enforces a minimum support of 1e-4; caller supports whose
    sketch threshold (support/2) would fall below that floor must still
    return EXACT results — the cascade skips the sketch entirely and runs
    the plain groupBy-HAVING path, because clamping the sketch threshold
    up would break its superset guarantee (terms with true frequency in
    [support, 1e-4) could be silently dropped)."""
    rows = (
        [(i, "alpha beta common") for i in range(30)]
        + [(100 + i, f"rare{i} common") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # support 1.5e-4 → support/2 is BELOW freqItems' floor; floor count is
    # 130 * 1.5e-4 ≈ 0.0195, so every term (even rare*, count 1) qualifies
    got = {
        (r["term"], r["n_occurrences"])
        for r in C.vocab_heavy_hitters(df, support=1.5e-4).collect()
    }
    want = {("alpha", 30), ("beta", 30), ("common", 40)} | {
        (f"rare{i}", 1) for i in range(10)
    }
    assert got == want


def test_vocab_heavy_hitters_subfloor_support_stays_exact(spark):
    """Regression: support < 1e-4 with a term whose TRUE frequency sits in
    [support, 1e-4). The old code clamped the sketch threshold up to
    freqItems' 1e-4 floor, whose superset guarantee no longer covered such
    terms — they could vanish silently. The exact-fallback path must
    return them."""
    # 40 docs x 1,000 tokens = 40,000 total; "needle" appears 3 times →
    # true frequency 7.5e-5, inside [5e-5, 1e-4)
    filler = " ".join(f"w{i % 997}" for i in range(1000))
    rows = [(d, filler) for d in range(40)]
    rows.append((40, "needle needle needle"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["term"]: r["n_occurrences"]
        for r in C.vocab_heavy_hitters(df, support=5e-5).collect()
    }
    assert got["needle"] == 3


def test_weighted_sample_matches_python_oracle(spark):
    """A-ES keys replayed in Python select the identical id set, and a
    dominant-weight item is always chosen."""
    import math

    from consent_based_conversion_adjustments_spark.operators.corpus import (
        ES_MOD,
        ES_MULT,
        weighted_sample,
    )

    rows = [(i, 10 ** 6 if i == 7 else (i % 5) + 1) for i in range(1, 41)]
    df = spark.createDataFrame(rows, "doc_id long, w long")

    def key(i, w):
        u = ((i * ES_MULT) % ES_MOD + 0.5) / float(ES_MOD)
        return math.log(u) / max(float(w), 1e-12)

    expect = {
        i for i, _ in sorted(
            rows, key=lambda r: (-key(r[0], r[1]), r[0])
        )[:10]
    }
    got = {
        r["doc_id"]
        for r in weighted_sample(df, "w", 10, id_col="doc_id").collect()
    }
    assert got == expect
    assert 7 in got  # the ~10^6-weight item is effectively certain


def test_weighted_sample_global_plan_is_take_ordered(spark):
    """Global mode must be per-partition top-k (TakeOrderedAndProject),
    never a global single-partition sort."""
    from consent_based_conversion_adjustments_spark.operators.corpus import (
        weighted_sample,
    )

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("w")
    )
    plan = weighted_sample(df, "w", 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_grouped_respects_k_and_determinism(spark):
    from consent_based_conversion_adjustments_spark.operators.corpus import (
        weighted_sample,
    )

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("src"),
        (F.col("id") % 9 + 1).alias("w"),
    )
    a = weighted_sample(df, "w", 6, by="src").collect()
    b = weighted_sample(df, "w", 6, by="src").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per = {}
    for r in a:
        per[r["src"]] = per.get(r["src"], 0) + 1
    assert all(v == 6 for v in per.values()) and len(per) == 4


def test_leakage_safe_splits_no_straddling_pairs(spark):
    """The invariant the operator exists for: zero near-dup pairs
    straddle splits (split_leakage_pairs' audit comes back clean when
    splitting on the cluster key)."""
    from consent_based_conversion_adjustments_spark.operators import dedup as D

    base = "common shared tokens alpha beta gamma delta epsilon zeta eta"
    docs = [(i, f"{base} tail{i % 3}") for i in range(30)] + [
        (100 + i, f"unique doc number {i} with its own words entirely{i}")
        for i in range(10)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = D.minhash_neardup(df, "text", "doc_id", threshold=0.8)
    cc = D.connected_components(pairs, a_col="doc_a", b_col="doc_b")
    keyed = (
        df.select("doc_id")
        .join(cc, df["doc_id"] == cc["node"], "left")
        .select(
            "doc_id", F.coalesce("component", "doc_id").alias("split_key")
        )
    )
    splits = C.assign_split(keyed, "split_key").select("doc_id", "split")
    j = (
        pairs.join(
            splits.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "split", "sa"
            ),
            "doc_a",
        )
        .join(
            splits.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "split", "sb"
            ),
            "doc_b",
        )
        .filter(F.col("sa") != F.col("sb"))
    )
    assert pairs.count() > 0, "fixture must contain near-dup pairs"
    assert j.count() == 0


def test_lm_cross_entropy_matches_python_reference(spark):
    ref_texts = ["the cat sat", "the cat ran", "the dog sat"]
    all_texts = ref_texts + ["the cat sat", "zebra quark flux"]
    df = spark.createDataFrame(
        [(i, t, "ref" if i < 3 else "other") for i, t in enumerate(all_texts)],
        "doc_id long, text string, source string",
    )
    out = {
        r.doc_id: (r.n_tokens, r.cross_entropy)
        for r in C.lm_cross_entropy(
            df, df.filter(F.col("source") == "ref"), "text", "doc_id"
        ).collect()
    }

    # pure-Python twin
    a = 0.5
    uni, big = {}, {}
    for t in ref_texts:
        ws = t.split()
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for p, c in zip(ws, ws[1:]):
            big[(p, c)] = big.get((p, c), 0) + 1
    n, v = sum(uni.values()), len(uni)
    for i, t in enumerate(all_texts):
        ws = t.split()
        lp = math_log((uni.get(ws[0], 0) + a) / (n + a * v))
        for p, c in zip(ws, ws[1:]):
            lp += math_log((big.get((p, c), 0) + a) / (uni.get(p, 0) + a * v))
        want = -lp / len(ws)
        got_n, got_ce = out[i]
        assert got_n == len(ws)
        assert abs(got_ce - want) < 1e-9, (i, got_ce, want)

    # in-domain text scores strictly better than OOV gibberish
    assert out[3][1] < out[4][1]


def test_bigram_pmi_matches_python_reference(spark):
    texts = [
        "new york new york city hall",
        "city hall new york is big",
        "the big apple is new york",
    ] * 3  # tile so pairs clear min_count
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.prev, r.cur): (r.pair_count, r.pmi)
        for r in C.bigram_pmi(df, "text", min_count=3).collect()
    }

    uni, pairs = {}, {}
    for t in texts:
        ws = t.split()
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for p, c in zip(ws, ws[1:]):
            pairs[(p, c)] = pairs.get((p, c), 0) + 1
    n1, n2 = sum(uni.values()), sum(pairs.values())
    want = {
        k: (c, math_log((c / n2) / ((uni[k[0]] / n1) * (uni[k[1]] / n1))))
        for k, c in pairs.items()
        if c >= 3
    }
    assert set(got) == set(want)
    for k, (c, pmi) in want.items():
        assert got[k][0] == c
        assert abs(got[k][1] - pmi) < 1e-9
    # the fused collocation scores above independence, function words below
    assert got[("new", "york")][1] > 0


def test_bm25_matches_python_reference(spark):
    """bm25_topk vs a literal pure-Python Okapi BM25 on a hand fixture:
    scores, ranking, and the n_matched_terms column."""
    from math import log

    texts = [
        "hash join hash join hash",        # high tf, short
        "hash join scan scan scan scan scan scan scan scan",  # long
        "join vector",
        "scan filter sort group window",   # no query term -> absent
        "hash",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    q = ["hash", "join"]
    got = {
        r.doc_id: (r.score, r.n_matched_terms)
        for r in C.bm25_topk(df, q, "text", "doc_id", k=10).collect()
    }

    docs = [t.split() for t in texts]
    n = float(len(docs))
    avgdl = sum(len(d) for d in docs) / n
    dfreq = {t: sum(1 for d in docs if t in d) for t in q}
    k1, b = 1.2, 0.75
    want = {}
    for i, d in enumerate(docs):
        s, m = 0.0, 0
        for t in q:
            tf = d.count(t)
            if tf == 0:
                continue
            m += 1
            idf = log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(d) / avgdl))
        if m:
            want[i] = (round(s - 1e-9, 6) + 0.0, m)
    assert got == want
    # retrieval invariants: doc 0 (dense, short) beats doc 1 (sparse, long)
    assert got[0][0] > got[1][0]
    # n_matched_terms: docs 0/1 hit both query terms, docs 2/4 just one
    assert {i: got[i][1] for i in got} == {0: 2, 1: 2, 2: 1, 4: 1}


def test_bm25_topk_cutoff_is_deterministic(spark):
    """Equal-score ties at the k-cutoff break by doc_id ascending."""
    # 6 identical docs -> identical scores; k=3 must keep ids 0,1,2
    df = spark.createDataFrame(
        [(i, "hash join") for i in range(6)], "doc_id long, text string"
    )
    got = [
        r.doc_id
        for r in C.bm25_topk(df, ["hash"], "text", "doc_id", k=3).collect()
    ]
    assert got == [0, 1, 2]


def test_frequent_item_pairs_matches_python(spark):
    """A-Priori pair mining vs literal Python counting, including the
    item-level pruning semantics (pairs of frequent-but-never-co-
    occurring items absent; pairs involving infrequent items absent even
    when the PAIR would meet support through duplicates)."""
    texts = [
        "a b c",
        "a b d",
        "a b e rare1",
        "c d e",
        "a c rare2",
        "b c d e",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    ms = 3
    got = {
        (r.item_a, r.item_b): r.pair_support
        for r in C.frequent_item_pairs(
            df, "text", "doc_id", min_support=ms
        ).collect()
    }
    support = {}
    baskets = [sorted(set(t.split())) for t in texts]
    for b in baskets:
        for it in b:
            support[it] = support.get(it, 0) + 1
    freq = {it for it, s in support.items() if s >= ms}
    want = {}
    for b in baskets:
        kept = [it for it in b if it in freq]
        for i in range(len(kept)):
            for j in range(i + 1, len(kept)):
                want[(kept[i], kept[j])] = want.get((kept[i], kept[j]), 0) + 1
    want = {k: v for k, v in want.items() if v >= ms}
    assert got == want
    assert ("rare1", "rare2") not in got and len(want) > 0


def test_global_ntile_matches_window_ntile(spark):
    """global_ntile == ntile() OVER (ORDER BY ...) including the
    remainder buckets, on an N not divisible by n."""
    from pyspark.sql import Window

    n_rows, n_buckets = 103, 8
    df = spark.createDataFrame(
        [(i, (i * 37) % 101) for i in range(n_rows)], "id long, v long"
    )
    got = {
        r.id: r.ntile
        for r in C.global_ntile(df, ["v", "id"], n_buckets).collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        r.id: r.nt
        for r in df.withColumn(
            "nt", F.ntile(n_buckets).over(w)
        ).collect()
    }
    assert got == want
    sizes = {}
    for b in got.values():
        sizes[b] = sizes.get(b, 0) + 1
    # 103 = 8*12 + 7: first 7 buckets get 13, the last gets 12
    assert sorted(sizes.values(), reverse=True) == [13] * 7 + [12]


def test_spearman_correlation_matches_python(spark):
    """Exact Σd² Spearman vs a literal Python computation; monotone
    transform gives rho == 1, reversal gives rho == -1."""
    # (i*7) % 40 is a bijection on 0..39 (gcd(7,40)=1) -> tie-free x
    vals = [(i, float((i * 7) % 40), float(((i * 7) % 40) ** 3), i)
            for i in range(40)]
    df = spark.createDataFrame(vals, "id long, x double, y double, tb long")
    r = C.spearman_correlation(df, "x", "y", "tb").collect()[0]
    assert r.n == 40
    assert abs(r.spearman_rho - 1.0) < 1e-12  # y = x^3 is monotone in x

    df2 = df.withColumn("y", -F.col("y"))
    r2 = C.spearman_correlation(df2, "x", "y", "tb").collect()[0]
    assert abs(r2.spearman_rho + 1.0) < 1e-12

    # general case vs Python (tie-free by the tiebreak convention)
    rows = [(i, float((i * 13) % 17), float((i * 5) % 11), i)
            for i in range(30)]
    df3 = spark.createDataFrame(rows, "id long, x double, y double, tb long")
    r3 = C.spearman_correlation(df3, "x", "y", "tb").collect()[0]
    xs = sorted(range(30), key=lambda i: (rows[i][1], rows[i][3]))
    ys = sorted(range(30), key=lambda i: (rows[i][2], rows[i][3]))
    rx = {i: k + 1 for k, i in enumerate(xs)}
    ry = {i: k + 1 for k, i in enumerate(ys)}
    sd2 = sum((rx[i] - ry[i]) ** 2 for i in range(30))
    want = 1.0 - 6.0 * sd2 / (30 * (30 * 30 - 1))
    assert abs(r3.spearman_rho - want) < 1e-12


def test_event_path_counts_matches_python(spark):
    """Sliding 3-paths per user vs a literal Python count, with the
    deterministic (count desc, path asc) cutoff."""
    import datetime

    t0 = datetime.datetime(2024, 5, 1)
    seqs = {1: "ABCABC", 2: "ABCD", 3: "AB", 4: "CABCA"}
    rows, eid = [], 0
    for u, s in seqs.items():
        for i, ch in enumerate(s):
            rows.append((u, t0 + datetime.timedelta(minutes=i), ch, eid))
            eid += 1
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    got = [
        (r.path, r.n_paths)
        for r in C.event_path_counts(ev, length=3, k=5).collect()
    ]
    want = {}
    for s in seqs.values():
        for i in range(len(s) - 2):
            p = ">".join(s[i : i + 3])
            want[p] = want.get(p, 0) + 1
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == top
    assert got[0] == ("A>B>C", 4)  # appears in users 1 (x2), 2, 4


def test_winsorize_stats_golden(spark):
    """Clip counts and bounds on a hand-checkable 1..100 column: p10/p90
    interpolated bounds, 9 clipped low / 9 high (strict inequality),
    clipped min/max equal the bounds."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], "id long, v double"
    )
    r = C.winsorize_stats(df, "v", 0.10, 0.90).collect()[0]
    # exact interpolated percentiles of 1..100: p10 = 10.9, p90 = 90.1
    assert abs(r.lower_bound - 10.9) < 1e-9
    assert abs(r.upper_bound - 90.1) < 1e-9
    assert r.n_clipped_low == 10 and r.n_clipped_high == 10
    assert r.n_rows == 100
    assert abs(r.clipped_min - 10.9) < 1e-9
    assert abs(r.clipped_max - 90.1) < 1e-9


def test_time_weighted_avg_golden(spark):
    """TWAP on a hand fixture: value 10 held 30s then 20 held 10s ->
    (10*30 + 20*10)/40 = 12.5; the last observation carries no weight;
    single-observation keys yield no row."""
    import datetime

    from consent_based_conversion_adjustments_spark.operators.timeseries import (
        time_weighted_avg,
    )

    t0 = datetime.datetime(2024, 6, 1)

    def at(s):
        return t0 + datetime.timedelta(seconds=s)

    rows = [
        (1, at(0), 10.0, 0),
        (1, at(30), 20.0, 1),
        (1, at(40), 99.0, 2),   # last -> excluded
        (2, at(0), 5.0, 3),     # lone observation -> no row
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long"
    )
    got = {
        r.user_id: (r.twap, r.total_seconds, r.n_intervals)
        for r in time_weighted_avg(
            df, "user_id", "ts", "value", "event_id"
        ).collect()
    }
    assert set(got) == {1}
    twap, total, n = got[1]
    assert abs(twap - 12.5) < 1e-9 and total == 40.0 and n == 2


def test_mad_anomalies_flags_exactly_the_outliers(spark):
    """Median/MAD rule on a MAD=1 fixture: exactly the two planted
    outliers flag (robust_z = |v-10|/1.4826), nothing in the base band;
    scores match the literal formula."""
    from consent_based_conversion_adjustments_spark.operators.timeseries import (
        mad_anomalies,
    )

    base = [float(v) for v in (9, 10, 11, 12, 8, 10, 9, 11, 12, 8)] * 5
    vals = base + [1000.0, -400.0]
    df = spark.createDataFrame(
        [(i, "t", v) for i, v in enumerate(vals)],
        "event_id long, event_type string, value double",
    )
    got = {
        r.event_id: r.robust_z
        for r in mad_anomalies(df, "event_type", "value").collect()
    }
    assert set(got) == {len(vals) - 2, len(vals) - 1}
    # median 10, MAD 1 -> robust_z = |v - 10| / 1.4826
    assert abs(got[len(vals) - 2] - 990 / 1.4826) < 1e-9
    assert abs(got[len(vals) - 1] - 410 / 1.4826) < 1e-9


def test_mad_anomalies_degenerate_zero_mad(spark):
    """A group with >half identical values has MAD=0: the rule
    degenerates to 'any deviation flags' (robust_z = +inf) without an
    ANSI division error."""
    import math

    from consent_based_conversion_adjustments_spark.operators.timeseries import (
        mad_anomalies,
    )

    vals = [10.0] * 8 + [10.5, 99.0]
    df = spark.createDataFrame(
        [(i, "t", v) for i, v in enumerate(vals)],
        "event_id long, event_type string, value double",
    )
    got = {
        r.event_id: r.robust_z
        for r in mad_anomalies(df, "event_type", "value").collect()
    }
    assert set(got) == {8, 9}
    assert all(math.isinf(z) for z in got.values())


def test_global_running_sum_matches_window(spark):
    """Distributed prefix scan == sum() OVER (ORDER BY ...) on a fixture
    spanning many partitions, including NULL values (treated as 0) and
    the co-emitted rank."""
    from pyspark.sql import Window

    rows = [
        (i, float((i * 37) % 101) if i % 11 else None, i) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id long, v double, tb long")
    got = {
        r.id: (r.rank, r.running_sum)
        for r in C.global_running_sum(
            df, ["v", "tb"], "v", num_partitions=7
        ).collect()
    }
    w = Window.orderBy(F.col("v").asc(), F.col("tb").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = {
        r.id: (r.rk, r.rs)
        for r in df.withColumn(
            "rs", F.sum(F.coalesce("v", F.lit(0.0))).over(w)
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.col("v").asc(), F.col("tb").asc())
            ),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in got:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-9


def test_ks_statistic_matches_scipy_free_python(spark):
    """KS distance vs a literal Python two-sample computation with
    right-continuous tie handling; identical samples give D == 0 and a
    disjoint shift gives D == 1."""
    xa = [float(v % 13) for v in range(40)]
    xb = [float((v * 3) % 17) for v in range(60)]
    a = spark.createDataFrame(
        [(i, v) for i, v in enumerate(xa)], "id long, v double"
    )
    b = spark.createDataFrame(
        [(i, v) for i, v in enumerate(xb)], "id long, v double"
    )
    r = C.ks_statistic(a, b, "v", "id").collect()[0]
    assert (r.n_a, r.n_b) == (40, 60)

    def cdf(xs, v):
        return sum(1 for x in xs if x <= v) / len(xs)

    want = max(
        abs(cdf(xa, v) - cdf(xb, v)) for v in sorted(set(xa) | set(xb))
    )
    assert abs(r.ks_d - want) < 1e-12

    same = C.ks_statistic(a, a.withColumnRenamed("id", "id"), "v", "id")
    assert abs(same.collect()[0].ks_d) < 1e-12
    shifted = b.withColumn("v", F.col("v") + 100.0)
    far = C.ks_statistic(a, shifted, "v", "id").collect()[0]
    assert abs(far.ks_d - 1.0) < 1e-12


def test_weighted_quantile_matches_python(spark):
    """Lower-bound weighted quantiles vs a literal Python computation;
    uniform weights reduce to the plain lower-bound quantile."""
    rows = [(i, float((i * 37) % 101), float(1 + (i * 13) % 9), i)
            for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x double, w double, tb long")
    qs = [0.25, 0.5, 0.9]
    r = C.weighted_quantile(df, "x", "w", qs, "tb").collect()[0]
    assert r.n == 200

    srt = sorted(rows, key=lambda t: (t[1], t[3]))
    tw = sum(t[2] for t in rows)
    for q in qs:
        cw = 0.0
        for t in srt:
            cw += t[2]
            if cw >= q * tw:
                want = t[1]
                break
        got = getattr(r, f"wq_{str(q).replace('.', '_')}")
        assert got == want, q

    ones = df.withColumn("w", F.lit(1.0))
    r1 = C.weighted_quantile(ones, "x", "w", [0.5], "tb").collect()[0]
    xs = sorted(t[1] for t in rows)
    assert r1.wq_0_5 == xs[99]  # cw >= 100 at the 100th row (1-based)


def test_grouped_weighted_median_matches_python(spark):
    """Per-group lower-bound weighted median vs literal Python, on
    groups with even/odd totals and a weight-skewed group where the
    unweighted median would differ."""
    rows = []
    rid = 0
    for g, pairs in {
        "a": [(1.0, 1.0), (2.0, 1.0), (3.0, 1.0)],           # plain median 2
        "b": [(1.0, 10.0), (2.0, 1.0), (3.0, 1.0)],          # weight-skew -> 1
        "c": [(5.0, 2.0), (7.0, 2.0)],                       # tie at half -> 5
    }.items():
        for x, w in pairs:
            rows.append((g, x, w, rid))
            rid += 1
    df = spark.createDataFrame(rows, "g string, x double, w double, tb long")
    got = {
        r.g: (r.weighted_median, r.total_weight, r.n_rows)
        for r in C.grouped_weighted_median(df, "g", "x", "w").collect()
    }
    assert got == {
        "a": (2.0, 3.0, 3),   # cw: 1,2,3; 0.5*3=1.5 -> first cw>=1.5 is x=2
        "b": (1.0, 12.0, 3),  # cw: 10 >= 6 at x=1
        "c": (5.0, 4.0, 2),   # cw: 2 >= 2 at x=5 (lower-bound convention)
    }


def test_event_transition_matrix_matches_python(spark):
    """Transition probabilities vs literal Python counting; rows per
    state sum to 1; cross-user boundaries contribute no transition."""
    import datetime

    t0 = datetime.datetime(2024, 7, 1)
    seqs = {1: "AABAC", 2: "BC", 3: "A"}
    rows, eid = [], 0
    for u, s in seqs.items():
        for i, ch in enumerate(s):
            rows.append((u, t0 + datetime.timedelta(minutes=i), ch, eid))
            eid += 1
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    got = {
        (r.state, r.next_state): (r.n_transitions, r.prob)
        for r in C.event_transition_matrix(ev).collect()
    }
    want_counts = {}
    for s in seqs.values():
        for a, b in zip(s, s[1:]):
            want_counts[(a, b)] = want_counts.get((a, b), 0) + 1
    tots = {}
    for (a, _), c in want_counts.items():
        tots[a] = tots.get(a, 0) + c
    assert set(got) == set(want_counts)
    for k, c in want_counts.items():
        assert got[k][0] == c
        assert abs(got[k][1] - c / tots[k[0]]) < 1e-9
    # per-state rows sum to 1
    by_state = {}
    for (a, _), (_, p) in got.items():
        by_state[a] = by_state.get(a, 0.0) + p
    assert all(abs(v - 1.0) < 1e-9 for v in by_state.values())
    # user 3's lone event and the 1->2 user boundary produce nothing
    assert ("C", "B") not in got


def test_pretrain_pipeline_composition_invariants(spark):
    """The composed cleaning pipeline (lang → quality → exact dedup →
    near-dup removal): survivors are a subset of each earlier stage, the
    funnel is monotone, and no near-dup pair survives intact (every
    pair's higher id was removed, so re-running MinHash over the
    survivor set yields nothing)."""
    from consent_based_conversion_adjustments_spark.operators import dedup as D
    from consent_based_conversion_adjustments_spark.plans.data_queries import (
        JACCARD_THRESHOLD,
        corpus_pretrain_funnel,
        corpus_pretrain_ids,
    )

    sf = "/root/testdata/sf0.001"
    survivors = {r["doc_id"] for r in corpus_pretrain_ids(spark, sf).collect()}
    funnel = {
        r["stage"]: r["n_docs"]
        for r in corpus_pretrain_funnel(spark, sf).collect()
    }
    assert funnel["1_raw"] >= funnel["2_lang_quality"] >= funnel[
        "3_exact_dedup"
    ] >= funnel["4_neardup_survivors"]
    assert funnel["4_neardup_survivors"] == len(survivors)
    assert funnel["2_lang_quality"] > 0  # gates must actually pass docs

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    kept = docs.filter(F.col("doc_id").isin(list(survivors)))
    residual = D.minhash_neardup(
        kept, "text", "doc_id", threshold=JACCARD_THRESHOLD
    )
    assert residual.count() == 0


def test_nb_quality_matches_manual_computation(spark):
    """Multinomial NB (add-one smoothing) against a by-hand replay on a
    tiny labeled corpus, including an unseen-token doc and a zero-token
    doc (which must score exactly the log-prior ratio)."""
    from math import log

    rows = [
        (0, "good clean prose here", True),
        (1, "good solid prose", True),
        (2, "spam spam junk", False),
        (3, "junk junk junk spam", False),
        (4, "prose with unseen zebra", True),
        (5, "", False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, label boolean")
    out = {
        r["doc_id"]: (r["n_tokens"], r["nb_score"])
        for r in C.nb_quality_scores(df, df).collect()
    }

    # manual replay
    from collections import Counter

    n1, n0 = Counter(), Counter()
    d1 = d0 = 0
    for _, text, y in rows:
        toks = text.split()
        if y:
            d1 += 1
            n1.update(toks)
        else:
            d0 += 1
            n0.update(toks)
    vocab = set(n1) | set(n0)
    N1, N0, V = sum(n1.values()), sum(n0.values()), len(vocab)
    prior = log((d1 + 1.0) / (d0 + 1.0))

    def llr(t):
        return log((n1[t] + 1.0) / (N1 + V)) - log((n0[t] + 1.0) / (N0 + V))

    for doc_id, text, _ in rows:
        toks = text.split()
        expected = prior + sum(llr(t) for t in toks)
        got_n, got_s = out[doc_id]
        assert got_n == len(toks)
        assert abs(got_s - expected) < 1e-9, doc_id

    assert out[5][1] == pytest.approx(prior)  # zero-token doc = prior
    assert out[0][1] > 0 > out[2][1]  # classifier separates the classes


def test_doc_gopher_rules_thresholds(spark, tmp_path):
    """Hand-built corpus hitting each rule edge: a passing doc, a
    too-short doc, a stopword-free doc, and a duplicate-line doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from consent_based_conversion_adjustments_spark.plans.corpus_queries import (
        doc_gopher_rules,
    )

    passing = "the quick brown fox and the lazy dog that have been " * 5
    short = "the and of that have with to be"
    no_stops = "alpha beta gamma delta epsilon zeta " * 10
    dup_lines = "\n".join(
        ["the line of text and that have with to be word " * 5] * 10
    )
    rows = [
        (1, passing, "web"),
        (2, short, "web"),
        (3, no_stops, "web"),
        (4, dup_lines, "web"),
    ]
    tbl = pa.Table.from_pylist(
        [{"doc_id": i, "text": t, "source": s} for i, t, s in rows]
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    got = {
        r["doc_id"]: r.asDict()
        for r in doc_gopher_rules(spark, str(tmp_path)).collect()
    }
    assert got[1]["passes"] == 1
    assert got[2]["ok_word_count"] == 0 and got[2]["passes"] == 0
    assert got[3]["ok_stop_hits"] == 0 and got[3]["passes"] == 0
    assert got[4]["ok_dup_lines"] == 0 and got[4]["passes"] == 0
    # dup-line doc: 10 identical lines -> 9/10 duplicates
    assert abs(got[4]["dup_line_ratio"] - 0.9) < 1e-9
    # raw signals present and sane on the passing doc
    assert got[1]["n_words"] >= 50
    assert 3.0 <= got[1]["mean_word_len"] <= 10.0
    assert got[1]["alpha_ratio"] == 1.0


def test_mixture_waterfill_caps_and_conserves():
    """Small sources cap at 11/5 epochs; surplus water-fills onto the
    uncapped; total allocation equals the budget exactly."""
    from consent_based_conversion_adjustments_spark.operators.corpus import (
        mixture_waterfill,
    )

    res = mixture_waterfill([("a", 100), ("b", 10000), ("c", 9000), ("d", 500)])
    by = {r["source"]: r for r in res}
    assert by["a"]["capped"] == 1 and by["a"]["epochs"] == 2.2
    assert by["d"]["capped"] == 1 and by["d"]["epochs"] == 2.2
    assert by["b"]["capped"] == 0 and by["c"]["capped"] == 0
    total = sum(r["alloc_tokens"] for r in res)
    assert total == 2.0 * (100 + 10000 + 9000 + 500)
    # uncapped epochs exceed the 2.0 flat rate (they absorbed the surplus)
    assert by["b"]["epochs"] > 1.9 and by["c"]["epochs"] > 2.0


def test_mixture_waterfill_uniform_sources_flat():
    from consent_based_conversion_adjustments_spark.operators.corpus import (
        mixture_waterfill,
    )

    res = mixture_waterfill([(f"s{i}", 1000) for i in range(5)])
    assert all(r["capped"] == 0 for r in res)
    for r in res:
        assert abs(r["epochs"] - 2.0) < 1e-12


def test_mixture_waterfill_rejects_empty_source():
    import pytest

    from consent_based_conversion_adjustments_spark.operators.corpus import (
        mixture_waterfill,
    )

    with pytest.raises(ValueError, match="tokens > 0"):
        mixture_waterfill([("a", 0), ("b", 10)])


def test_mixture_waterfill_rejects_more_sources_than_iters():
    """ADVICE r11: iters only guarantees the capped-set fixpoint for
    ≤ iters sources — more must raise loudly, not silently allocate past
    the epoch cap (and the oracle CTE chain replays exactly iters
    passes, so fudging iters here would desync the engines)."""
    import pytest

    from consent_based_conversion_adjustments_spark.operators.corpus import (
        mixture_waterfill,
    )

    counts = [(f"s{i}", 10 + i) for i in range(25)]
    with pytest.raises(ValueError, match="exceed iters"):
        mixture_waterfill(counts)  # default iters=24 < 25 sources
    # raising iters to cover the source count is the documented remedy
    res = mixture_waterfill(counts, iters=25)
    assert len(res) == 25
    budget = 2.0 * sum(t for _, t in counts)
    if any(not r["capped"] for r in res):
        total = sum(r["alloc_tokens"] for r in res)
        assert abs(total - budget) <= budget * 1e-9


def test_mixture_waterfill_invariants_property():
    """Property test: for arbitrary positive token counts, the water-fill
    (a) conserves the budget exactly whenever any source is uncapped,
    (b) never allocates beyond the cap, (c) gives every uncapped source
    the same tokens-per-weight rate."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from consent_based_conversion_adjustments_spark.operators.corpus import (
        mixture_waterfill,
    )

    @settings(max_examples=80, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=1, max_value=10_000_000),
            min_size=1,
            max_size=12,
        )
    )
    def run(tokens):
        counts = [(f"s{i}", t) for i, t in enumerate(tokens)]
        res = mixture_waterfill(counts)
        total_t = sum(tokens)
        budget = 2.0 * total_t
        uncapped = [r for r in res if not r["capped"]]
        for r in res:
            assert r["alloc_tokens"] <= 2.2 * r["n_tokens"] * (1 + 1e-12)
            assert r["alloc_tokens"] > 0
        if uncapped:
            total = sum(r["alloc_tokens"] for r in res)
            assert abs(total - budget) <= budget * 1e-9
            rates = [r["alloc_tokens"] / r["weight"] for r in uncapped]
            assert max(rates) - min(rates) <= max(rates) * 1e-9

    run()
