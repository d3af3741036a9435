"""Property-style invariants: conservation under random k / radius / data.

SURVEY.md §5 rebuild plan item 4 — hypothesis drives seeded synthetic
consent/noconsent tables through the full adjustment; the conservation and
row-preservation invariants must hold for every draw.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import pyspark.sql.functions as F

from consent_based_conversion_adjustments_spark.config import AdjustmentConfig
from consent_based_conversion_adjustments_spark.pipeline import run_adjustment


def _make_tables(spark, seed, n_consent, n_noconsent, n_cats):
    rng = np.random.RandomState(seed)
    cats = [f"cat_{i}" for i in range(n_cats)]
    rows = [
        (
            i,
            cats[rng.randint(n_cats)],
            int(rng.randint(0, 3)),
            float(np.round(rng.lognormal(1) + 0.01, 2)),
            i < n_consent,
        )
        for i in range(n_consent + n_noconsent)
    ]
    df = spark.createDataFrame(
        rows, ["rid", "segment", "tier", "conversion_value", "is_consent"]
    )
    return (
        df.filter("is_consent").drop("is_consent"),
        df.filter("not is_consent").drop("is_consent"),
    )


CFG = dict(conversion_column="conversion_value", id_columns=["rid"])


@settings(max_examples=5, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    k=st.integers(1, 8),
)
def test_knn_conservation_random(spark, seed, k):
    consent, noconsent = _make_tables(spark, seed, 40, 15, 4)
    cfg = AdjustmentConfig(**CFG, number_nearest_neighbors=k)
    adjusted = run_adjustment(consent, noconsent, cfg).data_adjusted
    got = adjusted.agg(
        F.sum("adjusted_conversion").alias("added"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    expected = noconsent.agg(F.sum("conversion_value")).first()[0]
    assert got["n"] == consent.count()
    # kNN matches every probe → exact conservation
    assert got["added"] == pytest.approx(expected, rel=1e-9)


@settings(max_examples=5, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    radius=st.sampled_from([0.0, 2.0, 4.0, 100.0]),
)
def test_radius_upper_bound_random(spark, seed, radius):
    consent, noconsent = _make_tables(spark, seed, 30, 12, 3)
    cfg = AdjustmentConfig(**CFG, radius=radius)
    result = run_adjustment(consent, noconsent, cfg)
    added = result.data_adjusted.agg(F.sum("adjusted_conversion")).first()[0]
    total = noconsent.agg(F.sum("conversion_value")).first()[0]
    # invariant 2: scattered value never exceeds the probe-side total; with
    # a huge radius every probe matches and it is exact
    assert added <= total + 1e-9
    if radius >= 100.0:
        assert added == pytest.approx(total, rel=1e-9)
    # matched-pair weights per probe always sum to ~1
    from consent_based_conversion_adjustments_spark.operators.adjust import (
        softmax_weights,
    )

    pairs = result.matched_pairs
    if pairs.count() > 0:
        sums = (
            softmax_weights(
                pairs,
                probe_id="__probe_row_id",
                conversion_column="conversion_value",
            )
            .groupBy("__probe_row_id")
            .agg(F.sum("weight").alias("w"))
            .collect()
        )
        for r in sums:
            assert r["w"] == pytest.approx(1.0, rel=1e-12)


@settings(max_examples=5, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_interval_bin_join_equals_naive_random(spark, seed):
    """For random events and random (possibly zero-length, boundary-
    touching, multi-bin) intervals, the binned range join must equal the
    naive inequality join exactly."""
    import datetime

    from consent_based_conversion_adjustments_spark.streaming.events import (
        interval_bin_join,
    )

    rng = np.random.RandomState(seed)
    t0 = datetime.datetime(2024, 1, 1)

    def at(minutes):
        return t0 + datetime.timedelta(minutes=float(minutes))

    events = spark.createDataFrame(
        [(i, at(rng.uniform(0, 4000))) for i in range(60)],
        "event_id long, ts timestamp",
    )
    ivs = []
    for j in range(25):
        start = rng.uniform(0, 4000)
        length = rng.choice([0.0, rng.uniform(0, 30), rng.uniform(0, 2000)])
        ivs.append((j, at(start), at(start + length)))
    intervals = spark.createDataFrame(
        ivs, "interval_id long, start timestamp, end timestamp"
    )
    got = {
        (r["event_id"], r["interval_id"])
        for r in interval_bin_join(
            events, intervals, bin_seconds=3600
        ).collect()
    }
    expect = {
        (r["event_id"], r["interval_id"])
        for r in events.crossJoin(intervals)
        .filter("ts >= start AND ts < end")
        .collect()
    }
    assert got == expect


@settings(max_examples=5, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    chunk=st.integers(4, 12),
    overlap=st.integers(0, 3),
)
def test_chunk_stitch_roundtrip_random(spark, seed, chunk, overlap):
    """Chunks with overlap o stitch back to the exact original token
    sequence for random documents (including empty and 1-token docs)."""
    from consent_based_conversion_adjustments_spark.operators.corpus import (
        chunk_documents,
    )

    rng = np.random.RandomState(seed)
    words = ["w%d" % i for i in range(30)]
    rows = []
    for d in range(12):
        n = int(rng.randint(0, 40))
        rows.append((d, " ".join(rng.choice(words, n))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(docs, chunk_tokens=chunk, overlap=overlap)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, text in rows:
        toks = text.split()
        got = sorted(by_doc[d], key=lambda r: r["chunk_idx"])
        stitched = got[0]["chunk_text"].split()
        for r in got[1:]:
            stitched.extend(r["chunk_text"].split()[overlap:])
        assert stitched == toks, (d, chunk, overlap)


@settings(max_examples=10, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 300),
    n_parts=st.integers(1, 9),
)
def test_global_rank_is_the_window_rank(spark, seed, n, n_parts):
    """Distributed global_rank ≡ single-partition row_number for arbitrary
    key multisets (heavy ties resolved by the unique id) and any partition
    count, including n_parts > n."""
    from pyspark.sql import Window

    from consent_based_conversion_adjustments_spark.operators.corpus import (
        global_rank,
    )

    rng = np.random.RandomState(seed)
    rows = [(i, int(rng.randint(0, max(n // 10, 2)))) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, key long")
    got = {
        r["id"]: r["rank"]
        for r in global_rank(df, ["key", "id"], num_partitions=n_parts).collect()
    }
    want = {
        r["id"]: r["rank"]
        for r in df.withColumn(
            "rank",
            F.row_number().over(Window.orderBy("key", "id")).cast("long"),
        ).collect()
    }
    assert got == want


def _py_duplicate_spans(docs, n=3, min_count=2):
    """Pure-Python reference for duplicate_spans (same polynomial hash)."""

    def h(s):
        acc = 0
        for ch in s:
            acc = (acc * 31 + ord(ch)) % 1_000_000_007
        return acc

    pos = {}  # doc -> [(p, shingle_hash)]
    counts = {}
    for doc_id, text in docs:
        toks = text.split()
        n_sh = max(len(toks) - (n - 1), 1)
        pos[doc_id] = []
        for p in range(n_sh):
            sh = h(" ".join(toks[p : p + n]))
            pos[doc_id].append((p, sh))
            counts[sh] = counts.get(sh, 0) + 1
    spans = []
    for doc_id, plist in pos.items():
        dup = [p for p, sh in plist if counts[sh] >= min_count]
        start = prev = None
        for p in dup:
            if prev is not None and p - prev <= n:
                prev = p
                continue
            if start is not None:
                spans.append((doc_id, start, prev + n))
            start = prev = p
        if start is not None:
            spans.append((doc_id, start, prev + n))
    return sorted(spans)


@settings(max_examples=5, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_duplicate_spans_match_python_reference(spark, seed):
    from consent_based_conversion_adjustments_spark.operators.dedup import (
        duplicate_spans,
    )

    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> many collisions
    docs = [
        (
            i,
            " ".join(
                vocab[rng.randint(len(vocab))]
                for _ in range(rng.randint(1, 25))
            ),
        )
        for i in range(25)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(df, "text", "doc_id", n=3).collect()
    )
    assert got == _py_duplicate_spans(docs)
    # structural invariants: spans at least n tokens; per-doc spans
    # disjoint with gaps > n (else they would have merged)
    per_doc = {}
    for d, a, b in got:
        assert b - a >= 3
        per_doc.setdefault(d, []).append((a, b))
    for ss in per_doc.values():
        for (a1, b1), (a2, b2) in zip(ss, ss[1:]):
            assert a2 - (b1 - 3) > 3  # next start vs last shingle pos


@settings(max_examples=5, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_asof_join_matches_bruteforce(spark, seed):
    """Property: for random keyed event sets, asof_join(backward) equals
    the brute-force per-left-row argmax of right_ts <= left_ts, with
    the unmatched rows NULL — under any partitioning."""
    import datetime as dt

    import numpy as np

    from consent_based_conversion_adjustments_spark.operators.asof import (
        asof_join,
    )

    rng = np.random.RandomState(seed)
    base = dt.datetime(2024, 1, 1)

    def mk(n):
        rows = []
        seen = set()
        for i in range(n):
            k = int(rng.randint(0, 4))
            t = int(rng.randint(0, 5000))
            if (k, t) in seen:  # unique (key, ts): the documented contract
                continue
            seen.add((k, t))
            rows.append((k, base + dt.timedelta(seconds=t), float(i)))
        return rows

    lrows, rrows = mk(40), mk(25)
    ls = spark.createDataFrame(lrows, "k long, ts timestamp, lv double")
    rs = spark.createDataFrame(
        rrows, "k long, ts timestamp, rv double"
    ).repartition(7)
    got = {
        (r.k, r.ts): r.rv
        for r in asof_join(ls, rs, ["k"], "ts", "ts", ["rv"]).collect()
    }
    for k, ts, _ in lrows:
        cands = [(t, v) for (kk, t, v) in rrows if kk == k and t <= ts]
        want = max(cands)[1] if cands else None
        assert got[(k, ts)] == want, (k, ts)
