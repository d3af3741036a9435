"""Tests for the behavioral-analytics operators (multi-touch attribution,
audience overlap exact + theta-sketched) and the token-distribution
statistics (JS divergence, chi-square scoring)."""

import math
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from consent_based_conversion_adjustments_spark.operators import behavior as B
from consent_based_conversion_adjustments_spark.operators import corpus as C

TS = datetime


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double, campaign long"
    )


class TestTouchAttribution:
    def fixture(self, spark):
        h = 3600
        rows = [
            # user 1: two clicks (campaigns 0, 1) then a purchase of 100
            # 2h and 1h before the conversion
            (1, 1, TS(2024, 1, 1, 10, 0, 0), "click", 0.0, 0),
            (2, 1, TS(2024, 1, 1, 11, 0, 0), "click", 0.0, 1),
            (3, 1, TS(2024, 1, 1, 12, 0, 0), "purchase", 100.0, 9),
            # user 2: one click exactly at the lookback lower bound
            # (included: window is [T-W, T)) and one at T (excluded)
            (4, 2, TS(2024, 1, 1, 0, 0, 0), "click", 0.0, 2),
            (5, 2, TS(2024, 1, 2, 0, 0, 0), "click", 0.0, 3),
            (6, 2, TS(2024, 1, 2, 0, 0, 0), "purchase", 50.0, 9),
            # user 3: purchase with no click in window → unattributed
            (7, 3, TS(2024, 1, 5, 0, 0, 0), "purchase", 70.0, 9),
        ]
        return _events(spark, rows)

    def test_golden_linear_and_decay(self, spark):
        ev = self.fixture(spark)
        out = B.touch_attribution(
            ev,
            lookback_seconds=24 * 3600,
            halflife_seconds=3600,
            group_expr=F.col("campaign"),
            group_name="campaign",
        ).collect()
        by_c = {r["campaign"]: r for r in out}
        # user 1's purchase splits 50/50 linearly between campaigns 0, 1
        assert by_c[0]["attributed_linear"] == pytest.approx(50.0)
        assert by_c[1]["attributed_linear"] == pytest.approx(50.0)
        # decay with halflife 1h: ages 2h and 1h → weights 1/4 and 1/2
        # → shares 1/3 and 2/3 of 100
        assert by_c[0]["attributed_decay"] == pytest.approx(100 / 3, abs=1e-3)
        assert by_c[1]["attributed_decay"] == pytest.approx(200 / 3, abs=1e-3)
        # user 2: only the T-W click attributes (sole touch → full 50)
        assert by_c[2]["attributed_linear"] == pytest.approx(50.0)
        assert by_c[2]["attributed_decay"] == pytest.approx(50.0)
        # the click AT the conversion instant is excluded entirely
        assert 3 not in by_c
        # user 3's touchless purchase appears nowhere
        total = sum(r["attributed_linear"] for r in out)
        assert total == pytest.approx(150.0)

    def test_conservation_across_groups(self, spark):
        """Both models credit exactly the value of every conversion that
        has ≥1 in-window touch, regardless of the grouping dimension."""
        from consent_based_conversion_adjustments_spark.sources.io import read_table

        ev = read_table(spark, "/root/testdata/sf0.001", "events")
        out = B.touch_attribution(
            ev,
            group_expr=F.get_json_object("props", "$.k").cast("long") % 10,
            group_name="campaign",
        ).agg(
            F.sum("attributed_linear").alias("lin"),
            F.sum("attributed_decay").alias("dec"),
        ).collect()[0]
        assert out["lin"] == pytest.approx(out["dec"], rel=1e-6)

    def test_cross_bin_pairs_counted_once(self, spark):
        """A touch and conversion in different bins still pair exactly
        once (conversion explodes to both bins; the touch owns one)."""
        rows = [
            (1, 1, TS(2024, 1, 1, 23, 0, 0), "click", 0.0, 0),
            (2, 1, TS(2024, 1, 2, 1, 0, 0), "purchase", 10.0, 9),
        ]
        ev = _events(spark, rows)
        out = B.touch_attribution(
            ev,
            lookback_seconds=4 * 3600,
            bin_seconds=3600,
            group_expr=F.col("campaign"),
        ).collect()
        assert len(out) == 1
        assert out[0]["n_touch_pairs"] == 1
        assert out[0]["attributed_linear"] == pytest.approx(10.0)


class TestAudienceOverlap:
    def test_golden_matrix(self, spark):
        rows = [
            (1, 1, TS(2024, 1, 1), "a", 0.0, 0),
            (2, 1, TS(2024, 1, 1), "b", 0.0, 0),
            (3, 2, TS(2024, 1, 1), "a", 0.0, 0),
            (4, 2, TS(2024, 1, 1), "a", 0.0, 0),  # dup event, same user
            (5, 3, TS(2024, 1, 1), "b", 0.0, 0),
            (6, 4, TS(2024, 1, 1), "c", 0.0, 0),
        ]
        out = B.audience_overlap(_events(spark, rows)).collect()
        m = {(r["type_a"], r["type_b"]): r for r in out}
        ab = m[("a", "b")]
        assert (ab["users_a"], ab["users_b"], ab["users_both"]) == (2, 2, 1)
        assert ab["jaccard"] == pytest.approx(1 / 3, abs=1e-6)
        # pairs with zero overlap produce no row (hash agg over observed
        # pairs only) — c never co-occurs
        assert ("a", "c") not in m and ("b", "c") not in m

    def test_theta_exact_regime_matches_exact(self, spark):
        """Below 2^lgk retained entries a theta sketch is exact: the
        sketched matrix must equal the exact operator's counts."""
        from consent_based_conversion_adjustments_spark.sources.io import read_table

        ev = read_table(spark, "/root/testdata/sf0.001", "events")
        exact = {
            (r["type_a"], r["type_b"]): r
            for r in B.audience_overlap(ev).collect()
        }
        for r in B.audience_overlap_theta(ev).collect():
            e = exact[(r["type_a"], r["type_b"])]
            assert r["est_a"] == pytest.approx(e["users_a"])
            assert r["est_b"] == pytest.approx(e["users_b"])
            assert r["est_both"] == pytest.approx(e["users_both"])

    def test_theta_estimation_regime_envelope(self, spark):
        """Past the nominal 2^lgk entries the sketch samples; the
        intersection estimate must stay within a loose relative error of
        the true overlap (two 30k-user segments, 50% overlap, lgk=12)."""
        n = 30000
        base = spark.range(n).select(
            F.col("id").alias("user_id"),
            F.lit(TS(2024, 1, 1)).alias("ts"),
        )
        seg_a = base.withColumn("event_type", F.lit("a"))
        seg_b = base.filter(F.col("user_id") >= n // 2).withColumn(
            "event_type", F.lit("b")
        )
        ev = seg_a.unionByName(seg_b).withColumn(
            "event_id", F.col("user_id")
        ).withColumn("value", F.lit(0.0)).withColumn("campaign", F.lit(0))
        r = B.audience_overlap_theta(ev, lgk=12).collect()[0]
        assert r["est_both"] == pytest.approx(n // 2, rel=0.10)
        assert r["est_union"] == pytest.approx(n, rel=0.10)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


class TestTokenJS:
    def test_identical_distributions_zero(self, spark):
        docs = _docs(
            spark,
            [(1, "x y z x", "src0"), (2, "x y z x", "src1")],
        )
        r = C.token_js_divergence(docs, "source", "src0", "src1").collect()[0]
        assert r["js_divergence"] == pytest.approx(0.0, abs=1e-9)

    def test_disjoint_vocabularies_one(self, spark):
        docs = _docs(spark, [(1, "a b c", "src0"), (2, "x y z", "src1")])
        r = C.token_js_divergence(docs, "source", "src0", "src1").collect()[0]
        assert r["js_divergence"] == pytest.approx(1.0, abs=1e-9)
        assert (r["n_terms_a"], r["n_terms_b"]) == (3, 3)

    def test_python_parity(self, spark):
        a_toks = "a a b c".split()
        b_toks = "a b b d d".split()
        docs = _docs(
            spark, [(1, " ".join(a_toks), "src0"), (2, " ".join(b_toks), "src1")]
        )
        r = C.token_js_divergence(docs, "source", "src0", "src1").collect()[0]

        def dist(toks):
            from collections import Counter

            c = Counter(toks)
            t = sum(c.values())
            return {k: v / t for k, v in c.items()}

        p, q = dist(a_toks), dist(b_toks)
        js = 0.0
        for term in set(p) | set(q):
            pi, qi = p.get(term, 0.0), q.get(term, 0.0)
            m = (pi + qi) / 2
            if pi > 0:
                js += 0.5 * pi * math.log2(pi / m)
            if qi > 0:
                js += 0.5 * qi * math.log2(qi / m)
        assert r["js_divergence"] == pytest.approx(js, abs=1e-6)


class TestTokenChi2:
    def test_python_parity_full_table(self, spark):
        """Brute-force the full 2×L contingency χ² per term and compare
        with the telescoped closed form the operator computes."""
        rows = [
            (1, "alpha beta", "s1"),
            (2, "alpha beta gamma", "s1"),
            (3, "beta gamma", "s2"),
            (4, "gamma delta", "s2"),
            (5, "delta delta alpha", "s3"),
        ]
        docs = _docs(spark, rows)
        out = {
            r["term"]: r
            for r in C.token_label_chi2(
                docs, "source", "text", "doc_id", top_k=10
            ).collect()
        }

        labels = sorted({s for _, _, s in rows})
        n_l = {ell: sum(1 for r in rows if r[2] == ell) for ell in labels}
        n = len(rows)
        terms = sorted({t for _, txt, _ in rows for t in txt.split()})
        for term in terms:
            present = {
                ell: sum(
                    1
                    for r in rows
                    if r[2] == ell and term in r[1].split()
                )
                for ell in labels
            }
            nt = sum(present.values())
            chi2 = 0.0
            for ell in labels:
                for obs, row_total in (
                    (present[ell], nt),
                    (n_l[ell] - present[ell], n - nt),
                ):
                    e = row_total * n_l[ell] / n
                    if e > 0:
                        chi2 += (obs - e) ** 2 / e
            assert out[term]["chi2"] == pytest.approx(chi2, abs=1e-3), term
            assert out[term]["n_docs"] == nt

    def test_all_docs_term_guard(self, spark):
        docs = _docs(spark, [(1, "x a", "s1"), (2, "x b", "s2")])
        out = {r["term"]: r for r in C.token_label_chi2(docs, "source").collect()}
        # x present in every doc: absent row empty, χ² finite (here 0)
        assert out["x"]["chi2"] == pytest.approx(0.0, abs=1e-9)


class TestLinearTrend:
    def test_perfect_line(self, spark):
        from consent_based_conversion_adjustments_spark.operators.timeseries import (
            linear_trend,
        )

        # value = 10 * (days since 2024-01-01) + 3, sampled every 6h
        base = TS(2024, 1, 1)
        rows = [
            (i, 1, base + __import__("datetime").timedelta(hours=6 * i),
             "a", 10.0 * (6 * i) / 24.0 + 3.0, 0)
            for i in range(20)
        ]
        out = linear_trend(_events(spark, rows), ["event_type"], "ts", "value")
        r = out.collect()[0]
        assert r["slope_per_day"] == pytest.approx(10.0, abs=1e-4)
        assert r["r2"] == pytest.approx(1.0, abs=1e-6)
        # fitted_delta = slope * elapsed days = 10 * (19*6/24)
        assert r["fitted_delta"] == pytest.approx(10.0 * 19 * 6 / 24, abs=1e-3)

    def test_numpy_parity(self, spark):
        import numpy as np

        from consent_based_conversion_adjustments_spark.operators.timeseries import (
            linear_trend,
        )

        rng = np.random.RandomState(7)
        base = TS(2024, 1, 1)
        xs = np.sort(rng.uniform(0, 30, 200))
        ys = 2.5 * xs + rng.normal(0, 3, 200)
        rows = [
            (i, 1, base + __import__("datetime").timedelta(days=float(x)),
             "a", float(y), 0)
            for i, (x, y) in enumerate(zip(xs, ys))
        ]
        r = linear_trend(_events(spark, rows), ["event_type"], "ts", "value").collect()[0]
        slope, icept = np.polyfit(xs + (base - TS(1970, 1, 1)).days, ys, 1)
        assert r["slope_per_day"] == pytest.approx(slope, rel=1e-4)
        assert r["n"] == 200


class TestVocabGrowth:
    def test_golden_curve(self, spark):
        # 4 docs, 2 checkpoints: doc order fixes when terms first appear
        rows = [
            (1, "a b", "s"),
            (2, "a c", "s"),
            (3, "c d a", "s"),
            (4, "e", "s"),
        ]
        out = C.vocab_growth(
            _docs(spark, rows), "text", "doc_id", n_checkpoints=2
        ).collect()
        assert [(r.checkpoint, r.n_docs, r.n_tokens, r.vocab_size) for r in out] == [
            (1, 2, 4, 3),   # docs 1-2: tokens a b a c, vocab {a,b,c}
            (2, 4, 8, 5),   # + docs 3-4: vocab adds {d,e}
        ]

    def test_monotone_and_totals(self, spark):
        from consent_based_conversion_adjustments_spark.sources.io import read_table

        docs = read_table(spark, "/root/testdata/sf0.001", "documents")
        out = C.vocab_growth(docs).collect()
        assert len(out) == 10
        for a, b in zip(out, out[1:]):
            assert b.n_docs > a.n_docs
            assert b.n_tokens > a.n_tokens
            assert b.vocab_size >= a.vocab_size
        total_terms = (
            docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("t"))
            .filter(F.col("t") != "")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("t").alias("v"),
            )
            .collect()[0]
        )
        assert out[-1].n_tokens == total_terms.n
        assert out[-1].vocab_size == total_terms.v


class TestEwmaAnomalies:
    def test_pandas_ewm_parity(self, spark):
        import numpy as np
        import pandas as pd

        from consent_based_conversion_adjustments_spark.operators.timeseries import (
            ewma_anomalies,
        )

        import datetime as dt

        rng = np.random.RandomState(5)
        days = [dt.datetime(2024, 1, 1) + dt.timedelta(days=i) for i in range(25)]
        vals = rng.uniform(10, 20, 25)
        rows = [
            (i, 1, d, "a", float(v), 0) for i, (d, v) in enumerate(zip(days, vals))
        ]
        out = ewma_anomalies(
            _events(spark, rows), ["event_type"], "ts", "value", alpha=0.3
        ).collect()
        want = pd.Series(vals).ewm(alpha=0.3, adjust=True).mean()
        for r, w in zip(out, want):
            assert r.ewma == pytest.approx(w, abs=1e-5)
        # first day has no prior EWMA -> null deviation and flag
        assert out[0].deviation is None and out[0].is_anomaly is None

    def test_spike_flagged(self, spark):
        import datetime as dt

        from consent_based_conversion_adjustments_spark.operators.timeseries import (
            ewma_anomalies,
        )

        rows = []
        for i in range(30):
            v = 10.0 + (i % 3) * 0.1
            if i == 20:
                v = 200.0  # the spike
            rows.append(
                (i, 1, dt.datetime(2024, 1, 1) + dt.timedelta(days=i), "a", v, 0)
            )
        out = ewma_anomalies(
            _events(spark, rows), ["event_type"], "ts", "value"
        ).collect()
        flags = [r.day for r in out if r.is_anomaly]
        assert "2024-01-21" in flags  # day index 20
        assert len(flags) <= 3  # the band recovers after the spike


class TestWindowedFunnel:
    def test_window_excludes_late_steps(self, spark):
        import datetime as dt

        from consent_based_conversion_adjustments_spark.operators.corpus import (
            funnel_counts,
        )

        base = dt.datetime(2024, 1, 1)
        rows = [
            # user 1 converts fully within 1h
            (1, 1, base, "view", 0.0, 0),
            (2, 1, base + dt.timedelta(minutes=10), "click", 0.0, 0),
            (3, 1, base + dt.timedelta(minutes=20), "purchase", 0.0, 0),
            # user 2 clicks inside but purchases outside the window
            (4, 2, base, "view", 0.0, 0),
            (5, 2, base + dt.timedelta(minutes=30), "click", 0.0, 0),
            (6, 2, base + dt.timedelta(hours=2), "purchase", 0.0, 0),
            # user 3 clicks outside the window entirely
            (7, 3, base, "view", 0.0, 0),
            (8, 3, base + dt.timedelta(hours=3), "click", 0.0, 0),
        ]
        ev = _events(spark, rows)
        bounded = funnel_counts(ev, max_span_seconds=3600).collect()[0]
        assert (bounded.n_step1, bounded.n_step2, bounded.n_step3) == (3, 2, 1)
        unbounded = funnel_counts(ev).collect()[0]
        assert (unbounded.n_step1, unbounded.n_step2, unbounded.n_step3) == (
            3,
            3,
            2,
        )


class TestAssociationRules:
    def test_lift_and_confidence_golden(self, spark):
        from consent_based_conversion_adjustments_spark.operators.corpus import (
            association_rules,
        )

        # a and b always co-occur (4 docs), c independent-ish
        rows = [
            (1, "a b", "s"),
            (2, "a b c", "s"),
            (3, "a b", "s"),
            (4, "a b c", "s"),
            (5, "c d", "s"),
            (6, "c d", "s"),
        ]
        out = {
            (r.item_a, r.item_b): r
            for r in association_rules(
                _docs(spark, rows), min_support=2, top_k=25
            ).collect()
        }
        ab = out[("a", "b")]
        # perfect co-occurrence: conf 1.0 both ways, lift = N/4 = 1.5
        assert ab.confidence_ab == pytest.approx(1.0)
        assert ab.confidence_ba == pytest.approx(1.0)
        assert ab.lift == pytest.approx(6 / 4, abs=1e-6)
        cd = out[("c", "d")]
        # c in 4 docs, d in 2, cd in 2: conf c->d = .5, d->c = 1, lift 1.5
        assert cd.confidence_ab == pytest.approx(0.5)
        assert cd.confidence_ba == pytest.approx(1.0)
        assert cd.lift == pytest.approx(6 * 2 / (4 * 2), abs=1e-6)
        # negative association (a vs d never co-occur) emits no row
        assert ("a", "d") not in out
