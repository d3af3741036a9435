"""asof_join parity against pandas merge_asof (the semantics oracle for
the general point-in-time operator)."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from consent_based_conversion_adjustments_spark.operators.asof import asof_join


def _frames(spark, seed=0, n_left=200, n_right=120, n_keys=7):
    rng = np.random.RandomState(seed)
    base = dt.datetime(2024, 1, 1)

    def mk(n, cols):
        ts = [base + dt.timedelta(seconds=int(s)) for s in rng.randint(0, 86400, n)]
        keys = rng.randint(0, n_keys, n)
        vals = np.round(rng.uniform(0, 100, n), 2)
        pdf = pd.DataFrame({"k": keys, "ts": ts, cols: vals})
        # merge_asof needs globally sorted 'on' columns
        return pdf.sort_values("ts").reset_index(drop=True)

    lp = mk(n_left, "lv")
    rp = mk(n_right, "rv")
    # drop duplicate (k, ts) on the right: pandas keeps the LAST and so
    # does the running window, but making it unique avoids relying on it
    rp = rp.drop_duplicates(["k", "ts"], keep="last").sort_values("ts")
    ls = spark.createDataFrame(lp)
    rs = spark.createDataFrame(rp)
    return lp, rp, ls, rs


def _expected(lp, rp, direction, tolerance=None):
    kw = {"tolerance": pd.Timedelta(seconds=tolerance)} if tolerance else {}
    m = pd.merge_asof(
        lp,
        rp.rename(columns={"ts": "rts"}),
        left_on="ts",
        right_on="rts",
        by="k",
        direction=direction,
        **kw,
    )
    return m.sort_values(["k", "ts", "lv"]).reset_index(drop=True)


def _got(ls, rs, direction, tolerance=None):
    out = asof_join(
        ls,
        rs,
        ["k"],
        "ts",
        "ts",
        ["rv"],
        direction=direction,
        tolerance_seconds=tolerance,
    )
    return (
        out.toPandas()
        .sort_values(["k", "ts", "lv"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_merge_asof_parity(spark, direction):
    lp, rp, ls, rs = _frames(spark, seed=3)
    want = _expected(lp, rp, direction)
    got = _got(ls, rs, direction)
    assert len(got) == len(want)
    assert got["rv"].fillna(-1).tolist() == want["rv"].fillna(-1).tolist()
    got_ts = got["asof_ts"].tolist()
    want_ts = want["rts"].tolist()
    for g, w in zip(got_ts, want_ts):
        assert (g is None or pd.isna(g)) == pd.isna(w)
        if not pd.isna(w):
            assert pd.Timestamp(g) == w


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_merge_asof_parity_with_tolerance(spark, direction):
    lp, rp, ls, rs = _frames(spark, seed=9)
    want = _expected(lp, rp, direction, tolerance=1800)
    got = _got(ls, rs, direction, tolerance=1800)
    assert got["rv"].fillna(-1).tolist() == want["rv"].fillna(-1).tolist()


def test_exact_timestamp_inclusive_and_no_match_null(spark):
    ls = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 12), 1.0)], "k long, ts timestamp, lv double"
    )
    rs = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 12), 42.0),
            (2, dt.datetime(2024, 1, 1, 11), 7.0),
        ],
        "k long, ts timestamp, rv double",
    )
    row = asof_join(ls, rs, ["k"], "ts", "ts", ["rv"]).collect()[0]
    assert row["rv"] == 42.0  # simultaneous right row matches
    ls2 = spark.createDataFrame(
        [(9, dt.datetime(2024, 1, 1), 1.0)], "k long, ts timestamp, lv double"
    )
    row2 = asof_join(ls2, rs, ["k"], "ts", "ts", ["rv"]).collect()[0]
    assert row2["rv"] is None and row2["asof_ts"] is None


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_null_timestamps_never_match(spark, direction):
    """Regression (round-9 advice): a right row with NULL right_ts must not
    become the running-last match for unmatched left rows (NULLS FIRST used
    to put its payload at the head of the backward spine), and a left row
    with NULL left_ts has no as-of point so its match is all-NULL."""
    t = dt.datetime(2024, 1, 1, 12)
    ls = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0), 1.0), (1, None, 2.0)],
        "k long, ts timestamp, lv double",
    )
    rs = spark.createDataFrame(
        [(1, None, 99.0), (1, t, 42.0)],
        "k long, ts timestamp, rv double",
    )
    rows = {
        r["lv"]: r
        for r in asof_join(
            ls, rs, ["k"], "ts", "ts", ["rv"], direction=direction
        ).collect()
    }
    early = rows[1.0]  # midnight left row
    if direction == "backward":
        # nothing at-or-before midnight: must be all-NULL, not rv=99
        assert early["rv"] is None and early["asof_ts"] is None
    else:
        assert early["rv"] == 42.0
    null_left = rows[2.0]
    assert null_left["rv"] is None and null_left["asof_ts"] is None


def test_output_collision_raises(spark):
    ls = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 5.0)], "k long, ts timestamp, rv double"
    )
    rs = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 7.0)], "k long, ts timestamp, rv double"
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(ls, rs, ["k"], "ts", "ts", ["rv"])
