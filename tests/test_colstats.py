"""Equi-depth histogram + join-cardinality estimator invariants."""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from consent_based_conversion_adjustments_spark.operators import colstats as S


def test_histogram_equi_depth_and_complete(spark):
    df = spark.range(1, 10001).selectExpr("id AS v")
    bounds = S.equi_depth_boundaries(df, "v", 8)
    hist = S.equi_depth_histogram(df, "v", bounds).orderBy("bucket").collect()
    assert [r.bucket for r in hist] == list(range(8))
    assert sum(r.n_rows for r in hist) == 10000
    # equal-height within 1 row on uniform data
    assert max(r.n_rows for r in hist) - min(r.n_rows for r in hist) <= 1
    # buckets tile the domain in order
    for a, b in zip(hist, hist[1:]):
        assert a.hi < b.lo


def test_estimator_exact_on_uniform_fk(spark):
    # every fact key hits one dim key uniformly: estimator is EXACT
    dim = spark.range(0, 100).selectExpr("id AS k")
    fact = spark.range(0, 5000).selectExpr("id % 100 AS k")
    bounds = S.equi_depth_boundaries(fact, "k", 8)
    ha = S.equi_depth_histogram(fact, "k", bounds)
    hb = S.equi_depth_histogram(dim, "k", bounds)
    est = S.estimate_equijoin_rows(ha, hb).first().est_rows
    actual = fact.join(dim, "k").count()
    assert actual == 5000
    assert abs(est - actual) < 1e-6


def test_estimator_reasonable_on_skew(spark):
    # zipf-ish skew: estimate within 3x of truth (the histogram's job)
    fact = spark.range(0, 8000).selectExpr(
        "CAST(pow(id % 2000, 2) / 40000 AS LONG) AS k")
    dim = spark.range(0, 100).selectExpr("id AS k")
    bounds = S.equi_depth_boundaries(fact, "k", 8)
    ha = S.equi_depth_histogram(fact, "k", bounds)
    hb = S.equi_depth_histogram(dim, "k", bounds)
    est = S.estimate_equijoin_rows(ha, hb).first().est_rows
    actual = fact.join(dim, "k").count()
    assert actual > 0
    assert actual / 3 <= est <= actual * 3, (est, actual)


def test_quantile_calibrate_matches_reference_distribution(spark):
    """Q-Q mapping: calibrating a uniform source onto a reference grid
    is monotone, hits the reference min/max at the rank extremes, and a
    self-calibration (source onto its own grid) is the identity on the
    grid points."""
    from consent_based_conversion_adjustments_spark.operators.colstats import (
        quantile_calibrate,
        quantile_grid,
    )

    # source: 0..100 uniform; reference: squared scale 0..10000
    src = spark.createDataFrame(
        [(i, float(i)) for i in range(101)], "id long, v double"
    )
    ref = spark.createDataFrame(
        [(i, float(i * i)) for i in range(101)], "id long, v double"
    )
    grid = quantile_grid(ref, "v", 101)
    out = {
        r.id: r.calibrated
        for r in quantile_calibrate(src, "v", "id", grid).collect()
    }
    vals = [out[i] for i in range(101)]
    assert vals == sorted(vals)                    # monotone
    assert abs(vals[0] - 0.0) < 1e-9               # min -> ref min
    assert abs(vals[-1] - 10000.0) < 1e-9          # max -> ref max
    # with 101 source rows on a 101-point grid, row i sits exactly at
    # grid point i -> calibrated == i^2 exactly
    for i in (10, 50, 90):
        assert abs(out[i] - i * i) < 1e-9

    self_grid = quantile_grid(src, "v", 101)
    ident = {
        r.id: r.calibrated
        for r in quantile_calibrate(src, "v", "id", self_grid).collect()
    }
    for i in range(101):
        assert abs(ident[i] - float(i)) < 1e-9     # identity
