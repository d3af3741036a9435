"""Newton/IRLS logistic regression: numpy parity, learning sanity,
singularity guard."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from consent_based_conversion_adjustments_spark.operators.mlfit import (
    logreg_newton_fit,
    logreg_scores,
)


def _numpy_newton(X, y, iters):
    """Reference fit: same fixed-iteration Newton, numpy linalg solve."""
    w = np.zeros(X.shape[1])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        wt = p * (1.0 - p)
        A = (X * wt[:, None]).T @ X
        g = X.T @ (y - p)
        w = w + np.linalg.solve(A, g)
    return w


def _planted(spark, n=400, seed=5):
    rng = np.random.default_rng(seed)
    x1 = rng.normal(size=n)
    x2 = rng.normal(size=n)
    z = 0.5 + 1.5 * x1 - 1.0 * x2
    y = (rng.uniform(size=n) < 1.0 / (1.0 + np.exp(-z))).astype(float)
    rows = [
        (i, 1.0, float(x1[i]), float(x2[i]), float(y[i])) for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "row_id long, x0 double, x1 double, x2 double, y double"
    )
    X = np.column_stack([np.ones(n), x1, x2])
    return df, X, y


def test_logreg_fit_matches_numpy_reference(spark):
    df, X, y = _planted(spark)
    fx = [F.col("x0"), F.col("x1"), F.col("x2")]
    for iters in (1, 2, 3):
        w = logreg_newton_fit(df, fx, F.col("y"), iters=iters)
        ref = _numpy_newton(X, y, iters)
        assert w == pytest.approx(ref.tolist(), rel=1e-9), iters


def test_logreg_recovers_planted_direction(spark):
    """Three Newton steps on a well-conditioned planted model should land
    near the generating coefficients (signs and rough magnitude — Newton
    converges quadratically near the optimum)."""
    df, X, y = _planted(spark, n=2000, seed=11)
    fx = [F.col("x0"), F.col("x1"), F.col("x2")]
    w = logreg_newton_fit(df, fx, F.col("y"), iters=3)
    assert w[1] > 0.8 and w[2] < -0.5
    assert abs(w[0] - 0.5) < 0.5


def test_logreg_scores_are_sigmoid_of_linear(spark):
    df, X, y = _planted(spark, n=50)
    fx = [F.col("x0"), F.col("x1"), F.col("x2")]
    w = [0.3, -0.7, 0.2]
    rows = df.select("row_id", logreg_scores(df, fx, w)).collect()
    got = {r["row_id"]: r["lr_score"] for r in rows}
    for i in range(50):
        z = w[0] * X[i, 0] + w[1] * X[i, 1] + w[2] * X[i, 2]
        assert got[i] == pytest.approx(
            1.0 / (1.0 + math.exp(-z)), rel=1e-12
        )


def test_logreg_singular_features_raise(spark):
    rows = [(i, 1.0, float(i % 7), 2.0 - 1.5 * (i % 7), float(i % 2))
            for i in range(40)]
    df = spark.createDataFrame(
        rows, "row_id long, x0 double, x1 double, x2 double, y double"
    )
    fx = [F.col("x0"), F.col("x1"), F.col("x2")]
    with pytest.raises(ValueError, match="singular normal matrix"):
        logreg_newton_fit(df, fx, F.col("y"), iters=1)


def test_ols_fit_matches_numpy_lstsq(spark):
    from consent_based_conversion_adjustments_spark.operators.mlfit import (
        ols_fit,
    )

    df, X, _ = _planted(spark)
    rng = np.random.default_rng(9)
    yv = 2.0 - 0.5 * X[:, 1] + 3.0 * X[:, 2] + rng.normal(
        scale=0.1, size=len(X)
    )
    df2 = spark.createDataFrame(
        [
            (float(X[i, 0]), float(X[i, 1]), float(X[i, 2]), float(yv[i]))
            for i in range(len(X))
        ],
        "x0 double, x1 double, x2 double, y double",
    )
    fx = [F.col("x0"), F.col("x1"), F.col("x2")]
    w = ols_fit(df2, fx, F.col("y"))
    ref, *_ = np.linalg.lstsq(X, yv, rcond=None)
    assert w == pytest.approx(ref.tolist(), rel=1e-8)
    # ridge shrinks the solution toward zero
    wr = ols_fit(df2, fx, F.col("y"), ridge=100.0)
    assert np.linalg.norm(wr) < np.linalg.norm(w)


def test_ols_zero_column_raises(spark):
    from consent_based_conversion_adjustments_spark.operators.mlfit import (
        ols_fit,
    )

    rows = [(1.0, float(i), 0.0, float(2 * i)) for i in range(20)]
    df = spark.createDataFrame(rows, "x0 double, x1 double, x2 double, y double")
    fx = [F.col("x0"), F.col("x1"), F.col("x2")]
    with pytest.raises(ValueError, match="singular normal matrix"):
        ols_fit(df, fx, F.col("y"))


def test_classifier_auc_matches_pairwise_definition(spark):
    """The distributed rank-sum AUC must equal the O(n²) pairwise
    definition (ties at half credit) on the fixture corpus."""
    from consent_based_conversion_adjustments_spark.operators import (
        mlfit as M,
    )
    from consent_based_conversion_adjustments_spark.plans import (
        corpus_queries as CQ,
    )
    from consent_based_conversion_adjustments_spark.sources.io import (
        read_table,
    )

    sf = "/root/testdata/sf0.001"
    row = CQ.doc_classifier_auc(spark, sf).first()

    feats = CQ._logreg_feats(read_table(spark, sf, "documents"))
    fx = [F.col("x0"), F.col("x1"), F.col("x2")]
    w = M.logreg_newton_fit(feats, fx, F.col("y"), iters=2)
    scored = feats.select(
        "y", M.logreg_scores(feats, fx, w, out_col="score")
    ).collect()
    pos = [r["score"] for r in scored if r["y"] == 1.0]
    neg = [r["score"] for r in scored if r["y"] == 0.0]
    assert pos and neg
    wins = sum(
        1.0 if p > q else (0.5 if p == q else 0.0)
        for p in pos
        for q in neg
    )
    brute = wins / (len(pos) * len(neg))
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert row["auc"] == pytest.approx(brute, abs=2e-6)


def test_logreg_d2_numpy_path(spark):
    """Non-3 feature counts take the np.linalg.solve path; parity holds."""
    df, X, y = _planted(spark)
    fx = [F.col("x0"), F.col("x1")]
    w = logreg_newton_fit(df, fx, F.col("y"), iters=2)
    ref = _numpy_newton(X[:, :2], y, 2)
    assert w == pytest.approx(ref.tolist(), rel=1e-9)


def _planted4(spark, n=400, seed=5):
    rng = np.random.default_rng(seed)
    x1 = rng.normal(size=n)
    x2 = rng.normal(size=n)
    x3 = rng.normal(size=n)
    z = 0.5 + 1.5 * x1 - 1.0 * x2 + 0.7 * x3
    y = (rng.uniform(size=n) < 1.0 / (1.0 + np.exp(-z))).astype(float)
    rows = [
        (i, 1.0, float(x1[i]), float(x2[i]), float(x3[i]), float(y[i]))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows,
        "row_id long, x0 double, x1 double, x2 double, x3 double, y double",
    )
    X = np.column_stack([np.ones(n), x1, x2, x3])
    return df, X, y


def test_logreg_d4_adjugate_matches_numpy_reference(spark):
    """d=4 takes the _solve4 adjugate path (the oracle-matched float
    contract); parity with the numpy LU reference must hold to ~1e-9."""
    df, X, y = _planted4(spark)
    fx = [F.col("x0"), F.col("x1"), F.col("x2"), F.col("x3")]
    for iters in (1, 2):
        w = logreg_newton_fit(df, fx, F.col("y"), iters=iters)
        ref = _numpy_newton(X, y, iters)
        assert w == pytest.approx(ref.tolist(), rel=1e-9), iters


def test_ols_d4_adjugate_matches_numpy_lstsq(spark):
    from consent_based_conversion_adjustments_spark.operators.mlfit import (
        ols_fit,
    )

    df, X, _ = _planted4(spark)
    rng = np.random.default_rng(9)
    yv = 2.0 - 0.5 * X[:, 1] + 3.0 * X[:, 2] - 1.1 * X[:, 3] + rng.normal(
        scale=0.1, size=len(X)
    )
    df2 = spark.createDataFrame(
        [tuple(float(v) for v in X[i]) + (float(yv[i]),) for i in range(len(X))],
        "x0 double, x1 double, x2 double, x3 double, y double",
    )
    fx = [F.col("x0"), F.col("x1"), F.col("x2"), F.col("x3")]
    w = ols_fit(df2, fx, F.col("y"))
    ref, *_ = np.linalg.lstsq(X, yv, rcond=None)
    assert w == pytest.approx(ref.tolist(), rel=1e-8)


def test_near_collinear_raises_not_garbage(spark):
    """ADVICE r10: a NEARLY-collinear feature set has det ~ 1e-13 * scale
    — far below the scale-relative tolerance but nonzero; the old exact
    det == 0.0 guard silently produced exploding weights here."""
    rng = np.random.default_rng(3)
    n = 200
    x1 = rng.normal(size=n)
    x2 = 2.0 * x1 + rng.normal(scale=1e-9, size=n)  # collinear + dust
    y = (rng.uniform(size=n) < 0.5).astype(float)
    df = spark.createDataFrame(
        [(1.0, float(x1[i]), float(x2[i]), float(y[i])) for i in range(n)],
        "x0 double, x1 double, x2 double, y double",
    )
    fx = [F.col("x0"), F.col("x1"), F.col("x2")]
    with pytest.raises(ValueError, match="singular normal matrix"):
        logreg_newton_fit(df, fx, F.col("y"), iters=1)


def test_solve4_matches_numpy_on_random_spd_systems():
    from consent_based_conversion_adjustments_spark.operators.mlfit import (
        _solve4,
    )

    rng = np.random.default_rng(7)
    for _ in range(20):
        Xm = rng.normal(size=(50, 4))
        A = Xm.T @ Xm
        g = rng.normal(size=4)
        cells = {
            f"a{i}{j}": float(A[i, j]) for i in range(4) for j in range(i, 4)
        }
        got = _solve4(cells, [float(v) for v in g])
        ref = np.linalg.solve(A, g)
        assert got == pytest.approx(ref.tolist(), rel=1e-8)


def test_sql4_and_solve4_share_expression_text():
    """The cross-engine d=4 contract is textual: the SQL oracle must
    contain the exact det/inverse expression strings _solve4 evaluates
    (modulo the i. table prefix)."""
    from consent_based_conversion_adjustments_spark.operators.mlfit import (
        _DET4_EXPR,
        _INV4_EXPRS,
        _sql4,
        logreg_sql4,
    )

    sql = logreg_sql4("feats AS (SELECT 1 AS x0)")
    assert _DET4_EXPR in sql  # unqualified inside the det subquery
    for expr in _INV4_EXPRS.values():
        assert _sql4(expr) in sql


def test_adjugate_generator_reproduces_handwritten_d4_exactly():
    """The cofactor generator must emit the handwritten d=4 strings
    BYTE-FOR-BYTE — that identity is what carries the one-string-drives-
    both-engines float contract from d=4 to every generated d."""
    from consent_based_conversion_adjustments_spark.operators.mlfit import (
        _DET4_EXPR,
        _INV4_EXPRS,
        adjugate_exprs,
    )

    det, inv = adjugate_exprs(4)
    assert det == _DET4_EXPR
    assert inv == _INV4_EXPRS


def test_adjugate_generator_bounds():
    import pytest

    from consent_based_conversion_adjustments_spark.operators.mlfit import (
        MAX_ADJUGATE_D,
        adjugate_exprs,
    )

    with pytest.raises(ValueError, match="outside"):
        adjugate_exprs(1)
    with pytest.raises(ValueError, match="outside"):
        adjugate_exprs(MAX_ADJUGATE_D + 1)


def test_solve_adjugate_d5_matches_numpy_on_random_spd_systems():
    from consent_based_conversion_adjustments_spark.operators.mlfit import (
        _solve_adjugate,
    )

    rng = np.random.default_rng(11)
    for _ in range(20):
        Xm = rng.normal(size=(60, 5))
        A = Xm.T @ Xm + np.eye(5)
        g = rng.normal(size=5)
        cells = {
            f"a{i}{j}": float(A[i, j]) for i in range(5) for j in range(i, 5)
        }
        got = _solve_adjugate(cells, list(map(float, g)), 5)
        want = np.linalg.solve(A, g)
        assert got == pytest.approx(want.tolist(), rel=1e-9)


def test_logreg_d5_fit_matches_numpy_irls(spark):
    """Two Newton steps at d=5 through the generated adjugate solve must
    match a numpy replay of the same fixed-iteration IRLS to float
    precision (reduction order is the only accepted divergence)."""
    from consent_based_conversion_adjustments_spark.operators.mlfit import (
        logreg_newton_fit,
    )

    rng = np.random.default_rng(23)
    n = 300
    X = np.column_stack(
        [
            np.ones(n),
            rng.uniform(size=n),
            rng.normal(loc=4.0, size=n),
            rng.uniform(size=n) * 0.3,
            rng.normal(loc=5.0, scale=0.5, size=n),
        ]
    )
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-(X @ [0.5, -1, 0.2, 2, -0.3])))).astype(float)
    df = spark.createDataFrame(
        [tuple(map(float, X[i])) + (float(y[i]),) for i in range(n)],
        "x0 double, x1 double, x2 double, x3 double, x4 double, y double",
    )
    fx = [F.col(f"x{i}") for i in range(5)]
    got = logreg_newton_fit(df, fx, F.col("y"), iters=2)
    w = np.zeros(5)
    for _ in range(2):
        p = 1 / (1 + np.exp(-(X @ w)))
        A = (X * (p * (1 - p))[:, None]).T @ X
        w = w + np.linalg.solve(A, X.T @ (y - p))
    assert got == pytest.approx(w.tolist(), rel=1e-7)
