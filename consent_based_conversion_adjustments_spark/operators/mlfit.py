"""Distributed generalized-linear-model fitting (Newton / IRLS).

Completes the on-cluster classifier family next to the Naive Bayes
trainer (corpus.nb_quality_scores) with LOGISTIC REGRESSION trained by
Newton's method: each iteration is ONE map-side-combinable aggregation
— the d×d normal matrix XᵀWX (d(d+1)/2 cells, W = diag p(1−p)) plus the
gradient Xᵀ(y−p) (d cells) — followed by a bounded driver-side d×d
solve. Per-iteration state is d(d+3)/2 doubles regardless of row count,
so the fit costs ``iters`` scans at 100 TB exactly like the k-means and
covariance fits. Iterations are FIXED (no convergence test, no
data-dependent control flow), which keeps the fit deterministic and
lets the DuckDB oracle replay every step as chained CTEs
(``logreg_sql3``).

Cross-engine float contract: the linear predictor folds left-to-right
(w0·x0 + w1·x1) + w2·x2 — the SQL ``+`` associativity — and the d=3/d=4
solves use explicit adjugate formulas in the SAME term order as the
oracle's SQL (the quantize.py sequential-accumulation precedent; at d=4
ONE set of expression strings drives both engines, so the match is by
construction), so the only engine divergence is the distributed sums'
reduction order (the accepted class shared by every covariance/k-means
oracle). d ≥ 5 falls back to np.linalg.solve — fine for use, but an
oracle built on it would add LU-vs-adjugate rounding risk (documented,
not registered; the ValueError note in logreg_newton_fit points users
at the oracle-safe range).

Derived entirely from public methodology: IRLS/Newton for logistic
regression is textbook (McCullagh & Nelder, GLM); the pseudo-label
quality-classifier shape mirrors the FineWeb-Edu recipe already cited
on the NB trainer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _linear(features: list[Column], weights: list[float]) -> Column:
    """w·x folded left-to-right (SQL + associativity)."""
    z = F.lit(float(weights[0])) * features[0]
    for w, x in zip(weights[1:], features[1:]):
        z = z + F.lit(float(w)) * x
    return z


def linear_predict(features: list[Column], weights: list[float]) -> Column:
    """w·x as a pure-Catalyst column (the OLS serving half; same
    left-to-right fold the SQL oracles use)."""
    return _linear(features, weights)


#: scale-relative singularity threshold: a nearly-collinear feature set
#: yields a tiny-but-nonzero determinant and exploding garbage weights;
#: det scales like max(|a_ii|)^d, so compare against eps·scale^d rather
#: than exact zero (ADVICE r10). eps = 1e-12 leaves ~4 decimal digits of
#: genuine conditioning headroom above double rounding noise.
_SINGULAR_EPS = 1e-12

_SINGULAR_MSG = (
    "{who}: singular normal matrix (|det|={det:.3e} <= tol={tol:.3e}) — "
    "the features are linearly dependent or near-collinear on this data "
    "(e.g. a saturated heuristic collapsing to an affine function of "
    "another feature); drop or replace a feature"
)


def _check_det(det: float, diag: list[float], who: str) -> None:
    tol = _SINGULAR_EPS * max(abs(v) for v in diag) ** len(diag)
    if abs(det) <= tol:
        raise ValueError(_SINGULAR_MSG.format(who=who, det=det, tol=tol))


def _solve3(a: dict[str, float], g: list[float]) -> list[float]:
    """Adjugate solve of the symmetric 3×3 system A·dw = g, term order
    matched to ``logreg_sql3``'s SQL expressions."""
    a00, a01, a02 = a["a00"], a["a01"], a["a02"]
    a11, a12, a22 = a["a11"], a["a12"], a["a22"]
    det = (
        a00 * (a11 * a22 - a12 * a12)
        - a01 * (a01 * a22 - a12 * a02)
        + a02 * (a01 * a12 - a11 * a02)
    )
    _check_det(det, [a00, a11, a22], "_solve3")
    i00 = (a11 * a22 - a12 * a12) / det
    i01 = (a02 * a12 - a01 * a22) / det
    i02 = (a01 * a12 - a02 * a11) / det
    i11 = (a00 * a22 - a02 * a02) / det
    i12 = (a01 * a02 - a00 * a12) / det
    i22 = (a00 * a11 - a01 * a01) / det
    g0, g1, g2 = g
    return [
        i00 * g0 + i01 * g1 + i02 * g2,
        i01 * g0 + i11 * g1 + i12 * g2,
        i02 * g0 + i12 * g1 + i22 * g2,
    ]


# -- d=4 adjugate: ONE set of expression strings drives BOTH the Python
# -- solve (eval) and the SQL oracle (textual splice), so the float-op
# -- order matches across engines BY CONSTRUCTION instead of by the
# -- hand-mirroring discipline the d=3 pair relies on. Python eval and
# -- DuckDB share left-associativity and precedence for * - + /, and both
# -- compute IEEE doubles, so identical text ⇒ identical rounding.

_DET4_EXPR = (
    "a00 * (a11 * (a22 * a33 - a23 * a23) - a12 * (a12 * a33 - a23 * a13)"
    " + a13 * (a12 * a23 - a22 * a13))"
    " - a01 * (a01 * (a22 * a33 - a23 * a23) - a12 * (a02 * a33 - a23 * a03)"
    " + a13 * (a02 * a23 - a22 * a03))"
    " + a02 * (a01 * (a12 * a33 - a23 * a13) - a11 * (a02 * a33 - a23 * a03)"
    " + a13 * (a02 * a13 - a12 * a03))"
    " - a03 * (a01 * (a12 * a23 - a22 * a13) - a11 * (a02 * a23 - a22 * a03)"
    " + a12 * (a02 * a13 - a12 * a03))"
)

#: upper-triangle inverse cells of the symmetric 4×4 (adj/det; the
#: (-1)^{i+j} minor signs are folded into leading negations)
_INV4_EXPRS = {
    "i00": "(a11 * (a22 * a33 - a23 * a23) - a12 * (a12 * a33 - a23 * a13)"
    " + a13 * (a12 * a23 - a22 * a13)) / det",
    "i01": "-(a01 * (a22 * a33 - a23 * a23) - a12 * (a02 * a33 - a23 * a03)"
    " + a13 * (a02 * a23 - a22 * a03)) / det",
    "i02": "(a01 * (a12 * a33 - a23 * a13) - a11 * (a02 * a33 - a23 * a03)"
    " + a13 * (a02 * a13 - a12 * a03)) / det",
    "i03": "-(a01 * (a12 * a23 - a22 * a13) - a11 * (a02 * a23 - a22 * a03)"
    " + a12 * (a02 * a13 - a12 * a03)) / det",
    "i11": "(a00 * (a22 * a33 - a23 * a23) - a02 * (a02 * a33 - a23 * a03)"
    " + a03 * (a02 * a23 - a22 * a03)) / det",
    "i12": "-(a00 * (a12 * a33 - a23 * a13) - a01 * (a02 * a33 - a23 * a03)"
    " + a03 * (a02 * a13 - a12 * a03)) / det",
    "i13": "(a00 * (a12 * a23 - a22 * a13) - a01 * (a02 * a23 - a22 * a03)"
    " + a02 * (a02 * a13 - a12 * a03)) / det",
    "i22": "(a00 * (a11 * a33 - a13 * a13) - a01 * (a01 * a33 - a13 * a03)"
    " + a03 * (a01 * a13 - a11 * a03)) / det",
    "i23": "-(a00 * (a11 * a23 - a12 * a13) - a01 * (a01 * a23 - a12 * a03)"
    " + a02 * (a01 * a13 - a11 * a03)) / det",
    "i33": "(a00 * (a11 * a22 - a12 * a12) - a01 * (a01 * a22 - a12 * a02)"
    " + a02 * (a01 * a12 - a11 * a02)) / det",
}


def _solve4(a: dict[str, float], g: list[float]) -> list[float]:
    """Adjugate solve of the symmetric 4×4 system A·dw = g by evaluating
    the SAME expression strings ``logreg_sql4`` splices into the oracle
    SQL — cross-engine float parity by construction."""
    ns = dict(a)
    det = eval(_DET4_EXPR, {"__builtins__": {}}, ns)  # noqa: S307 — fixed literal
    _check_det(det, [a["a00"], a["a11"], a["a22"], a["a33"]], "_solve4")
    ns["det"] = det
    inv = {
        k: eval(expr, {"__builtins__": {}}, ns)  # noqa: S307 — fixed literal
        for k, expr in _INV4_EXPRS.items()
    }
    g0, g1, g2, g3 = g
    return [
        ((inv["i00"] * g0 + inv["i01"] * g1) + inv["i02"] * g2) + inv["i03"] * g3,
        ((inv["i01"] * g0 + inv["i11"] * g1) + inv["i12"] * g2) + inv["i13"] * g3,
        ((inv["i02"] * g0 + inv["i12"] * g1) + inv["i22"] * g2) + inv["i23"] * g3,
        ((inv["i03"] * g0 + inv["i13"] * g1) + inv["i23"] * g2) + inv["i33"] * g3,
    ]


def logreg_newton_fit(
    df: DataFrame,
    features: list[Column],
    label: Column,
    *,
    iters: int = 2,
) -> list[float]:
    """Fit logistic-regression weights by ``iters`` Newton steps from
    w = 0 (p = 0.5 everywhere on step one). ``features`` are small-d
    column expressions (include ``F.lit(1.0)`` for the intercept);
    ``label`` casts to {0.0, 1.0}. Returns the weight list.

    Each step runs one aggregation over ``df`` and one driver-side d×d
    solve; the weights re-enter the next step as exact literal doubles.
    """
    d = len(features)
    y = label.cast("double")
    w = [0.0] * d
    for _ in range(int(iters)):
        z = _linear(features, w)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        wt = p * (F.lit(1.0) - p)
        r = y - p
        aggs = []
        for i in range(d):
            for j in range(i, d):
                aggs.append(
                    F.sum(wt * features[i] * features[j]).alias(f"a{i}{j}")
                )
        for i in range(d):
            aggs.append(F.sum(r * features[i]).alias(f"g{i}"))
        row = df.agg(*aggs).first()
        if row[f"g{0}"] is None:
            raise ValueError(
                "logreg_newton_fit: empty input frame (SUM over zero "
                "rows) — nothing to fit"
            )
        g = [float(row[f"g{i}"]) for i in range(d)]
        if d in (3, 4):
            cells = {
                f"a{i}{j}": float(row[f"a{i}{j}"])
                for i in range(d)
                for j in range(i, d)
            }
            dw = _solve3(cells, g) if d == 3 else _solve4(cells, g)
        else:
            import numpy as np

            A = np.zeros((d, d))
            for i in range(d):
                for j in range(i, d):
                    A[i, j] = A[j, i] = float(row[f"a{i}{j}"])
            dw = np.linalg.solve(A, np.asarray(g)).tolist()
        w = [w[i] + dw[i] for i in range(d)]
    return w


def logreg_scores(
    df: DataFrame,
    features: list[Column],
    weights: list[float],
    *,
    out_col: str = "lr_score",
) -> Column:
    """σ(w·x) as a pure-Catalyst column (stateless codegen projection —
    the serving half; pair with the fitted weights from
    ``logreg_newton_fit``)."""
    z = _linear(features, weights)
    return (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias(out_col)


def ols_fit(
    df: DataFrame,
    features: list[Column],
    target: Column,
    *,
    ridge: float = 0.0,
) -> list[float]:
    """Closed-form least squares via the normal equations: ONE
    aggregation computes XᵀX (d(d+1)/2 cells) and Xᵀy (d cells) — the
    same bounded-state shape as the covariance fit — then a driver-side
    d×d solve (adjugate at d=3, matching ``ols_sql3``'s float-op order;
    np.linalg.solve otherwise). ``ridge`` adds λ to every diagonal cell
    (including the intercept's — document the choice when it matters;
    the default 0.0 is plain OLS)."""
    d = len(features)
    y = target.cast("double")
    aggs = []
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.sum(features[i] * features[j]).alias(f"a{i}{j}"))
    for i in range(d):
        aggs.append(F.sum(features[i] * y).alias(f"b{i}"))
    row = df.agg(*aggs).first()
    if row["b0"] is None:
        raise ValueError(
            "ols_fit: empty input frame (SUM over zero rows) — nothing "
            "to fit"
        )
    g = [float(row[f"b{i}"]) for i in range(d)]
    if d in (3, 4):
        cells = {
            f"a{i}{j}": float(row[f"a{i}{j}"])
            + (float(ridge) if i == j else 0.0)
            for i in range(d)
            for j in range(i, d)
        }
        return _solve3(cells, g) if d == 3 else _solve4(cells, g)
    import numpy as np

    A = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            A[i, j] = A[j, i] = float(row[f"a{i}{j}"])
    A += float(ridge) * np.eye(d)
    return np.linalg.solve(A, np.asarray(g)).tolist()


def ols_sql3(
    feats_cte: str,
    *,
    x_cols: tuple[str, str, str] = ("x0", "x1", "x2"),
    y_col: str = "y",
    ridge: float = 0.0,
) -> str:
    """Chained-CTE DuckDB replay of a d=3 ``ols_fit``: emits CTEs ending
    in ``w`` holding (w0, w1, w2); formulas mirror the operator's
    adjugate solve term for term."""
    x0, x1, x2 = x_cols
    r = float(ridge)
    return f"""{feats_cte},
nrm AS (
    SELECT sum({x0} * {x0}) + {r!r} AS a00,
           sum({x0} * {x1}) AS a01,
           sum({x0} * {x2}) AS a02,
           sum({x1} * {x1}) + {r!r} AS a11,
           sum({x1} * {x2}) AS a12,
           sum({x2} * {x2}) + {r!r} AS a22,
           sum({x0} * {y_col}) AS b0,
           sum({x1} * {y_col}) AS b1,
           sum({x2} * {y_col}) AS b2
    FROM feats
),
w AS (
    SELECT ((i.a11 * i.a22 - i.a12 * i.a12) / i.det) * i.b0
         + ((i.a02 * i.a12 - i.a01 * i.a22) / i.det) * i.b1
         + ((i.a01 * i.a12 - i.a02 * i.a11) / i.det) * i.b2 AS w0,
           ((i.a02 * i.a12 - i.a01 * i.a22) / i.det) * i.b0
         + ((i.a00 * i.a22 - i.a02 * i.a02) / i.det) * i.b1
         + ((i.a01 * i.a02 - i.a00 * i.a12) / i.det) * i.b2 AS w1,
           ((i.a01 * i.a12 - i.a02 * i.a11) / i.det) * i.b0
         + ((i.a01 * i.a02 - i.a00 * i.a12) / i.det) * i.b1
         + ((i.a00 * i.a11 - i.a01 * i.a01) / i.det) * i.b2 AS w2
    FROM (
        SELECT *,
               (a00 * (a11 * a22 - a12 * a12)
                - a01 * (a01 * a22 - a12 * a02)
                + a02 * (a01 * a12 - a11 * a02)) AS det
        FROM nrm
    ) i
)"""


def logreg_sql3(
    feats_cte: str,
    *,
    iters: int = 2,
    x_cols: tuple[str, str, str] = ("x0", "x1", "x2"),
    y_col: str = "y",
) -> str:
    """Chained-CTE DuckDB replay of a d=3 ``logreg_newton_fit``:
    ``feats_cte`` must define a relation ``feats`` with the three
    feature columns, the 0/1 double label, and any passthrough columns.
    Emits CTEs up to ``w{iters}`` holding the final (w0, w1, w2); the
    caller composes the scoring SELECT. Every formula mirrors the
    operator's float-op order term for term."""
    x0, x1, x2 = x_cols
    ctes = [feats_cte, "w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2)"]
    for k in range(1, int(iters) + 1):
        prev = f"w{k - 1}"
        ctes.append(f"""it{k} AS (
    SELECT sum((p * (1.0 - p)) * {x0} * {x0}) AS a00,
           sum((p * (1.0 - p)) * {x0} * {x1}) AS a01,
           sum((p * (1.0 - p)) * {x0} * {x2}) AS a02,
           sum((p * (1.0 - p)) * {x1} * {x1}) AS a11,
           sum((p * (1.0 - p)) * {x1} * {x2}) AS a12,
           sum((p * (1.0 - p)) * {x2} * {x2}) AS a22,
           sum(({y_col} - p) * {x0}) AS g0,
           sum(({y_col} - p) * {x1}) AS g1,
           sum(({y_col} - p) * {x2}) AS g2
    FROM (
        SELECT f.*, 1.0 / (1.0 + exp(-((w.w0 * f.{x0} + w.w1 * f.{x1})
                                       + w.w2 * f.{x2}))) AS p
        FROM feats f CROSS JOIN {prev} w
    )
)""")
        ctes.append(f"""w{k} AS (
    SELECT w.w0 + (((i.a11 * i.a22 - i.a12 * i.a12) / i.det) * i.g0
                 + ((i.a02 * i.a12 - i.a01 * i.a22) / i.det) * i.g1
                 + ((i.a01 * i.a12 - i.a02 * i.a11) / i.det) * i.g2) AS w0,
           w.w1 + (((i.a02 * i.a12 - i.a01 * i.a22) / i.det) * i.g0
                 + ((i.a00 * i.a22 - i.a02 * i.a02) / i.det) * i.g1
                 + ((i.a01 * i.a02 - i.a00 * i.a12) / i.det) * i.g2) AS w1,
           w.w2 + (((i.a01 * i.a12 - i.a02 * i.a11) / i.det) * i.g0
                 + ((i.a01 * i.a02 - i.a00 * i.a12) / i.det) * i.g1
                 + ((i.a00 * i.a11 - i.a01 * i.a01) / i.det) * i.g2) AS w2
    FROM (
        SELECT *,
               (a00 * (a11 * a22 - a12 * a12)
                - a01 * (a01 * a22 - a12 * a02)
                + a02 * (a01 * a12 - a11 * a02)) AS det
        FROM it{k}
    ) i CROSS JOIN {prev} w
)""")
    return ",\n".join(ctes)


def _sql4(expr: str) -> str:
    """Prefix every normal-matrix cell / det reference with the ``i.``
    alias — the textual splice that keeps the oracle's float-op order
    IDENTICAL to ``_solve4``'s eval of the same string."""
    import re

    return re.sub(r"\b(a[0-3][0-3]|det)\b", r"i.\1", expr)


def logreg_sql4(
    feats_cte: str,
    *,
    iters: int = 2,
    x_cols: tuple[str, str, str, str] = ("x0", "x1", "x2", "x3"),
    y_col: str = "y",
) -> str:
    """Chained-CTE DuckDB replay of a d=4 ``logreg_newton_fit`` — the
    d=4 sibling of ``logreg_sql3``, except the adjugate formulas are not
    hand-mirrored: they are the SAME strings ``_solve4`` evaluates
    (``_DET4_EXPR`` / ``_INV4_EXPRS``), spliced with an ``i.`` prefix.
    Emits CTEs up to ``w{iters}`` holding (w0..w3)."""
    x0, x1, x2, x3 = x_cols
    xs = (x0, x1, x2, x3)
    ctes = [
        feats_cte,
        "w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)",
    ]
    inv = {k: _sql4(v) for k, v in _INV4_EXPRS.items()}
    for k in range(1, int(iters) + 1):
        prev = f"w{k - 1}"
        cells = ",\n           ".join(
            f"sum((p * (1.0 - p)) * {xs[i]} * {xs[j]}) AS a{i}{j}"
            for i in range(4)
            for j in range(i, 4)
        )
        grads = ",\n           ".join(
            f"sum(({y_col} - p) * {xs[i]}) AS g{i}" for i in range(4)
        )
        ctes.append(f"""it{k} AS (
    SELECT {cells},
           {grads}
    FROM (
        SELECT f.*, 1.0 / (1.0 + exp(-((((w.w0 * f.{x0} + w.w1 * f.{x1})
                                         + w.w2 * f.{x2}) + w.w3 * f.{x3})))) AS p
        FROM feats f CROSS JOIN {prev} w
    )
)""")
        # dw_i = ((i_i0*g0 + i_i1*g1) + i_i2*g2) + i_i3*g3 — the _solve4 fold
        def cell(i: int, j: int) -> str:
            key = f"i{min(i, j)}{max(i, j)}"
            return f"({inv[key]})"

        rows = []
        for i in range(4):
            rows.append(
                f"w.w{i} + ((({cell(i, 0)} * i.g0\n"
                f"              + {cell(i, 1)} * i.g1)\n"
                f"              + {cell(i, 2)} * i.g2)\n"
                f"              + {cell(i, 3)} * i.g3) AS w{i}"
            )
        wsel = ",\n           ".join(rows)
        ctes.append(f"""w{k} AS (
    SELECT {wsel}
    FROM (
        SELECT *, ({_DET4_EXPR}) AS det
        FROM it{k}
    ) i CROSS JOIN {prev} w
)""")
    return ",\n".join(ctes)


def ols_sql4(
    feats_cte: str,
    *,
    x_cols: tuple[str, str, str, str] = ("x0", "x1", "x2", "x3"),
    y_col: str = "y",
    ridge: float = 0.0,
) -> str:
    """Chained-CTE DuckDB replay of a d=4 ``ols_fit`` — the d=4 sibling
    of ``ols_sql3``, sharing ``_DET4_EXPR``/``_INV4_EXPRS`` verbatim with
    ``_solve4`` (cross-engine float parity by construction). Emits CTEs
    ending in ``w`` holding (w0..w3)."""
    xs = x_cols
    r = float(ridge)
    inv = {k: _sql4(v) for k, v in _INV4_EXPRS.items()}
    cells = ",\n           ".join(
        f"sum({xs[i]} * {xs[j]})"
        + (f" + {r!r}" if i == j else "")
        + f" AS a{i}{j}"
        for i in range(4)
        for j in range(i, 4)
    )
    rhs = ",\n           ".join(
        f"sum({xs[i]} * {y_col}) AS b{i}" for i in range(4)
    )

    def cell(i: int, j: int) -> str:
        return f"({inv[f'i{min(i, j)}{max(i, j)}']})"

    rows = []
    for i in range(4):
        rows.append(
            f"((({cell(i, 0)} * i.b0\n"
            f"      + {cell(i, 1)} * i.b1)\n"
            f"      + {cell(i, 2)} * i.b2)\n"
            f"      + {cell(i, 3)} * i.b3) AS w{i}"
        )
    wsel = ",\n           ".join(rows)
    return f"""{feats_cte},
nrm AS (
    SELECT {cells},
           {rhs}
    FROM feats
),
w AS (
    SELECT {wsel}
    FROM (
        SELECT *, ({_DET4_EXPR}) AS det
        FROM nrm
    ) i
)"""
