"""Distance / similarity column expressions over ``array<double>`` features.

All of these are pure Catalyst expressions (``zip_with`` + ``aggregate`` fold)
— they run JVM-side inside whole-stage codegen, no Python in the hot path.
This replaces the reference's scipy CSR matrix + sklearn metric machinery
(reference: nearest_consented_customers.py:67-83) with column expressions a
distributed join can evaluate per-pair.

Scale note: a fold over a width-w array is O(w) per pair with zero shuffle
implications; the expression is evaluated streaming-side in the broadcast
join, so the 100 TB probe side never materializes a feature matrix.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def l1_distance(a: Column, b: Column) -> Column:
    """Manhattan distance  Σ|a_i − b_i| (the reference default metric,
    README.md:36-38)."""
    return _fold_sum(F.zip_with(a, b, lambda x, y: F.abs(x - y)))


def l2_distance(a: Column, b: Column) -> Column:
    """Euclidean distance  sqrt(Σ(a_i − b_i)²)."""
    d = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.sqrt(_fold_sum(d))


def squared_l2_distance(a: Column, b: Column) -> Column:
    """Σ(a_i − b_i)² — the metric the quantized ANN paths (PQ ADC, SQ8)
    approximate; kept unrooted so rank comparisons skip the sqrt."""
    return _fold_sum(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)))


def dot_product(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def l2_norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.zip_with(a, a, lambda x, y: x * y)))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (|a||b|); null-safe on zero vectors (returns null)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot_product(a, b) / denom)


def _unrolled_sum(a: Column, b: Column, width: int, term) -> Column:
    total = None
    for i in range(width):
        t = term(F.element_at(a, i + 1), F.element_at(b, i + 1))
        total = t if total is None else total + t
    return total


def l1_distance_unrolled(a: Column, b: Column, width: int) -> Column:
    """Manhattan distance as a statically unrolled arithmetic expression.

    ``zip_with`` materializes an intermediate array per evaluated pair —
    ruinous inside a broadcast nested-loop join evaluating O(m·n) pairs.
    When the feature width is known (the encoder always knows it), an
    unrolled Σ|a_i−b_i| stays in whole-stage codegen registers with zero
    allocation."""
    return _unrolled_sum(a, b, width, lambda x, y: F.abs(x - y))


def l2_distance_unrolled(a: Column, b: Column, width: int) -> Column:
    return F.sqrt(_unrolled_sum(a, b, width, lambda x, y: (x - y) * (x - y)))


def chebyshev_distance(a: Column, b: Column) -> Column:
    """L∞ distance  max|a_i − b_i| (sklearn metric='chebyshev')."""
    return F.array_max(F.zip_with(a, b, lambda x, y: F.abs(x - y)))


def chebyshev_distance_unrolled(a: Column, b: Column, width: int) -> Column:
    terms = [
        F.abs(F.element_at(a, i + 1) - F.element_at(b, i + 1))
        for i in range(width)
    ]
    return F.greatest(*terms) if len(terms) > 1 else terms[0]


def minkowski_distance(a: Column, b: Column, p: float) -> Column:
    """L_p distance  (Σ|a_i − b_i|^p)^(1/p) (sklearn metric='minkowski')."""
    return F.pow(
        _fold_sum(F.zip_with(a, b, lambda x, y: F.pow(F.abs(x - y), F.lit(p)))),
        F.lit(1.0 / p),
    )


def minkowski_distance_unrolled(
    a: Column, b: Column, width: int, p: float
) -> Column:
    return F.pow(
        _unrolled_sum(
            a, b, width, lambda x, y: F.pow(F.abs(x - y), F.lit(p))
        ),
        F.lit(1.0 / p),
    )


def cosine_distance(a: Column, b: Column) -> Column:
    """1 − cosine similarity; zero vectors are maximally distant (1.0),
    matching sklearn's convention for degenerate inputs."""
    return F.lit(1.0) - F.coalesce(cosine_similarity(a, b), F.lit(0.0))


def hamming_distance(a: Column, b: Column) -> Column:
    """Number of differing positions."""
    return _fold_sum(
        F.zip_with(a, b, lambda x, y: F.when(x == y, 0.0).otherwise(1.0))
    )


def parse_minkowski(metric: str) -> float | None:
    """``"minkowski:<p>"`` → p (sklearn-style parametrized metric; the
    reference forwards ``metric`` + params straight to sklearn,
    nearest_consented_customers.py:50). Returns None for other metrics."""
    if not metric.startswith("minkowski:"):
        return None
    p = float(metric.split(":", 1)[1])
    if not p >= 1.0:
        raise ValueError(f"minkowski p must be >= 1, got {p}")
    return p


def metric_distance(
    metric: str, a: Column, b: Column, width: int | None = None
) -> Column:
    p = parse_minkowski(metric)
    if p is not None:
        return (
            minkowski_distance_unrolled(a, b, width, p)
            if width
            else minkowski_distance(a, b, p)
        )
    if metric == "chebyshev":
        return (
            chebyshev_distance_unrolled(a, b, width)
            if width
            else chebyshev_distance(a, b)
        )
    if metric == "manhattan":
        return l1_distance_unrolled(a, b, width) if width else l1_distance(a, b)
    if metric == "euclidean":
        return l2_distance_unrolled(a, b, width) if width else l2_distance(a, b)
    if metric == "cosine":
        return cosine_distance(a, b)
    if metric == "hamming":
        if width:
            return _unrolled_sum(
                a, b, width,
                lambda x, y: F.when(x == y, 0.0).otherwise(1.0),
            )
        return hamming_distance(a, b)
    raise ValueError(f"unsupported metric: {metric!r}")
