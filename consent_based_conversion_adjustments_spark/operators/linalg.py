"""Distributed dense linear algebra over an embedding column: mean,
Gram/covariance accumulation, and PCA projection/whitening.

The standard preprocessing in front of large-scale ANN / semantic-dedup
stacks (center → whiten → the quantizer behaves): the covariance fit is
the only corpus-wide pass, and it reduces to one Arrow-batched partial
Gram per partition — each executor accumulates X^T X (dim×dim) and the
column sum over its rows in NumPy/BLAS, then ships ONE flattened row per
batch; the final combine is a tiny hash agg on the (row, col) cell
index. Nothing quadratic in rows, nothing driver-side except the
dim×dim solve (64×64 here — microseconds), mirroring how Spark MLlib's
RowMatrix computes principal components, but staying in the DataFrame
API end to end.

The eigendecomposition itself is a driver-side ``numpy.linalg.eigh`` on
the dim×dim matrix — bounded work independent of table size (the same
bounded-collect class as the IVF k-means sample). The projection back
over the table is an unrolled codegen expression (see cluster.py's
driver-cost notes — one generated SQL string, distance terms appear
once).

reference: no linear-algebra operator exists in the reference engine;
this is part of the mandated training-data-pipeline surface
(SURVEY.md §2 extensions — embedding-pipeline preprocessing).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import stable_round


def gram_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Second-moment statistics in one pass: returns the long-form upper
    triangle of X^T X plus the column sums and the row count —
    (d1, d2, s) rows with d1 ≤ d2, plus (d1, -1, colsum_d1) rows and one
    (-1, -1, n) row. One mapInPandas pass (per-batch BLAS ``x.T @ x``),
    one tiny hash agg on the cell index."""
    import numpy as np

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            dim = x.shape[1]
            g = x.T @ x
            iu = np.triu_indices(dim)
            d1 = np.concatenate(
                [iu[0], np.arange(dim), [-1]]
            ).astype(np.int32)
            d2 = np.concatenate(
                [iu[1], np.full(dim, -1), [-1]]
            ).astype(np.int32)
            s = np.concatenate(
                [g[iu], x.sum(axis=0), [float(len(x))]]
            )
            yield pd.DataFrame({"d1": d1, "d2": d2, "s": s})

    parts = df.select(vec_col).mapInPandas(partial, "d1 int, d2 int, s double")
    return parts.groupBy("d1", "d2").agg(F.sum("s").alias("s"))


def assemble_cov(rows) -> tuple[list[float], list[list[float]], int]:
    """Assemble (mean, covariance, n) from collected gram_stats cells —
    shared by the batch fit and the streaming RunningStatsStore (the
    partials are additive, so the same assembly serves both)."""
    import numpy as np

    n = int(next(r["s"] for r in rows if r["d1"] == -1 and r["d2"] == -1))
    sums = {r["d1"]: r["s"] for r in rows if r["d2"] == -1 and r["d1"] >= 0}
    dim = len(sums)
    mean = np.array([sums[d] / n for d in range(dim)])
    g = np.zeros((dim, dim))
    for r in rows:
        if r["d1"] >= 0 and r["d2"] >= 0:
            g[r["d1"], r["d2"]] = r["s"]
            g[r["d2"], r["d1"]] = r["s"]
    cov = g / n - np.outer(mean, mean)
    return mean.tolist(), cov.tolist(), n


def covariance_fit(
    df: DataFrame, vec_col: str = "embedding"
) -> tuple[list[float], list[list[float]], int]:
    """Collect the bounded gram_stats result (dim·(dim+3)/2 + 1 rows)
    and assemble (mean, covariance, n) driver-side."""
    return assemble_cov(gram_stats(df, vec_col).collect())


def pca_fit(
    df: DataFrame, n_components: int, vec_col: str = "embedding"
) -> tuple[list[float], list[list[float]], list[float]]:
    """Top-``n_components`` principal axes of the covariance (driver-side
    eigh on the dim×dim matrix; deterministic sign convention: each
    eigenvector's largest-magnitude coordinate is positive). Returns
    (mean, components[k][dim], explained_variance[k])."""
    import numpy as np

    mean, cov, _ = covariance_fit(df, vec_col)
    vals, vecs = np.linalg.eigh(np.array(cov))
    order = np.argsort(vals)[::-1][:n_components]
    comps = []
    for j in order:
        v = vecs[:, j]
        pivot = np.argmax(np.abs(v))
        if v[pivot] < 0:
            v = -v
        comps.append(v.tolist())
    return mean, comps, [float(vals[j]) for j in order]


def pca_project(
    df: DataFrame,
    mean: list[float],
    components: list[list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    whiten_by: list[float] | None = None,
    scale: int = 6,
) -> DataFrame:
    """Project (and optionally whiten) every vector onto the fitted
    axes: coord_j = Σ_d (v[d] − mean[d])·c_j[d] (/ √λ_j when whitening).
    One generated codegen expression per component — stateless map, zero
    shuffle, no Python in the hot path."""
    dim = len(mean)
    outs = [F.col(id_col)]
    for j, comp in enumerate(components):
        denom = (whiten_by[j] ** 0.5) if whiten_by else 1.0
        terms = " + ".join(
            f"(element_at({vec_col},{d + 1}) - ({mean[d]!r})) * ({c!r})"
            for d, c in enumerate(comp[:dim])
        )
        outs.append(
            stable_round(F.expr(f"({terms}) / ({denom!r})"), scale).alias(
                f"pc{j}"
            )
        )
    return df.select(*outs)
