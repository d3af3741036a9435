"""Distributed k-means (Lloyd's algorithm) over an embedding column.

The iterative-ML building block of cluster-aware corpus work (topic
balancing, SemDeDup-style semantic bucketing, cluster-stratified
sampling). Unlike ``similarity_search.ivf_topk``'s coarse quantizer —
which fits driver-side on a bounded sample — this is the full
distributed fit: every assignment pass and every centroid update runs
on the cluster; only the k×(dim+1) running-centroid table crosses the
driver per iteration (k=8, dim=64 → ~4 KB), the same bounded shape as a
broadcast-variable update on any Spark ML iteration.

Physical strategy — the assignment is an Arrow-batched NumPy kernel
(mapInPandas), the same decision as the kNN join's BLAS kernel and for
the same measured reason: a k·dim unrolled Catalyst expression for the
distances falls out of whole-stage codegen (the argmin needs the k
distances twice, or a higher-order function to let-bind them — HOFs are
interpreted, and the fallback interpreter walks ~4k expression nodes
per row). Measured per assignment pass over 128k×64-d rows: 65 s
(transform-let form), 13 s (duplicated array_position/least form),
<1 s (NumPy kernel). The kernel emits per-batch PARTIAL per-cluster
sums (cell, count, Σx) — k rows per Arrow batch — so the centroid
update shuffles k·n_batches tiny rows, never the vectors; the final
labeling pass emits (id, cluster) rows only.

Per iteration: one corpus scan, zero vector shuffles, one k·n_batches-
row hash agg. Empty clusters keep their previous centroid (mirrored in
the oracle via LEFT JOIN + coalesce against the prior centroid table).

Cross-engine exactness: centroids are rounded to a fixed decimal scale
each iteration, so the DuckDB oracle replays init + every update from
identical inputs. Distances inside one pass are NumPy float64 (pairwise
summation) vs the oracle's sequential list_sum — bit-differences can
flip an argmin only when two centroids are within float error of
EXACTLY equidistant, which for distinct rounded centroids on real data
is measure-zero; true ties (duplicate vectors) resolve to the lowest
cluster id in both engines (np.argmin and ORDER BY dist, cell both take
the first minimum).

Deterministic init: the k vectors with the smallest Knuth-mixed id hash
(``(id·2654435761) mod 2^53-ish``), tie-broken by id — spread like a
random sample, replayable in SQL to the row.

reference: the reference engine has no clustering operator; this is
part of the mandated training-data-pipeline surface (SURVEY.md §2
extensions).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INIT_MULT = 2654435761
INIT_MOD = 9007199254740881  # < 2^53: id·mult stays integer-exact in SQL
ROUND_SCALE = 6


def _dists(x, cents):
    import numpy as np

    # explicit (x - c)^2 per centroid: k small, keeps memory at
    # batch×dim and matches the oracle's formula term-for-term
    return np.stack(
        [np.square(x - c).sum(axis=1) for c in cents], axis=1
    )


def _partials_kernel(cents, id_col: str, vec_col: str):
    """Per Arrow batch: assign, then emit k partial rows
    (cell, cnt, per-dim sum) — the vectors never leave the executor."""
    import numpy as np

    c = np.asarray(cents, dtype=np.float64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            cell = np.argmin(_dists(x, c), axis=1)
            cells, inv = np.unique(cell, return_inverse=True)
            cnt = np.bincount(inv)
            sums = np.zeros((len(cells), x.shape[1]))
            np.add.at(sums, inv, x)
            yield pd.DataFrame(
                {
                    "cell": cells.astype("int32"),
                    "cnt": cnt.astype("int64"),
                    "s": list(sums),
                }
            )

    return run


def _cells_kernel(cents, id_col: str, vec_col: str):
    import numpy as np

    c = np.asarray(cents, dtype=np.float64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            cell = np.argmin(_dists(x, c), axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "cluster": cell.astype("int32")}
            )

    return run


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = ROUND_SCALE,
) -> DataFrame:
    """Fit k-means with ``iters`` Lloyd updates and return the final
    assignment (id_col, cluster). Cluster identity is the deterministic
    init ordering, so results are stable run-to-run and cross-engine."""
    first = df.select(vec_col).first()
    if first is None:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, cluster int"
        )
    dim = len(first[0])
    v = df.select(F.col(id_col), F.col(vec_col))

    init_key = (F.col(id_col) * F.lit(INIT_MULT)) % F.lit(INIT_MOD)
    cents: list[list[float]] = [
        [float(x) for x in r[vec_col]]  # float32 -> exact float64
        for r in v.orderBy(init_key, F.col(id_col)).limit(k).collect()
    ]
    k = len(cents)  # degenerate inputs: fewer vectors than k

    for _ in range(iters):
        parts = v.mapInPandas(
            _partials_kernel(cents, id_col, vec_col),
            "cell int, cnt long, s array<double>",
        )
        agg = (
            parts.select(
                "cell", "cnt", F.posexplode("s").alias("d", "x")
            )
            .groupBy("cell", "d")
            .agg(F.sum("x").alias("sx"), F.sum("cnt").alias("cnt"))
            .collect()
        )
        new = [list(c) for c in cents]  # empty cluster keeps its centroid
        by_cell: dict[int, dict[int, float]] = {}
        counts: dict[int, int] = {}
        for r in agg:
            by_cell.setdefault(r["cell"], {})[r["d"]] = r["sx"]
            counts[r["cell"]] = r["cnt"]
        for cell, sums in by_cell.items():
            cnt = counts[cell]
            new[cell] = [
                round(sums[d] / cnt - 1e-9, scale) + 0.0
                for d in range(dim)
            ]
        cents = new

    return v.mapInPandas(
        _cells_kernel(cents, id_col, vec_col),
        f"{id_col} long, cluster int",
    )


def pq_codes(
    df: DataFrame,
    n_subspaces: int = 8,
    k: int = 8,
    iters: int = 2,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codes (Jégou et al., TPAMI 2011 — the IVF-PQ
    compression standard): the vector splits into ``n_subspaces``
    contiguous slices, each slice gets its own k-means codebook
    (``kmeans_assign`` — the Arrow-kernel Lloyd fit), and a vector's
    code is its per-subspace centroid ids — dim·4 bytes compress to
    n_subspaces·log2(k) bits (64·4B → 3B at the defaults).

    Scale shape: each sub-fit inherits kmeans_assign's costs (scan-bound
    passes, k×(dim/m+1) driver rows); the final code table assembles via
    id-keyed joins of the m assignment frames. Fits are independent —
    at cluster scale submit them as concurrent jobs."""
    dim = len(df.select(vec_col).first()[0])
    width = dim // n_subspaces
    out = None
    for j in range(n_subspaces):
        sub = df.select(
            F.col(id_col),
            F.slice(F.col(vec_col), j * width + 1, width).alias(vec_col),
        )
        codes = kmeans_assign(
            sub, k=k, iters=iters, id_col=id_col, vec_col=vec_col
        ).withColumnRenamed("cluster", f"code_{j}")
        out = codes if out is None else out.join(codes, id_col)
    return out.orderBy(id_col)


def pq_sql(
    n_subspaces: int = 8,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    *,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of ``pq_codes``: one full kmeans replay per subspace
    (sliced vector expression), joined on the id."""
    width = dim // n_subspaces
    subs = []
    for j in range(n_subspaces):
        sliced = f"{vec_col}[{j * width + 1} : {j * width + width}]"
        inner = kmeans_sql(
            k=k,
            iters=iters,
            dim=width,
            table=table,
            id_col=id_col,
            vec_col=sliced,
        )
        subs.append(
            f"(SELECT {id_col}, cluster AS code_{j} FROM ({inner}) s{j})"
        )
    joins = subs[0] + " v0"
    for j in range(1, n_subspaces):
        joins += f" JOIN {subs[j]} v{j} USING ({id_col})"
    cols = ", ".join(f"code_{j}" for j in range(n_subspaces))
    return f"SELECT {id_col}, {cols} FROM {joins} ORDER BY {id_col}"


def kmeans_sql(
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    *,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = ROUND_SCALE,
) -> str:
    """DuckDB twin of ``kmeans_assign``: replays init, every assignment
    (same left-to-right float sums via list_sum) and every rounded
    centroid update as chained CTEs."""
    rng = f"range(1, {dim} + 1)"

    def assign(src: str, cents: str, out_cols: str) -> str:
        return f"""(
    SELECT {out_cols} FROM (
        SELECT v.{id_col}, v.v, c.cell,
               row_number() OVER (PARTITION BY v.{id_col} ORDER BY
                   list_sum(list_transform({rng},
                       d -> (v.v[d] - c.v[d]) * (v.v[d] - c.v[d]))),
                   c.cell) AS rn
        FROM {src} v CROSS JOIN {cents} c) WHERE rn = 1)"""

    init_key = f"({id_col} * {INIT_MULT}) % {INIT_MOD}"
    parts = [
        f"""v AS (
    SELECT {id_col},
           list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
    FROM {table}
), c0 AS (
    SELECT row_number() OVER (ORDER BY {init_key}, {id_col}) - 1 AS cell, v
    FROM v
    QUALIFY row_number() OVER (ORDER BY {init_key}, {id_col}) <= {k}
)"""
    ]
    for i in range(1, iters + 1):
        prev = f"c{i - 1}"
        parts.append(
            f"""a{i} AS {assign('v', prev, f'{id_col}, v, cell')},
u{i} AS (
    SELECT cell, unnest({rng}) AS d, unnest(v) AS x FROM a{i}
), s{i} AS (
    SELECT cell, d,
           round(sum(x) / count(*) - 1e-9, {scale}) + 0.0 AS m
    FROM u{i} GROUP BY cell, d
), n{i} AS (
    SELECT cell, list(m ORDER BY d) AS v FROM s{i} GROUP BY cell
), c{i} AS (
    SELECT p.cell, coalesce(n{i}.v, p.v) AS v
    FROM {prev} p LEFT JOIN n{i} USING (cell)
)"""
        )
    final = assign("v", f"c{iters}", f"{id_col}, CAST(cell AS INT) AS cluster")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT * FROM {final} ORDER BY {id_col}"
    )
