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


_DISTS_EXACT_MAX_K = 32


def _dists(x, cents):
    import numpy as np

    # small k: explicit (x - c)^2 per centroid — batch×dim memory and
    # term-for-term the oracle's formula (every oracle-checked query
    # runs k ≤ 8). large k (SemDeDup scales k with the corpus): ONE
    # BLAS matmul via x² + c² − 2xc — the per-centroid Python loop
    # otherwise dominates the assignment pass (measured at k=512). The
    # matmul form rounds differently, which can flip an argmin only for
    # near-exactly-equidistant centroids — accepted for the large-k
    # regime, which is never oracle-replayed.
    if len(cents) <= _DISTS_EXACT_MAX_K:
        return np.stack(
            [np.square(x - c).sum(axis=1) for c in cents], axis=1
        )
    c = np.asarray(cents)
    return (
        (x * x).sum(axis=1)[:, None]
        + (c * c).sum(axis=1)[None, :]
        - 2.0 * (x @ c.T)
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


def _cells_kernel(
    cents,
    id_col: str,
    vec_col: str,
    carry_vec: bool = False,
    emit_dist: bool = False,
):
    import numpy as np

    c = np.asarray(cents, dtype=np.float64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            d = _dists(x, c)
            cell = np.argmin(d, axis=1)
            out = {id_col: pdf[id_col], "cluster": cell.astype("int32")}
            if emit_dist:
                # recompute the EMITTED distance sequentially over dims:
                # _dists sums pairwise (np.sum) but the DuckDB oracle
                # replays left-to-right list_sum — hashing a rounded
                # value within a ulp of the 1e-6 boundary must not flip
                # between engines (the quantize.py kernel contract).
                sel = c[cell]
                acc = np.zeros(len(cell))
                for dd in range(x.shape[1]):
                    diff = x[:, dd] - sel[:, dd]
                    acc += diff * diff
                out["sq_dist"] = acc
            if carry_vec:
                out[vec_col] = pdf[vec_col]
            yield pd.DataFrame(out)

    return run


def kmeans_label(
    df: DataFrame,
    cents: list[list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry_vec: bool = False,
    emit_dist: bool = False,
) -> DataFrame:
    """Label rows against fixed centroids (one Arrow kernel pass).

    ``carry_vec=True`` passes the vector column through the same pass in
    its SOURCE type (float→double cast happens only inside the distance
    math), so cluster-keyed downstream work (SemDeDup's within-cluster
    pair stage) gets (id, cluster, vec) without a second scan or an
    id-equi-join that would re-shuffle every vector. ``emit_dist=True``
    adds the squared distance to the assigned centroid (the SemDeDup
    paper's prune signal) — already computed by the argmin, so free."""
    out_schema = f"{id_col} long, cluster int"
    if emit_dist:
        out_schema += ", sq_dist double"
    if carry_vec:
        out_schema += f", {vec_col} {df.schema[vec_col].dataType.simpleString()}"
    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        _cells_kernel(cents, id_col, vec_col, carry_vec, emit_dist),
        out_schema,
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = ROUND_SCALE,
) -> list[list[float]]:
    """Run the Lloyd loop and return the final (rounded) centroids."""
    first = df.select(vec_col).first()
    if first is None:
        return []
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

    return cents


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
    cents = kmeans_fit(
        df, k, iters, id_col=id_col, vec_col=vec_col, scale=scale
    )
    if not cents:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, cluster int"
        )
    return kmeans_label(df, cents, id_col=id_col, vec_col=vec_col)


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
    return pq_fit_codes(
        df, n_subspaces, k, iters, id_col=id_col, vec_col=vec_col
    )[1].orderBy(id_col)


def pq_fit_codes(
    df: DataFrame,
    n_subspaces: int = 8,
    k: int = 8,
    iters: int = 2,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[list[float]]], DataFrame]:
    """Fit the per-subspace codebooks and label every row: returns
    (centroids[m][k][width], codes frame with code_0..code_{m-1})."""
    dim = len(df.select(vec_col).first()[0])
    width = dim // n_subspaces
    cents_all: list[list[list[float]]] = []
    out = None
    for j in range(n_subspaces):
        sub = df.select(
            F.col(id_col),
            F.slice(F.col(vec_col), j * width + 1, width).alias(vec_col),
        )
        cents = kmeans_fit(
            sub, k=k, iters=iters, id_col=id_col, vec_col=vec_col
        )
        cents_all.append(cents)
        codes = kmeans_label(
            sub, cents, id_col=id_col, vec_col=vec_col
        ).withColumnRenamed("cluster", f"code_{j}")
        out = codes if out is None else out.join(codes, id_col)
    return cents_all, out


def pq_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    *,
    n_subspaces: int = 8,
    n_cents: int = 8,
    iters: int = 2,
    query_id: str = "query_id",
    cand_id: str = "cand_id",
    vec_col: str = "embedding",
    max_query_rows: int = 10_000,
) -> DataFrame:
    """PQ-ADC approximate nearest neighbors (asymmetric distance
    computation, Jégou et al. 2011): fit PQ codebooks on the
    candidates, precompute each query's m×k distance table driver-side
    (queries are the bounded side, like every ANN entry point here),
    then score candidates by m table lookups per row in an Arrow kernel
    that emits only its BATCH-LOCAL top-k per query — the global window
    ranks n_batches·n_queries·k rows, never the full candidate set.
    Approximate squared-L2 (codebook-quantized); exact re-rank of the
    shortlist is one join away when needed.

    The queries frame is collected to the driver to build the ADC
    lookup tables — correct ONLY for probe-sized query sets. To keep a
    large frame from silently materializing driver-side,
    ``max_query_rows`` (default 10k ≈ tables of 10k·m·n_cents doubles)
    is enforced with one eager count, the same cheap-assert precedent
    as ``run_adjustment(check_id_uniqueness=True)``; raise it
    deliberately, or batch the query set, for bigger probes.

    Scale: the per-row cost is m integer lookups + adds (vectorized
    fancy-indexing over the whole batch), the only full-table pass is
    the scan, and nothing pairwise survives past the per-batch top-k."""
    import numpy as np

    from ..functions.rounding import stable_round

    n_q = queries.count()
    if n_q > max_query_rows:
        raise ValueError(
            f"pq_topk collects the query side driver-side to build ADC "
            f"tables: got {n_q} query rows > max_query_rows="
            f"{max_query_rows}. Batch the query set or raise "
            f"max_query_rows deliberately."
        )
    cents_all, codes = pq_fit_codes(
        candidates,
        n_subspaces,
        n_cents,
        iters,
        id_col=cand_id,
        vec_col=vec_col,
    )
    width = len(cents_all[0][0])
    m = n_subspaces
    qrows = queries.select(query_id, vec_col).collect()
    qids = np.asarray([r[query_id] for r in qrows])
    qv = np.asarray(
        [[float(x) for x in r[vec_col]] for r in qrows], dtype=np.float64
    )
    n_c = max(len(c) for c in cents_all)
    tables = np.zeros((len(qids), m, n_c))
    for j, cents in enumerate(cents_all):
        c = np.asarray(cents, dtype=np.float64)
        sub = qv[:, j * width : (j + 1) * width]
        for ci in range(c.shape[0]):
            tables[:, j, ci] = np.square(sub - c[ci]).sum(axis=1)
    code_cols = [f"code_{j}" for j in range(m)]
    kk = int(k)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            codes_np = pdf[code_cols].to_numpy()
            acc = np.zeros((len(qids), len(pdf)))
            for j in range(m):
                acc += tables[:, j, codes_np[:, j]]
            cand = pdf[cand_id].to_numpy()
            outs = []
            for qi in range(len(qids)):
                idx = np.nonzero(cand != qids[qi])[0]
                if not len(idx):
                    continue
                order = np.lexsort((cand[idx], acc[qi, idx]))[:kk]
                sel = idx[order]
                outs.append(
                    pd.DataFrame(
                        {
                            query_id: qids[qi],
                            cand_id: cand[sel],
                            "pq_dist": acc[qi, sel],
                        }
                    )
                )
            if outs:
                yield pd.concat(outs)

    local = codes.mapInPandas(
        run, f"{query_id} long, {cand_id} long, pq_dist double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id).orderBy(
        F.col("pq_dist"), F.col(cand_id)
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id,
            cand_id,
            stable_round("pq_dist", 6).alias("pq_dist"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


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
    emit: str = "assign",
) -> str:
    """DuckDB twin of ``kmeans_assign``: replays init, every assignment
    (same left-to-right float sums via list_sum) and every rounded
    centroid update as chained CTEs. ``emit="cents"`` returns the final
    centroid table (cell, v) instead of the assignment — the
    ``kmeans_fit`` twin used by the ADC oracle."""
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
    if emit == "cents":
        return (
            "WITH "
            + ",\n".join(parts)
            + f"\nSELECT cell, v FROM c{iters}"
        )
    final = assign("v", f"c{iters}", f"{id_col}, CAST(cell AS INT) AS cluster")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT * FROM {final} ORDER BY {id_col}"
    )


def pq_topk_sql(
    k_out: int,
    n_subspaces: int = 8,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    *,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: str = "vec_id % 100 = 0",
) -> str:
    """DuckDB twin of ``pq_topk``: replays every subspace's codebook fit
    twice (codes + final centroids), then computes the ADC distance for
    ALL (query, candidate) pairs and ranks — batch-local top-k on the
    Spark side preserves the global top-k, so the full ranking is the
    exact oracle."""
    width = dim // n_subspaces
    code_joins = []
    cent_joins = []
    dist_terms = []
    for j in range(n_subspaces):
        sliced = f"{vec_col}[{j * width + 1} : {j * width + width}]"
        codes_j = kmeans_sql(
            k=k, iters=iters, dim=width, table=table,
            id_col=id_col, vec_col=sliced,
        )
        cents_j = kmeans_sql(
            k=k, iters=iters, dim=width, table=table,
            id_col=id_col, vec_col=sliced, emit="cents",
        )
        code_joins.append(
            f"(SELECT {id_col}, cluster AS code_{j} FROM ({codes_j}) s{j})"
            f" cd{j}"
        )
        cent_joins.append(
            f"JOIN ({cents_j}) ct{j} ON ct{j}.cell = codes.code_{j}"
        )
        dist_terms.append(
            f"list_sum(list_transform(range(1, {width} + 1), "
            f"d -> (q.qv[{j * width} + d] - ct{j}.v[d])"
            f" * (q.qv[{j * width} + d] - ct{j}.v[d])))"
        )
    codes_sql = (
        f"SELECT * FROM {code_joins[0]} "
        + " ".join(
            f"JOIN {code_joins[j]} USING ({id_col})"
            for j in range(1, n_subspaces)
        )
    )
    dist = " + ".join(dist_terms)
    return f"""
WITH q AS (
    SELECT {id_col} AS query_id,
           list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS qv
    FROM {table} WHERE {query_pred}
), codes AS ({codes_sql}),
pairs AS (
    SELECT q.query_id, codes.{id_col} AS cand_id, {dist} AS pq_dist
    FROM codes CROSS JOIN q
    {' '.join(cent_joins)}
    WHERE codes.{id_col} <> q.query_id
), ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY pq_dist, cand_id) AS rank
    FROM pairs
)
SELECT query_id, cand_id,
       round((pq_dist) - 1e-9, 6) + 0.0 AS pq_dist, rank
FROM ranked WHERE rank <= {k_out}
ORDER BY query_id, rank
"""
