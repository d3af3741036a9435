"""Int8 scalar quantization (SQ8) of an embedding column + ANN over codes.

The standard memory/bandwidth lever between full-precision vectors and
product quantization (FAISS's ``SQ8``, Milvus/pgvector equivalents): each
dimension is affinely mapped onto 0..255 using its GLOBAL min/max, so a
64×4 B float32 vector becomes 64 bytes — 4× less scan and shuffle volume —
while distances stay within the per-dim step of exact. PQ (cluster.pq_*)
compresses harder but needs codebook fits; SQ8 needs one min/max pass.

Spark shapes:

- fit: ONE scan computing 2·dim column aggregates (unrolled ``F.min`` /
  ``F.max`` over array slots — map-side-combinable hash agg, no explode,
  no shuffle of vectors). The 2·dim-double bounds table crosses the
  driver, same bounded shape as a k-means centroid update.
- encode: a pure Catalyst projection (array of round/cast expressions) —
  stateless, codegen'd, zero Python.
- ``sq8_topk``: asymmetric ANN — exact float64 queries against
  dequantized candidates. Queries are collected (bounded probe set,
  ``max_query_rows`` guard — the ``pq_topk`` precedent); candidates
  stream through an Arrow kernel that dequantizes per batch and emits
  only batch-local top-k, so nothing pairwise survives past the kernel.

Cross-engine determinism: bounds are exact min/max (no float summation),
codes use the same round(x − 1e-9) expression both engines, and the
kernel accumulates squared diffs SEQUENTIALLY over dimensions to match
the oracle's left-to-right ``list_sum`` order bit-for-bit.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import stable_round

LEVELS = 255  # codes 0..255


def sq8_fit(
    df: DataFrame, *, vec_col: str = "embedding", dim: int = 64
) -> tuple[list[float], list[float]]:
    """Per-dimension (mins, steps) from one unrolled min/max scan."""
    aggs = []
    for d in range(dim):
        x = F.col(vec_col)[d].cast("double")
        aggs.append(F.min(x).alias(f"mn_{d}"))
        aggs.append(F.max(x).alias(f"mx_{d}"))
    row = df.agg(*aggs).first()
    mins, steps = [], []
    for d in range(dim):
        mn, mx = row[f"mn_{d}"], row[f"mx_{d}"]
        if mn is None:  # empty input
            return [], []
        mins.append(float(mn))
        steps.append((float(mx) - float(mn)) / LEVELS)
    return mins, steps


def sq8_encode(
    df: DataFrame,
    mins: list[float],
    steps: list[float],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """Affine-quantize each dimension to 0..255 (pure Catalyst projection).

    Constant dimensions (step 0) encode as 0. The 1e-9 shift keeps
    half-boundary rounding identical across engines (functions.rounding).
    """
    cells = []
    for d, (mn, st) in enumerate(zip(mins, steps)):
        x = F.col(vec_col)[d].cast("double")
        if st > 0.0:
            code = F.round((x - F.lit(mn)) / F.lit(st) - F.lit(1e-9), 0)
        else:
            code = F.lit(0.0)
        cells.append(code.cast("int"))
    return df.select(F.col(id_col), F.array(*cells).alias(out_col))


def sq8_reconstruction_error(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Per-dimension quantization-quality audit: mean squared and max
    absolute dequantization error. One encode projection + one unrolled
    agg — the check a deployment runs before switching scans to codes."""
    mins, steps = sq8_fit(df, vec_col=vec_col, dim=dim)
    if not mins:
        return df.sparkSession.createDataFrame(
            [], "d int, mse double, max_abs_err double"
        )
    errs = []
    for d, (mn, st) in enumerate(zip(mins, steps)):
        x = F.col(vec_col)[d].cast("double")
        if st > 0.0:
            code = F.round((x - F.lit(mn)) / F.lit(st) - F.lit(1e-9), 0)
        else:
            code = F.lit(0.0)
        deq = F.lit(mn) + code * F.lit(st)
        errs.append((x - deq).alias(f"e_{d}"))
    e = df.select(*errs)
    aggs = []
    for d in range(dim):
        c = F.col(f"e_{d}")
        aggs.append(F.avg(c * c).alias(f"mse_{d}"))
        aggs.append(F.max(F.abs(c)).alias(f"mx_{d}"))
    row = e.agg(*aggs).first()
    out = [
        (d, float(row[f"mse_{d}"]), float(row[f"mx_{d}"]))
        for d in range(dim)
    ]
    return df.sparkSession.createDataFrame(
        out, "d int, mse double, max_abs_err double"
    )


def sq8_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    *,
    dim: int = 64,
    query_id: str = "query_id",
    cand_id: str = "cand_id",
    vec_col: str = "embedding",
    max_query_rows: int = 10_000,
) -> DataFrame:
    """Asymmetric SQ8 nearest neighbors: exact queries vs dequantized
    candidates, squared-L2, ties by candidate id.

    The candidate table is scanned once as CODES (4× fewer bytes than the
    float32 vectors at dim 64); the kernel dequantizes each Arrow batch,
    accumulates (q_d − deq_d)² sequentially over d (oracle float-op
    order), and keeps batch-local top-k; the global window ranks only
    n_batches·n_queries·k rows."""
    n_q = queries.count()
    if n_q > max_query_rows:
        raise ValueError(
            f"sq8_topk collects the query side driver-side: got {n_q} "
            f"query rows > max_query_rows={max_query_rows}. Batch the "
            f"query set or raise max_query_rows deliberately."
        )
    mins, steps = sq8_fit(candidates, vec_col=vec_col, dim=dim)
    spark = queries.sparkSession
    if not mins:
        return spark.createDataFrame(
            [], f"{query_id} long, {cand_id} long, sq_dist double, rank long"
        )
    codes = sq8_encode(
        candidates, mins, steps, id_col=cand_id, vec_col=vec_col
    )
    qrows = queries.select(query_id, vec_col).collect()
    if not qrows:
        # np.asarray of an empty row list is 1-D; the kernel's qv[:, d, None]
        # would IndexError — mirror the empty-candidates early return.
        return spark.createDataFrame(
            [], f"{query_id} long, {cand_id} long, sq_dist double, rank long"
        )
    qids = np.asarray([r[query_id] for r in qrows])
    qv = np.asarray(
        [[float(x) for x in r[vec_col]] for r in qrows], dtype=np.float64
    )
    mn = np.asarray(mins, dtype=np.float64)
    st = np.asarray(steps, dtype=np.float64)
    kk = int(k)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            c = np.vstack(pdf["codes"].to_numpy()).astype(np.float64)
            deq = mn[None, :] + c * st[None, :]
            cand = pdf[cand_id].to_numpy()
            if len(qids) <= 32:
                # sequential over d: bit-matches the oracle's list_sum
                # order (every oracle-checked run is a probe-sized set)
                acc = np.zeros((len(qids), len(pdf)))
                for d in range(deq.shape[1]):
                    diff = qv[:, d, None] - deq[None, :, d]
                    acc += diff * diff
            else:
                # large query sets: the d-loop allocates a q×batch temp
                # per dimension — 64 passes of pure memory traffic
                # (measured 259 s at the 64× rung, 1,280 queries). One
                # BLAS matmul via q²+c²−2qc is compute-bound instead;
                # the rounding difference can flip a rank only for
                # near-exactly-equidistant candidates (same acceptance
                # as cluster._dists' large-k form).
                acc = (
                    (qv * qv).sum(axis=1)[:, None]
                    + (deq * deq).sum(axis=1)[None, :]
                    - 2.0 * (qv @ deq.T)
                )
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
                            "sq_dist": acc[qi, sel],
                        }
                    )
                )
            if outs:
                yield pd.concat(outs)

    local = codes.mapInPandas(
        run, f"{query_id} long, {cand_id} long, sq_dist double"
    )
    w = Window.partitionBy(query_id).orderBy(F.col("sq_dist"), F.col(cand_id))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id,
            cand_id,
            stable_round("sq_dist", 6).alias("sq_dist"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def _bounds_cte(table: str, vec_col: str, dim: int) -> str:
    return f"""dv AS (
    SELECT *, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS __v
    FROM {table}
), bounds AS (
    SELECT d, min(__v[d]) AS mn,
           (max(__v[d]) - min(__v[d])) / {LEVELS}.0 AS st
    FROM dv CROSS JOIN (SELECT unnest(range(1, {dim} + 1)) AS d)
    GROUP BY d
), b AS (
    SELECT list(mn ORDER BY d) AS mn, list(st ORDER BY d) AS st
    FROM bounds
), coded AS (
    SELECT dv.*, list_transform(range(1, {dim} + 1),
        d -> CASE WHEN b.st[d] > 0
             THEN round((dv.__v[d] - b.mn[d]) / b.st[d] - 1e-9, 0)
             ELSE 0.0 END) AS __code
    FROM dv CROSS JOIN b
)"""


def sq8_recon_error_sql(
    dim: int = 64, *, table: str = "embeddings", vec_col: str = "embedding"
) -> str:
    """DuckDB twin of ``sq8_reconstruction_error``."""
    return f"""
WITH {_bounds_cte(table, vec_col, dim)},
errs AS (
    SELECT d, coded.__v[d] - (b.mn[d] + coded.__code[d] * b.st[d]) AS e
    FROM coded CROSS JOIN b
    CROSS JOIN (SELECT unnest(range(1, {dim} + 1)) AS d)
)
SELECT CAST(d - 1 AS INT) AS d, avg(e * e) AS mse,
       max(abs(e)) AS max_abs_err
FROM errs GROUP BY d ORDER BY d
"""


def sq8_topk_sql(
    k_out: int,
    dim: int = 64,
    *,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: str = "vec_id % 100 = 0",
) -> str:
    """DuckDB twin of ``sq8_topk``: full distance set, then rank."""
    return f"""
WITH {_bounds_cte(table, vec_col, dim)},
q AS (
    SELECT {id_col} AS query_id, __v AS qv FROM dv WHERE {query_pred}
), pairs AS (
    SELECT q.query_id, coded.{id_col} AS cand_id,
           list_sum(list_transform(range(1, {dim} + 1),
               d -> (q.qv[d] - (b.mn[d] + coded.__code[d] * b.st[d]))
                  * (q.qv[d] - (b.mn[d] + coded.__code[d] * b.st[d]))))
               AS sq_dist
    FROM coded CROSS JOIN b CROSS JOIN q
    WHERE coded.{id_col} <> q.query_id
), ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY sq_dist, cand_id) AS rank
    FROM pairs
)
SELECT query_id, cand_id,
       round((sq_dist) - 1e-9, 6) + 0.0 AS sq_dist, rank
FROM ranked WHERE rank <= {k_out}
ORDER BY query_id, rank
"""
