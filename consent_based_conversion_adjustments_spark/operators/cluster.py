"""Distributed k-means (Lloyd's algorithm) over an embedding column.

The iterative-ML building block of cluster-aware corpus work (topic
balancing, SemDeDup-style semantic bucketing, cluster-stratified
sampling). Unlike ``similarity_search.ivf_topk``'s coarse quantizer —
which fits driver-side on a bounded sample — this is the full
distributed fit: every assignment pass and every centroid update runs
on the cluster; only the k×(dim+1) running-centroid table crosses the
driver per iteration (k=8, dim=64 → ~4 KB), which is the same bounded
shape as a broadcast-variable update on any Spark ML iteration.

Scale design, per iteration:

- **Assignment is zero-shuffle.** Centroids are baked into one unrolled
  Catalyst expression (k·dim fused multiply-adds in whole-stage
  codegen, summed left-to-right so the float order is reproducible) —
  no N×k pair explosion, no crossJoin, no window. Argmin ties break to
  the lowest cluster id via a first-match when-chain.
- **The update is one map-side-combinable hash agg**: per-cluster count
  + dim column sums (k rows × dim+1 cols per partition partial), then
  the new means are rounded to a fixed decimal scale so the next
  iteration's literals are reproducible across summation orders —
  which is exactly what makes the DuckDB oracle replay bit-exact.
- Empty clusters keep their previous centroid (mirrored in the oracle
  via a LEFT JOIN + coalesce against the prior centroid table).

Deterministic init: the k vectors with the smallest Knuth-mixed id hash
(``(id·2654435761) mod 2^53-ish``), tie-broken by id — spread like a
random sample, replayable in SQL to the row.

reference: the reference engine has no clustering operator; this is
part of the mandated training-data-pipeline surface (SURVEY.md §2
extensions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity_search import _cast_double

INIT_MULT = 2654435761
INIT_MOD = 9007199254740881  # < 2^53: id·mult stays integer-exact in SQL
ROUND_SCALE = 6


def _assign_expr(vec: str, cents: str, k: int, dim: int) -> Column:
    """Argmin cluster id: first centroid (lowest id) achieving the
    minimum unrolled squared-L2 distance, terms summed left-to-right
    (index order) so Spark and the SQL twin add the same doubles in the
    same order and distances compare bit-identically. Ties resolve like
    the oracle's ``ORDER BY dist, cell`` row_number (array_position
    returns the FIRST index of the minimum).

    Three driver-cost traps, all measured on the k=8/dim=64 fit:
    - the k·dim distance terms appear in the plan exactly ONCE — the
      distance array is let-bound (transform-over-1-array) and the
      argmin reads the lambda variable; a least(...)/when-chain form
      re-embeds the whole k·dim subtree per branch (76 s of driver
      analysis per fit);
    - the expression is built as ONE generated SQL string → a single
      py4j call, instead of ~k·dim·4 Python Column operator calls each
      paying a py4j round-trip (the dominant cost at ~2,000 nodes);
    - the centroids arrive as a COLUMN (1-row broadcast attach), not as
      literals, so the generated code is byte-identical across Lloyd
      iterations and both the analyzer and the codegen cache see a
      repeated, already-compiled shape."""
    dist = lambda j: " + ".join(  # noqa: E731
        f"(element_at({vec},{d})-element_at(element_at({cents},{j}),{d}))"
        f"*(element_at({vec},{d})-element_at(element_at({cents},{j}),{d}))"
        for d in range(1, dim + 1)
    )
    arr = "array(" + ",".join(dist(j) for j in range(1, k + 1)) + ")"
    return F.expr(
        f"CAST(transform(array({arr}), "
        "a -> array_position(a, array_min(a)) - 1)[0] AS INT)"
    )


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
    v = df.select(F.col(id_col), _cast_double(vec_col).alias("__v"))

    init_key = (F.col(id_col) * F.lit(INIT_MULT)) % F.lit(INIT_MOD)
    cents: list[list[float]] = [
        [float(x) for x in r["__v"]]
        for r in v.orderBy(init_key, F.col(id_col)).limit(k).collect()
    ]
    k = len(cents)  # degenerate inputs: fewer vectors than k
    spark = df.sparkSession

    def with_cells(cent_vals: list[list[float]]) -> DataFrame:
        # 1-row broadcast attach keeps the generated assignment code
        # byte-identical across iterations (codegen cache hit)
        cdf = spark.createDataFrame(
            [(cent_vals,)], "__cents array<array<double>>"
        )
        return v.crossJoin(F.broadcast(cdf)).withColumn(
            "cell", _assign_expr("__v", "__cents", k, dim)
        )

    for _ in range(iters):
        sums = (
            with_cells(cents)
            .groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                *[
                    F.sum(F.element_at("__v", d + 1)).alias(f"s{d}")
                    for d in range(dim)
                ],
            )
            .collect()
        )
        new = [list(c) for c in cents]  # empty cluster keeps its centroid
        for r in sums:
            cnt = r["cnt"]
            new[r["cell"]] = [
                round(r[f"s{d}"] / cnt - 1e-9, scale) + 0.0
                for d in range(dim)
            ]
        cents = new

    return with_cells(cents).select(
        F.col(id_col), F.col("cell").alias("cluster")
    )


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
