"""SemDeDup: semantic deduplication of an embedding corpus.

Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" (arXiv:2303.09540): cluster the embeddings with
k-means, then search for near-duplicate pairs ONLY within each cluster —
the cluster key prunes the cross-cluster n² before it exists, turning
exact all-pairs dedup into k independent (n/k)²·d problems.

Spark realization (everything reuses measured building blocks):

1. ``cluster.kmeans_fit`` — the distributed Lloyd loop (one scan +
   k·n_batches-row hash agg per iteration; vectors never shuffle).
2. ``cluster.kmeans_label(carry_vec=True)`` — one Arrow pass emits
   (id, cluster, vec); no re-join, no second scan.
3. ``similarity_search.cosine_neardup_blas(group_col="cluster")`` — the
   block-pair grid BLAS kernel, cogroup-keyed on (cluster, block-pair):
   each cluster's pair work is independently blocked (peak task memory
   2·(cluster_size/B) vectors) and clusters parallelize against each
   other. A mega-cluster degrades gracefully to the measured blocked
   all-pairs shape instead of one straggler task.

Keep rules (``semdedup_keep(keep=...)``): the default removes a row when
some same-cluster row with a SMALLER id is cosine-similar above the
threshold (keep-lowest-id — deterministic with no float ordering);
``keep="farthest_from_centroid"`` is the paper's §3 rule — among
duplicates the member farthest from its cluster centroid survives
(ties → lowest id), made cross-engine-deterministic by the sequential
per-dim distance accumulation shared with the oracle's list_sum order.
Both remove the same number of rows per dup group when similarity is
transitive within the group.

100 TB shape: k scales with the corpus (the paper uses ~100k clusters for
LAION) so cluster sizes stay bounded; the fit cost is iters scans, the
pair stage is Σ_c |c|²/B-blocked BLAS — no global quadratic, no
driver-side step beyond the k×dim centroid table.

Oracle: ``semdedup_pairs_sql`` / ``semdedup_keep_sql`` replay the exact
k-means (``cluster.kmeans_sql`` chained CTEs) and the within-cluster
pair scan in DuckDB; cosine uses the same dot/(|a|·|b|) expression shape
as the kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cluster import kmeans_fit, kmeans_label, kmeans_sql
from .similarity_search import cosine_cross_pairs_blas, cosine_neardup_blas


def _auto_blocks(spark, k: int) -> int:
    """Smallest B with k·B(B+1)/2 cogroup tasks ≥ 4× the core count —
    the task-packing law measured on the global kernel (B=16 ↔ 136
    tasks on 32 cores). As k grows, clusters shrink AND supply the
    parallelism themselves, so B falls to 1 (at 64×/k=512 the B=4
    default's 5,120 tiny tasks cost 1.5× pure scheduling overhead vs
    B=1's 512). Blocking never changes the output, only task shape, so
    the auto pick keeps registered queries deterministic."""
    target = 4 * spark.sparkContext.defaultParallelism
    b = 1
    while k * b * (b + 1) // 2 < target and b < 16:
        b += 1
    return b


def _fit_label_blocks(
    df: DataFrame,
    *,
    k: int,
    iters: int,
    id_col: str,
    vec_col: str,
    n_blocks: int | None,
    emit_dist: bool = False,
):
    """Shared fit → label → block-policy stage of the SemDeDup family —
    ONE implementation so the pair stage and every keep rule stay on
    identical clustering/blocking behavior. Returns (labeled, n_blocks)
    or None when the input is empty."""
    cents = kmeans_fit(df, k, iters, id_col=id_col, vec_col=vec_col)
    if not cents:
        return None
    labeled = kmeans_label(
        df,
        cents,
        id_col=id_col,
        vec_col=vec_col,
        carry_vec=True,
        emit_dist=emit_dist,
    )
    if n_blocks is None:
        n_blocks = _auto_blocks(df.sparkSession, len(cents))
    return labeled, n_blocks


def semdedup_pairs(
    df: DataFrame,
    threshold: float,
    *,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
) -> DataFrame:
    """Within-cluster semantic near-duplicate pairs.

    Returns (id_a, id_b, cosine) with id_a < id_b, both members of the
    same k-means cluster, cosine ≥ threshold. ``n_blocks`` blocks each
    cluster's pair grid; the default (None) picks the smallest B whose
    k·B(B+1)/2 cogroup tasks pack the executors (see ``_auto_blocks``)
    — raise it explicitly when single clusters outgrow task memory.
    """
    staged = _fit_label_blocks(
        df, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
        n_blocks=n_blocks,
    )
    if staged is None:
        spark = df.sparkSession
        return spark.createDataFrame([], "id_a long, id_b long, cosine double")
    labeled, n_blocks = staged
    return cosine_neardup_blas(
        labeled,
        threshold,
        id_col=id_col,
        vec_col=vec_col,
        n_blocks=n_blocks,
        group_col="cluster",
    )


def semdedup_keep(
    df: DataFrame,
    threshold: float,
    *,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
    keep: str = "lowest_id",
) -> DataFrame:
    """Ids surviving semantic dedup.

    ``keep="lowest_id"`` (default): a row is removed iff it is the
    HIGHER id of some qualifying pair — one distinct over the pair
    stage's id_b column and a left-anti join; both shuffle only id rows,
    never vectors.

    ``keep="farthest_from_centroid"``: the paper's rule (Abbas et al.
    §3 — among semantic duplicates, keep the member with the LOWEST
    similarity to its cluster centroid, i.e. the farthest; prototypical
    near-center mass prunes first). Deterministic tie-break: centroid
    distance DESC, id ASC. Per qualifying pair the loser under that
    ordering is removed, so on a transitive dup group exactly the
    group's winner survives — the same removal count as keep-lowest-id
    with the order key swapped. Distances ship free from the labeling
    argmin (``emit_dist``, sequential per-dim accumulation so the
    oracle's list_sum order bit-matches); the keep stage joins pair
    rows to a (id, dist) table — id-keyed equi-joins only, vectors
    never re-shuffle.
    """
    if keep not in ("lowest_id", "farthest_from_centroid"):
        raise ValueError(
            f"keep must be 'lowest_id' or 'farthest_from_centroid', "
            f"got {keep!r}"
        )
    if keep == "lowest_id":
        pairs = semdedup_pairs(
            df,
            threshold,
            k=k,
            iters=iters,
            id_col=id_col,
            vec_col=vec_col,
            n_blocks=n_blocks,
        )
        removed = pairs.select(F.col("id_b").alias(id_col)).distinct()
        return df.select(id_col).join(removed, id_col, "left_anti")
    staged = _fit_label_blocks(
        df, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
        n_blocks=n_blocks, emit_dist=True,
    )
    if staged is None:
        return df.select(id_col)
    labeled, n_blocks = staged
    pairs = cosine_neardup_blas(
        labeled,
        threshold,
        id_col=id_col,
        vec_col=vec_col,
        n_blocks=n_blocks,
        group_col="cluster",
    )
    dists = labeled.select(F.col(id_col), F.col("sq_dist"))
    da = dists.select(
        F.col(id_col).alias("id_a"), F.col("sq_dist").alias("__da")
    )
    db = dists.select(
        F.col(id_col).alias("id_b"), F.col("sq_dist").alias("__db")
    )
    # pair contract: id_a < id_b. Loser = nearer-to-centroid member;
    # on a distance tie the HIGHER id loses (distance DESC, id ASC).
    removed = (
        pairs.join(da, "id_a")
        .join(db, "id_b")
        .select(
            F.when(F.col("__db") > F.col("__da"), F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias(id_col)
        )
        .distinct()
    )
    return df.select(id_col).join(removed, id_col, "left_anti")


def centroid_outliers(
    df: DataFrame,
    *,
    k: int = 8,
    iters: int = 3,
    z: float = 2.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space outlier flags: squared distance to the assigned
    k-means centroid, z-scored within the cluster (the SemDeDup paper's
    actual prune signal — it keeps LOW-centroid-similarity members; this
    exposes the raw signal plus a per-cluster 2σ flag for data-quality
    triage of noisy embeddings).

    One labeling pass (the argmin already computes the distance, so it
    ships for free), one k-row stats agg, one broadcast join back.
    Cross-engine note: sq_dist is rounded for hashing; the boolean
    compares UNROUNDED dist vs mean + z·stddev_pop, where both engines'
    aggregates can differ in final ulps — a flip needs a point sitting
    within float error of exactly the threshold (measure-zero on real
    data, same acceptance as the k-means argmin tie).
    """
    cents = kmeans_fit(df, k, iters, id_col=id_col, vec_col=vec_col)
    if not cents:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, cluster int, sq_dist double, "
            "is_outlier boolean"
        )
    labeled = kmeans_label(
        df, cents, id_col=id_col, vec_col=vec_col, emit_dist=True
    )
    stats = labeled.groupBy("cluster").agg(
        F.avg("sq_dist").alias("__mu"),
        F.stddev_pop("sq_dist").alias("__sd"),
    )
    return labeled.join(F.broadcast(stats), "cluster").select(
        F.col(id_col),
        F.col("cluster"),
        F.col("sq_dist"),
        (
            F.col("sq_dist") > F.col("__mu") + F.lit(z) * F.col("__sd")
        ).alias("is_outlier"),
    )


def semdedup_admission(
    store: DataFrame,
    batch: DataFrame,
    threshold: float,
    *,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
) -> DataFrame:
    """Incremental SemDeDup: the arriving ``batch`` is checked against the
    ACCEPTED ``store`` without ever re-forming store×store pairs — the
    embedding analog of the MinHash admission store
    (dedup.incremental_minhash_neardup).

    Centroids are fit on the store ONLY (the accepted corpus defines the
    semantic space; a production deployment persists them and refits on
    drift). Both frames take one labeling pass; then two cluster-keyed
    BLAS stages: batch×store cross pairs (`cosine_cross_pairs_blas` —
    the full-square grid, |batch|·|store|/k mass) and batch-internal
    pairs against lower-id batch-mates. Emits every near-dup relation
    (id, dup_of, cosine) — dup_of is a store member or an earlier
    batch-mate, mirroring the MinHash admission's output contract.

    Empty store: centroids fall back to a batch fit, so the first-ever
    epoch degrades to plain ``semdedup_pairs`` admission.
    """
    cents = kmeans_fit(store, k, iters, id_col=id_col, vec_col=vec_col)
    if not cents:
        cents = kmeans_fit(batch, k, iters, id_col=id_col, vec_col=vec_col)
    spark = batch.sparkSession
    if not cents:
        return spark.createDataFrame(
            [], f"{id_col} long, dup_of long, cosine double"
        )
    if n_blocks is None:
        n_blocks = _auto_blocks(spark, len(cents))
    store_l = kmeans_label(
        store, cents, id_col=id_col, vec_col=vec_col, carry_vec=True
    )
    batch_l = kmeans_label(
        batch, cents, id_col=id_col, vec_col=vec_col, carry_vec=True
    )
    vs_store = cosine_cross_pairs_blas(
        batch_l,
        store_l,
        threshold,
        id_col=id_col,
        vec_col=vec_col,
        n_blocks=n_blocks,
        group_col="cluster",
    ).select(
        F.col("id_a").alias(id_col),
        F.col("id_b").alias("dup_of"),
        "cosine",
    )
    vs_batch = cosine_neardup_blas(
        batch_l,
        threshold,
        id_col=id_col,
        vec_col=vec_col,
        n_blocks=n_blocks,
        group_col="cluster",
    ).select(
        F.col("id_b").alias(id_col),  # the LATER doc carries the relation
        F.col("id_a").alias("dup_of"),
        "cosine",
    )
    return vs_store.unionAll(vs_batch)


def semdedup_admission_sql(
    threshold: float,
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    *,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    store_pred: str = "vec_id % 4 <> 0",
    round_scale: int = 6,
) -> str:
    """DuckDB twin of ``semdedup_admission`` with store/batch split by
    ``store_pred``: replays the store-only k-means fit, assigns BOTH
    sides against the final centroids, then the two cluster-keyed pair
    scans."""
    cents = kmeans_sql(
        k=k,
        iters=iters,
        dim=dim,
        table=f"(SELECT * FROM {table} WHERE {store_pred})",
        id_col=id_col,
        vec_col=vec_col,
        emit="cents",
    )
    rng = f"range(1, {dim} + 1)"
    return f"""
WITH cents AS ({cents}),
dv AS (
    SELECT {id_col}, ({store_pred}) AS in_store,
           list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
    FROM {table}
), asg AS (
    SELECT {id_col}, in_store, v, cell AS cluster FROM (
        SELECT dv.*, c.cell,
               row_number() OVER (PARTITION BY dv.{id_col} ORDER BY
                   list_sum(list_transform({rng},
                       d -> (dv.v[d] - c.v[d]) * (dv.v[d] - c.v[d]))),
                   c.cell) AS rn
        FROM dv CROSS JOIN cents c) WHERE rn = 1
), rel AS (
    SELECT b.{id_col}, s.{id_col} AS dup_of,
           list_dot_product(b.v, s.v)
               / (sqrt(list_dot_product(b.v, b.v))
                  * sqrt(list_dot_product(s.v, s.v))) AS cosine
    FROM asg b JOIN asg s
      ON b.cluster = s.cluster AND NOT b.in_store
     AND (s.in_store OR s.{id_col} < b.{id_col})
    WHERE list_dot_product(b.v, b.v) > 0
      AND list_dot_product(s.v, s.v) > 0
)
SELECT {id_col}, dup_of,
       round(cosine - 1e-9, {round_scale}) + 0.0 AS cosine
FROM rel WHERE cosine >= {threshold}
ORDER BY {id_col}, dup_of
"""


def _dist_cte(
    k: int, iters: int, dim: int, table: str, id_col: str, vec_col: str
) -> str:
    """Shared oracle CTE: (id, cluster, sq_dist) from a double k-means
    replay (assignment + final centroids) plus the distance recompute."""
    asg = kmeans_sql(
        k=k, iters=iters, dim=dim, table=table, id_col=id_col, vec_col=vec_col
    )
    cents = kmeans_sql(
        k=k, iters=iters, dim=dim, table=table, id_col=id_col,
        vec_col=vec_col, emit="cents",
    )
    return f"""asg AS (SELECT * FROM ({asg})),
cents AS ({cents}),
dv AS (
    SELECT {id_col},
           list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
    FROM {table}
), dist AS (
    SELECT a.{id_col}, a.cluster,
           list_sum(list_transform(range(1, {dim} + 1),
               d -> (dv.v[d] - c.v[d]) * (dv.v[d] - c.v[d]))) AS sq_dist
    FROM asg a
    JOIN cents c ON c.cell = a.cluster
    JOIN dv ON dv.{id_col} = a.{id_col}
)"""


def centroid_outliers_sql(
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    *,
    z: float = 2.0,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scale: int = 6,
) -> str:
    """DuckDB twin of ``centroid_outliers``: replays the k-means fit
    twice (assignment + final centroids), recomputes each row's distance
    to its centroid, then the per-cluster z-flag."""
    cte = _dist_cte(k, iters, dim, table, id_col, vec_col)
    return f"""
WITH {cte},
stats AS (
    SELECT cluster, avg(sq_dist) AS mu, stddev_pop(sq_dist) AS sd
    FROM dist GROUP BY cluster
)
SELECT d.{id_col}, d.cluster,
       round(d.sq_dist - 1e-9, {round_scale}) + 0.0 AS sq_dist,
       d.sq_dist > s.mu + {z} * s.sd AS is_outlier
FROM dist d JOIN stats s USING (cluster)
ORDER BY d.{id_col}
"""


def semdedup_keep_paper_sql(
    threshold: float,
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    *,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of ``semdedup_keep(keep="farthest_from_centroid")``:
    replays the k-means fit, the per-row centroid distance, the
    within-cluster pair scan, then removes each pair's nearer-to-
    centroid member (tie → higher id)."""
    cte = _dist_cte(k, iters, dim, table, id_col, vec_col)
    return f"""
WITH {cte},
lv AS (
    SELECT dv.{id_col}, dv.v, d.cluster, d.sq_dist
    FROM dv JOIN dist d USING ({id_col})
), sem_pairs AS (
    SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
           a.sq_dist AS da, b.sq_dist AS db,
           list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))) AS cosine
    FROM lv a JOIN lv b
      ON a.cluster = b.cluster AND a.{id_col} < b.{id_col}
    WHERE list_dot_product(a.v, a.v) > 0
      AND list_dot_product(b.v, b.v) > 0
), removed AS (
    SELECT DISTINCT CASE WHEN db > da THEN id_a ELSE id_b END AS {id_col}
    FROM sem_pairs WHERE cosine >= {threshold}
)
SELECT {id_col} FROM {table}
WHERE {id_col} NOT IN (SELECT {id_col} FROM removed)
ORDER BY {id_col}
"""


def diverse_sample(
    df: DataFrame,
    m: int,
    *,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-stratified diverse subset: the m members of each k-means
    cluster FARTHEST from their centroid (ties → lowest id) — the
    SemDeDup paper's keep-rule turned into a subset selector (pruning
    prototypical near-center mass first is also SSL-prototypes pruning,
    Sorscher et al. 2022). One labeling pass (distance free from the
    argmin), then a per-cluster top-m window over k bounded partitions.

    Output: (cluster, vec_id, sq_dist, rank) with rank 1 = farthest.
    """
    from pyspark.sql import Window

    cents = kmeans_fit(df, k, iters, id_col=id_col, vec_col=vec_col)
    if not cents:
        return df.sparkSession.createDataFrame(
            [], f"cluster int, {id_col} long, sq_dist double, rank long"
        )
    labeled = kmeans_label(
        df, cents, id_col=id_col, vec_col=vec_col, emit_dist=True
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("sq_dist").desc(), F.col(id_col)
    )
    return (
        labeled.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= m)
        .select(
            "cluster", F.col(id_col), "sq_dist",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def diverse_sample_sql(
    m: int,
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    *,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scale: int = 6,
) -> str:
    """DuckDB twin of ``diverse_sample``."""
    cte = _dist_cte(k, iters, dim, table, id_col, vec_col)
    return f"""
WITH {cte},
ranked AS (
    SELECT cluster, {id_col}, sq_dist,
           row_number() OVER (
               PARTITION BY cluster ORDER BY sq_dist DESC, {id_col}) AS rank
    FROM dist
)
SELECT cluster, {id_col},
       round(sq_dist - 1e-9, {round_scale}) + 0.0 AS sq_dist, rank
FROM ranked WHERE rank <= {m}
ORDER BY cluster, rank
"""


def _pairs_cte(
    threshold: float,
    k: int,
    iters: int,
    dim: int,
    *,
    table: str,
    id_col: str,
    vec_col: str,
) -> str:
    asg = kmeans_sql(
        k=k, iters=iters, dim=dim, table=table, id_col=id_col, vec_col=vec_col
    )
    return f"""asg AS (
    SELECT * FROM ({asg})
), dv AS (
    SELECT {id_col},
           list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
    FROM {table}
), lv AS (
    SELECT dv.{id_col}, dv.v, asg.cluster
    FROM dv JOIN asg USING ({id_col})
), sem_pairs AS (
    SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
           list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))) AS cosine
    FROM lv a JOIN lv b
      ON a.cluster = b.cluster AND a.{id_col} < b.{id_col}
    WHERE list_dot_product(a.v, a.v) > 0
      AND list_dot_product(b.v, b.v) > 0
)"""


def semdedup_pairs_sql(
    threshold: float,
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    *,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scale: int = 6,
) -> str:
    """DuckDB twin of ``semdedup_pairs`` (cosine rounded for hashing)."""
    cte = _pairs_cte(
        threshold, k, iters, dim, table=table, id_col=id_col, vec_col=vec_col
    )
    return f"""
WITH {cte}
SELECT id_a, id_b,
       round(cosine - 1e-9, {round_scale}) + 0.0 AS cosine
FROM sem_pairs WHERE cosine >= {threshold}
ORDER BY id_a, id_b
"""


def semdedup_keep_sql(
    threshold: float,
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    *,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of ``semdedup_keep``."""
    cte = _pairs_cte(
        threshold, k, iters, dim, table=table, id_col=id_col, vec_col=vec_col
    )
    return f"""
WITH {cte}
SELECT {id_col} FROM {table}
WHERE {id_col} NOT IN (
    SELECT id_b FROM sem_pairs WHERE cosine >= {threshold})
ORDER BY {id_col}
"""
