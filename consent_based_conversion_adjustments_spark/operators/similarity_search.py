"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``: exact brute-force top-k — broadcast crossJoin + windowed
  row_number, distances as Catalyst fold expressions (the baseline, and the
  re-rank stage of the approximate paths).
- ``hyperplane_signatures`` / ``lsh_topk``: random-hyperplane LSH — sign
  patterns from deterministic ±1 hyperplanes bucket the vectors; candidates
  share a bucket (equi-join, no quadratic step); exact cosine re-ranks.
  This is the 100 TB path: signature build is a stateless map; the join is
  a hash join on the signature key.
- ``ivf_topk``: IVF-style coarse quantization — assign each vector to the
  nearest of n_cells sampled centroids (one broadcast argmin map), probe
  only the query's nearest cells, exact re-rank inside.

Cosine ties break by candidate id — same determinism contract as the kNN
similarity join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.distance import cosine_similarity

N_PLANES = 5
N_TABLES = 8


def _cast_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    *,
    query_id: str = "query_id",
    cand_id: str = "cand_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity (descending), excluding self-pairs."""
    q = queries.select(
        F.col(query_id), _cast_double(vec_col).alias("__qv")
    )
    c = candidates.select(
        F.col(cand_id), _cast_double(vec_col).alias("__cv")
    )
    pairs = q.crossJoin(F.broadcast(c)).filter(
        F.col(query_id) != F.col(cand_id)
    )
    pairs = pairs.withColumn(
        "cosine", cosine_similarity(F.col("__qv"), F.col("__cv"))
    ).drop("__qv", "__cv")
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(cand_id).asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def l2_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    *,
    query_id: str = "query_id",
    cand_id: str = "cand_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by squared L2 distance (ascending, ties by candidate
    id), excluding self-pairs — the exact baseline the quantized ANN
    paths (PQ ADC, SQ8) approximate; same broadcast crossJoin + windowed
    row_number shape as ``cosine_topk``."""
    from ..functions.distance import squared_l2_distance

    q = queries.select(F.col(query_id), _cast_double(vec_col).alias("__qv"))
    c = candidates.select(F.col(cand_id), _cast_double(vec_col).alias("__cv"))
    pairs = q.crossJoin(F.broadcast(c)).filter(
        F.col(query_id) != F.col(cand_id)
    )
    pairs = pairs.withColumn(
        "sq_dist", squared_l2_distance(F.col("__qv"), F.col("__cv"))
    ).drop("__qv", "__cv")
    w = Window.partitionBy(query_id).orderBy(
        F.col("sq_dist").asc(), F.col(cand_id).asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def plane_sign(dim: int, plane: int) -> int:
    """Deterministic ±1 hyperplane entries via a splitmix64 avalanche mix.

    A full-avalanche mix matters here: a weaker LCG-style mix (the round-1
    version) produced visibly correlated planes, and the measured per-pair
    miss rate was ~100× the independence model's prediction — recall
    guarantees derived from 1−(1−p^planes)^tables are only valid when the
    sign matrix behaves like i.i.d. Rademacher entries."""
    x = (dim * 1000003 + plane + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    x = x ^ (x >> 31)
    return 1 if (x & 1) == 1 else -1


def _plane_matrix(dim: int, n_planes: int, n_tables: int) -> np.ndarray:
    return np.array(
        [
            [plane_sign(d, p) for p in range(n_planes * n_tables)]
            for d in range(dim)
        ],
        dtype=np.float64,
    )


def hyperplane_signatures(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = N_PLANES,
    n_tables: int = N_TABLES,
) -> DataFrame:
    """One row per (vector, table): ``table_id`` + the table's n_planes-bit
    sign signature (bit p = [Σ_d v_d · s(d, table·n_planes + p) > 0]).

    Multi-table OR-amplification: a true neighbor pair is a candidate if it
    collides in ANY table — P(candidate) = 1 − (1 − p_match^planes)^tables,
    the standard recall knob when per-plane match probability is modest.

    All tables' projections are one BLAS matmul per Arrow batch inside a
    pandas UDF (a 2560-term Catalyst expression tree spends more time in
    codegen than the data takes to scan); output explodes to
    (row, table_id, lsh_sig)."""
    tables = F.posexplode(
        _signature_array(vec_col, dim=dim, n_planes=n_planes, n_tables=n_tables)
    )
    return df.select("*", tables).withColumnRenamed(
        "pos", "table_id"
    ).withColumnRenamed("col", "lsh_sig")


def _signature_array(
    vec_col: str,
    *,
    dim: int,
    n_planes: int,
    n_tables: int,
) -> Column:
    """``array<long>`` of all tables' sign signatures for one vector — one
    BLAS matmul per Arrow batch."""
    planes = _plane_matrix(dim, n_planes, n_tables)
    weights = (2 ** np.arange(n_planes, dtype=np.int64))

    @F.pandas_udf("array<long>")
    def signatures(vecs: pd.Series) -> pd.Series:
        V = np.array(vecs.tolist(), dtype=np.float64)
        bits = (V @ planes) > 0
        sigs = bits.reshape(len(V), -1, len(weights)) @ weights
        return pd.Series(list(sigs.astype(np.int64)))

    return signatures(F.col(vec_col))


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    *,
    query_id: str = "query_id",
    cand_id: str = "cand_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = N_PLANES,
    n_tables: int = N_TABLES,
) -> DataFrame:
    """Approximate top-k: union of same-bucket candidates over all hash
    tables, dedup, exact cosine re-rank. The candidate step is a plain
    equi-join on (table_id, signature) — no quadratic pass anywhere.

    The bucket join and the dedup shuffle carry ONLY the id pair — a
    bucket-dense corpus multiplies candidate rows by n_tables, and dragging
    two 64-double vectors through that join and the dropDuplicates
    exchange was most of its bytes (the embedding tables are re-joined by
    id afterwards, touching each surviving pair once)."""
    q = hyperplane_signatures(
        queries, id_col=query_id, vec_col=vec_col, dim=dim,
        n_planes=n_planes, n_tables=n_tables,
    ).select(query_id, "table_id", "lsh_sig")
    c = hyperplane_signatures(
        candidates, id_col=cand_id, vec_col=vec_col, dim=dim,
        n_planes=n_planes, n_tables=n_tables,
    ).select(cand_id, "table_id", "lsh_sig")
    pairs = (
        q.join(c, ["table_id", "lsh_sig"])
        .select(query_id, cand_id)
        .filter(F.col(query_id) != F.col(cand_id))
        .dropDuplicates([query_id, cand_id])
    )
    qv = queries.select(F.col(query_id), _cast_double(vec_col).alias("__qv"))
    cv = candidates.select(F.col(cand_id), _cast_double(vec_col).alias("__cv"))
    pairs = (
        pairs.join(qv, query_id)
        .join(cv, cand_id)
        .withColumn("cosine", cosine_similarity(F.col("__qv"), F.col("__cv")))
        .drop("__qv", "__cv")
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(cand_id).asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _kmeans_centroids(
    df: DataFrame,
    *,
    vec_col: str,
    id_col: str,
    n_cells: int,
    train_size: int = 4096,
    n_iter: int = 10,
) -> np.ndarray:
    """Spherical k-means fit on a bounded deterministic sample.

    Sample = first ``train_size`` rows in ``hash(id)`` order (stable across
    runs and partitionings — no RNG, no sample() nondeterminism); init =
    first n_cells sampled vectors; Lloyd updates re-normalize centroids so
    argmax-dot is argmax-cosine. All numpy on the driver: the collect is
    capped at train_size rows no matter the table size."""
    rows = (
        df.orderBy(F.hash(F.col(id_col)).asc(), F.col(id_col).asc())
        .limit(train_size)
        .select(_cast_double(vec_col).alias("__v"))
        .toPandas()
    )
    x = np.array(rows["__v"].tolist(), dtype=np.float64)
    return _kmeans_fit(x, n_cells, n_iter)


def _kmeans_fit(x: np.ndarray, n_cells: int, n_iter: int = 10) -> np.ndarray:
    """Numpy Lloyd core, shared with the oracle generator (which replays
    the identical fit on the identically-ordered sample so the centroid
    literals it emits are bit-equal to the ones this pipeline broadcasts)."""
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    k = min(n_cells, len(xn))
    cents = xn[:k].copy()
    for _ in range(n_iter):
        assign = np.argmax(xn @ cents.T, axis=1)
        for j in range(k):
            members = xn[assign == j]
            if len(members):
                v = members.mean(axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    cents[j] = v / norm
    return cents


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    *,
    query_id: str = "query_id",
    cand_id: str = "cand_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize candidates to n_cells spherical
    k-means centroids, probe the query's n_probe nearest cells, exact
    re-rank inside the probed cells.

    The fit follows the faiss-IVF recipe scaled to Spark: Lloyd iterations
    run driver-side over a bounded deterministic sample (hash-ordered
    ``limit(train_size)`` — ``train_size·dim·8`` bytes, ~2 MB at the
    defaults, regardless of table size), then the n_cells centroids are
    broadcast and assignment is one argmax map over the full table. At
    100 TB only the sample collect and the broadcast cross the driver."""
    cents_np = _kmeans_centroids(
        candidates, vec_col=vec_col, id_col=cand_id, n_cells=n_cells
    )
    spark = candidates.sparkSession
    cents = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(cents_np)],
        "cell_id int, __cent array<double>",
    )

    def assign(df: DataFrame, id_name: str, n_keep: int) -> DataFrame:
        vecs = df.select(F.col(id_name), _cast_double(vec_col).alias("__v"))
        pairs = vecs.crossJoin(F.broadcast(cents)).withColumn(
            "cell_sim", cosine_similarity(F.col("__v"), F.col("__cent"))
        )
        w = Window.partitionBy(id_name).orderBy(
            F.col("cell_sim").desc(), F.col("cell_id").asc()
        )
        return (
            pairs.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= n_keep)
            .select(id_name, "cell_id", "__v")
        )

    q = assign(queries, query_id, n_probe).withColumnRenamed("__v", "__qv")
    c = assign(candidates, cand_id, 1).withColumnRenamed("__v", "__cv")
    pairs = q.join(c, "cell_id").filter(F.col(query_id) != F.col(cand_id))
    pairs = pairs.withColumn(
        "cosine", cosine_similarity(F.col("__qv"), F.col("__cv"))
    ).select(query_id, cand_id, "cosine").dropDuplicates([query_id, cand_id])
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(cand_id).asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold, id_a < id_b.

    All-pairs form — the exact baseline and the verify-stage helper; the
    registered/scale path is `cosine_neardup_lsh`."""
    a = df.select(F.col(id_col).alias("id_a"), _cast_double(vec_col).alias("__a"))
    b = df.select(F.col(id_col).alias("id_b"), _cast_double(vec_col).alias("__b"))
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_similarity(F.col("__a"), F.col("__b")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def cosine_neardup_blas(
    df: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 16,
    group_col: str | None = None,
) -> DataFrame:
    """Exact all-pairs cosine near-dup via a block-pair grid join:
    identical output contract to `cosine_neardup_pairs` (cosine ≥
    threshold, id_a < id_b), executed as one BLAS matmul per block pair
    instead of a pair-materializing join — and with NO driver-side
    materialization of the table.

    Why this exists: at *aggressively low* thresholds (the synthetic
    corpus' 0.45), angular LSH cannot prune — a random pair collides in
    some table with probability ≈1−(1−0.5^planes)^tables ≈ 0.96 at the
    recall-preserving settings, so the "candidate" set IS the all-pairs
    set, but dragged through a join that materializes every pair row
    (measured 129 s on 2,000×64 at sf0.1, with AQE coalescing the
    exploded join to one task). The exact computation is 2,000²·64 ≈
    2.6e8 flops — milliseconds in BLAS.

    Scale shape: every row gets a deterministic block id
    (``pmod(hash(id), B)``); the B·(B+1)/2 unordered block pairs form a
    tiny broadcast grid; each row is replicated to the grid rows where
    its block is the left (or right) member — (B+1)× shuffle
    amplification, the standard exact-all-pairs trade — and a cogrouped
    Arrow kernel multiplies the two blocks of each pair. Peak task
    memory is 2·(N/B) vectors no matter how big N is: at 100 TB you
    raise ``n_blocks`` until a block fits an executor, and the
    B(B+1)/2 pairs give the parallelism. Size B for task-packing too,
    not just memory: B(B+1)/2 should be ≥ ~4× the core count so the
    heterogeneous matmul tasks pack the executors without a ragged
    tail wave (measured on the 8×-sf0.1 tiles, local[32]: B=8 → 36
    pairs → 6.5 s; B=16 → 136 pairs → 3.4 s; B=24 → flat — hence the
    default 16, whose extra per-task overhead costs only ~0.4 s at
    sf0.1 scale). (The n²·d flops are inherent
    to EXACT all-pairs under a threshold this low; `cosine_neardup_lsh`
    remains the sub-quadratic route for thresholds where LSH prunes.)
    Each unordered row pair lives in exactly one block pair, so no
    global dedup shuffle is needed; a diagonal block pair dedups by
    ``id_a < id_b``, an off-diagonal one normalizes the orientation.

    FP boundary note: cosine is computed as ``dot(a,b) / (|a|·|b|)`` —
    the oracle's expression shape — so Spark and DuckDB agree to the
    final ulp in practice; a pair sitting *exactly* at the threshold
    within ~1 ulp is still formally at the mercy of FMA/summation-order
    differences (documented risk, accepted: the synthetic corpus has no
    such pair, and the threshold is a tunable, not an identity).

    ``group_col``: restrict pairs to rows sharing that column's value —
    the block-pair grid then keys on (group, block-pair), so each
    group's quadratic work is independently blocked AND the cross-group
    n² never exists at all (the cogroup key prunes it). This is the
    within-cluster pair stage of SemDeDup (`operators.semdedup`).
    """
    spark = df.sparkSession
    # the vector column ships through the (B+1)× replication shuffle in its
    # SOURCE type (array<float> for the embeddings table) — the kernel's
    # .astype(float64) is the cast point, and float→double is exact, so the
    # result is bit-identical to casting here while the shuffle is half the
    # bytes (the dominant data movement of this operator)
    grp_cols = [F.col(group_col).alias("__grp")] if group_col else []
    tagged = df.select(
        *grp_cols,
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        F.pmod(F.hash(F.col(id_col)), F.lit(n_blocks)).alias("__blk"),
    )
    # VALUES gives a true LocalRelation (known tiny size → statically
    # broadcast on both grid joins, no hint, no stats guesswork), unlike
    # createDataFrame's stats-less ExistingRDD scan
    grid_rows = ", ".join(
        f"({a * n_blocks + b}, {a}, {b})"
        for a in range(n_blocks)
        for b in range(a, n_blocks)
    )
    grid = spark.sql(
        f"SELECT * FROM VALUES {grid_rows} AS grid(__pair, __ba, __bb)"
    )
    ta, ga = tagged.alias("ta"), grid.alias("ga")
    tb, gb = tagged.alias("tb"), grid.alias("gb")
    # no broadcast() hint: the grid is a B(B+1)/2-row local relation whose
    # known size makes the planner broadcast it unhinted (plan-audited)
    lg = [F.col("ta.__grp").alias("__grp")] if group_col else []
    rg = [F.col("tb.__grp").alias("__grp")] if group_col else []
    left = ta.join(
        ga, F.col("ta.__blk") == F.col("ga.__ba")
    ).select(
        *lg,
        F.col("ga.__pair").alias("__pair"),
        F.col("ta.__id").alias("__id"),
        F.col("ta.__v").alias("__v"),
    )
    right = tb.join(
        gb, F.col("tb.__blk") == F.col("gb.__bb")
    ).select(
        *rg,
        F.col("gb.__pair").alias("__pair_r"),
        F.col("tb.__id").alias("__id"),
        F.col("tb.__v").alias("__v"),
    )

    def block_kernel(key, l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "cosine": pd.Series(dtype="float64"),
            }
        )
        if len(l) == 0 or len(r) == 0:
            return empty
        pair = int(key[-1])  # key is (pair,) or (group, pair)
        diag = (pair // n_blocks) == (pair % n_blocks)
        la = l["__id"].to_numpy()
        rb = r["__id"].to_numpy()
        L = np.stack(l["__v"].to_numpy()).astype(np.float64)
        R = np.stack(r["__v"].to_numpy()).astype(np.float64)
        ln = np.sqrt((L * L).sum(axis=1))
        rn = np.sqrt((R * R).sum(axis=1))
        lsafe = np.where(ln == 0.0, 1.0, ln)
        rsafe = np.where(rn == 0.0, 1.0, rn)
        # dot / (|a|·|b|): same expression shape as the SQL oracle
        S = (L @ R.T) / np.outer(lsafe, rsafe)
        mask = (S >= threshold) & (ln[:, None] > 0.0) & (rn[None, :] > 0.0)
        if diag:
            mask &= rb[None, :] > la[:, None]
        ii, jj = np.nonzero(mask)
        if len(ii) == 0:
            return empty
        ida, idb = la[ii], rb[jj]
        if not diag:
            ida, idb = np.minimum(ida, idb), np.maximum(ida, idb)
        return pd.DataFrame({"id_a": ida, "id_b": idb, "cosine": S[ii, jj]})

    lkeys = ["__grp", "__pair"] if group_col else ["__pair"]
    rkeys = ["__grp", "__pair_r"] if group_col else ["__pair_r"]
    return (
        left.groupBy(*lkeys)
        .cogroup(right.groupBy(*rkeys))
        .applyInPandas(block_kernel, "id_a long, id_b long, cosine double")
    )


def cosine_cross_pairs_blas(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 4,
    group_col: str | None = None,
) -> DataFrame:
    """Asymmetric near-dup pairs BETWEEN two frames: (id_a from left,
    id_b from right, cosine ≥ threshold). The two-frame sibling of
    `cosine_neardup_blas` — same block-pair-grid BLAS execution, but the
    grid is the full B_l×B_r square (every cross pair lives in exactly
    one block pair; no diagonal dedup, no orientation normalization).
    This is the probe stage of incremental admission: left = the
    arriving batch, right = the accepted store, optionally both keyed by
    ``group_col`` (cluster) so only same-group pairs are ever formed.
    No self-pair exclusion exists — the caller's frames are expected to
    be id-disjoint (admission's store/batch split is); an id present on
    both sides would pair with itself."""
    spark = left.sparkSession

    def tag(df: DataFrame) -> DataFrame:
        grp = [F.col(group_col).alias("__grp")] if group_col else []
        return df.select(
            *grp,
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("__v"),
            F.pmod(F.hash(F.col(id_col)), F.lit(n_blocks)).alias("__blk"),
        )

    tl, tr = tag(left), tag(right)
    grid_rows = ", ".join(
        f"({a * n_blocks + b}, {a}, {b})"
        for a in range(n_blocks)
        for b in range(n_blocks)
    )
    grid = spark.sql(
        f"SELECT * FROM VALUES {grid_rows} AS grid(__pair, __ba, __bb)"
    )
    lg = [F.col("__grp")] if group_col else []
    lhs = tl.join(grid, tl["__blk"] == grid["__ba"]).select(
        *lg, "__pair", "__id", "__v"
    )
    rhs = tr.join(grid, tr["__blk"] == grid["__bb"]).select(
        *lg,
        F.col("__pair").alias("__pair_r"),
        "__id",
        "__v",
    )

    def kernel(key, l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "cosine": pd.Series(dtype="float64"),
            }
        )
        if len(l) == 0 or len(r) == 0:
            return empty
        la = l["__id"].to_numpy()
        rb = r["__id"].to_numpy()
        L = np.stack(l["__v"].to_numpy()).astype(np.float64)
        R = np.stack(r["__v"].to_numpy()).astype(np.float64)
        ln = np.sqrt((L * L).sum(axis=1))
        rn = np.sqrt((R * R).sum(axis=1))
        lsafe = np.where(ln == 0.0, 1.0, ln)
        rsafe = np.where(rn == 0.0, 1.0, rn)
        S = (L @ R.T) / np.outer(lsafe, rsafe)
        mask = (S >= threshold) & (ln[:, None] > 0.0) & (rn[None, :] > 0.0)
        ii, jj = np.nonzero(mask)
        if len(ii) == 0:
            return empty
        return pd.DataFrame(
            {"id_a": la[ii], "id_b": rb[jj], "cosine": S[ii, jj]}
        )

    lkeys = ["__grp", "__pair"] if group_col else ["__pair"]
    rkeys = ["__grp", "__pair_r"] if group_col else ["__pair_r"]
    return (
        lhs.groupBy(*lkeys)
        .cogroup(rhs.groupBy(*rkeys))
        .applyInPandas(kernel, "id_a long, id_b long, cosine double")
    )


def cosine_neardup_lsh(
    df: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 3,
    n_tables: int = 24,
) -> DataFrame:
    """Embedding near-duplicate pairs via hyperplane-LSH candidates + exact
    cosine verify — no quadratic step; the candidate stage is an equi-join
    on (table_id, signature).

    Exactly-once emission without a `distinct` shuffle: each side carries
    the full per-table signature array, and a pair is kept only at its
    FIRST agreeing table (``array_position`` of the elementwise-equality
    zip) — the same trick as MinHash/SimHash banding.

    Recall model (per qualifying pair): miss = (1 − p^planes)^tables with
    p = 1 − θ/π. The defaults (3, 24) give miss ≈ 5·10⁻⁴ at cosine 0.45 —
    chosen because the synthetic corpus' near-dups sit just above that
    adversarially low threshold, where ANY angular LSH has weak
    selectivity (p_match 0.65 vs p_random 0.5). At real near-dup
    thresholds (cosine ≥ 0.9, p ≥ 0.86) the same operator prunes sharply
    with fewer tables. Signatures are deterministic, so a verified match
    against the exact oracle is stable run-to-run."""
    sigs = df.select(
        F.col(id_col).alias("__id"),
        _cast_double(vec_col).alias("__v"),
        _signature_array(
            vec_col, dim=dim, n_planes=n_planes, n_tables=n_tables
        ).alias("__sigs"),
    )
    a = sigs.select(
        F.col("__id").alias("id_a"),
        F.col("__v").alias("__a"),
        F.col("__sigs").alias("__sa"),
        F.posexplode("__sigs").alias("table_id", "lsh_sig"),
    )
    b = sigs.select(
        F.col("__id").alias("id_b"),
        F.col("__v").alias("__b"),
        F.col("__sigs").alias("__sb"),
        F.posexplode("__sigs").alias("table_id", "lsh_sig"),
    )
    first_match = F.array_position(
        F.zip_with("__sa", "__sb", lambda x, y: x == y), True
    )
    return (
        a.join(b, ["table_id", "lsh_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.col("table_id") + 1 == first_match)
        .withColumn("cosine", cosine_similarity(F.col("__a"), F.col("__b")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
