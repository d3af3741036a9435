"""Approximate string matching: edit-distance similarity self-join.

The record-linkage primitive (entity resolution / fuzzy key matching)
the relational surface lacks: all pairs with ``levenshtein(a, b) <= d``
without a quadratic pass, via q-gram prefix filtering (Gravano et al.
VLDB 2001; Ed-Join, Xiao et al. VLDB 2008) + exact verify.

Filter chain, each step exact (recall 1.0 — the quadratic form lives
only in the DuckDB oracle):

1. q-gram lemma: an edit operation destroys at most ``q`` of a string's
   ``|s| − q + 1`` overlapping q-grams, so ``ed(a, b) <= d`` forces a
   multiset gram overlap of at least ``max(|Ga|,|Gb|) − d·q``.
2. prefix filter: order every (gram, occurrence) element by a global
   canonical order (ascending global frequency — rare grams first —
   then gram, then occurrence); any pair meeting the overlap bound must
   share an element within the first ``d·q + 1`` elements of each side.
   Candidates are therefore an EQUI-join on prefix elements — never a
   cross join — and rare-first ordering keeps the join keys selective
   (frequency-agnostic orders put the hottest gram in every prefix,
   which is the quadratic-blowup failure mode).
3. verify: length filter ``||a|−|b|| <= d`` plus one exact
   ``levenshtein`` per surviving candidate (JVM codegen, short strings).

Scale shape: gram explode (×(len−q+1) rows) → one hash agg for global
gram frequencies → equi-join back on gram → two keyed windows (occ index
on (id, gram); prefix rank on id) → prefix self-equi-join → hash-agg
distinct pairs → verify. All shuffles key on high-cardinality columns
(gram, id, pair); nothing quadratic, nothing driver-side.

reference: no analog — record-linkage primitive for the north-star
relational surface (SURVEY.md §7 step 7), sibling of the dedup family's
prefix-filter AllPairs join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: prefix-row count past which a (gram, occ) join key is salted: an
#: unsalted key enumerates C(rows, 2) candidate pairs in ONE task, so
#: 256 caps the per-task burst at ~33k pairs; keys at or below it keep
#: a single un-replicated b-side row (no blanket replication at scale)
_SALT_HOT_KEY_ROWS = 256


def edit_distance_pairs(
    df: DataFrame,
    col: str,
    id_col: str,
    max_dist: int = 2,
    q: int = 3,
) -> DataFrame:
    """All pairs ``(id_a, id_b, distance)`` with
    ``levenshtein(s_a, s_b) <= max_dist`` and ``id_a < id_b``.

    Requires every string to carry at least ``max_dist·q + 1`` q-grams
    (``len >= q·(max_dist + 1)``): below that the q-gram count bound is
    vacuous (zero shared grams no longer contradicts ``ed <= d``) and no
    gram join can be recall-exact — such inputs raise rather than
    silently losing pairs. Route shorter strings through an exact or
    per-length-block comparison instead.
    """
    prefix_len = max_dist * q + 1
    min_len = q * (max_dist + 1)
    strings = df.select(
        F.col(id_col).alias("__id"), F.col(col).alias("__s")
    )
    # loud guard: one tiny agg (min length over the column)
    shortest = strings.agg(F.min(F.length("__s"))).first()[0]
    if shortest is not None and shortest < min_len:
        raise ValueError(
            f"edit_distance_pairs requires len >= {min_len} "
            f"(= q*(max_dist+1)) for exact recall; shortest input is "
            f"{shortest}. Pre-filter or compare short strings exactly."
        )
    # positions 1..len-q+1; gram = substr(s, pos, q)
    grams = strings.select(
        "__id",
        F.explode(
            F.sequence(F.lit(1), F.length("__s") - F.lit(q) + F.lit(1))
        ).alias("__pos"),
        "__s",
    ).select(
        "__id",
        "__pos",
        F.col("__s").substr(F.col("__pos"), F.lit(q)).alias("__gram"),
    )
    w_occ = Window.partitionBy("__id", "__gram").orderBy("__pos")
    occ = grams.withColumn("__occ", F.row_number().over(w_occ)).drop(
        "__pos"
    )
    freq = occ.groupBy("__gram").agg(F.count(F.lit(1)).alias("__cnt"))
    w_pref = Window.partitionBy("__id").orderBy(
        F.col("__cnt").asc(), F.col("__gram").asc(), F.col("__occ").asc()
    )
    prefix = (
        occ.join(freq, "__gram")
        .withColumn("__rk", F.row_number().over(w_pref))
        .filter(F.col("__rk") <= prefix_len)
        .select("__id", "__gram", "__occ")
    )
    # hot-key salting for the prefix self-join (r14, guide §2.5): when a
    # corpus has fewer than prefix_len discriminating grams per string
    # (serial-numbered names share all but ~3 grams), the remaining
    # prefix slot falls to the SAME tie-broken ubiquitous gram on every
    # row, and that one (gram, occ) key enumerates C(hot, 2) candidate
    # pairs inside a single join task (measured at sf0.1: "#00" in all
    # 1000 supplier prefixes → 500k of 564k candidates in one ~2 s
    # task). AQE's skew split cannot fire — the key's INPUT is a few KB,
    # only its join OUTPUT explodes. Exact fix: bucket the a-side id of
    # hot keys into ``n_salt`` sub-keys and replicate the b-side across
    # them, so each (ida < idb) pair still meets exactly once (at
    # bucket(ida)) while a hot key's pair enumeration fans out over
    # ``n_salt`` tasks. Gated per key on the measured prefix-row count —
    # cold keys keep one un-replicated row each, so the replication
    # NEVER multiplies the whole prefix table at scale.
    key_cnt = prefix.groupBy("__gram", "__occ").agg(
        F.count(F.lit(1)).alias("__kc")
    )
    n_salt = prefix.sparkSession.sparkContext.defaultParallelism
    hot = F.col("__kc") > F.lit(_SALT_HOT_KEY_ROWS)
    keyed = prefix.join(key_cnt, ["__gram", "__occ"])
    a_side = keyed.select(
        "__id",
        "__gram",
        "__occ",
        F.when(hot, F.pmod(F.xxhash64("__id"), F.lit(n_salt)))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("__sb"),
    )
    b_side = keyed.select(
        "__id",
        "__gram",
        "__occ",
        F.explode(
            F.when(
                hot, F.sequence(F.lit(0), F.lit(n_salt - 1))
            ).otherwise(F.array(F.lit(0)))
        ).alias("__sb"),
    )
    # explicit co-partitioning on the (salted) join key: AQE coalesces
    # post-shuffle partitions by INPUT size and cannot see that this
    # join's per-key OUTPUT is quadratic in key rows, so it would merge
    # the salted buckets back into one task; an explicit partition count
    # is respected by AQE and keeps the hot key's enumeration spread
    a_side = a_side.repartition(n_salt, "__gram", "__occ", "__sb")
    b_side = b_side.repartition(n_salt, "__gram", "__occ", "__sb")
    cands = (
        a_side.alias("a")
        .join(
            b_side.alias("b"),
            (F.col("a.__gram") == F.col("b.__gram"))
            & (F.col("a.__occ") == F.col("b.__occ"))
            & (F.col("a.__sb") == F.col("b.__sb"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("__ida"), F.col("b.__id").alias("__idb")
        )
        .distinct()
    )
    sa = strings.select(
        F.col("__id").alias("__ida"), F.col("__s").alias("__sa")
    )
    sb = strings.select(
        F.col("__id").alias("__idb"), F.col("__s").alias("__sb")
    )
    return (
        cands.join(sa, "__ida")
        .join(sb, "__idb")
        .filter(
            (
                F.abs(F.length("__sa") - F.length("__sb"))
                <= F.lit(max_dist)
            )
            & (F.levenshtein("__sa", "__sb") <= F.lit(max_dist))
        )
        .select(
            F.col("__ida").alias(f"{id_col}_a"),
            F.col("__idb").alias(f"{id_col}_b"),
            F.levenshtein("__sa", "__sb").cast("long").alias("distance"),
        )
    )
