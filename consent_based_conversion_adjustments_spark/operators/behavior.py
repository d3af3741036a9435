"""Behavioral / product-analytics operators over event streams:
multi-touch attribution and audience set algebra.

These extend the engine's event-time family (sessionization, funnels,
cohort retention, as-of last-touch attribution, path mining, transition
matrices) with the remaining classic product-analytics questions —
"which touches deserve the credit" (fractional multi-touch models, vs
the as-of operator's winner-take-all) and "how much do segments
overlap" (set algebra over user audiences, exact and sketch-backed).

Scale notes common to both:
- the only full-data exchanges are hash partitions on well-distributed
  keys (user id, (user, time-bin)); nothing quadratic in users or
  events, nothing driver-side;
- every float that reaches an oracle-checked output is stable-rounded;
  orderings tiebreak on ids so results are deterministic under any
  partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import stable_round


def touch_attribution(
    events: DataFrame,
    touch_type: str = "click",
    conversion_type: str = "purchase",
    lookback_seconds: int = 24 * 3600,
    halflife_seconds: int = 6 * 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
    bin_seconds: int | None = None,
    group_expr=None,
    group_name: str = "campaign",
) -> DataFrame:
    """Multi-touch attribution: each conversion's value is credited to
    the SAME user's touch events inside ``[conv_ts - lookback, conv_ts)``
    under two models at once — linear (equal split across the touch set)
    and exponential time-decay (weight 2^(-age/halflife), normalized
    within the conversion's touch set, so each conversion still credits
    exactly its value). Complements the as-of operator's last-touch
    model (`plans/data_queries.events_asof_attribution`), which assigns
    every conversion wholly to the single latest touch.

    ``group_expr`` (a Column over the TOUCH row, e.g. a campaign id
    parsed from the event payload) sets the dimension credit is rolled
    up to — the dimension along which the two models actually disagree.
    With the default (the user id), both models degenerate to the same
    totals, because every touch of a conversion belongs to one user and
    each model credits exactly the conversion's value in aggregate.

    The touch↔conversion match is a range join — Spark has no native
    one, and a raw inequality join plans as a nested loop. Same cure as
    `streaming.events.interval_bin_join`, with the user key ADDED to the
    equi-join key: conversions explode to the lookback window's time
    bins (⌈lookback/bin⌉+1 rows each; ``bin_seconds`` defaults to the
    lookback so ≤ 2), touches map to their single bin, candidates come
    from one hash join on (user, bin), and the exact window predicate
    filters in-stage. Per-candidate fan-out is bounded by a user's
    touches per bin — user-level hot keys fall to AQE skew splitting.
    Bin math is exact integer microseconds (shared rationale:
    interval_bin_join's docstring).

    Exactly-once per (touch, conversion) pair without a distinct pass:
    the touch owns ONE bin. Per-conversion normalizers (touch count,
    decay-weight sum) come from one hash agg keyed on the conversion id;
    the final per-user rollup sums credited value. Decay weights are
    computed from integer microsecond ages, so both engines evaluate
    pow(2, -age/halflife) on identical doubles.

    Returns per-group rows: (<group>, n_conversions, n_touch_pairs,
    attributed_linear, attributed_decay) — conversions with no touch in
    the window attribute nothing (they are the as-of query's business).
    ``n_conversions`` counts conversions the GROUP's touches
    participated in: a conversion touched by two campaigns appears in
    both rows (its VALUE still splits — only the credit columns are
    additive across groups; summing n_conversions double-counts by
    design, the standard participation semantics).
    """
    bin_us = int(bin_seconds or lookback_seconds) * 1_000_000
    look_us = int(lookback_seconds) * 1_000_000
    half_us = float(halflife_seconds) * 1e6

    us = lambda c: F.unix_micros(F.col(c).cast("timestamp_ltz"))  # noqa: E731
    bin_of = lambda col: F.floor(  # noqa: E731
        col.cast("decimal(20,0)") / F.lit(bin_us)
    ).cast("long")

    if group_expr is None:
        group_expr, group_name = F.col(user_col), user_col
    touches = events.filter(F.col(type_col) == touch_type).select(
        F.col(user_col).alias("__u"),
        group_expr.alias("__g"),
        us(ts_col).alias("__tt"),
        bin_of(us(ts_col)).alias("__bin"),
    )
    convs = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("__u"),
        F.col(id_col).alias("__cid"),
        us(ts_col).alias("__ct"),
        F.col(value_col).alias("__v"),
    )
    conv_bins = convs.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                bin_of(F.col("__ct") - F.lit(look_us)),
                bin_of(F.col("__ct") - F.lit(1)),
            )
        ),
    )
    pairs = touches.join(conv_bins, ["__u", "__bin"]).filter(
        (F.col("__tt") >= F.col("__ct") - F.lit(look_us))
        & (F.col("__tt") < F.col("__ct"))
    )
    weighted = pairs.withColumn(
        "__w",
        F.pow(
            F.lit(2.0),
            -((F.col("__ct") - F.col("__tt")).cast("double")) / F.lit(half_us),
        ),
    )
    per_conv = weighted.groupBy("__cid").agg(
        F.count(F.lit(1)).alias("__n_touch"),
        F.sum("__w").alias("__w_sum"),
    )
    credited = weighted.join(per_conv, "__cid")
    return (
        credited.groupBy(F.col("__g").alias(group_name))
        .agg(
            F.countDistinct("__cid").cast("long").alias("n_conversions"),
            F.count(F.lit(1)).cast("long").alias("n_touch_pairs"),
            stable_round(
                F.sum(F.col("__v") / F.col("__n_touch")), 4
            ).alias("attributed_linear"),
            stable_round(
                F.sum(F.col("__v") * F.col("__w") / F.col("__w_sum")), 4
            ).alias("attributed_decay"),
        )
        .orderBy(group_name)
    )


def audience_flags(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user audience membership: one row per user with the SORTED
    distinct set of event types they performed. Two hash aggs on
    user-family keys — distinct (user, type) first (map-side partials
    absorb each user's event volume before any exchange), then a
    per-user collect bounded by the type vocabulary, never by history.
    """
    return (
        events.select(F.col(user_col).alias("__u"), F.col(type_col).alias("__t"))
        .distinct()
        .groupBy("__u")
        .agg(F.sort_array(F.collect_set("__t")).alias("__types"))
    )


def audience_overlap(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Exact pairwise audience overlap matrix: for every unordered pair
    of event types (a < b), the user counts |A|, |B|, |A ∩ B| and the
    Jaccard overlap — the segment-overlap question behind campaign
    reach / cannibalization analyses.

    Shape: `audience_flags` (two bounded hash aggs), then the pair
    explode happens IN ROW over each user's bounded type set (≤ T types
    → ≤ T(T−1)/2 pair rows per user, constants for any real event
    vocabulary), one hash agg on the pair key, and a broadcast attach of
    per-type totals (T rows). The user×user or event×event join a naive
    formulation implies never exists; total work is two scans + aggs
    over user-cardinality tables.

    Returns (type_a, type_b, users_a, users_b, users_both, jaccard),
    jaccard stable-rounded, ordered by (type_a, type_b).
    """
    flags = audience_flags(events, user_col, type_col)
    t = F.col("__types")
    pair_rows = flags.select(
        F.explode(
            F.flatten(
                F.transform(
                    t,
                    lambda a, i: F.transform(
                        F.slice(
                            t,
                            i + 2,
                            F.greatest(F.size(t) - i - 1, F.lit(0)),
                        ),
                        lambda b: F.struct(
                            a.alias("type_a"), b.alias("type_b")
                        ),
                    ),
                )
            )
        ).alias("__p")
    )
    both = pair_rows.groupBy(
        F.col("__p.type_a").alias("type_a"),
        F.col("__p.type_b").alias("type_b"),
    ).agg(F.count(F.lit(1)).cast("long").alias("users_both"))
    totals = (
        events.select(F.col(user_col).alias("__u"), F.col(type_col).alias("__t"))
        .distinct()
        .groupBy("__t")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    return (
        both.join(
            F.broadcast(totals.select(F.col("__t").alias("type_a"),
                                      F.col("__n").alias("users_a"))),
            "type_a",
        )
        .join(
            F.broadcast(totals.select(F.col("__t").alias("type_b"),
                                      F.col("__n").alias("users_b"))),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "users_a",
            "users_b",
            "users_both",
            stable_round(
                F.col("users_both")
                / (F.col("users_a") + F.col("users_b") - F.col("users_both")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


def audience_overlap_theta(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    lgk: int = 12,
) -> DataFrame:
    """Sketch-backed audience overlap: the same pairwise matrix as
    `audience_overlap`, but from per-type DataSketches THETA sketches of
    the user set — the mergeable-state route when audiences are too
    large to re-scan per analysis. Theta sketches support set
    INTERSECTION and DIFFERENCE (HLL does unions only), which is the
    whole point here: build T sketches once (one pass, additive state
    like the engine's HLL/KLL cubes — map-side-combined, 2^lgk × 8
    bytes each regardless of user count), then answer any overlap
    question sketch-side.

    Estimates are EXACT while a sketch stays below its 2^lgk retention
    (no sampling has kicked in); beyond that the intersection's relative
    error grows with the inverse overlap fraction — the pytest envelope
    pins both regimes. Registered rows-only for that reason, same
    status as the HLL/KLL cube queries.

    The pairwise stage cross-joins the T-row sketch table with itself
    (T² tiny rows, broadcast) — sketch binaries never leave the plan.
    Returns (type_a, type_b, est_a, est_b, est_both, est_union) with
    estimates rounded to 2 decimals (exact-regime values are integral).
    """
    sketches = (
        events.select(F.col(type_col).alias("__t"), F.col(user_col).alias("__u"))
        .groupBy("__t")
        .agg(F.theta_sketch_agg(F.col("__u"), F.lit(lgk)).alias("__sk"))
    )
    a = sketches.select(
        F.col("__t").alias("type_a"), F.col("__sk").alias("__ska")
    )
    b = sketches.select(
        F.col("__t").alias("type_b"), F.col("__sk").alias("__skb")
    )
    pairs = a.crossJoin(F.broadcast(b)).filter(
        F.col("type_a") < F.col("type_b")
    )
    est = lambda c: stable_round(  # noqa: E731
        F.theta_sketch_estimate(c), 2
    )
    return pairs.select(
        "type_a",
        "type_b",
        est(F.col("__ska")).alias("est_a"),
        est(F.col("__skb")).alias("est_b"),
        est(F.theta_intersection("__ska", "__skb")).alias("est_both"),
        est(F.theta_union("__ska", "__skb")).alias("est_union"),
    ).orderBy("type_a", "type_b")
