"""General as-of join — the point-in-time lookup operator (pandas
``merge_asof``, DuckDB ``ASOF JOIN``, kdb ``aj``) Spark lacks natively.

For every left row, attach the single right row with the latest
``right_ts <= left_ts`` (direction="backward", the default) or the
earliest ``right_ts >= left_ts`` (direction="forward") within the same
key, optionally bounded by a tolerance. The classic uses: trades→quotes,
conversions→last touch, sensor readings→latest calibration.

Why not a join: the naive formulation is an inequality join + argmax,
which Spark plans as a per-key nested loop (quadratic in key history).
The idiomatic composition — established by the cocoa as-of attribution
query (plans/data_queries.events_asof_attribution) and generalized
here — is a SORTED UNION + running ``last(..., ignorenulls)`` window:

1. tag right rows 0 / left rows 1 and union them on the shared
   (key…, ts) spine, each side's payload packed into ONE struct so any
   column width costs one union slot and one window expression;
2. one hash partition on the key, one in-partition sort on (ts, tag) —
   right-before-left at equal timestamps gives the standard inclusive
   at-or-before semantics;
3. the running ``last`` of the right struct over ``unbounded preceding
   → current row`` is exactly "the most recent right row so far";
4. keep left rows, unpack both structs, and null the match outside the
   tolerance.

Cost: ONE shuffle of |left| + |right| rows and one sort — linear;
history skew shows up as long sorted runs, never as memory (window
state is one struct), and there is no join at all in the plan.
``direction="forward"`` runs the identical plan with the sort reversed.
This is the 100 TB shape: no inequality-join explosion, no per-key
collect, no row-id round trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    matched_ts_col: str = "asof_ts",
) -> DataFrame:
    """Left as-of join; returns every left column + ``matched_ts_col``
    and ``right_value_cols`` from the matched right row (all NULL when
    no right row qualifies, merge_asof semantics). A right row exactly
    AT the left timestamp qualifies in both directions; among several
    right rows sharing the matched timestamp the running-last keeps the
    one the sort visits last — pre-deduplicate the right frame per
    (key, ts) when that matters, as with ``merge_asof``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    collisions = ({matched_ts_col, *right_value_cols} & set(left.columns))
    if collisions:
        raise ValueError(
            "asof_join output columns collide with left columns: "
            f"{sorted(collisions)} — alias the right value columns or "
            "matched_ts_col"
        )

    left_cols = [c for c in left.columns if c not in key_cols]
    r_payload = F.struct(
        F.col(right_ts).alias("__mts"),
        *[F.col(c).alias(c) for c in right_value_cols],
    )
    l_payload = F.struct(*[F.col(c).alias(c) for c in left_cols])
    # A NULL right_ts can never be "the latest row at-or-before t" — drop it
    # before the union, otherwise NULLS FIRST ordering makes its payload the
    # running-last match for left rows with no qualifying right row (matched
    # ts NULL but value columns populated, violating the all-NULL contract).
    r = right.filter(F.col(right_ts).isNotNull()).select(
        *key_cols,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        r_payload.alias("__r"),
    )
    r = r.withColumn("__l", F.lit(None).cast(
        left.select(l_payload.alias("__l")).schema["__l"].dataType
    ))
    l = left.select(
        *key_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        l_payload.alias("__l"),
    )
    asc = direction == "backward"
    order = [
        F.col("__ts").asc() if asc else F.col("__ts").desc(),
        # right rows sort before left at equal ts in BOTH directions →
        # an exactly-simultaneous right row is visible to the left row
        F.col("__tag").asc(),
    ]
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spine = (
        r.unionByName(l)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__tag") == 1)
    )
    match_ts = F.col("__match.__mts")
    if tolerance_seconds is not None:
        lt = F.col("__ts").cast("timestamp_ltz")
        rt = match_ts.cast("timestamp_ltz")
        gap_us = (
            (F.unix_micros(lt) - F.unix_micros(rt))
            if asc
            else (F.unix_micros(rt) - F.unix_micros(lt))
        )
        keep = F.when(
            match_ts.isNotNull()
            & (gap_us <= F.lit(int(tolerance_seconds * 1_000_000))),
            F.col("__match"),
        )
    else:
        keep = F.col("__match")
    # A left row with NULL left_ts has no defined as-of point: its position
    # in the NULLS FIRST/LAST sort is arbitrary, so force the no-match result
    # (merge_asof raises on NaN "on" keys; we return the all-NULL row).
    keep = F.when(F.col("__ts").isNotNull(), keep)
    return spine.select(
        *key_cols,
        F.col("__ts").alias(left_ts),
        *[F.col(f"__l.{c}").alias(c) for c in left_cols if c != left_ts],
        keep.getField("__mts").alias(matched_ts_col),
        *[keep.getField(c).alias(c) for c in right_value_cols],
    )
