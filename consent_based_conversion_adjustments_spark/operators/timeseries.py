"""Event-stream time-series analytics: time-weighted averages and
robust (median/MAD) anomaly scanning.

Both are two-shape compositions that avoid the single-partition-window
and quadratic traps their naive formulations hide: TWAP is a keyed
lead-window pass (duration weights built in-row), and the MAD scan is
the agg-then-broadcast two-pass shape shared with the z-score scan —
per-group medians are tiny aggregates broadcast back onto the stream,
never a per-group window sort.

reference: no analog — event-analytics operators for the north-star
surface (SURVEY.md §7 step 7), siblings of the events family in
plans/data_queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_weighted_avg(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-key time-weighted average (TWAP): each observation is
    weighted by how long it REMAINED CURRENT — the gap to the key's
    next observation. The last observation per key carries no duration
    (no successor) and is excluded, the standard left-closed TWAP over
    an observation window. Keys with a single observation yield no row.

    Output: ``(key, twap, total_seconds, n_intervals)``.

    Scale: ONE hash shuffle on the key + a lead-window pass (duration
    built in-row), then a map-side-combinable weighted-sum agg. The
    naive per-key ``collect_list`` + Python loop would materialize
    whole histories per row; this never does. Heavy-key caveat shared
    with sessionization.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    dur = (
        F.unix_micros(F.lead(ts_col).over(w).cast("timestamp_ltz"))
        - F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    ).cast("double") / 1e6
    weighted = events.select(
        F.col(key_col),
        F.col(value_col).cast("double").alias("__v"),
        dur.alias("__dur"),
    ).filter(F.col("__dur").isNotNull())
    return weighted.groupBy(key_col).agg(
        (F.sum(F.col("__v") * F.col("__dur")) / F.sum("__dur")).alias(
            "twap"
        ),
        F.sum("__dur").alias("total_seconds"),
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
    )


MAD_CONSISTENCY = 1.4826  # Φ⁻¹-based factor: MAD·1.4826 ≈ σ for normals


def mad_anomalies(
    events: DataFrame,
    group_col: str,
    value_col: str,
    threshold: float = 3.5,
) -> DataFrame:
    """Robust per-group outliers via the median/MAD rule (Iglewicz &
    Hoaglin): flag rows with ``|value − median| / (MAD·1.4826) >
    threshold``. Unlike the mean/σ z-score scan (which heavy outliers
    inflate, masking themselves), median and MAD have a 50% breakdown
    point — the robust-statistics variant a cleaning pipeline wants.

    A degenerate group (more than half its values identical) has
    MAD = 0; there the rule degenerates to "any deviation is infinitely
    surprising", so such rows get ``robust_z = +inf`` (flagged) and
    exact-median rows 0 — the standard Iglewicz-Hoaglin fallback, and
    ANSI-safe (no division by zero).

    Three passes, all scale-safe: per-group exact median (tiny agg),
    broadcast back to compute |v − med|, per-group MAD (tiny agg),
    broadcast again for the flag filter. Group cardinality bounds the
    broadcast sides; the stream is never window-sorted per group.
    """
    med = events.groupBy(group_col).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("__med")
    )
    with_dev = events.join(F.broadcast(med), group_col).withColumn(
        "__adev", F.abs(F.col(value_col) - F.col("__med"))
    )
    mad = with_dev.groupBy(group_col).agg(
        F.percentile(F.col("__adev"), F.lit(0.5)).alias("__mad")
    )
    score = F.when(
        F.col("__mad") == 0,
        F.when(F.col("__adev") > 0, F.lit(float("inf"))).otherwise(
            F.lit(0.0)
        ),
    ).otherwise(F.col("__adev") / (F.col("__mad") * MAD_CONSISTENCY))
    return (
        with_dev.join(F.broadcast(mad), group_col)
        .withColumn("robust_z", score)
        .filter(F.col("robust_z") > threshold)
        .drop("__med", "__adev", "__mad")
    )


def linear_trend(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    value_col: str,
    round_scale: int = 6,
) -> DataFrame:
    """Per-group OLS trend of a value over TIME: slope (units/day),
    intercept, R², and the fitted endpoints' delta — the "is this metric
    drifting and how fast" primitive behind alerting and capacity
    forecasts.

    Uses Spark's native bivariate regression aggregates (``regr_slope``
    / ``regr_intercept`` / ``regr_r2``, SQL:2023 — DuckDB implements the
    same family, so the oracle is a direct mirror): ONE hash aggregate
    with map-side partials, zero joins, zero windows — the co-moment
    accumulation is inside the JVM aggregate, never a collected series.
    The regressor is fractional DAYS since the epoch computed from exact
    integer microseconds (one double division by 8.64e10), keeping both
    engines' inputs bit-identical and the slope in interpretable
    units/day.

    Scale: group count bounds the output; the scan is the whole cost —
    this composes with the sketch cubes' pattern (run it per day/epoch
    and the partial regr moments would be additive too, but Spark's
    regr_* don't expose partial state, so the cube variant would use
    explicit Σx/Σy/Σxy/Σx²/Σn columns instead).
    """
    from ..functions.rounding import stable_round

    x = (
        F.unix_micros(F.col(ts_col).cast("timestamp_ltz")).cast("double")
        / F.lit(86_400_000_000.0)
    )
    y = F.col(value_col).cast("double")
    out = df.groupBy(*group_cols).agg(
        F.count(y).cast("long").alias("n"),
        F.regr_slope(y, x).alias("__slope"),
        F.regr_intercept(y, x).alias("__icept"),
        F.regr_r2(y, x).alias("__r2"),
        F.min(x).alias("__x0"),
        F.max(x).alias("__x1"),
    )
    return out.select(
        *group_cols,
        "n",
        stable_round(F.col("__slope"), round_scale).alias("slope_per_day"),
        stable_round(F.col("__icept"), round_scale).alias("intercept"),
        stable_round(F.col("__r2"), round_scale).alias("r2"),
        stable_round(
            F.col("__slope") * (F.col("__x1") - F.col("__x0")), round_scale
        ).alias("fitted_delta"),
    ).orderBy(*group_cols)


def ewma_anomalies(
    events: DataFrame,
    group_cols: list[str],
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    n_sigma: float = 3.0,
) -> DataFrame:
    """EWMA control band per group over the DAILY series: each day's
    average is compared with the exponentially-weighted moving average
    of the days BEFORE it; deviations beyond ``n_sigma`` × the group's
    deviation spread are flagged — the classic monitoring smoother,
    complementing the robust MAD scan (point outliers) with trend-aware
    drift detection.

    EWMA here is the adjust=True form (pandas ``ewm`` semantics):
    ewma_t = Σ_j (1−α)^(t−j)·x_j / Σ_j (1−α)^(t−j), computed WITHOUT a
    sequential recurrence: with u_j = x_j·(1−α)^(−j), the numerator is
    (1−α)^t · cumsum(u) and the denominator is the geometric closed form
    (1 − (1−α)^(t+1))/α — two keyed cumulative windows over the
    AGGREGATED daily frame (rows = #groups × #days, grain-bounded, never
    event-cardinality; the events collapse in one map-side-combined hash
    agg first). The (1−α)^(−t) rescaling overflows double once
    t·ln(1/(1−α)) ≳ 700 — ~5.4 years of daily grain at α=0.3; longer
    horizons need per-chunk renormalization, which is the documented
    trade for a recurrence-free distributed form.

    Consecutive ROWS are consecutive steps: calendar gaps are not
    decay-weighted (grain is the contract, matching the resample
    family). Flags use the group's stddev of deviations (two-pass
    agg→broadcast, the MAD-scan shape). Returns (group…, day, daily_avg,
    ewma, deviation, is_anomaly) — day as an ISO string (the oracle
    comparator's date convention), floats stable-rounded to 6;
    deviation/flag NULL on each group's first day (no prior EWMA).
    """
    from ..functions.rounding import stable_round

    r = 1.0 - alpha
    daily = events.groupBy(
        *group_cols, F.to_date(ts_col).alias("day")
    ).agg(F.avg(F.col(value_col).cast("double")).alias("__x"))
    w = Window.partitionBy(*group_cols).orderBy("day")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t = F.row_number().over(w) - 1
    num = F.sum(F.col("__x") * F.pow(F.lit(r), -t)).over(wc) * F.pow(
        F.lit(r), t
    )
    den = (1.0 - F.pow(F.lit(r), t + 1)) / alpha
    with_ewma = daily.withColumn("__ewma", num / den)
    dev = F.col("__x") - F.lag("__ewma").over(w)
    scored = with_ewma.withColumn("__dev", dev)
    spread = scored.groupBy(*group_cols).agg(
        F.stddev_samp("__dev").alias("__sd")
    )
    return (
        scored.join(F.broadcast(spread), list(group_cols))
        .select(
            *group_cols,
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            stable_round(F.col("__x"), 6).alias("daily_avg"),
            stable_round(F.col("__ewma"), 6).alias("ewma"),
            stable_round(F.col("__dev"), 6).alias("deviation"),
            F.when(
                F.col("__dev").isNotNull(),
                F.abs(F.col("__dev")) > F.lit(n_sigma) * F.col("__sd"),
            ).alias("is_anomaly"),
        )
        .orderBy(*group_cols, "day")
    )
