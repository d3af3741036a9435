"""End-to-end behavioral-analytics story over the events fixture — the
composition demo for the round-8 layer.

One flow from raw events to the four classic product-analytics answers,
each stage a registered operator with its own oracle/tests:

1. FUNNEL       — corpus.funnel_counts: view → click → purchase, strict
   event-time order.
2. RETENTION    — the theta-sketch cube (streaming.stats): per-day user
   sketches, week-1 vs week-3 retained users by sketch intersection,
   checked against the exact per-user flag aggregation.
3. ATTRIBUTION  — behavior.touch_attribution: every purchase's value
   credited to the user's prior-24h clicks by campaign, linear and
   time-decay models side by side (and the as-of last-touch model for
   contrast).
4. OVERLAP      — behavior.audience_overlap: which event-type audiences
   share users (exact), and the same matrix from theta sketches.
5. DRIFT        — timeseries.ewma_anomalies: daily value EWMA control
   band per event type; timeseries.linear_trend: is value trending?

Run:  python examples/behavior_demo.py [sf_dir]
(defaults to /root/testdata/sf0.001; deterministic output).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402

from consent_based_conversion_adjustments_spark.operators import (  # noqa: E402
    behavior as B,
)
from consent_based_conversion_adjustments_spark.operators.corpus import (  # noqa: E402
    funnel_counts,
)
from consent_based_conversion_adjustments_spark.operators.timeseries import (  # noqa: E402
    ewma_anomalies,
    linear_trend,
)
from consent_based_conversion_adjustments_spark.session import get_spark  # noqa: E402
from consent_based_conversion_adjustments_spark.sources.io import (  # noqa: E402
    read_table,
)
from consent_based_conversion_adjustments_spark.streaming.stats import (  # noqa: E402
    daily_user_theta_sketches,
    retained_over_ranges,
)


def main(sf_dir: str) -> None:
    spark = get_spark("behavior-demo")
    ev = read_table(spark, sf_dir, "events")

    print("1. FUNNEL view -> click -> purchase")
    funnel_counts(ev).show()

    print("2. RETENTION week1 vs week3 (theta-sketch cube)")
    cube = daily_user_theta_sketches(ev)
    retained_over_ranges(
        cube, "2024-01-01", "2024-01-07", "2024-01-15", "2024-01-21"
    ).show()

    print("3a. ATTRIBUTION by campaign (linear vs time-decay)")
    B.touch_attribution(
        ev,
        group_expr=F.get_json_object("props", "$.k").cast("long") % 10,
        group_name="campaign",
    ).show(10)

    print("3b. last-touch (as-of) for contrast: total purchase value")
    ev.filter(F.col("event_type") == "purchase").agg(
        F.round(F.sum("value"), 2).alias("total_purchase_value")
    ).show()

    print("4. AUDIENCE OVERLAP (first two days; exact vs theta)")
    early = ev.filter(F.col("ts") < F.lit("2024-01-03").cast("timestamp_ntz"))
    B.audience_overlap(early).show()
    B.audience_overlap_theta(early).show()

    print("5a. EWMA control band (first anomalies per type)")
    ewma_anomalies(ev, ["event_type"], "ts", "value").filter(
        F.col("is_anomaly")
    ).show(5)

    print("5b. value trend per event type (OLS, units/day)")
    linear_trend(ev, ["event_type"], "ts", "value").show()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
