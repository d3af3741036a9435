"""Per-query profiling harness for the r13 optimization round.

For each named headline query: fresh-JVM session (same config as bench),
bench warmup, capture ``.explain("formatted")`` to ``plans/r13/<q>_<tag>.txt``
and time the query end-to-end through the noop sink. With ``--jobs`` the
Spark UI stays enabled and per-job wall times (from the status tracker) are
appended, so the dominant stage of a multi-job query is attributable
without the UI.

Usage:
  python tools/profile_query.py [--tag before|after] [--reps N] query ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from bench import HEADLINE, SF_DIR, drain, force, warmup  # noqa: E402
from consent_based_conversion_adjustments_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--no-plan", action="store_true")
    args = ap.parse_args()

    plans_dir = os.path.join(HERE, "plans", "r13")
    os.makedirs(plans_dir, exist_ok=True)
    fns = dict(HEADLINE)

    spark = get_spark("profile-r13")
    warmup(spark)
    results = {}
    for name in args.queries:
        fn = fns[name]
        df = fn(spark, SF_DIR)
        if not args.no_plan:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(plans_dir, f"{name}_{args.tag}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"# plan -> {path}", file=sys.stderr)
        drain(spark)
        times = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.time()
            force(fn(spark, SF_DIR))
            times.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            drain(spark)
        results[name] = times
        print(f"# {name}: {times}", file=sys.stderr)
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "tag": args.tag, "times": results}))


if __name__ == "__main__":
    main()
