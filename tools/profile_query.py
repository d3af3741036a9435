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


def _dump_jobs(spark, name: str) -> None:
    """Per-job wall times for the labelled profile run via the UI REST API
    (guide §7.1 without a browser): job duration, stage count, and the
    job group/description so multi-job queries attribute their time."""
    import datetime
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        print("# --jobs: no UI url", file=sys.stderr)
        return
    app_id = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"
        ) as fh:
            jobs = json.load(fh)
    except Exception as exc:  # diagnostics only — never kill the profile
        print(f"# --jobs fetch failed: {exc}", file=sys.stderr)
        return

    def ts(s):
        return datetime.datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f")

    rows = []
    for j in jobs:
        if j.get("description") != f"profile:{name}":
            continue
        dur = (ts(j["completionTime"]) - ts(j["submissionTime"])).total_seconds()
        rows.append((j["jobId"], dur, j.get("numTasks", 0)))
    rows.sort()
    total = sum(d for _, d, _ in rows)
    print(
        f"# jobs[{name}]: n={len(rows)} sum={total:.2f}s "
        f"(wall overlaps possible)",
        file=sys.stderr,
    )
    for jid, dur, ntasks in rows:
        print(f"#   job {jid}: {dur:7.3f}s tasks={ntasks}", file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--plans-dir", default="r14", help="plans/<dir> output")
    ap.add_argument(
        "--jobs",
        action="store_true",
        help="enable the UI and print per-job wall times (REST API)",
    )
    args = ap.parse_args()

    plans_dir = os.path.join(HERE, "plans", args.plans_dir)
    os.makedirs(plans_dir, exist_ok=True)
    fns = dict(HEADLINE)

    extra = {"spark.ui.enabled": "true"} if args.jobs else None
    spark = get_spark("profile-r13", extra_conf=extra)
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
        if args.jobs:
            _dump_jobs(spark, name)
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "tag": args.tag, "times": results}))


if __name__ == "__main__":
    main()
