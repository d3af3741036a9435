"""r14 re-measurement of admit_batch's per-round checkpoint strategy.

The r6 verdict (full-union checkpoint beats delta, 882/867 s vs
1382/1127 s at the identical-copy 64x rung) was measured when each
round probed the store ~19x (16 per-band joins + verify attaches +
vocab probe). After r13's single-shuffle exploded banding the store is
scanned ~4x per round, and VERDICT r13 flagged the justification as
stale: the full-union rewrite is an O(store)-per-round checkpoint
write, the admission pipeline's only remaining superlinear-at-depth
cost. This harness re-runs the A/B on the ORGANIC sf1.0 stream rung
(run_sf1_stream_r13.make_sf1_stream: 10x duplicate-rich docs — the
regime where the store actually grows), alternating fresh-JVM legs of
``admission_round`` with ``COCOA_ADMIT_CKPT`` = full | delta.

Usage: python tools/scale/admission_ckpt_ab_r14.py [rounds]
Writes tools/scale/results_admission_ckpt_r14.json (appending legs).
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))

SNIP = """
import json, sys, time
sys.path.insert(0, {repo!r})
t0 = time.time()
s = 0
for i in range(10**7):
    s += i
loop = round(time.time() - t0, 3)
import bench
from consent_based_conversion_adjustments_spark.session import get_spark
import __spark_entry__ as e
spark = get_spark()
bench.warmup(spark)
fn = e._flat()["admission_round"][0]
t0 = time.time()
bench.force(fn(spark, {sf!r}))
print(json.dumps({{"query": "admission_round", "sec": round(time.time() - t0, 3),
                   "py_loop": loop}}))
"""


def leg(sf_dir: str, variant: str, timeout: float = 3600.0) -> dict | None:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["COCOA_ADMIT_CKPT"] = variant
    code = SNIP.format(repo=REPO, sf=sf_dir)
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True,
            text=True, timeout=timeout, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        print(f"  !! {variant} @ {sf_dir}: timed out", file=sys.stderr)
        return None
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if rec.get("query") == "admission_round":
            rec["variant"] = variant
            rec["sf_dir"] = sf_dir
            return rec
    print(f"  !! {variant} @ {sf_dir}: no timing; stderr tail:", file=sys.stderr)
    print("\n".join(out.stderr.strip().splitlines()[-5:]), file=sys.stderr)
    return None


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spec = importlib.util.spec_from_file_location(
        "run_sf1_stream_r13", os.path.join(HERE, "run_sf1_stream_r13.py")
    )
    r13 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(r13)
    dst = r13.make_sf1_stream()

    path = os.path.join(HERE, "results_admission_ckpt_r14.json")
    results = []
    if os.path.exists(path):
        results = json.load(open(path))
    for r in range(rounds):
        for variant in ("full", "delta"):
            rec = leg(dst, variant)
            print(f"  round {r} {variant}: {rec}", flush=True)
            if rec:
                rec["round"] = r
                results.append(rec)
            with open(path, "w") as fh:
                json.dump(results, fh, indent=1)
                fh.write("\n")
            time.sleep(10)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
