"""Organic sf1.0 rung for the streaming/admission state-store family
(VERDICT r12 §Next #5).

Round 12 proved identical-copy tiles flatter dedup-shaped operators —
organic duplicate-rich data falsified three tile-based stories. The
state-store cohort (`admission_round`, `streaming_click_purchase_join`,
`streaming_attribution_rounds`, `streaming_cms_rounds`,
`streaming_sketch_cube_audit`) had only identical-copy 64x evidence;
this rung gives it the same honest test:

- events ×10 ORGANIC: per-copy fresh user population (user_id offset —
  state scales with KEYS, tiling users would flatter the state store),
  per-row timestamp jitter (±10 min uniform, seeded), 2% row drop,
  ±5% value jitter, fresh sequential event ids. 10× rows AND 10× keys
  with mutated per-user sequences — organic growth, not copies.
- documents: the r12 organic corpus recipe (bootstrap ×10 + token
  drop — near-dup-rich, the regime the MinHash admission store must
  actually work in), reused from run_sf1_corpus_r12.make_sf1_corpus.

Protocol (PERF.md bench hygiene): fresh JVM per leg, bench warmup +
noop-sink timing, serialized on an idle host.

Run:   python tools/scale/run_sf1_stream_r13.py
Writes tools/scale/results_sf1_stream_r13.json.
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
SRC = "/root/testdata/sf0.1"
DST = "/tmp/scale_sf1_stream"
SEED = 113
COPIES = 10
DROP_RATE = 0.02
TS_JITTER_S = 600.0
USER_STRIDE = 100_000

QUERIES = [
    "admission_round",
    "streaming_click_purchase_join",
    "streaming_attribution_rounds",
    "streaming_cms_rounds",
    "streaming_sketch_cube_audit",
]

SNIP = """
import json, sys, time
sys.path.insert(0, {repo!r})
import bench
bench.SF_DIR = {sf!r}
from consent_based_conversion_adjustments_spark.session import get_spark
import __spark_entry__ as e
spark = get_spark()
bench.warmup(spark)
fn = e._flat()[{name!r}][0]
t0 = time.time()
bench.force(fn(spark, {sf!r}))
print(json.dumps({{"query": {name!r}, "sec": round(time.time() - t0, 3)}}))
"""


def make_sf1_stream() -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(DST, exist_ok=True)
    for fname in os.listdir(SRC):
        if fname in ("events.parquet", "documents.parquet"):
            continue
        link = os.path.join(DST, fname)
        if not os.path.exists(link):
            os.symlink(os.path.join(SRC, fname), link)

    ev_path = os.path.join(DST, "events.parquet")
    if not os.path.exists(ev_path):
        rng = np.random.default_rng(SEED)
        df = pq.read_table(os.path.join(SRC, "events.parquet")).to_pandas()
        parts = []
        for c in range(COPIES):
            keep = rng.uniform(size=len(df)) >= DROP_RATE
            copy = df[keep].copy()
            copy["user_id"] = copy["user_id"] + c * USER_STRIDE
            jit = rng.uniform(-TS_JITTER_S, TS_JITTER_S, size=len(copy))
            copy["ts"] = copy["ts"] + (jit * 1e9).astype("timedelta64[ns]")
            copy["value"] = (
                copy["value"] * (1.0 + rng.uniform(-0.05, 0.05, size=len(copy)))
            ).round(2)
            parts.append(copy)
        import pandas as pd

        out = pd.concat(parts, ignore_index=True)
        out = out.sort_values("ts", kind="stable").reset_index(drop=True)
        out["event_id"] = np.arange(len(out), dtype="int64")
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False), ev_path)
        print(
            f"wrote {ev_path}: {len(out)} organic events "
            f"({COPIES}x, fresh users, ts/value jitter, {DROP_RATE:.0%} drop)"
        )

    doc_path = os.path.join(DST, "documents.parquet")
    if not os.path.exists(doc_path):
        spec = importlib.util.spec_from_file_location(
            "run_sf1_corpus_r12", os.path.join(HERE, "run_sf1_corpus_r12.py")
        )
        r12 = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(r12)
        r12.make_sf1_corpus()
        os.symlink(
            os.path.join(r12.DST, "documents.parquet"), doc_path
        )
    return DST


def leg(name: str, sf_dir: str, timeout: float = 2400.0) -> float | None:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    code = SNIP.format(repo=REPO, sf=sf_dir, name=name)
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True,
            text=True, timeout=timeout, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        print(f"  !! {name} @ {sf_dir}: timed out", file=sys.stderr)
        return None
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if rec.get("query") == name:
            return float(rec["sec"])
    print(f"  !! {name} @ {sf_dir}: no timing; stderr tail:", file=sys.stderr)
    print("\n".join(out.stderr.strip().splitlines()[-5:]), file=sys.stderr)
    return None


def main() -> int:
    dst = make_sf1_stream()
    results = []
    for sf_label, sf_dir in (("sf0.1", SRC), ("sf1.0", dst)):
        for name in QUERIES:
            sec = leg(name, sf_dir)
            print(f"  {name} @ {sf_label}: {sec}s", flush=True)
            results.append({"query": name, "sf": sf_label, "sec": sec})
    path = os.path.join(HERE, "results_sf1_stream_r13.json")
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
        fh.write("\n")
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
