"""sf1.0 rung for the cocoa flagship set (VERDICT r10 §Next #7).

The 64× rungs tile identical copies; this leg scales the ORGANIC sf0.1
customer table 10× (TPC-H sf1.0 proportions: ~150k customers) by
bootstrap-resampling rows — the joint (c_mktsegment, c_nationkey)
distribution that defines the one-hot feature space is preserved exactly
(sampling with replacement), fresh sequential c_custkey keeps the %5
consent split at 80/20, and c_acctbal gets ±1% multiplicative jitter so
conversions stay varied. That is the closest available stand-in for real
sf1.0 data (no TPC-H generator ships in this container) and strictly
more organic than a tile: category frequencies, per-block neighbor
counts, and conversion spread all match the source distribution instead
of repeating verbatim.

Protocol: fresh JVM per leg via `bench.py --solo` (same warmup +
noop-sink timing as every committed number), serialized on an idle host;
the non-customer tables are symlinked from sf0.1 (the cocoa set reads
only customer; warmup touches the others with limit(1)).

Run:  python tools/scale/run_sf1_cocoa_r11.py
Writes tools/scale/results_sf1_cocoa_r11.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SRC = "/root/testdata/sf0.1"
DST = "/tmp/scale_sf1"
FACTOR = 10
SEED = 11

FLAGSHIP = [
    "cocoa_knn_adjust",          # broadcast-matrix numpy impl (bench default)
    "cocoa_radius_adjust",
    "cocoa_percentile_adjust",
    "cocoa_knn_lsh_pairs",       # beyond-broadcast LSH route
    "cocoa_radius_lsh_adjust",
    "cocoa_percentile_lsh_adjust",
]


def make_sf1() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(DST, exist_ok=True)
    # symlink every non-customer table (warmup + any incidental reads)
    for fname in os.listdir(SRC):
        if fname == "customer.parquet":
            continue
        link = os.path.join(DST, fname)
        if not os.path.exists(link):
            os.symlink(os.path.join(SRC, fname), link)
    out_path = os.path.join(DST, "customer.parquet")
    if os.path.exists(out_path):
        return
    tbl = pq.read_table(os.path.join(SRC, "customer.parquet"))
    df = tbl.to_pandas()
    n = len(df) * FACTOR
    rng = np.random.default_rng(SEED)
    boot = df.iloc[rng.integers(0, len(df), size=n)].reset_index(drop=True)
    boot["c_custkey"] = np.arange(1, n + 1, dtype=boot["c_custkey"].dtype)
    boot["c_acctbal"] = (
        boot["c_acctbal"].astype("float64")
        * (1.0 + rng.uniform(-0.01, 0.01, size=n))
    ).round(2)
    pq.write_table(
        pa.Table.from_pandas(boot, preserve_index=False), out_path
    )
    print(f"wrote {out_path}: {n} customers (bootstrap x{FACTOR} of sf0.1)")


def solo(name: str, sf_dir: str, timeout: float = 900.0) -> float | None:
    env = dict(os.environ)
    env["PYTHONPATH"] = HERE + os.pathsep + env.get("PYTHONPATH", "")
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(HERE, "bench.py"), "--solo", name],
            env=env,
            capture_output=True,
            text=True,
            timeout=timeout,
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
    make_sf1()
    results = []
    for sf_label, sf_dir in (("sf0.1", SRC), ("sf1.0", DST)):
        for name in FLAGSHIP:
            sec = solo(name, sf_dir)
            print(f"  {name} @ {sf_label}: {sec}s", flush=True)
            results.append({"query": name, "sf": sf_label, "sec": sec})
    path = os.path.join(
        HERE, "tools", "scale", "results_sf1_cocoa_r11.json"
    )
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
        fh.write("\n")
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
