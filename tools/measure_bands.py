"""Measure fresh-JVM variance bands for the known-noisy bench entries.

The checkpoint/state-store queries swing up to ±38% inside one warmed JVM
(PERF.md round 9); their committed bench numbers must therefore be
band-checked, not trusted raw. This script runs N serialized fresh-JVM
solo legs (bench.py --solo) per noisy query on an otherwise idle host and
writes tools/bench_bands.json with band = [min/1.5, max*1.5] — wide
enough for ordinary state-store noise, tight enough that a host-I/O
stall (the 74 s vs 25 s admission_round outlier of round 9, a 2.9x
excursion) falls outside and triggers bench.py's automatic A/B.

Run:  python tools/measure_bands.py [runs_per_query]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NOISY = [
    "admission_round",
    "dedup_clusters",
    "corpus_canonical_ids",
    "streaming_click_purchase_join",
    "streaming_attribution_rounds",
    "streaming_dedup_union",
    # r14 additions: every query whose committed in-loop timing has
    # exceeded 2x its fresh-JVM solo time in a driver or builder board
    # (dedup_minhash 34.2 vs 11.9 r14-before; source_dup_matrix 22.8
    # in-loop vs 10.2 warmed; incremental_dedup_admission 18.5 vs 6.6;
    # corpus_pretrain_ids 9.5 vs 6.4) — the same warmed-JVM
    # checkpoint/GC interference the original cohort encodes. A measured
    # band only changes WHEN bench.py re-measures (fresh-JVM solo legs,
    # every raw observation recorded in band_audit) — never the numbers.
    "dedup_minhash",
    "source_dup_matrix",
    "incremental_dedup_admission",
    "corpus_pretrain_ids",
]


def solo_run(name: str) -> float | None:
    env = dict(os.environ)
    env["PYTHONPATH"] = HERE + os.pathsep + env.get("PYTHONPATH", "")
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(HERE, "bench.py"), "--solo", name],
            env=env,
            capture_output=True,
            text=True,
            timeout=600,
        )
    except subprocess.TimeoutExpired:
        # a host stall (the very phenomenon the bands exist to catch)
        # must cost one observation, not the whole measurement run
        print(f"  !! {name}: solo leg timed out (600s)", file=sys.stderr)
        return None
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if rec.get("query") == name:
            return float(rec["sec"])
    print(f"  !! no timing parsed for {name}; stderr tail:", file=sys.stderr)
    print("\n".join(out.stderr.strip().splitlines()[-5:]), file=sys.stderr)
    return None


def main() -> int:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    bands: dict[str, dict] = {}
    for name in NOISY:
        obs: list[float] = []
        for i in range(runs):
            t = solo_run(name)
            print(f"  {name} run {i + 1}/{runs}: {t}s", flush=True)
            if t is not None:
                obs.append(t)
        if not obs:
            print(f"FAIL: no successful runs for {name}")
            return 1
        bands[name] = {
            "lo": round(min(obs) / 1.5, 3),
            "hi": round(max(obs) * 1.5, 3),
            "runs": obs,
        }
    path = os.path.join(HERE, "tools", "bench_bands.json")
    with open(path, "w") as fh:
        json.dump(bands, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
