"""Build tools/bench_bands.json covering the FULL headline set.

Round 10's band protocol covered only the 6 known-noisy checkpoint/
state-store queries; seven other entries were then committed above 2× of
their first-recorded baseline without adjudication — host-load noise that
sailed through exactly where the protocol had no coverage (VERDICT r10
"What's wrong" #1). This script gives EVERY headline query a band:

- the 6 measured fresh-JVM bands (tools/measure_bands.py output) are
  preserved verbatim where present — they encode real state-store
  variance that a baseline-derived band would misjudge;
- every other query gets the judge's default band
  [0.5×, 2×] of its FIRST-RECORDED baseline, where the baseline is the
  earliest per-query timing recoverable from the committed BENCH_r*.json
  records (both formats: the stderr `# name: 1.23s` progress lines and
  the final JSON `"name": 1.23` payload fragments the driver captured).

bench.py then auto-A/Bs any in-loop timing above its band `hi` with
fresh-JVM solo re-runs before the results file is committed, recording
every raw observation in the artifact's band_audit section.

Run:  python tools/build_bands.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def headline_names() -> list[str]:
    # import bench lazily: it pulls the package (pyspark import is slow
    # but fine for a tool run)
    import bench

    return [name for name, _ in bench.HEADLINE]


def first_recorded() -> dict[str, tuple[float, str]]:
    """query -> (earliest recorded seconds, source file). Scans committed
    BENCH_r*.json rounds in ascending order; within a round the stderr
    progress lines and the JSON payload fragments agree (same run), so
    either spelling may supply the number."""
    names = set(headline_names())
    out: dict[str, tuple[float, str]] = {}
    for path in sorted(glob.glob(os.path.join(HERE, "BENCH_r*.json"))):
        try:
            raw = open(path).read()
        except OSError:
            continue
        found: dict[str, float] = {}
        # stderr form: `# name: 12.345s`
        for m in re.finditer(r"# (\w+): ([0-9]+(?:\.[0-9]+)?)s", raw):
            if m.group(1) in names:
                found.setdefault(m.group(1), float(m.group(2)))
        # JSON-fragment form: `"name": 12.345` (names filter excludes the
        # record's own meta keys)
        for m in re.finditer(r'\\?"(\w+)\\?": ([0-9]+(?:\.[0-9]+)?)', raw):
            if m.group(1) in names:
                found.setdefault(m.group(1), float(m.group(2)))
        base = os.path.basename(path)
        for name, sec in found.items():
            if name not in out:
                out[name] = (sec, base)
    # queries first recorded in tools/bench_results_latest.json only
    # (registered after the last driver BENCH record, or clipped out of a
    # truncated tail): their earliest available number IS the baseline
    latest = os.path.join(HERE, "tools", "bench_results_latest.json")
    try:
        for name, sec in json.load(open(latest))["queries"].items():
            if name in names and name not in out:
                out[name] = (float(sec), "bench_results_latest.json")
    except (OSError, json.JSONDecodeError, KeyError):
        pass
    return out


def main() -> int:
    bands_path = os.path.join(HERE, "tools", "bench_bands.json")
    measured: dict[str, dict] = {}
    if os.path.exists(bands_path):
        try:
            for name, band in json.load(open(bands_path)).items():
                if band.get("kind", "measured") == "measured":
                    measured[name] = band
        except (OSError, json.JSONDecodeError):
            pass
    baselines = first_recorded()
    bands: dict[str, dict] = {}
    missing: list[str] = []
    for name in headline_names():
        if name in measured:
            band = dict(measured[name])
            band["kind"] = "measured"
            bands[name] = band
            continue
        if name not in baselines:
            missing.append(name)
            continue
        sec, src = baselines[name]
        bands[name] = {
            "lo": round(0.5 * sec, 3),
            "hi": round(2.0 * sec, 3),
            "kind": "default",
            "baseline": sec,
            "baseline_src": src,
        }
    with open(bands_path, "w") as fh:
        json.dump(bands, fh, indent=1, sort_keys=True)
        fh.write("\n")
    n_meas = sum(1 for b in bands.values() if b["kind"] == "measured")
    print(
        f"wrote {bands_path}: {len(bands)} bands "
        f"({n_meas} measured, {len(bands) - n_meas} default)"
    )
    if missing:
        # a brand-new query has no recorded baseline yet — its first
        # driver-recorded timing becomes the baseline next round
        print(f"no baseline yet (unbanded): {missing}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
