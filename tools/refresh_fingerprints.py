"""Refresh tools/verify_fp.json — each query's source fingerprint AT ITS
LAST GREEN DRIVER ROW.

The code-aware rotation (__spark_entry__._ordered_names) sorts a query
FIRST when its current fingerprint differs from the one recorded here,
i.e. when its implementing source changed since the driver last verified
it. This script rebuilds the record from git truth rather than trusting
any previously-committed sidecar:

  for each round N with a CORRECTNESS_rN.json on disk
      record-commit = the commit that ADDED that file (the driver's
      end-of-round bookkeeping commit); the code the driver actually ran
      is that commit's PARENT tree
      archive the package + registry files from <record-commit>^ and
      fingerprint every query registered there
  for each query: sidecar[q] = fingerprint at its last-green round

Run at ROUND START (before editing any source) so that a query greened
in the just-finished round N is fingerprinted against exactly the tree
the driver tested. Idempotent; safe to re-run.

Usage: python tools/refresh_fingerprints.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tarfile
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from consent_based_conversion_adjustments_spark.plans import (  # noqa: E402
    provenance as P,
)

SIDECAR = os.path.join(HERE, "tools", "verify_fp.json")


def _record_commit(round_no: int) -> str | None:
    """Commit that first added CORRECTNESS_r{N}.json (zero-padded and
    unpadded spellings both tried)."""
    for fname in (
        f"CORRECTNESS_r{round_no:02d}.json",
        f"CORRECTNESS_r{round_no}.json",
    ):
        out = subprocess.run(
            ["git", "log", "--diff-filter=A", "--format=%H", "--", fname],
            cwd=HERE,
            capture_output=True,
            text=True,
        )
        lines = out.stdout.strip().splitlines()
        if lines:
            return lines[-1]  # oldest add, should be unique anyway
    return None


def _archive_tree(commit: str, dest: str) -> bool:
    """Extract <commit>'s package tree into ``dest`` (returns False if
    the commit has no parent or archive fails)."""
    proc = subprocess.run(
        ["git", "archive", commit, P.PKG],
        cwd=HERE,
        capture_output=True,
    )
    if proc.returncode != 0:
        return False
    import io

    with tarfile.open(fileobj=io.BytesIO(proc.stdout)) as tf:
        tf.extractall(dest, filter="data")
    return True


def _all_record_rounds() -> list[int]:
    import glob

    out = []
    for path in glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json")):
        try:
            out.append(int(os.path.basename(path)[len("CORRECTNESS_r") : -len(".json")]))
        except ValueError:
            continue
    return sorted(out)


def main() -> int:
    greens = P.last_green_rounds(HERE)
    if not greens:
        print("no CORRECTNESS records found; nothing to do")
        return 0
    record_rounds = _all_record_rounds()
    latest, prev = record_rounds[-1], (
        record_rounds[-2] if len(record_rounds) > 1 else None
    )
    # fingerprint every round tree we need: each query's last-green round,
    # plus the two most recent record trees (change-recency detection)
    need = sorted(set(greens.values()) | {latest} | ({prev} if prev else set()))
    fps_at: dict[int, dict[str, str]] = {}
    with tempfile.TemporaryDirectory() as tmp:
        for rnd in need:
            commit = _record_commit(rnd)
            if commit is None:
                print(f"round {rnd}: no record commit found — skipped")
                continue
            dest = os.path.join(tmp, f"r{rnd}")
            os.makedirs(dest, exist_ok=True)
            # the driver ran on the record commit's PARENT tree
            if not _archive_tree(commit + "^", dest):
                print(f"round {rnd}: archive of {commit}^ failed — skipped")
                continue
            try:
                fps_at[rnd] = P.fingerprint_all(dest)
            except Exception as exc:  # historical trees may predate a registry
                print(f"round {rnd}: fingerprint failed ({exc}) — skipped")
        sidecar: dict[str, dict] = {
            "__meta__": {"latest_round": latest, "prev_round": prev}
        }
        for query, rnd in sorted(greens.items()):
            sidecar[query] = {
                "round": rnd,
                "fp": fps_at.get(rnd, {}).get(query),
                # head/prev trees: lets the rotation spot HOT churn — a
                # query whose closure changed in the latest round (or in
                # uncommitted edits vs head) re-verifies before the
                # stale-changed cohort
                "fp_head": fps_at.get(latest, {}).get(query),
                "fp_prev": (fps_at.get(prev, {}).get(query) if prev else None),
            }
    with open(SIDECAR, "w") as fh:
        json.dump(sidecar, fh, indent=1, sort_keys=True)
        fh.write("\n")
    n_fp = sum(
        1 for k, v in sidecar.items() if k != "__meta__" and v["fp"]
    )
    print(
        f"wrote {SIDECAR}: {len(sidecar) - 1} queries, "
        f"{n_fp} with historical fingerprints "
        f"(last-green rounds {min(greens.values())}..{latest})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
