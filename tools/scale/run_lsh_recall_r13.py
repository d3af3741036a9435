"""Round-13 rung: re-measure the LSH recall ledger on ORGANIC embeddings
(VERDICT r12 §Next #1).

The round-10 ledger (``RECALL_LEDGER_64X``) was measured on the
rotation-tiled synthetic corpus (run_scale_r9.build_tiles) — a
weak-angular-gap construction whose neighbor structure does not resemble
the driver-generated embeddings (label-clustered Gaussian directions).
lsh_recall_plan's recall floor is a stated CONTRACT resting on that
synthetic evidence; this rung replaces it with measurements on an
organically-grown corpus: bootstrap-resample the sf0.1 embeddings
``FACTOR``x with sigma=0.01 Gaussian jitter + renormalization (the
run_sf1_corpus_r12 recipe — cluster structure and neighbor-angle
distribution survive, exact equality doesn't).

Also fixes a recorded-constant error this rung's arithmetic exposed:
``_LEDGER_SIDES`` claimed the r10 corpus was 1.28M rows per side, but
build_tiles(64) of the 2000-row sf0.1 table is 128k rows — the uniform
occupancy model (mass ~ t*n_b*n_q/2^p) confirms it (p=10/t=8 predicts
128M vs 170M measured at 128k sides; 12.8G at 1.28M sides). The
organic ledger records its true sides, measured here.

Protocol (PERF.md bench hygiene): fresh JVM per leg, bench warmup,
noop-sink timing, serialized on an idle host. Ground truth = exact
euclidean top-k for a ~1000-probe sample via chunked BLAS mapInPandas,
cached as parquet (reuses the r10 snippets verbatim).

Legs:
  organic 64x (128k rows)  — the ledger grid: p in {8,10,12} x tables
  organic 256x (512k rows) — one out-of-sample validation point for the
                             pair-product mass scaling + recall-transfer
                             laws the planner applies across scale.

Run:   python tools/scale/run_lsh_recall_r13.py
Writes tools/scale/results_lsh_recall_r13.json.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, HERE)

_spec = importlib.util.spec_from_file_location(
    "run_lsh_recall_r10", os.path.join(HERE, "run_lsh_recall_r10.py")
)
r10 = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(r10)

# executor workers unpickle package closures — they need the repo on
# PYTHONPATH regardless of this process's cwd (sys.path fixes only the
# driver side of each snippet subprocess)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

K = r10.K
SRC = "/root/testdata/sf0.1"
BASE = "/tmp/scale_lsh_organic"
SEED = 13
SIGMA = 0.01
OUT = os.path.join(HERE, "results_lsh_recall_r13.json")


def make_organic(factor: int) -> str:
    """Bootstrap-resample sf0.1 embeddings ``factor``x with Gaussian
    jitter + renorm (run_sf1_corpus_r12.make_sf1_corpus recipe)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = os.path.join(BASE, f"emb{factor}x")
    path = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(path):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED + factor)
    df = pq.read_table(os.path.join(SRC, "embeddings.parquet")).to_pandas()
    n = len(df) * factor
    boot = df.iloc[rng.integers(0, len(df), size=n)].reset_index(drop=True)
    M = np.array(boot["embedding"].tolist(), dtype="float32")
    M = M + rng.normal(scale=SIGMA, size=M.shape).astype("float32")
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    boot["embedding"] = list(M)
    boot["vec_id"] = np.arange(1, n + 1, dtype="int64")
    pq.write_table(pa.Table.from_pandas(boot, preserve_index=False), path)
    print(f"wrote {path}: {n} organic vecs (x{factor}, jitter+renorm)")
    return out_dir


def ensure_exact(sf: str, sample_mod: int, tag: str) -> str:
    path = os.path.join(BASE, f"exact_knn_{tag}")
    if not os.path.exists(path):
        rec = r10.run_snippet(
            r10.EXACT_SNIPPET.format(
                sf=sf, sample_mod=sample_mod, k=K, out_path=path
            )
        )
        print(f"exact[{tag}]: {rec}", flush=True)
        if "error" in rec:
            raise RuntimeError(rec["error"])
    return path


def main() -> int:
    org64 = make_organic(64)     # 128k rows — the r10 rung's true size
    org256 = make_organic(256)   # 512k rows — out-of-sample validation
    exact64 = ensure_exact(org64, 128, "org64")
    exact256 = ensure_exact(org256, 512, "org256")
    legs = [
        # (tag, sf_dir, exact, sample_mod, n_planes, n_tables)
        ("org64", org64, exact64, 128, 8, 8),
        ("org64", org64, exact64, 128, 10, 4),
        ("org64", org64, exact64, 128, 10, 8),
        ("org64", org64, exact64, 128, 10, 16),
        ("org64", org64, exact64, 128, 12, 8),
        ("org64", org64, exact64, 128, 12, 16),
        ("org256", org256, exact256, 512, 12, 8),
        ("org256", org256, exact256, 512, 12, 16),
    ]
    rows = []
    for tag, sf, exact, mod, planes, tables in legs:
        rec = r10.run_snippet(
            r10.LEG_SNIPPET.format(
                sf=sf, n_planes=planes, n_tables=tables,
                sample_mod=mod, k=K, exact_path=exact,
            )
        )
        rec.update(
            corpus=tag, sf=sf, n_planes=planes, n_tables=tables,
            recall=(
                round(rec["hits"] / rec["n_exact"], 4)
                if rec.get("n_exact")
                else None
            ),
        )
        print(json.dumps(rec), flush=True)
        rows.append(rec)
        with open(OUT, "w") as f:
            json.dump(rows, f, indent=1)
            f.write("\n")
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
