"""sf1.0 rung for the corpus/dedup headline set + the auto-dispatch
flagship legs (VERDICT r11 §Next #4 and #1's PERF note).

Why a NEW resample instead of the 64x tiles: identical-copy tiles
flatter dedup — every duplicate is EXACT, so the identity-class collapse
absorbs the whole blow-up and the banding join never sees a hard
candidate set. This rung bootstrap-resamples the sf0.1 documents 10x
(TPC-H-ish sf1.0 proportions, 50k docs) and then MUTATES each copy by
dropping ~2% of its tokens (seeded, per-copy): copies become NEAR
duplicates (word-level Jaccard ~0.96, above the 0.8 threshold) that the
MinHash S-curve must actually catch — the honest regime, where neither
exact fingerprints nor the identity collapse can short-circuit the work.
Organic marginals (length, language mix, source mix, quality scores) are
preserved by construction. Embeddings are bootstrapped 10x with sigma =
0.01 gaussian jitter + renormalization — near-dup structure survives,
exact equality doesn't.

The cocoa auto-dispatch legs reuse the r11 customer rung
(tools/scale/run_sf1_cocoa_r11.make_sf1) and time
knn/radius/percentile_adjust with impl="auto" at both scales — the
acceptance check that the auto route reproduces the rung's fast legs
(broadcast under the crossover at sf0.1, LSH above it at sf1.0).

Protocol: fresh JVM per leg, bench.py's warmup + noop-sink timing,
serialized on an idle host.

Run:  python tools/scale/run_sf1_corpus_r12.py
Writes tools/scale/results_sf1_corpus_r12.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, HERE)
SRC = "/root/testdata/sf0.1"
DST = "/tmp/scale_sf1_corpus"
FACTOR = 10
SEED = 12
DROP_RATE = 0.02

CORPUS_SET = [
    "corpus_pretrain_ids",
    "dedup_minhash",
    "dedup_minhash_collapsed",
    "dedup_clusters",
    "semdedup_admission",
]
AUTO_SET = ["knn_adjust", "radius_adjust", "percentile_adjust"]


def make_sf1_corpus() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(DST, exist_ok=True)
    for fname in os.listdir(SRC):
        if fname in ("documents.parquet", "embeddings.parquet"):
            continue
        link = os.path.join(DST, fname)
        if not os.path.exists(link):
            os.symlink(os.path.join(SRC, fname), link)
    rng = np.random.default_rng(SEED)

    doc_path = os.path.join(DST, "documents.parquet")
    if not os.path.exists(doc_path):
        df = pq.read_table(os.path.join(SRC, "documents.parquet")).to_pandas()
        n = len(df) * FACTOR
        boot = df.iloc[rng.integers(0, len(df), size=n)].reset_index(drop=True)

        def mutate(text: str) -> str:
            words = text.split(" ")
            if len(words) < 4:
                return text
            keep = rng.uniform(size=len(words)) >= DROP_RATE
            keep[0] = True  # never empty a doc
            return " ".join(w for w, k in zip(words, keep) if k)

        boot["text"] = [mutate(t) for t in boot["text"]]
        boot["doc_id"] = np.arange(1, n + 1, dtype="int64")
        boot["n_chars"] = boot["text"].str.len().astype("int64")
        pq.write_table(pa.Table.from_pandas(boot, preserve_index=False), doc_path)
        print(f"wrote {doc_path}: {n} docs (bootstrap x{FACTOR}, {DROP_RATE:.0%} token drop)")

    emb_path = os.path.join(DST, "embeddings.parquet")
    if not os.path.exists(emb_path):
        df = pq.read_table(os.path.join(SRC, "embeddings.parquet")).to_pandas()
        n = len(df) * FACTOR
        boot = df.iloc[rng.integers(0, len(df), size=n)].reset_index(drop=True)
        M = np.array(boot["embedding"].tolist(), dtype="float32")
        M = M + rng.normal(scale=0.01, size=M.shape).astype("float32")
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        boot["embedding"] = list(M)
        boot["vec_id"] = np.arange(1, n + 1, dtype="int64")
        pq.write_table(pa.Table.from_pandas(boot, preserve_index=False), emb_path)
        print(f"wrote {emb_path}: {n} vecs (bootstrap x{FACTOR}, jitter+renorm)")


def solo(name: str, sf_dir: str, timeout: float = 1200.0) -> float | None:
    env = dict(os.environ)
    env["PYTHONPATH"] = HERE + os.pathsep + env.get("PYTHONPATH", "")
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(HERE, "bench.py"), "--solo", name],
            env=env, capture_output=True, text=True, timeout=timeout,
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


_AUTO_RUNNER = """
import json, sys, time
sys.path.insert(0, {here!r})
import bench
from consent_based_conversion_adjustments_spark.plans import cocoa_queries
from consent_based_conversion_adjustments_spark.session import get_spark
spark = get_spark()
bench.warmup(spark)
t0 = time.time()
bench.force(getattr(cocoa_queries, {fn!r})(spark, bench.SF_DIR, impl="auto"))
print(json.dumps({{"query": {fn!r}, "sec": round(time.time() - t0, 3)}}))
"""


def solo_auto(fn: str, sf_dir: str, timeout: float = 1200.0) -> float | None:
    """Fresh-JVM leg of a cocoa adjust query under impl='auto' — the same
    warmup + noop-sink protocol as bench.py --solo, parameterized over the
    impl the board entries pin."""
    env = dict(os.environ)
    env["PYTHONPATH"] = HERE + os.pathsep + env.get("PYTHONPATH", "")
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    code = _AUTO_RUNNER.format(here=HERE, fn=fn)
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            env=env, capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        print(f"  !! auto:{fn} @ {sf_dir}: timed out", file=sys.stderr)
        return None
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if rec.get("query") == fn:
            return float(rec["sec"])
    print(f"  !! auto:{fn} @ {sf_dir}: no timing; stderr tail:", file=sys.stderr)
    print("\n".join(out.stderr.strip().splitlines()[-5:]), file=sys.stderr)
    return None


def main() -> int:
    make_sf1_corpus()
    # tools/ is not a package — load the r11 customer-rung builder by path
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "run_sf1_cocoa_r11",
        os.path.join(HERE, "tools", "scale", "run_sf1_cocoa_r11.py"),
    )
    cocoa_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cocoa_mod)
    COCOA_DST = cocoa_mod.DST
    cocoa_mod.make_sf1()
    results = []
    for sf_label, sf_dir in (("sf0.1", SRC), ("sf1.0", DST)):
        for name in CORPUS_SET:
            sec = solo(name, sf_dir)
            print(f"  {name} @ {sf_label}: {sec}s", flush=True)
            results.append({"query": name, "sf": sf_label, "sec": sec})
    for sf_label, sf_dir in (("sf0.1", SRC), ("sf1.0", COCOA_DST)):
        for fn in AUTO_SET:
            sec = solo_auto(fn, sf_dir)
            print(f"  auto:{fn} @ {sf_label}: {sec}s", flush=True)
            results.append(
                {"query": f"auto:{fn}", "sf": sf_label, "sec": sec}
            )
    path = os.path.join(HERE, "tools", "scale", "results_sf1_corpus_r12.json")
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
        fh.write("\n")
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
