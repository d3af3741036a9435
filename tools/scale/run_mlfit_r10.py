"""Round-10 rung: the on-cluster GLM trainers' flat-state scale law.

mlfit's claim is that a Newton step (or the OLS normal equations) costs
``iters`` data scans with d(d+3)/2 doubles of aggregation state — the
same class as the covariance fit, so a 64x corpus should cost ~64x scan
time and IDENTICAL driver traffic. This measures the full registered
doc_logreg_quality shape (feature projection + 2 Newton steps + scoring
to a noop sink) and the ols_fit at sf0.1 / 8x / 64x identical-copy
document tiles, fresh JVM per leg.

Run on an IDLE host:  python tools/scale/run_mlfit_r10.py
Results: tools/scale/results_mlfit_r10.json
"""

import json
import subprocess

from run_scale_pipeline_r9 import build_copy_tiles

SNIPPET = r'''
import time, sys
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from consent_based_conversion_adjustments_spark.session import get_spark
spark = get_spark("mlfit-rung")
import bench
bench.SF_DIR = "/root/testdata/sf0.1"
bench.warmup(spark)
sf, which = "{sf}", "{which}"

from consent_based_conversion_adjustments_spark.operators import mlfit as M
from consent_based_conversion_adjustments_spark.operators import text as X
from consent_based_conversion_adjustments_spark.operators.text import tokens

docs = spark.read.parquet(sf + "/documents.parquet")
t0 = time.time()  # end-to-end: includes the (possibly eager) feature pass
toks = tokens("text")
praw = X.punct_ratio("text")
quality = X.quality_score_in(toks, praw, X.stopword_ratio_in(toks))
y = (X.language_id_in(toks) == F.lit("en")).cast("double")
feats = docs.select(
    F.lit(1.0).alias("x0"),
    quality.alias("x1"),
    F.log(F.lit(1.0) + F.size(toks).cast("double")).alias("x2"),
    y.alias("y"),
)
if "{variant}" == "pinned":
    # the registered queries' shape since round 10: persist (codegen
    # intact — localCheckpoint's RDD conversion drops the projection
    # to interpreted eval, tripling the materialization scan)
    feats = feats.persist()
fx = [F.col("x0"), F.col("x1"), F.col("x2")]
if which == "logreg":
    w = M.logreg_newton_fit(feats, fx, F.col("y"), iters=2)
    feats.select(M.logreg_scores(feats, fx, w)).write.format(
        "noop").mode("overwrite").save()
else:
    # the registered doc_quality_ols shape: regress the composite
    # quality onto (1, ln(1+n_tokens), stopword_ratio) + residual pass
    ofeats = docs.select(
        F.lit(1.0).alias("x0"),
        F.log(F.lit(1.0) + F.size(toks).cast("double")).alias("x1"),
        X.stopword_ratio_in(toks).alias("x2"),
        quality.alias("yq"),
    )
    w = M.ols_fit(ofeats, fx, F.col("yq"))
    resid = F.col("yq") - M.linear_predict(fx, w)
    ofeats.agg(F.sqrt(F.avg(resid * resid)).alias("r")).first()
print("RESULT %.3f" % (time.time() - t0), flush=True)
print("VOLUME rows", docs.count(), flush=True)
print("WEIGHTS", " ".join(repr(x) for x in w), flush=True)
'''


def run(sf: str, which: str, variant: str = "plain", timeout: int = 1800) -> dict:
    rec: dict = {"sf": sf, "which": which, "variant": variant}
    out = subprocess.run(
        ["python", "-c", SNIPPET.format(sf=sf, which=which, variant=variant)],
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            rec["sec"] = float(line.split()[1])
        elif line.startswith("VOLUME"):
            rec["rows"] = int(line.split()[2])
        elif line.startswith("WEIGHTS"):
            rec["weights"] = [float(x) for x in line.split()[1:]]
    if "sec" not in rec:
        rec["error"] = out.stderr[-2000:]
    return rec


if __name__ == "__main__":
    docs8 = build_copy_tiles(8, "/tmp/scale64/docs8_copy_r9")
    docs64 = build_copy_tiles(64, "/tmp/scale64/docs64_copy_r9")
    import sys

    variant = sys.argv[1] if len(sys.argv) > 1 else "plain"
    out_file = (
        "/root/repo/tools/scale/results_mlfit_r10.json"
        if variant == "plain"
        else f"/root/repo/tools/scale/results_mlfit_r10_{variant}.json"
    )
    rows = []
    for which in ("logreg", "ols"):
        # the registered doc_quality_ols is deliberately unpinned (see
        # PERF.md round-10), so the pin variant only applies to logreg
        v = variant if which == "logreg" else "plain"
        for sf in ("/root/testdata/sf0.1", docs8, docs64):
            rec = run(sf, which, v)
            print(json.dumps(rec), flush=True)
            rows.append(rec)
            with open(out_file, "w") as f:
                json.dump(rows, f, indent=1)
