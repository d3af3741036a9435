"""A/B: Spark runtime bloom-filter join pruning on a beyond-broadcast
selective join (li64, 38.4M-row probe side).

Shape under test: lineitem ⋈ dim on l_orderkey where dim keeps 20% of
the key space (l_orderkey % 5 = 0) and is forced beyond the broadcast
threshold, so the join is shuffle-based and 80% of probe rows are
droppable before the exchange. Runtime bloom filtering
(spark.sql.optimizer.runtime.bloomFilter.*) injects a might_contain
filter on the probe side built from the creation side at runtime —
exactly the row-level semi-join pushdown a 100 TB fact-dim join needs
when the dim outgrows broadcast.

Fresh JVM per leg, two repetitions, noop sink. Results printed as JSON
lines; adjudicate into PERF.md.
"""
import json
import os
import subprocess

SNIPPET = r'''
import time, sys
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from consent_based_conversion_adjustments_spark.session import get_spark
spark = get_spark("bloom-ab", extra_conf={{
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "{flag}",
    # defaults gate injection on >10GB application-side scans and <10MB
    # creation sides — neither matches a 64x local tile, so open both
    # gates to measure the mechanism itself at this scale
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "256MB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}})
li = spark.read.parquet("/tmp/scale64/li64/lineitem.parquet")
# the injection rule (InjectRuntimeFilter) requires a SELECTIVE
# predicate on the creation side's plan — keep the filter in-plan
# (a pre-materialized dim read back from parquet never qualifies)
dim = (
    spark.read.parquet("/tmp/scale64/li64/lineitem.parquet")
    .select("l_orderkey").distinct()
    .filter(F.col("l_orderkey") % 50 == 0)
    .withColumn("dim_payload", F.col("l_orderkey") * 2)
)
t0 = time.time()
out = (
    li.join(dim, "l_orderkey")
    .agg(F.sum("l_extendedprice").alias("rev"), F.count("*").alias("n"))
)
out.write.format("noop").mode("overwrite").save()
print("RESULT %.3f" % (time.time() - t0))
p = out._jdf.queryExecution().executedPlan().toString()
print("BLOOM", "might_contain" in p)
'''


def run(flag: str) -> dict:
    # scale protocol: 64x shuffle volume goes to disk, not tmpfs
    env = dict(os.environ, SPARK_LOCAL_DIRS="/tmp/spark-local-scale")
    out = subprocess.run(
        ["python", "-u", "-c", SNIPPET.format(flag=flag)],
        capture_output=True,
        text=True,
        timeout=1800,
        env=env,
    )
    rec = {"bloom": flag}
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            rec["sec"] = float(line.split()[1])
        elif line.startswith("BLOOM"):
            rec["plan_has_bloom"] = line.split()[1] == "true" or line.split()[1] == "True"
    if "sec" not in rec:
        rec["error"] = out.stderr[-1500:]
    return rec


if __name__ == "__main__":
    rows = []
    for rep in range(2):
        for flag in ("false", "true"):
            rec = run(flag)
            rec["rep"] = rep
            print(json.dumps(rec))
            rows.append(rec)
    with open("/root/repo/tools/scale/results_bloom_ab.json", "w") as f:
        json.dump(rows, f, indent=1)
