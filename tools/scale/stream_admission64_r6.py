import json, os, shutil, subprocess, sys

LOCAL_DIR = "/tmp/spark-local-stream64"
SNIP = r'''
import time, sys, shutil
sys.path.insert(0, "/root/repo")
from consent_based_conversion_adjustments_spark.session import get_spark
from consent_based_conversion_adjustments_spark.streaming.admission import AdmissionStore
import pyspark.sql.functions as F
spark = get_spark("stream64")
import bench
bench.warmup(spark)
shutil.rmtree("/tmp/adm_store64", ignore_errors=True)
docs = spark.read.parquet("/tmp/scale64/sf6.4/documents.parquet")
store = AdmissionStore("/tmp/adm_store64", threshold=0.8)
t0 = time.time()
store.process_batch(docs.filter(F.col("doc_id") % 4 < 2), 0)
t1 = time.time()
store.process_batch(docs.filter(F.col("doc_id") % 4 == 2), 1)
t2 = time.time()
store.process_batch(docs.filter(F.col("doc_id") % 4 == 3), 2)
t3 = time.time()
n_adm = store.admitted(spark).count()
n_rel = store.relations(spark).count()
print("RESULT %.3f epochs %.3f/%.3f/%.3f admitted %d relations %d"
      % (t3 - t0, t1 - t0, t2 - t1, t3 - t2, n_adm, n_rel))
'''
shutil.rmtree(LOCAL_DIR, ignore_errors=True)
os.makedirs(LOCAL_DIR, exist_ok=True)
env = dict(os.environ, SPARK_LOCAL_DIRS=LOCAL_DIR)
p = subprocess.run([sys.executable, "-c", SNIP], capture_output=True,
                   text=True, cwd="/root/repo", timeout=5400, env=env)
for line in p.stdout.splitlines():
    if line.startswith("RESULT "):
        print(line)
        break
else:
    print(p.stdout[-3000:], p.stderr[-3000:])
shutil.rmtree(LOCAL_DIR, ignore_errors=True)
