#!/usr/bin/env python
"""Why does an 8-row query-side collect cost 0.23s? Compare variants."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
tier_dir = os.path.join("/root/repo/.bench_cache", sys.argv[1] if len(sys.argv)>1 else "256x")
from coldata_spark.session import get_spark, tune_for_input, dir_bytes
from coldata_spark.tables import load
from pyspark.sql import functions as F
spark = get_spark(app_name="probe_q30c")
tune_for_input(spark, dir_bytes(tier_dir))
emb = load(spark, tier_dir, "embeddings")
def t(name, fn, n=5):
    for _ in range(2): fn()
    runs=[]
    for _ in range(n):
        t0=time.perf_counter(); fn(); runs.append(round(time.perf_counter()-t0,4))
    print(name, runs)

qf = emb.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
ql = qf.limit(8)
t("collect_filter_limit", lambda: ql.collect())
t("collect_filter_nolimit", lambda: qf.collect())
t("toPandas_filter_limit", lambda: ql.toPandas())
t("collect_limit_first_file", lambda: spark.read.parquet(os.path.join(tier_dir,"embeddings.parquet")).filter(F.col("vec_id")<8).limit(8).collect())
print("numfiles:", len([f for f in os.listdir(os.path.join(tier_dir,"embeddings.parquet")) if f.endswith(".parquet")]) if os.path.isdir(os.path.join(tier_dir,"embeddings.parquet")) else "single file")
print("emb partitions:", qf.rdd.getNumPartitions())
spark.stop()
