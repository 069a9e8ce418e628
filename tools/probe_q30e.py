#!/usr/bin/env python
"""Experiment: final-merge variants for knn_join at a tier.
Variants: current (window over AQE exchange), explicit repartition(8,q_id)
pre-window, AQE off session-wide (control)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
tier_dir = os.path.join("/root/repo/.bench_cache", sys.argv[1] if len(sys.argv)>1 else "256x")
from coldata_spark.session import get_spark, tune_for_input, dir_bytes
from coldata_spark.tables import load
from coldata_spark.operators import similarity as S
from coldata_spark.queries.vector_queries import _queries_df
from pyspark.sql import functions as F, Window as W

spark = get_spark(app_name="probe_q30e")
tune_for_input(spark, dir_bytes(tier_dir))
print("aqe:", spark.conf.get("spark.sql.adaptive.enabled"),
      "shuffle.partitions:", spark.conf.get("spark.sql.shuffle.partitions"))

def build(variant):
    q = _queries_df(spark, tier_dir)
    emb = load(spark, tier_dir, "embeddings").select("vec_id", "embedding")
    scored, _nq = S._knn_scored_arrow(q, emb, 4, "COSINE", "q_id", "q_vec", "vec_id", "embedding", 6, True, None)
    scored = scored.withColumn("score", F.round(F.col("score"), 6))
    order = [F.col("score").desc(), F.col("vec_id").asc()]
    if variant == "repart8":
        scored = scored.repartition(8, F.col("q_id"))
    w = W.partitionBy("q_id").orderBy(*order)
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 4)

def run(name, variant, n=5):
    build(variant).collect()  # warm codegen
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        build(variant).collect()
        runs.append(round(time.perf_counter() - t0, 3))
    print(name, runs)

run("current", "none")
run("repart8", "repart8")
spark.conf.set("spark.sql.adaptive.enabled", "false")
run("current_aqe_off", "none")
run("repart8_aqe_off", "repart8")
spark.stop()
