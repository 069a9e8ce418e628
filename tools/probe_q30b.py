#!/usr/bin/env python
"""Micro-decompose knn_join plan-build cost at a tier."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
tier_dir = os.path.join("/root/repo/.bench_cache", sys.argv[1] if len(sys.argv)>1 else "256x")

from coldata_spark.session import get_spark, tune_for_input, dir_bytes
from coldata_spark import registry
from coldata_spark.queries.vector_queries import _queries_df
from coldata_spark.tables import load
from coldata_spark.operators import similarity as S

spark = get_spark(app_name="probe_q30b")
tune_for_input(spark, dir_bytes(tier_dir))
spec = registry.specs()["q30_knn_cosine_topk"]
spec.fn(spark, "/root/testdata/sf0.001").collect()
spec.fn(spark, tier_dir).collect()

def t(name, fn, n=5):
    runs=[]
    for _ in range(n):
        t0=time.perf_counter(); r=fn(); runs.append(round(time.perf_counter()-t0,4))
    print(name, runs); return r

q = _queries_df(spark, tier_dir)
emb = load(spark, tier_dir, "embeddings").select("vec_id","embedding")
t("build_queries_df", lambda: _queries_df(spark, tier_dir))
t("refuse_at_scale(stats)", lambda: S._estimated_bytes(q))
t("q_collect", lambda: q.select("q_id","q_vec").collect())
t("est_bytes_vectors", lambda: S._estimated_bytes(emb))
t("rdd_getNumPartitions", lambda: emb.rdd.getNumPartitions())
t("sized_for_arrow", lambda: S._sized_for_arrow_stage(emb))
t("knn_join_build_only", lambda: S.knn_join(_queries_df(spark, tier_dir), emb, k=4, metric="COSINE", exclude_self=True))
df = S.knn_join(_queries_df(spark, tier_dir), emb, k=4, metric="COSINE", exclude_self=True)
t("first_collect_fresh_plan", lambda: S.knn_join(_queries_df(spark, tier_dir), emb, k=4, metric="COSINE", exclude_self=True).collect(), n=3)
t("recollect_same_plan", lambda: df.collect())
spark.stop()
