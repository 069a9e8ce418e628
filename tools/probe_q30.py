#!/usr/bin/env python
"""Decompose q30's per-run cost at a tier: plan build vs query-side
collect vs main job (scoring + merge).  Standalone, fresh JVM."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

tier = sys.argv[1] if len(sys.argv) > 1 else "256x"
tier_dir = os.path.join("/root/repo/.bench_cache", tier)

from coldata_spark.session import get_spark, tune_for_input, dir_bytes
from coldata_spark import registry
from coldata_spark.queries.vector_queries import _queries_df
from coldata_spark.tables import load

spark = get_spark(app_name="probe_q30")
tune_for_input(spark, dir_bytes(tier_dir))
spec = registry.specs()["q30_knn_cosine_topk"]
spec.fn(spark, "/root/testdata/sf0.001").collect()
spec.fn(spark, tier_dir).collect()
spark._jvm.System.gc()

out = {}
for name, fn in [
    ("plan_build", lambda: spec.fn(spark, tier_dir)),
    ("query_collect", lambda: _queries_df(spark, tier_dir).select("q_id", "q_vec").collect()),
    ("full", lambda: spec.fn(spark, tier_dir).collect()),
]:
    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        fn()
        runs.append(round(time.perf_counter() - t0, 3))
    out[name] = runs

# main job alone: build plan once, collect repeatedly (re-executes collect
# job + main job each time; subtracting query_collect isolates scoring+merge)
df = spec.fn(spark, tier_dir)
runs = []
for _ in range(5):
    t0 = time.perf_counter()
    df.collect()
    runs.append(round(time.perf_counter() - t0, 3))
out["collect_prebuilt_plan"] = runs
print(json.dumps(out))
spark.stop()
