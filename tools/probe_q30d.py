#!/usr/bin/env python
"""Count Spark jobs + decompose build/collect per q30 run (new code)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
tier_dir = os.path.join("/root/repo/.bench_cache", sys.argv[1] if len(sys.argv)>1 else "256x")
from coldata_spark.session import get_spark, tune_for_input, dir_bytes
from coldata_spark import registry
spark = get_spark(app_name="probe_q30d")
tune_for_input(spark, dir_bytes(tier_dir))
spec = registry.specs()["q30_knn_cosine_topk"]
spec.fn(spark, "/root/testdata/sf0.001").collect()
spec.fn(spark, tier_dir).collect()
spark._jvm.System.gc()
st = spark.sparkContext.statusTracker()
for i in range(6):
    j0 = set(st.getJobIdsForGroup() or [])
    t0 = time.perf_counter()
    df = spec.fn(spark, tier_dir)
    t1 = time.perf_counter()
    df.collect()
    t2 = time.perf_counter()
    j1 = set(st.getJobIdsForGroup() or [])
    new_jobs = sorted(j1 - j0)
    stages = {j: (st.getJobInfo(j).stageIds if st.getJobInfo(j) else []) for j in new_jobs}
    print(f"run{i}: build={t1-t0:.3f} collect={t2-t1:.3f} jobs={len(new_jobs)} stages={ {j: len(s) for j,s in stages.items()} }")
spark.stop()
