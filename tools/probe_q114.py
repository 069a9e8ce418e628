#!/usr/bin/env python
"""q114 decomposition at a tier: scan, hash+registers map stage, full HLL
vs the DuckDB oracle's equivalent stages."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
tier = sys.argv[1] if len(sys.argv) > 1 else "16x"
tier_dir = os.path.join("/root/repo/.bench_cache", tier)
from bench import _pretouch
from coldata_spark.session import get_spark, tune_for_input, dir_bytes
from coldata_spark.tables import load
from coldata_spark import registry
from coldata_spark.operators import sketches as SK
from pyspark.sql import functions as F
import duckdb

_pretouch(os.path.join(tier_dir, "lineitem.parquet"))
spark = get_spark(app_name="probe_q114")
tune_for_input(spark, dir_bytes(tier_dir))
li = load(spark, tier_dir, "lineitem").select("l_returnflag", "l_orderkey")

variants = {
    "scan_count": lambda: li.count(),
    "hash_registers": lambda: SK.hll_registers(
        li.select(F.col("l_returnflag").alias("flag"), "l_orderkey"), ["flag"], "l_orderkey"
    ).count(),
    "full_q114": lambda: registry.specs()["q114_hll_distinct"].fn(spark, tier_dir).collect(),
}
out = {}
for name, fn in variants.items():
    fn()
    runs = []
    for _ in range(5):
        t0 = time.perf_counter(); fn(); runs.append(round(time.perf_counter()-t0, 3))
    out[name] = runs
spark.stop()

con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")
p = os.path.join(tier_dir, "lineitem.parquet")
src = f"{p}/*.parquet" if os.path.isdir(p) else p
con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{src}')")
dsql = {
    "scan_count": "SELECT count(*) FROM (SELECT l_returnflag, l_orderkey FROM lineitem)",
    "full_q114": registry.specs()["q114_hll_distinct"].sql,
}
for name, sql in dsql.items():
    con.execute(sql).df()
    runs = []
    for _ in range(5):
        t0 = time.perf_counter(); con.execute(sql).df(); runs.append(round(time.perf_counter()-t0, 3))
    out["duck_" + name] = runs
con.close()
print(json.dumps({k: min(v) for k, v in out.items()}))
