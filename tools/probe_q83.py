#!/usr/bin/env python
"""q83 decomposition at a tier: scan floor, hourly agg, full rollup."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
tier = sys.argv[1] if len(sys.argv) > 1 else "64x"
tier_dir = os.path.join("/root/repo/.bench_cache", tier)
from bench import _pretouch
from coldata_spark.session import get_spark, tune_for_input, dir_bytes
from coldata_spark.tables import load
from coldata_spark import registry
from pyspark.sql import functions as F

_pretouch(os.path.join(tier_dir, "events.parquet"))
spark = get_spark(app_name="probe_q83")
tune_for_input(spark, dir_bytes(tier_dir))
print("aqe:", spark.conf.get("spark.sql.adaptive.enabled"),
      "parts:", spark.conf.get("spark.sql.shuffle.partitions"))
ev = load(spark, tier_dir, "events")
hour_e = F.expr("(unix_micros(ts) div 3600000000) * 3600").alias("hour_e")

variants = {
    "scan_count": lambda: ev.select("ts").count(),
    "hour_expr_count": lambda: ev.select(hour_e).filter(F.col("hour_e") > 0).count(),
    "hourly_agg": lambda: ev.select(hour_e, "value").groupBy("hour_e")
        .agg(F.count("*"), F.sum("value")).collect(),
    "full_q83": lambda: registry.specs()["q83_hypertable_rollup"].fn(spark, tier_dir).collect(),
}
out = {}
for name, fn in variants.items():
    fn()
    runs = []
    for _ in range(5):
        t0 = time.perf_counter(); fn(); runs.append(round(time.perf_counter()-t0, 3))
    out[name] = runs
print(json.dumps({k: min(v) for k, v in out.items()}))
spark.stop()
