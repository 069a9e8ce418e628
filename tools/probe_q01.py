#!/usr/bin/env python
"""q01 decomposition at a tier (round-7 verdict ask #3): bare-scan floor,
filter-only, agg variants — attribute the 1.9-2.7x ratio to scan vs
expression vs aggregation, fresh JVM, pinned protocol."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
tier = sys.argv[1] if len(sys.argv) > 1 else "256x"
tier_dir = os.path.join("/root/repo/.bench_cache", tier)
from bench import _pretouch
from coldata_spark.session import get_spark, tune_for_input, dir_bytes
from coldata_spark.tables import load
from coldata_spark import registry
from pyspark.sql import functions as F
import duckdb

_pretouch(os.path.join(tier_dir, "lineitem.parquet"))
spark = get_spark(app_name="probe_q01")
tune_for_input(spark, dir_bytes(tier_dir))
li = load(spark, tier_dir, "lineitem")
cutoff = F.lit("1998-09-02").cast("timestamp")
disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
charge = disc_price * (1 + F.col("l_tax"))

variants = {
    # bare columnar scan floor: count over the filter column only
    "scan_count": lambda: li.select("l_shipdate").count(),
    # filter + count: adds predicate evaluation
    "filter_count": lambda: li.filter(F.col("l_shipdate") <= cutoff).count(),
    # sums without derived expressions
    "agg_plain_sums": lambda: li.filter(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.sum("l_extendedprice"), F.count("*")).collect(),
    # the full q01
    "full_q01": lambda: registry.specs()["q01_pricing_summary"].fn(spark, tier_dir).collect(),
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
    "scan_count": "SELECT count(l_shipdate) FROM lineitem",
    "filter_count": "SELECT count(*) FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'",
    "agg_plain_sums": "SELECT l_returnflag, l_linestatus, sum(l_quantity), sum(l_extendedprice), count(*) FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' GROUP BY 1,2",
    "full_q01": registry.specs()["q01_pricing_summary"].sql,
}
for name, sql in dsql.items():
    con.execute(sql).df()
    runs = []
    for _ in range(5):
        t0 = time.perf_counter(); con.execute(sql).df(); runs.append(round(time.perf_counter()-t0, 3))
    out["duck_" + name] = runs
con.close()
print(json.dumps(out, indent=1))
