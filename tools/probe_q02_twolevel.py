#!/usr/bin/env python
"""q02 two-level aggregation experiment (round-8 verdict #5): does
aggregating on a PREFIX of the 3.5M-group key move the profiled hash-agg
engine constant?

The registered q02 groups the joined survivors by the full display key
(o_orderkey, o_orderdate, o_orderpriority) — a bigint + timestamp +
string composite hashed per row.  o_orderkey functionally determines the
other two, so the same answer is computable with the hash key narrowed
to the single bigint prefix, two ways:

  * prefix_anyvalue — level 1: groupBy(o_orderkey) with
    sum(revenue) + any_value(o_orderdate/o_orderpriority) (dims ride as
    agg payload, not key bytes); level 2: the top-10 sort.
  * prefix_rejoin — level 1: groupBy(o_orderkey) over (key, revenue)
    only — nothing but 2 bigint/double columns in the agg — top-10,
    then re-join orders to attach the display dims to 10 rows.

Both run the identical join tree as the baseline (same shuffle-join
gate; ClusteredDistribution(o_orderkey, ...) is satisfied by the join's
HashPartitioning(o_orderkey), so NO variant adds an exchange — the delta
isolated is agg-key width alone).  Round-3's profiling already showed
pre-aggregating lineitem BEFORE the join loses (1.8x at 64x, q02
docstring); this probe is the missing control on the other side of the
join.  Fresh JVM, pinned pretouch protocol, best-of-5 warm.

Usage: python tools/probe_q02_twolevel.py [tier]      (default 256x)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

tier = sys.argv[1] if len(sys.argv) > 1 else "256x"
tier_dir = os.path.join("/root/repo/.bench_cache", tier)

import duckdb
from pyspark.sql import functions as F

from bench import _pretouch
from coldata_spark import registry
from coldata_spark.session import dir_bytes, get_spark, tune_for_input
from coldata_spark.tables import load

_pretouch(tier_dir)
spark = get_spark(app_name="probe_q02_twolevel")
tune_for_input(spark, dir_bytes(tier_dir))

CUTOFF = F.lit("1998-01-01").cast("timestamp")


def _joined(sf_dir):
    """The baseline's exact join tree (copied shape, same gates)."""
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < CUTOFF)
    o = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > CUTOFF)
    return li.join(o, li.l_orderkey == o.o_orderkey)


def prefix_anyvalue(sf_dir):
    j = _joined(sf_dir).select(
        "o_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        "o_orderdate",
        "o_orderpriority",
    )
    return (
        j.groupBy("o_orderkey")
        .agg(
            F.round(F.sum("rev"), 2).alias("revenue"),
            F.any_value("o_orderdate").alias("o_orderdate"),
            F.any_value("o_orderpriority").alias("o_orderpriority"),
        )
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def prefix_rejoin(sf_dir):
    j = _joined(sf_dir).select(
        "o_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    top = (
        j.groupBy("o_orderkey")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"), "o_orderdate", "o_orderpriority"
    )
    # broadcast the 10-row side; the honest cost of this variant is the
    # second full orders scan the dim re-attach forces
    return (
        orders.join(F.broadcast(top), top.o_orderkey == orders.ok)
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
    )


variants = {
    "baseline_full_key": lambda: registry.specs()[
        "q02_top_orders_by_revenue"
    ].fn(spark, tier_dir).collect(),
    "prefix_anyvalue": lambda: prefix_anyvalue(tier_dir).collect(),
    "prefix_rejoin": lambda: prefix_rejoin(tier_dir).collect(),
}

# answers must agree before timings mean anything
ref = [tuple(r) for r in variants["baseline_full_key"]()]
for name in ("prefix_anyvalue", "prefix_rejoin"):
    got = [tuple(r) for r in variants[name]()]
    assert got == ref, f"{name} diverges from baseline: {got[:2]} vs {ref[:2]}"

out = {}
for name, fn in variants.items():
    fn()  # warm
    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        fn()
        runs.append(round(time.perf_counter() - t0, 3))
    out[name] = {"runs": runs, "best": min(runs)}
spark.stop()

con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")
for t in ("customer", "orders", "lineitem"):
    p = os.path.join(tier_dir, f"{t}.parquet")
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
sql = registry.specs()["q02_top_orders_by_revenue"].sql
con.execute(sql).df()
runs = []
for _ in range(5):
    t0 = time.perf_counter()
    con.execute(sql).df()
    runs.append(round(time.perf_counter() - t0, 3))
con.close()
out["duckdb_reference"] = {"runs": runs, "best": min(runs)}

print(json.dumps({"tier": tier, **out}, indent=2))
