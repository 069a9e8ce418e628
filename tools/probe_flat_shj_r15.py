#!/usr/bin/env python
"""Round-15 follow-on from the q02/q77-clustered finding: do the FLAT
fact-fact orderkey joins of the same family (q77, q68) also win from
hash-building the pruned orders side instead of sort-merge?  Both sides
shuffle either way; SMJ additionally SORTS both, and the streamed
lineitem side is ~5x larger.

Run: python tools/probe_flat_shj_r15.py [times]   (default 64)
"""

from __future__ import annotations

import gc
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

REPEATS = 2


def _t(make_df, label, spark):
    make_df().toPandas()
    best = float("inf")
    for i in range(REPEATS):
        gc.collect()
        t0 = time.perf_counter()
        make_df().toPandas()
        best = min(best, time.perf_counter() - t0)
    print(f"timing {label}: best_of_{REPEATS} = {best:.3f} s", flush=True)
    return best


def _gate(a, b, label):
    ga = sorted(map(tuple, a.collect()))
    gb = sorted(map(tuple, b.collect()))
    print(f"value_gate {label}: {ga == gb}", flush=True)
    assert ga == gb, label


def _with_hint(module_fn, spark, tier, hint_patch):
    """Rebuild the query with the orders-side hint via monkeypatched join."""
    return hint_patch(spark, tier)


def q77_shj(spark, tier):
    from coldata_spark.tables import load

    region = load(spark, tier, "region").filter(F.col("r_name") == "EUROPE")
    nat = load(spark, tier, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust_eu = (
        load(spark, tier, "customer")
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    orders = load(spark, tier, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    ord_eu = (
        orders.select("o_orderkey", "o_custkey")
        .join(cust_eu, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_nationkey", "n_name")
    )
    supp = load(spark, tier, "supplier")
    li = load(spark, tier, "lineitem")
    return (
        li.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ord_eu.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q68_shj(spark, tier):
    from coldata_spark.tables import load

    li = load(spark, tier, "lineitem")
    supp = load(spark, tier, "supplier")
    n1 = load(spark, tier, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    region = load(spark, tier, "region").filter(F.col("r_name") == "ASIA")
    n2 = (
        load(spark, tier, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    cust = load(spark, tier, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key")
    )
    orders = (
        load(spark, tier, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .join(
            F.broadcast(cust.select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("o_orderkey", "o_orderdate")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .select("l_orderkey", vol.alias("volume"), "supp_nation")
        .join(orders.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            "volume",
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_3", F.col("volume")
                    ).otherwise(0.0)
                )
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
    )


def main():
    times = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import _pretouch, _tier_dir
    from coldata_spark.registry import specs
    from coldata_spark.session import dir_bytes, get_spark, tune_for_input

    tier = _tier_dir("/root/testdata/sf0.1", times)
    _pretouch(tier)
    spark = get_spark(app_name="probe_flat_shj_r15")
    tune_for_input(spark, dir_bytes(tier))
    print(
        "session: times=", times,
        "shuffle.partitions=", spark.conf.get("spark.sql.shuffle.partitions"),
        flush=True,
    )
    sp = specs()
    for name, shj in [
        ("q77_local_supplier_volume", q77_shj),
        ("q68_market_share", q68_shj),
    ]:
        committed = lambda: sp[name].fn(spark, tier)  # noqa: E731
        variant = lambda: shj(spark, tier)  # noqa: E731
        _gate(committed(), variant(), name)
        plan = variant()._jdf.queryExecution().executedPlan().toString()
        print(f"  {name} variant SHJ in plan: {'ShuffledHashJoin' in plan}")
        _t(committed, f"{name} committed (SMJ)", spark)
        _t(variant, f"{name} shuffle_hash", spark)


def q77_bcast(spark, tier):
    """Explicit broadcast of the pruned ord_eu side (the planner cannot
    see the ~6% join+filter selectivity through the scan estimate)."""
    from coldata_spark.tables import load

    region = load(spark, tier, "region").filter(F.col("r_name") == "EUROPE")
    nat = load(spark, tier, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust_eu = (
        load(spark, tier, "customer")
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    orders = load(spark, tier, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    ord_eu = (
        orders.select("o_orderkey", "o_custkey")
        .join(cust_eu, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_nationkey", "n_name")
    )
    supp = load(spark, tier, "supplier")
    li = load(spark, tier, "lineitem")
    return (
        li.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(F.broadcast(ord_eu), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q68_bcast(spark, tier):
    from coldata_spark.tables import load

    li = load(spark, tier, "lineitem")
    supp = load(spark, tier, "supplier")
    n1 = load(spark, tier, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    region = load(spark, tier, "region").filter(F.col("r_name") == "ASIA")
    n2 = (
        load(spark, tier, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    cust = load(spark, tier, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key")
    )
    orders = (
        load(spark, tier, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .join(
            F.broadcast(cust.select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("o_orderkey", "o_orderdate")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .select("l_orderkey", vol.alias("volume"), "supp_nation")
        .join(F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            "volume",
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_3", F.col("volume")
                    ).otherwise(0.0)
                )
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
    )


def main_bcast():
    times = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import _pretouch, _tier_dir
    from coldata_spark.registry import specs
    from coldata_spark.session import dir_bytes, get_spark, tune_for_input

    tier = _tier_dir("/root/testdata/sf0.1", times)
    _pretouch(tier)
    spark = get_spark(app_name="probe_flat_bcast_r15")
    tune_for_input(spark, dir_bytes(tier))
    sp = specs()
    for name, bcast in [
        ("q77_local_supplier_volume", q77_bcast),
        ("q68_market_share", q68_bcast),
    ]:
        committed = lambda: sp[name].fn(spark, tier)  # noqa: E731
        variant = lambda: bcast(spark, tier)  # noqa: E731
        _gate(committed(), variant(), f"{name} bcast {times}x")
        _t(committed, f"{name} committed {times}x", spark)
        _t(variant, f"{name} explicit-broadcast {times}x", spark)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "bcast":
        main_bcast()
    else:
        main()
