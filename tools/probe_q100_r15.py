#!/usr/bin/env python
"""Round-15 follow-on: q100_late_suppliers (TPC-H Q21 shape) is the
largest Spark absolute left in the fresh 16x sweep (9.44 s, ratio 2.74).
The committed plan scans lineitem 3x (late twice — the l3 anti side
recomputes the li x orders join — plus the l2 semi side) and runs two
wide self-joins.

Rewrite under test (guide §2.3/§2.4, the q137 aggregate-instead-of-
self-join pattern): per-row EXISTS/NOT-EXISTS tests depend only on
per-order DISTINCT-supplier counts, so compute them as two stacked
aggregates over ONE li x broadcast(orders) pass:

  per (orderkey, suppkey): n_late_rows = count(late rows)
  per orderkey: n_supp = count(*) rows (= distinct suppliers),
                n_late_supp = count(n_late_rows > 0),
                late_supp / late_rows of the unique late supplier
  waiting rows = orders with n_supp > 1 and n_late_supp == 1,
                 contributing late_rows to that supplier's numwait.

A repartition(l_orderkey) before the first aggregate makes BOTH
aggregates run on the same single exchange (HashPartitioning(orderkey)
satisfies the (orderkey, suppkey) clustering).

Run: python tools/probe_q100_r15.py [times]   (default 16)
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
    for _ in range(REPEATS):
        gc.collect()
        t0 = time.perf_counter()
        make_df().toPandas()
        best = min(best, time.perf_counter() - t0)
    print(f"timing {label}: best_of_{REPEATS} = {best:.3f} s", flush=True)
    return best


def q100_agg(spark, tier):
    from coldata_spark.operators.similarity import _estimated_bytes
    from coldata_spark.tables import load

    li = load(spark, tier, "lineitem")
    orders = load(spark, tier, "orders").select("o_orderkey", "o_orderdate")
    supp = load(spark, tier, "supplier")
    est = _estimated_bytes(load(spark, tier, "orders"))
    if 0 < est <= (256 << 20):
        orders = F.broadcast(orders)
    j = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            ).alias("_late"),
        )
    )
    per_os = (
        j.repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.count(F.when(F.col("_late"), True)).alias("_n_late_rows"))
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("_n_supp"),
        F.count(F.when(F.col("_n_late_rows") > 0, True)).alias("_n_late_supp"),
        F.max(
            F.when(F.col("_n_late_rows") > 0, F.col("l_suppkey"))
        ).alias("_late_supp"),
        F.sum(
            F.when(F.col("_n_late_rows") > 0, F.col("_n_late_rows"))
        ).alias("_late_rows"),
    )
    return (
        per_o.filter((F.col("_n_supp") > 1) & (F.col("_n_late_supp") == 1))
        .join(
            F.broadcast(supp), F.col("_late_supp") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.sum("_late_rows").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


def main():
    times = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import _pretouch, _tier_dir
    from coldata_spark.registry import specs
    from coldata_spark.session import dir_bytes, get_spark, tune_for_input

    tier = _tier_dir("/root/testdata/sf0.1", times)
    _pretouch(tier)
    spark = get_spark(app_name="probe_q100_r15")
    tune_for_input(spark, dir_bytes(tier))
    print(
        "session: times=", times,
        "shuffle.partitions=", spark.conf.get("spark.sql.shuffle.partitions"),
        flush=True,
    )
    committed = lambda: specs()["q100_late_suppliers"].fn(spark, tier)  # noqa: E731
    variant = lambda: q100_agg(spark, tier)  # noqa: E731
    a = [tuple(r) for r in committed().collect()]
    b = [tuple(r) for r in variant().collect()]
    print("value_gate q100 (ordered rows):", a == b, flush=True)
    assert a == b, f"mismatch\n{a[:5]}\n{b[:5]}"
    ex = variant()._jdf.queryExecution().executedPlan().toString()
    n_scans = ex.count("Scan parquet")
    n_exch = ex.count("Exchange") - ex.count("BroadcastExchange")
    print(f"  variant: parquet scans={n_scans} row-exchanges={n_exch}", flush=True)
    _t(committed, f"q100 committed {times}x", spark)
    _t(variant, f"q100 aggregate-rewrite {times}x", spark)


if __name__ == "__main__":
    main()
