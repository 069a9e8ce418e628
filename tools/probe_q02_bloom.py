#!/usr/bin/env python
"""q02 @256x, part 2: runtime Bloom-filter injection (guide §3.2) on top of
the join-strategy choice.  Only ~20% of shipdate-filtered lineitem rows
join a BUILDING order, so a bloom filter over the orders side's
o_orderkey, applied below lineitem's exchange, cuts the shuffled rows ~5x.
Spark 3.3+ injects this automatically but the defaults
(creationSideThreshold 10 MB, applicationSideScanSizeThreshold 10 GB)
never fire at this tier — raise/lower them and measure SMJ/SHJ x bloom.

Run: python tools/probe_q02_bloom.py [times]
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


def build(spark, tier, hint):
    from coldata_spark.tables import load

    cutoff = F.lit("1998-01-01").cast("timestamp")
    cust = (
        load(spark, tier, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load(spark, tier, "orders").filter(F.col("o_orderdate") < cutoff)
    o = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    if hint:
        o = o.hint(hint)
    li = load(spark, tier, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def _t(df_fn, label, spark):
    spark.sparkContext.setJobDescription(f"q02b {label} warm")
    df_fn().write.format("noop").mode("overwrite").save()
    best = float("inf")
    for i in range(REPEATS):
        gc.collect()
        spark.sparkContext.setJobDescription(f"q02b {label} run{i}")
        t0 = time.perf_counter()
        df_fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"timing {label}: best_of_{REPEATS} = {best:.3f} s", flush=True)
    return best


def main() -> None:
    times = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from bench import _pretouch, _tier_dir, dir_bytes
    from coldata_spark.session import get_spark, tune_for_input

    tier = _tier_dir("/root/testdata/sf0.1", times)
    _pretouch(tier)
    spark = get_spark(app_name="probe_q02_bloom")
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_input(spark, dir_bytes(tier))

    base = build(spark, tier, None).toPandas()

    def set_bloom(on: bool):
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", str(on).lower()
        )
        if on:
            spark.conf.set(
                "spark.sql.optimizer.runtime.bloomFilter."
                "creationSideThreshold", str(512 << 20)
            )
            spark.conf.set(
                "spark.sql.optimizer.runtime.bloomFilter."
                "applicationSideScanSizeThreshold", str(256 << 20)
            )

    for hint in (None, "shuffle_hash"):
        for bloom in (False, True):
            set_bloom(bloom)
            v = build(spark, tier, hint).toPandas()
            ok = base.reset_index(drop=True).equals(v.reset_index(drop=True))
            label = f"hint={hint} bloom={bloom}"
            print(f"value_gate {label}: {ok}", flush=True)
            if not ok:
                sys.exit(1)
            plan = build(spark, tier, hint)._jdf.queryExecution().toString()
            print(f"  bloom_in_plan={('bloom_filter' in plan) or ('might_contain' in plan)}", flush=True)
            _t(lambda: build(spark, tier, hint), label, spark)
    spark.stop()


if __name__ == "__main__":
    main()
