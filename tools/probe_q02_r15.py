#!/usr/bin/env python
"""Round-15 q02 @256x investigation (verdict ask #3): the flat-256x tier
read 2.40 in the r14 driver run and 3.40 in this round's fresh baseline,
and the fresh per-query table shows it is ENTIRELY q02 (17.9 s vs DuckDB's
1.18; every other subset member <=2.61).  q02 scales 0.75 -> 1.30 -> 17.9 s
across 16x/64x/256x — superlinear at exactly the tier where the join stops
broadcasting (the 256 MB orders-scan gate) and runs as a sort-merge join:
suspect the 154M-row sort + spill, not the documented hash-agg constant.

Decompose (noop sink, §1.4), then A/B the join strategy and shapes under
the tier protocol (pretouch, tuned fresh session, toPandas best-of-2).

Run: python tools/probe_q02_r15.py [times]    (default 256)
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


def _pieces(spark, tier, join_hint=None):
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
    if join_hint:
        o = o.hint(join_hint)
    li = load(spark, tier, "lineitem").filter(F.col("l_shipdate") > cutoff)
    joined = li.join(o, li.l_orderkey == F.col("o_orderkey"))
    full = (
        joined.groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )
    return li, o, joined, full


def _t_noop(df_fn, label, spark):
    spark.sparkContext.setJobDescription(f"q02 {label} warm")
    df_fn().write.format("noop").mode("overwrite").save()
    best = float("inf")
    for i in range(REPEATS):
        gc.collect()
        spark.sparkContext.setJobDescription(f"q02 {label} run{i}")
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
    spark = get_spark(app_name="probe_q02_r15")
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_input(spark, dir_bytes(tier))
    print(
        "session: shuffle.partitions=",
        spark.conf.get("spark.sql.shuffle.partitions"),
        " aqe=", spark.conf.get("spark.sql.adaptive.enabled"),
        flush=True,
    )

    # value gate: every timed variant must equal the committed query
    from coldata_spark.registry import specs

    base = specs()["q02_top_orders_by_revenue"].fn(spark, tier).toPandas()
    for hint in ("shuffle_hash", "merge"):
        v = _pieces(spark, tier, hint)[3].toPandas()
        same = base.reset_index(drop=True).equals(v.reset_index(drop=True))
        print(f"value_gate {hint}: {same}", flush=True)
        if not same:
            sys.exit(1)

    li, o, joined, full = _pieces(spark, tier)
    _t_noop(lambda: li.select("l_orderkey", "l_extendedprice", "l_discount"),
            "A scan+filter lineitem", spark)
    _t_noop(lambda: o, "B orders side (bcast cust)", spark)
    _t_noop(lambda: joined.select("o_orderkey", "l_extendedprice"),
            "C join (default strategy)", spark)
    _t_noop(lambda: _pieces(spark, tier, "shuffle_hash")[2]
            .select("o_orderkey", "l_extendedprice"),
            "C join (SHUFFLE_HASH hint)", spark)
    _t_noop(lambda: full, "D FULL committed", spark)
    _t_noop(lambda: _pieces(spark, tier, "shuffle_hash")[3],
            "D FULL shuffle_hash", spark)

    # partition sweep on the committed full shape
    for parts in (32, 64, 128, 256):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        _t_noop(lambda: _pieces(spark, tier)[3],
                f"D FULL committed parts={parts}", spark)
    tune_for_input(spark, dir_bytes(tier))
    spark.stop()


if __name__ == "__main__":
    main()
