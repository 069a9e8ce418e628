#!/usr/bin/env python
"""Scaling stress probe: replicate the sf0.1 lineitem fact table in-memory
(1x/4x/16x ~ 0.6M -> 9.6M rows), run representative plans at each scale, and
record seconds + rows/sec to STRESS.md.

The point is the TREND, not the absolute numbers: if per-row throughput
RISES with scale (fixed per-stage overhead amortizing) the plans are
overhead-bound locally and scale-ready; if it FELL, something in the plan
grows super-linearly (a quadratic join, a global sort) and would die at
100 TB.  Run: python tools/stress.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from coldata_spark.session import get_spark, tune_for_input
from coldata_spark.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated(df, times: int, key: str = "l_orderkey"):
    """Union `times` copies with perturbed keys so group/join cardinality
    scales with the data (a pure copy would keep the same distinct keys).
    Replicate BOTH sides of a join with the same key shift so the match
    rate stays constant across scales."""
    parts = []
    for i in range(times):
        parts.append(df.withColumn(key, F.col(key) + F.lit(i * 10_000_000)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def q_agg(df):
    """TPC-H Q1 shape: filter -> group -> 8 aggregates."""
    return (
        df.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity"), F.sum("l_extendedprice"),
            F.avg("l_discount"), F.count("*"),
        )
    )


def q_join_agg(df, orders):
    """Fact-fact join + aggregation (shuffle-heavy path)."""
    big = df.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("qty"))
    return orders.join(big, orders.o_orderkey == big.l_orderkey).agg(
        F.sum("qty"), F.count("*")
    )


def q_window(df):
    """Per-key window rank (partition-local sort path)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("l_orderkey").orderBy(F.col("l_extendedprice").desc())
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2).agg(
        F.count("*")
    )


def main() -> None:
    spark = get_spark(app_name="stress")
    li = load(spark, SF_DIR, "lineitem")
    orders = load(spark, SF_DIR, "orders")
    base_rows = li.count()

    lines = [
        "# STRESS — scaling probe (replicated sf0.1 lineitem, local[32])",
        "",
        "Per-row throughput must NOT fall as rows grow; rising throughput =",
        "fixed per-stage overhead amortizing (see tools/stress.py).",
        "",
        "| plan | scale | rows | sec | Mrows/sec |",
        "|---|---|---|---|---|",
    ]
    for times in (1, 4, 16):
        df = replicated(li, times)
        ords = replicated(orders, times, key="o_orderkey")
        n = base_rows * times
        tune_for_input(spark, n * 100)  # ~100 B/row working estimate
        for name, fn in (
            ("agg", lambda d: q_agg(d)),
            ("join+agg", lambda d: q_join_agg(d, ords)),
            ("window", lambda d: q_window(d)),
        ):
            fn(df).collect()  # warm
            t0 = time.perf_counter()
            fn(df).collect()
            dt = time.perf_counter() - t0
            lines.append(
                f"| {name} | {times}x | {n:,} | {dt:.2f} | {n / dt / 1e6:.1f} |"
            )
            print(lines[-1])
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "STRESS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
