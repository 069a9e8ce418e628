#!/usr/bin/env python
"""Round-15 q77-clustered investigation (verdict ask #4): 2.11 s Spark vs
0.79 s DuckDB (ratio 2.67) on the co-bucketed tier.  Decompose the
zero-exchange plan (bare bucketed-scan floor, join, agg) and A/B the
levers: shuffled-hash instead of merge on the (already-sorted) orderkey
join, and the verdict's named pre-aggregation (supplier broadcast first,
partial volume per (l_orderkey, s_nationkey), both exchange-free on the
orderkey bucketing).

Run: python tools/probe_q77_r15.py
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

REPEATS = 2


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _time(label, df, materialize=_noop):
    materialize(df)  # warm
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        materialize(df)
        best = min(best, time.perf_counter() - t0)
    print(f"timing {label}: best_of_{REPEATS} = {best:.3f} s", flush=True)
    return best


def _ord_eu(spark, out_dir):
    region = spark.read.parquet(os.path.join(out_dir, "region")).filter(
        F.col("r_name") == "EUROPE"
    )
    nat = spark.read.parquet(os.path.join(out_dir, "nation")).join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust_eu = (
        spark.read.parquet(os.path.join(out_dir, "customer"))
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    return (
        spark.table("orders_c")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
        .join(F.broadcast(cust_eu), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_nationkey", "n_name")
    )


def _final_agg(df):
    return df.groupBy("n_name").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


def shape_shj(spark, out_dir):
    supp = spark.read.parquet(os.path.join(out_dir, "supplier"))
    return _final_agg(
        spark.table("lineitem_c")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(_ord_eu(spark, out_dir).hint("shuffle_hash"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
    )


def shape_preagg(spark, out_dir):
    supp = spark.read.parquet(os.path.join(out_dir, "supplier")).select(
        "s_suppkey", "s_nationkey"
    )
    li_vol = (
        spark.table("lineitem_c")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_orderkey", "s_nationkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "_vol"
            )
        )
    )
    return (
        li_vol.join(
            _ord_eu(spark, out_dir),
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum("_vol"), 2).alias("revenue"))
    )


def main():
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import _pretouch, _tier_dir
    from coldata_spark.session import dir_bytes, get_spark, tune_for_input
    from tools.clustered import q77_clustered, register_clustered

    out = _tier_dir("/root/testdata/sf0.1", 256) + "_clustered"
    _pretouch(out)
    spark = get_spark(app_name="probe_q77_r15")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    tune_for_input(spark, dir_bytes(out))
    register_clustered(spark, out)
    print(
        "session: shuffle.partitions=",
        spark.conf.get("spark.sql.shuffle.partitions"),
        flush=True,
    )

    committed = q77_clustered(spark, out)
    expect = sorted(map(tuple, committed.collect()))

    # decomposition: bucketed-scan floor and the orders-side build
    _time(
        "bare lineitem_c 4-col scan",
        spark.table("lineitem_c").select(
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
        ),
    )
    _time("ord_eu build alone", _ord_eu(spark, out))

    for label, fn in [
        ("committed (SMJ zero-exchange)", q77_clustered),
        ("shuffled-hash ord_eu build", shape_shj),
        ("preagg (orderkey,s_nationkey) first", shape_preagg),
    ]:
        df = fn(spark, out)
        got = sorted(map(tuple, df.collect()))
        print(f"value_gate {label}: {got == expect}", flush=True)
        assert got == expect, label
        ex = df._jdf.queryExecution().executedPlan().toString()
        n_exch = ex.count("Exchange") - ex.count("BroadcastExchange")
        print(f"  row-exchanges={n_exch}", flush=True)
        _time(label, df)


if __name__ == "__main__":
    main()
