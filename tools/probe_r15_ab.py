#!/usr/bin/env python
"""Round-15 A/B + decomposition probes (verdict asks #4/#5/#6), under the
sweep protocol (symmetric client materialization, warm + best-of-2, fresh
tuned session, pretouched tier).

  q135  decomposition: scan+exprs only / count-only agg / full (+distinct);
        expr variants: double-division (committed) vs integer div/%.
  q125  decomposition: hourly agg only / full; date_trunc vs
        unix_micros-arithmetic hour bucket.
  q74   committed 3-scan form vs single multi-distinct agg (Expand x4),
        plus the DuckDB oracle — the 64x attribution row.
  q123  same trade (profile aggregate), plus DuckDB.
  q77c  clustered twin: committed shape vs supplier-first + pre-aggregated
        (l_orderkey, s_nationkey) partial volume before the zero-exchange
        SMJ (verdict ask #4's named lever).

Every variant pair is value-gated equal before it is timed.

Run: python tools/probe_r15_ab.py [probe ...]   (default: all)
     probes: q135 q125 q74 q123 q77c
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
TIMES = 64


def _t(make_df, label, spark):
    spark.sparkContext.setJobDescription(f"r15 probe {label} warm")
    make_df().toPandas()
    best = float("inf")
    for i in range(REPEATS):
        gc.collect()
        spark.sparkContext.setJobDescription(f"r15 probe {label} run{i}")
        t0 = time.perf_counter()
        make_df().toPandas()
        best = min(best, time.perf_counter() - t0)
    print(f"timing {label}: best_of_{REPEATS} = {best:.3f} s", flush=True)
    return best


def _t_noop(make_df, label, spark):
    spark.sparkContext.setJobDescription(f"r15 probe {label} warm")
    make_df().write.format("noop").mode("overwrite").save()
    best = float("inf")
    for i in range(REPEATS):
        gc.collect()
        spark.sparkContext.setJobDescription(f"r15 probe {label} run{i}")
        t0 = time.perf_counter()
        make_df().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"timing {label}: best_of_{REPEATS} = {best:.3f} s", flush=True)
    return best


def _duck(sql_text, tier, label):
    import duckdb

    from coldata_spark.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(tier, f"{t}.parquet")
        if os.path.isdir(p):  # replicated tiers are Spark-written dirs
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
            )
        elif os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    con.execute(sql_text).df()  # warm
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        con.execute(sql_text).df()
        best = min(best, time.perf_counter() - t0)
    print(f"timing {label} (duckdb): best_of_{REPEATS} = {best:.3f} s", flush=True)
    con.close()
    return best


def _gate(a_df, b_df, label):
    import pandas as pd

    a = a_df.toPandas()
    b = b_df.toPandas()
    a = a[sorted(a.columns)].sort_values(sorted(a.columns)).reset_index(drop=True)
    b = b[sorted(b.columns)].sort_values(sorted(b.columns)).reset_index(drop=True)
    ok = a.equals(b)
    print(f"value_gate {label}: rows={len(a)} equal={ok}", flush=True)
    if not ok:
        print(a.head(), b.head(), sep="\n")
        sys.exit(1)


def probe_q135(spark, tier):
    from coldata_spark.tables import load

    def base(expr_mode):
        ev = load(spark, tier, "events")
        epoch = F.col("ts").cast("long")
        if expr_mode == "double":
            sel = ev.select(
                (((epoch / 86400).cast("long") + 4) % 7).alias("dow"),
                ((epoch % 86400) / 3600).cast("long").alias("hour_utc"),
                "user_id",
            )
        else:  # integer-only
            sel = ev.select(
                F.expr(
                    "(CAST(ts AS LONG) div 86400 + 4) % 7"
                ).alias("dow"),
                F.expr(
                    "(CAST(ts AS LONG) % 86400) div 3600"
                ).alias("hour_utc"),
                "user_id",
            )
        return sel

    def full(mode):
        return (
            base(mode)
            .groupBy("dow", "hour_utc")
            .agg(
                F.count("*").cast("long").alias("n_events"),
                F.countDistinct("user_id").cast("long").alias("n_users"),
            )
        )

    def count_only(mode):
        return (
            base(mode)
            .groupBy("dow", "hour_utc")
            .agg(F.count("*").cast("long").alias("n_events"))
        )

    _gate(full("double"), full("int"), "q135 double-vs-int exprs")
    _t_noop(lambda: base("double"), "q135 scan+exprs(double) noop", spark)
    _t_noop(lambda: base("int"), "q135 scan+exprs(int) noop", spark)
    _t(lambda: count_only("double"), "q135 count-only(double)", spark)
    _t(lambda: full("double"), "q135 FULL(double, committed)", spark)
    _t(lambda: full("int"), "q135 FULL(int)", spark)
    from coldata_spark.registry import specs

    _duck(specs()["q135_weekday_hour_heatmap"].sql, tier, "q135 oracle")


def probe_q125(spark, tier):
    from coldata_spark.tables import load

    def hourly(mode):
        ev = load(spark, tier, "events")
        if mode == "trunc":
            hr = F.date_trunc("hour", F.col("ts"))
        else:
            hr = F.expr(
                "timestamp_micros(unix_micros(ts)"
                " - pmod(unix_micros(ts), 3600000000))"
            )
        return ev.groupBy("event_type", hr.alias("hr")).agg(
            F.count("*").cast("long").alias("n")
        )

    def full(mode):
        h = hourly(mode)
        stats = h.groupBy("event_type").agg(
            F.count("*").cast("long").alias("k"),
            F.sum("n").cast("long").alias("s"),
            F.sum(F.expr("n * n")).cast("long").alias("sq"),
        )
        j = h.join(F.broadcast(stats), "event_type")
        dev = F.expr("k * n - s")
        return j.filter(
            (dev > 0) & (dev * dev > F.expr("4 * (k * sq - s * s)"))
        ).select(
            "event_type",
            "hr",
            "n",
            F.expr("CAST((1000000 * n * k) div s AS BIGINT)").alias(
                "vs_mean_micro"
            ),
        )

    _gate(full("trunc"), full("micros"), "q125 trunc-vs-micros")
    _t(lambda: hourly("trunc"), "q125 hourly-only(trunc)", spark)
    _t(lambda: hourly("micros"), "q125 hourly-only(micros)", spark)
    _t(lambda: full("trunc"), "q125 FULL(trunc, committed)", spark)
    _t(lambda: full("micros"), "q125 FULL(micros)", spark)
    from coldata_spark.registry import specs

    _duck(specs()["q125_hourly_anomalies"].sql, tier, "q125 oracle")


def probe_q74(spark, tier):
    from coldata_spark.registry import specs
    from coldata_spark.tables import load

    def expand():
        li = load(spark, tier, "lineitem")
        return li.groupBy("l_returnflag").agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )

    committed = lambda: specs()["q74_distinct_counts"].fn(spark, tier)  # noqa: E731
    _gate(committed(), expand(), "q74 3scan-vs-expand")
    _t(committed, "q74 committed 3-scan", spark)
    _t(expand, "q74 Expand single-agg", spark)
    _duck(specs()["q74_distinct_counts"].sql, tier, "q74 oracle")


def probe_q123(spark, tier):
    from coldata_spark.registry import specs
    from coldata_spark.tables import load

    def expand():
        o = load(spark, tier, "orders")
        prof = o.agg(
            F.count("*").alias("n_rows"),
            (F.count("*") - F.count("o_custkey")).alias("nn_ck"),
            F.countDistinct("o_custkey").alias("nd_ck"),
            F.min("o_custkey").cast("string").alias("mn_ck"),
            F.max("o_custkey").cast("string").alias("mx_ck"),
            (F.count("*") - F.count("o_orderpriority")).alias("nn_op"),
            F.countDistinct("o_orderpriority").alias("nd_op"),
            F.min("o_orderpriority").alias("mn_op"),
            F.max("o_orderpriority").alias("mx_op"),
            (F.count("*") - F.count("o_orderstatus")).alias("nn_os"),
            F.countDistinct("o_orderstatus").alias("nd_os"),
            F.min("o_orderstatus").alias("mn_os"),
            F.max("o_orderstatus").alias("mx_os"),
        )
        return prof.select(
            F.expr(
                "stack(3,"
                " 'o_custkey', n_rows, nn_ck, nd_ck, mn_ck, mx_ck,"
                " 'o_orderpriority', n_rows, nn_op, nd_op, mn_op, mx_op,"
                " 'o_orderstatus', n_rows, nn_os, nd_os, mn_os, mx_os)"
                " AS (col_name, n_rows, n_nulls, n_distinct, min_val, max_val)"
            )
        ).select(
            "col_name",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_nulls").cast("long").alias("n_nulls"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            "min_val",
            "max_val",
        )

    committed = lambda: specs()["q123_profile_orders"].fn(spark, tier)  # noqa: E731
    _gate(committed(), expand(), "q123 3scan-vs-expand")
    _t(committed, "q123 committed 3-scan", spark)
    _t(expand, "q123 Expand single-agg", spark)
    _duck(specs()["q123_profile_orders"].sql, tier, "q123 oracle")


def probe_q77c(spark):
    from bench import _tier_dir
    from tools.clustered import CLUSTERED_JOIN_QUERIES, register_clustered

    out = _tier_dir("/root/testdata/sf0.1", 256) + "_clustered"
    if not os.path.isdir(out):
        print("q77c: clustered fixture absent — skip")
        return
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    register_clustered(spark, out)

    committed = lambda: CLUSTERED_JOIN_QUERIES[  # noqa: E731
        "q77_local_supplier_volume"
    ](spark, out)

    def preagg():
        region = spark.read.parquet(os.path.join(out, "region")).filter(
            F.col("r_name") == "EUROPE"
        )
        nat = spark.read.parquet(os.path.join(out, "nation")).join(
            F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
        )
        cust_eu = (
            spark.read.parquet(os.path.join(out, "customer"))
            .select("c_custkey", "c_nationkey")
            .join(
                F.broadcast(nat.select("n_nationkey", "n_name")),
                F.col("c_nationkey") == F.col("n_nationkey"),
            )
        )
        ord_eu = (
            spark.table("orders_c")
            .filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            )
            .select("o_orderkey", "o_custkey")
            .join(F.broadcast(cust_eu), F.col("o_custkey") == F.col("c_custkey"))
            .select("o_orderkey", "c_nationkey", "n_name")
        )
        supp = spark.read.parquet(os.path.join(out, "supplier"))
        # supplier-first + pre-aggregation: join the broadcast supplier to
        # get s_nationkey BEFORE the orderkey SMJ, then collapse lineitem
        # to (l_orderkey, s_nationkey, partial volume) — the aggregate's
        # required clustering is satisfied by the orderkey bucketing, so
        # it is exchange-free and the SMJ stream shrinks
        li_pre = (
            spark.table("lineitem_c")
            .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
            .join(
                F.broadcast(supp.select("s_suppkey", "s_nationkey")),
                F.col("l_suppkey") == F.col("s_suppkey"),
            )
            .groupBy("l_orderkey", "s_nationkey")
            .agg(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).alias("vol")
            )
        )
        return (
            li_pre.join(ord_eu, F.col("l_orderkey") == F.col("o_orderkey"))
            .filter(F.col("s_nationkey") == F.col("c_nationkey"))
            .groupBy("n_name")
            .agg(F.round(F.sum("vol"), 2).alias("revenue"))
        )

    _gate(committed(), preagg(), "q77c committed-vs-preagg")
    _t(committed, "q77c committed", spark)
    _t(preagg, "q77c supplier-first preagg", spark)


def main() -> None:
    wanted = sys.argv[1:] or ["q135", "q125", "q74", "q123", "q77c"]
    from bench import _tier_dir, dir_bytes
    from coldata_spark.session import get_spark, tune_for_input

    tier = _tier_dir("/root/testdata/sf0.1", TIMES)
    spark = get_spark(app_name="probe_r15_ab")
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_input(spark, dir_bytes(tier))
    for p in wanted:
        if p == "q77c":
            probe_q77c(spark)
        else:
            globals()[f"probe_{p}"](spark, tier)
    spark.stop()


if __name__ == "__main__":
    main()
