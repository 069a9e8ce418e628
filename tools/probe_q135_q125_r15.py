#!/usr/bin/env python
"""Round-15 ask #5: decompose q135_weekday_hour_heatmap (9.2x in the r13
sweep) and q125_hourly_anomalies (5.3x) per term, then A/B the levers that
keep the results bit-identical:

q135 — the plan is ALREADY the no-Expand two-phase distinct; the cost is
the (dow, hour, user_id) dedup shuffle.  Levers: integer `div` instead of
the double-precision divisions in the key exprs, and packing (dow, hour)
into one small cell key so the dedup shuffle moves 2 longs, not 3.

q125 — levers: group the hourly rollup on integer epoch-hours instead of
date_trunc'd timestamps (timezone logic per row), reconstructing the
timestamp after the aggregates.

Run: python tools/probe_q135_q125_r15.py [times]   (default 16)
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


def _time(label, df):
    _noop(df)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        _noop(df)
        best = min(best, time.perf_counter() - t0)
    print(f"timing {label}: best_of_{REPEATS} = {best:.3f} s", flush=True)
    return best


def _gate(label, df, expect):
    got = sorted(map(tuple, df.collect()))
    print(f"value_gate {label}: {got == expect}", flush=True)
    assert got == expect, label


# ---------------- q135 shapes ----------------
def q135_committed(spark, tier):
    from coldata_spark.queries.events_queries import q135_weekday_hour_heatmap

    return q135_weekday_hour_heatmap(spark, tier)


def q135_intdiv(spark, tier):
    from coldata_spark.tables import load

    ev = load(spark, tier, "events")
    return (
        ev.select(
            F.expr("((cast(ts as bigint) div 86400) + 4) % 7").alias("dow"),
            F.expr("(cast(ts as bigint) % 86400) div 3600").alias("hour_utc"),
            "user_id",
        )
        .groupBy("dow", "hour_utc")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )


def q135_packed(spark, tier):
    from coldata_spark.tables import load

    ev = load(spark, tier, "events")
    cell = F.expr(
        "cast(((((cast(ts as bigint) div 86400) + 4) % 7) * 24"
        " + (cast(ts as bigint) % 86400) div 3600) as int)"
    ).alias("_cell")
    per_user = (
        ev.select(cell, "user_id")
        .groupBy("_cell", "user_id")
        .agg(F.count("*").alias("_n"))
    )
    return (
        per_user.groupBy("_cell")
        .agg(
            F.sum("_n").cast("long").alias("n_events"),
            F.count("*").cast("long").alias("n_users"),
        )
        .select(
            F.expr("cast(_cell div 24 as bigint)").alias("dow"),
            F.expr("cast(_cell % 24 as bigint)").alias("hour_utc"),
            "n_events",
            "n_users",
        )
    )


# ---------------- q125 shapes ----------------
def q125_committed(spark, tier):
    from coldata_spark.queries.events_queries import q125_hourly_anomalies

    return q125_hourly_anomalies(spark, tier)


def q125_epoch_hr(spark, tier):
    from coldata_spark.tables import load

    ev = load(spark, tier, "events")
    hourly = (
        ev.groupBy(
            "event_type",
            F.expr("cast(ts as bigint) div 3600").alias("_hr_epoch"),
        ).agg(F.count("*").cast("long").alias("n"))
    )
    stats = hourly.groupBy("event_type").agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n").cast("long").alias("s"),
        F.sum(F.expr("n * n")).cast("long").alias("sq"),
    )
    j = hourly.join(F.broadcast(stats), "event_type")
    dev = F.expr("k * n - s")
    return (
        j.filter((dev > 0) & (dev * dev > F.expr("4 * (k * sq - s * s)")))
        .select(
            "event_type",
            F.timestamp_seconds(F.expr("_hr_epoch * 3600")).alias("hr"),
            "n",
            F.expr("CAST((1000000 * n * k) div s AS BIGINT)").alias(
                "vs_mean_micro"
            ),
        )
    )


def main():
    times = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import _pretouch, _tier_dir
    from coldata_spark.session import dir_bytes, get_spark, tune_for_input
    from coldata_spark.tables import load

    tier = _tier_dir("/root/testdata/sf0.1", times)
    _pretouch(tier)
    spark = get_spark(app_name="probe_q135_q125_r15")
    tune_for_input(spark, dir_bytes(tier))
    print(
        "session: times=", times,
        "shuffle.partitions=", spark.conf.get("spark.sql.shuffle.partitions"),
        flush=True,
    )

    ev = load(spark, tier, "events")
    _time("bare events (ts,user_id) scan", ev.select("ts", "user_id"))
    _time(
        "q135 keys-only rollup (no distinct)",
        ev.select(
            F.expr("((cast(ts as bigint) div 86400) + 4) % 7").alias("dow"),
            F.expr("(cast(ts as bigint) % 86400) div 3600").alias("hour_utc"),
        )
        .groupBy("dow", "hour_utc")
        .agg(F.count("*").alias("n")),
    )

    expect135 = sorted(map(tuple, q135_committed(spark, tier).collect()))
    for label, fn in [
        ("q135 committed", q135_committed),
        ("q135 intdiv keys", q135_intdiv),
        ("q135 packed-cell two-level", q135_packed),
    ]:
        df = fn(spark, tier)
        _gate(label, df, expect135)
        _time(label, df)

    expect125 = sorted(map(tuple, q125_committed(spark, tier).collect()))
    _time(
        "q125 hourly rollup alone (committed form)",
        load(spark, tier, "events")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(F.count("*").cast("long").alias("n")),
    )
    for label, fn in [
        ("q125 committed", q125_committed),
        ("q125 epoch-hour keys", q125_epoch_hr),
    ]:
        df = fn(spark, tier)
        _gate(label, df, expect125)
        _time(label, df)


if __name__ == "__main__":
    main()
