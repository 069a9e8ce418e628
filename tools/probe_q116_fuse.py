#!/usr/bin/env python
"""q116 per-row-term probe (round-11 verdict ask #1, option a).

SCALE.md's decomposition leaves q116@16x at ~0.39 s fixed + ~1.6x
per-row gap vs DuckDB, with the plan already minimal (one lead window +
one agg reusing the partitioning).  The verdict names one untried cut:
fuse the duration x value product into the WINDOW projection so the
aggregate sums plain columns instead of evaluating v_c * dur_s inside
the partial-agg stage.  This probe measures that, plus controls that
bound where the time actually goes:

  scan_count    events scan + count floor
  production    q116 as shipped
  fused         wprod = v_c * dur_s emitted by the window projection;
                agg sums plain columns
  window_only   the lead window + filter alone, no aggregation
                (bounds the agg stage's share)
  no_tiebreak   orderBy(ts) without the event_id tiebreak (NOT
                shippable — oracle needs the deterministic order; only
                bounds what the second sort key costs)

DuckDB runs the q116 oracle for the denominator.
Run: python tools/probe_q116_fuse.py [tier] (prints one JSON line)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from bench import _pretouch
from coldata_spark import registry
from coldata_spark.session import dir_bytes, get_spark, tune_for_input
from coldata_spark.tables import load

tier = sys.argv[1] if len(sys.argv) > 1 else "16x"
tier_dir = os.path.join("/root/repo/.bench_cache", tier)

_pretouch(os.path.join(tier_dir, "events.parquet"))
spark = get_spark(app_name="probe_q116_fuse")
tune_for_input(spark, dir_bytes(tier_dir))
ev = load(spark, tier_dir, "events")


def _seg(order_cols):
    w = W.partitionBy("user_id").orderBy(*order_cols)
    return ev.select(
        "user_id",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("v_c"),
        (
            F.lead(F.col("ts").cast("long")).over(w)
            - F.col("ts").cast("long")
        ).alias("dur_s"),
    ).filter(F.col("dur_s").isNotNull())


def production():
    seg = _seg(["ts", "event_id"])
    return (
        seg.groupBy("user_id")
        .agg(
            F.count("dur_s").cast("long").alias("n_segments"),
            F.sum("dur_s").cast("long").alias("total_s"),
            F.expr(
                "CAST((1000000 * sum(v_c * dur_s)) div sum(dur_s) AS BIGINT)"
            ).alias("twa_centi_micro"),
        )
        .filter(F.col("total_s") > 0)
    )


def fused():
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.select(
        "user_id",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("v_c"),
        (
            F.lead(F.col("ts").cast("long")).over(w)
            - F.col("ts").cast("long")
        ).alias("dur_s"),
    ).select(
        "user_id",
        "dur_s",
        (F.col("v_c") * F.col("dur_s")).alias("wprod"),
    ).filter(F.col("dur_s").isNotNull())
    return (
        seg.groupBy("user_id")
        .agg(
            F.count("dur_s").cast("long").alias("n_segments"),
            F.sum("dur_s").cast("long").alias("total_s"),
            F.expr(
                "CAST((1000000 * sum(wprod)) div sum(dur_s) AS BIGINT)"
            ).alias("twa_centi_micro"),
        )
        .filter(F.col("total_s") > 0)
    )


variants = {
    "scan_count": lambda: ev.count(),
    "production": lambda: production().count(),
    "fused": lambda: fused().count(),
    "window_only": lambda: _seg(["ts", "event_id"]).count(),
    "no_tiebreak": lambda: _seg(["ts"]).count(),
}
out = {"tier": tier}
for name, fn in variants.items():
    fn()  # warm
    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        fn()
        runs.append(round(time.perf_counter() - t0, 3))
    out[name] = runs

# sanity: fused must return IDENTICAL rows to production
assert {tuple(r) for r in production().collect()} == {
    tuple(r) for r in fused().collect()
}, "fused variant diverged from production"
out["fused_identical"] = True
spark.stop()

con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")
p = os.path.join(tier_dir, "events.parquet")
src = f"{p}/*.parquet" if os.path.isdir(p) else p
con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{src}')")
sql = registry.specs()["q116_time_weighted_avg"].sql
con.execute(sql).df()  # warm
runs = []
for _ in range(5):
    t0 = time.perf_counter()
    con.execute(sql).df()
    runs.append(round(time.perf_counter() - t0, 3))
out["duckdb_full"] = runs
print(json.dumps(out))
