#!/usr/bin/env python
"""q114-family per-row expression-gap probe (round-10 verdict ask #3).

Bounds how much of the HLL register-build cost is HASH ARITHMETIC vs
scan+groupBy, and whether projection-chain depth matters:

  scan_count           the scan+count floor
  registers_current    production hll_registers (fold + 5 chained
                       one-step projections + bit-split + groupBy max)
  registers_collapsed  identical expressions nested into ONE projection
                       (tests the expression-tree-depth hypothesis)
  registers_xxhash     Spark-native xxhash64 replaces fold+mix (control:
                       the cheapest possible real hash — NOT portable,
                       the oracle keeps the murmur finalizer; this only
                       bounds hash cost vs the rest)
  registers_nohash     h32 = pmod(key, 2^32), no mixing at all (bounds
                       the bit-split + shuffle + max-agg residual)

DuckDB runs the oracle twin's register build for the denominator.
Run: python tools/probe_q114_hash.py [tier]   (prints one JSON line)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F

from bench import _pretouch
from coldata_spark import registry  # noqa: F401 (registers tables module)
from coldata_spark.operators import sketches as SK
from coldata_spark.session import dir_bytes, get_spark, tune_for_input
from coldata_spark.tables import load

tier = sys.argv[1] if len(sys.argv) > 1 else "16x"
tier_dir = os.path.join("/root/repo/.bench_cache", tier)

_pretouch(os.path.join(tier_dir, "lineitem.parquet"))
spark = get_spark(app_name="probe_q114_hash")
tune_for_input(spark, dir_bytes(tier_dir))
li = load(spark, tier_dir, "lineitem").select(
    F.col("l_returnflag").alias("flag"), "l_orderkey"
)


def _registers_from_h32(b, h32_expr: str):
    """idx/rank bit-split + groupBy max over a prebuilt h32 column expr."""
    b = b.select("flag", F.expr(h32_expr).alias("h32"))
    b = b.select(
        "flag",
        F.expr(f"h32 div {SK._W_MOD}").alias("idx"),
        F.expr(
            f"case when h32 % {SK._W_MOD} = 0 then {SK._MAX_RANK}"
            f" else {SK._MAX_RANK - 1} - cast(floor(log2(h32 % {SK._W_MOD})) as int) end"
        ).alias("rank"),
    )
    return b.groupBy("flag", "idx").agg(F.max("rank").alias("mx"))


def registers_collapsed():
    """The identical fold+mix arithmetic nested into ONE projection."""
    h = SK._spark_fold64("l_orderkey")
    for step in SK._mix32_steps(SK._spark_xor, "div"):
        h = step.format(h=h)
    return _registers_from_h32(
        li.filter(F.col("l_orderkey").isNotNull()), h
    )


variants = {
    "scan_count": lambda: li.count(),
    "registers_current": lambda: SK.hll_registers(
        li, ["flag"], "l_orderkey"
    ).count(),
    "registers_collapsed": lambda: registers_collapsed().count(),
    "registers_xxhash": lambda: _registers_from_h32(
        li, "pmod(xxhash64(l_orderkey), 4294967296)"
    ).count(),
    "registers_nohash": lambda: _registers_from_h32(
        li, "pmod(l_orderkey, 4294967296)"
    ).count(),
}
out = {}
for name, fn in variants.items():
    fn()  # warm
    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        fn()
        runs.append(round(time.perf_counter() - t0, 3))
    out[name] = runs

# sanity: collapsed must compute the IDENTICAL registers as current
cur = {
    tuple(r) for r in SK.hll_registers(li, ["flag"], "l_orderkey").collect()
}
col = {tuple(r) for r in registers_collapsed().collect()}
out["collapsed_identical"] = cur == col
spark.stop()

con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")
p = os.path.join(tier_dir, "lineitem.parquet")
src = f"{p}/*.parquet" if os.path.isdir(p) else p
con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{src}')")
duck_regs = (
    "WITH "
    + SK.hll_h32_sql(
        "(SELECT l_returnflag AS flag, l_orderkey FROM lineitem)",
        "flag",
        "l_orderkey",
    )
    + f""",
    split AS (
        SELECT flag, h // {SK._W_MOD} AS idx,
               CASE WHEN h % {SK._W_MOD} = 0 THEN {SK._MAX_RANK}
                    ELSE {SK._MAX_RANK - 1} - CAST(floor(log2(h % {SK._W_MOD})) AS INT)
               END AS rank
        FROM m5
    )
    SELECT flag, idx, max(rank) AS mx FROM split GROUP BY flag, idx
    """
)
dsql = {
    "duck_scan_count": "SELECT count(*) FROM (SELECT l_returnflag, l_orderkey FROM lineitem)",
    "duck_registers": f"SELECT count(*) FROM ({duck_regs})",
}
for name, sql in dsql.items():
    con.execute(sql).df()
    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        con.execute(sql).df()
        runs.append(round(time.perf_counter() - t0, 3))
    out[name] = runs
con.close()
print(
    json.dumps(
        {
            k: (min(v) if isinstance(v, list) else v)
            for k, v in out.items()
        }
    )
)
print(json.dumps(out))
