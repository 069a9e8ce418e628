"""Sketch layer: probabilistic summaries with *exact* cross-engine oracles.

Spark ships HLL++ / KLL behind ``approx_count_distinct`` / ``approx_percentile``
(q75 exercises those, rows-only — their estimates are engine-internal and not
reproducible elsewhere).  Production corpus pipelines, however, standardize on
sketches whose layout is engine-independent so they can be built in one system
and merged/read in another.  These queries implement that: the sketch update
and estimate rules are pure integer column expressions derived from md5, so
DuckDB recomputes the identical registers bit-for-bit and the driver's
value-hash check verifies the *sketch algebra itself*, not just row counts.

Both sketches here are mergeable by construction (register max / counter sum),
which is exactly what makes them work as map-side partials at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coldata_spark.operators import sketches as SK
from coldata_spark.registry import register
from coldata_spark.tables import load

# Sketch mechanics (hash split, register math, CM row-hashes) live in
# operators/sketches.py; the oracle SQL below mirrors those expressions
# literally.  Kept for doc parity with the SQL constants:
_HLL_C = SK.HLL_C


@register(
    "q114_hll_distinct",
    survey="A5,ext-sketch",
    sql="""
    WITH h AS (
        SELECT l_returnflag AS flag,
               ('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))::BIGINT AS h32
        FROM lineitem
    ),
    b AS (SELECT flag, h32 // 16777216 AS idx, h32 % 16777216 AS w24 FROM h),
    r AS (
        SELECT flag, idx,
               max(CASE WHEN w24 = 0 THEN 25 ELSE 25 - length(bin(w24)) END) AS mx
        FROM b GROUP BY flag, idx
    ),
    s AS (
        SELECT flag, count(*) AS n_used,
               sum((1::BIGINT) << (25 - mx)) AS s_present
        FROM r GROUP BY flag
    ),
    e AS (
        SELECT l_returnflag AS flag, count(DISTINCT l_orderkey) AS exact_distinct
        FROM lineitem GROUP BY flag
    )
    SELECT s.flag AS l_returnflag,
           CAST(s.n_used AS BIGINT) AS n_registers,
           CAST(1579498136381 // (s.s_present + (256 - s.n_used) * 33554432)
                AS BIGINT) AS hll_estimate,
           CAST(e.exact_distinct AS BIGINT) AS exact_distinct
    FROM s JOIN e ON e.flag = s.flag
    """,
)
def q114_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-order count per return flag, next to the exact
    count so the result exhibits the sketch's error envelope.  Reference
    parity: the reference dedups/counts collections exactly (crawler.py
    count paths); this is the sketch the same pipeline needs once the key
    set no longer fits a hash table per group.

    Plan: one md5 + bit-split per row map-side, then a groupBy(flag,
    register) max — the shuffle carries at most groups x 256 rows no matter
    how many input rows, which IS the HLL promise at 100 TB.  The register
    max is algebraic (partial max merges), so map-side combine leaves
    ~256 rows per task."""
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_orderkey")
    flagged = li.select(F.col("l_returnflag").alias("flag"), "l_orderkey")
    regs = SK.hll_registers(flagged, ["flag"], "l_orderkey")
    est = SK.hll_estimate(regs, ["flag"])
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_distinct")
    )
    return (
        est.join(exact, est.flag == exact.l_returnflag)
        .select(
            "l_returnflag",
            "n_registers",
            "hll_estimate",
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
        )
    )


@register(
    "q115_cms_heavy_hitters",
    survey="A5,ext-sketch",
    sql="""
    WITH cand AS (SELECT p_partkey FROM part WHERE p_partkey % 97 = 1),
    rows_h AS (
        SELECT j,
               ('0x' || substring(md5(CAST(j AS VARCHAR) || ':' ||
                    CAST(l_partkey AS VARCHAR)), 1, 8))::BIGINT % 1024 AS bucket
        FROM lineitem, unnest([0, 1, 2, 3]) AS t(j)
    ),
    sketch AS (SELECT j, bucket, count(*) AS cnt FROM rows_h GROUP BY j, bucket),
    ch AS (
        SELECT p_partkey, j,
               ('0x' || substring(md5(CAST(j AS VARCHAR) || ':' ||
                    CAST(p_partkey AS VARCHAR)), 1, 8))::BIGINT % 1024 AS bucket
        FROM cand, unnest([0, 1, 2, 3]) AS t(j)
    ),
    est AS (
        SELECT ch.p_partkey, min(coalesce(sketch.cnt, 0)) AS cms_est
        FROM ch LEFT JOIN sketch ON sketch.j = ch.j AND sketch.bucket = ch.bucket
        GROUP BY ch.p_partkey
    ),
    ex AS (
        SELECT l_partkey, count(*) AS exact_cnt
        FROM lineitem JOIN cand ON p_partkey = l_partkey
        GROUP BY l_partkey
    )
    SELECT est.p_partkey,
           CAST(est.cms_est AS BIGINT) AS cms_est,
           CAST(coalesce(ex.exact_cnt, 0) AS BIGINT) AS exact_cnt,
           CAST(est.cms_est - coalesce(ex.exact_cnt, 0) AS BIGINT) AS overcount
    FROM est LEFT JOIN ex ON ex.l_partkey = est.p_partkey
    """,
)
def q115_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (d=4 rows x w=1024 buckets) over lineitem part
    keys, queried for a deterministic candidate key set, with the exact
    counts joined in so the one-sided overcount (cms_est >= exact_cnt,
    the CM guarantee) is visible in the result and checked by the oracle.

    Plan: the sketch build is a 4x row explode map-side, then ONE combine
    aggregation whose output is bounded by d*w = 4096 counters regardless
    of input size — the fixed-size-summary shape that replaces a full
    frequency table at 100 TB.  Candidate estimation broadcasts the probe
    rows against the 4096-row sketch; exact counts scan only the
    candidate-filtered fact rows (broadcast semi-join before the agg)."""

    li = load(spark, sf_dir, "lineitem").select("l_partkey")
    sketch = SK.cms_build(li, "l_partkey")
    cand = (
        load(spark, sf_dir, "part")
        .filter(F.expr("p_partkey % 97 = 1"))
        .select("p_partkey")
    )
    est = SK.cms_lookup(sketch, cand, "p_partkey")
    exact = (
        li.join(F.broadcast(cand), li.l_partkey == cand.p_partkey)
        .groupBy("l_partkey")
        .agg(F.count("*").alias("exact_cnt"))
    )
    return (
        est.join(F.broadcast(exact), est.p_partkey == exact.l_partkey, "left")
        .select(
            "p_partkey",
            F.col("cms_est").cast("long").alias("cms_est"),
            F.coalesce("exact_cnt", F.lit(0)).cast("long").alias("exact_cnt"),
            (F.col("cms_est") - F.coalesce("exact_cnt", F.lit(0)))
            .cast("long")
            .alias("overcount"),
        )
    )
