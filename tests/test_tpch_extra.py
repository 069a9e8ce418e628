"""Semantics tests for the extended relational coverage (tpch_extra.py):
MERGE upsert behavior and approximate-aggregate accuracy vs exact."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from coldata_spark.operators.upsert import merge_upsert
from coldata_spark.tables import load


def test_merge_upsert_update_and_insert(spark):
    existing = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["pk", "tag", "val"]
    )
    updates = spark.createDataFrame(
        [(2, "B", 200.0), (4, "d", 40.0)], ["pk", "tag", "val"]
    )
    out = {r["pk"]: r for r in merge_upsert(existing, updates, pk="pk").collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["tag"] == "a" and out[1]["val"] == 10.0  # untouched
    assert out[2]["tag"] == "B" and out[2]["val"] == 200.0  # updated
    assert out[4]["tag"] == "d" and out[4]["val"] == 40.0  # inserted


def test_merge_upsert_idempotent(spark):
    existing = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["pk", "val"])
    updates = spark.createDataFrame([(2, 99.0), (3, 30.0)], ["pk", "val"])
    once = merge_upsert(existing, updates, pk="pk")
    twice = merge_upsert(once, updates, pk="pk")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_merge_upsert_schema_mismatch_raises(spark):
    existing = spark.createDataFrame([(1, 10.0)], ["pk", "val"])
    updates = spark.createDataFrame([(1, "x")], ["pk", "other"])
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(existing, updates, pk="pk")


def test_approx_distinct_within_tolerance(spark, sf_dir):
    """HLL++ default rsd is 5%; assert the sketch lands within 10% of exact
    per group (deterministic — same data, same sketch implementation)."""
    li = load(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    approx = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(exact) == set(approx)
    for flag, n in exact.items():
        assert abs(approx[flag] - n) <= max(2, 0.10 * n), (flag, n, approx[flag])


def test_approx_percentile_brackets_exact_median(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    got = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("m")
    ).collect()[0]["m"]
    lo, hi = li.agg(
        F.expr("percentile(l_extendedprice, 0.45)").alias("lo"),
        F.expr("percentile(l_extendedprice, 0.55)").alias("hi"),
    ).collect()[0]
    assert lo <= got <= hi
