"""Bucketed co-located join (SURVEY — 'co-locate joins via bucketing'):
writing both join sides bucketed+sorted by the key lets the join run with
ZERO exchanges — at 100 TB this is the difference between a full-network
shuffle of the fact table per join and none."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from coldata_spark.tables import load


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    # tables land in ./spark-warehouse (gitignored); dropped on teardown
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_no_shuffle(spark, sf_dir, bucketed_tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        li = spark.table("li_bucketed")
        orders = spark.table("orders_bucketed")
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        # and it computes the right thing
        n = joined.count()
        plain = (
            load(spark, sf_dir, "lineitem")
            .join(
                load(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert n == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
