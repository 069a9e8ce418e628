"""Skew salting and exactly-once run-partitioned ingest."""

from __future__ import annotations

from pyspark.sql import functions as F

from coldata_spark.operators.skew import salted_agg
from coldata_spark.operators.upsert import write_run_partition
from coldata_spark.tables import load


def test_salted_agg_matches_plain(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    got = (
        salted_agg(
            ev,
            ["event_type"],
            {
                "n": (F.count("*"), F.sum("n")),
                "total": (F.sum("value"), F.round(F.sum("total"), 2)),
                "mx": (F.max("value"), F.round(F.max("mx"), 2)),
            },
        )
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    plain = (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
            F.round(F.max("value"), 2).alias("mx"),
        )
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    assert got["n"].equals(plain["n"])
    assert (got["total"] - plain["total"]).abs().max() < 0.02  # fp order
    assert got["mx"].equals(plain["mx"])


def test_run_partition_idempotent_retry(spark, sf_dir, tmp_path):
    """A retried run overwrites ITS OWN partition — no duplicates; a new
    run appends its own partition only."""
    docs = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("index"), "text"
    )
    path = str(tmp_path / "ingest_table")

    run1 = docs.filter(F.col("index").cast("long") < 100)
    write_run_partition(run1, path, "run1")
    n1 = spark.read.parquet(path).count()
    # retry of run1 (e.g. after failure) — same partition replaced
    write_run_partition(run1, path, "run1")
    assert spark.read.parquet(path).count() == n1

    run2 = docs.filter(
        (F.col("index").cast("long") >= 100) & (F.col("index").cast("long") < 150)
    )
    write_run_partition(run2, path, "run2", existing=spark.read.parquet(path))
    total = spark.read.parquet(path)
    assert total.count() == n1 + run2.count()
    assert total.select("index").distinct().count() == total.count()
    # run2 retried with existing-check: its partition rewrites to the same rows
    write_run_partition(run2, path, "run2")
    assert spark.read.parquet(path).count() == n1 + run2.count()


def test_tune_for_input_thresholds(spark):
    """Size-based knob tuning: tiny input -> static plan (AQE off, few
    partitions); big input -> AQE on with bytes-proportional partitions
    clamped to [cores, 2000]."""
    from coldata_spark.session import SMALL_INPUT_BYTES, tune_for_input

    cores = spark.sparkContext.defaultParallelism
    try:
        tune_for_input(spark, 10 << 20)  # 10 MiB: scheduling-latency floor
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) == 8

        tune_for_input(spark, 1 << 30)  # 1 GiB: ~32 MiB per reduce partition
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) == max(
            8, min(cores // 2, 32)
        )

        tune_for_input(spark, 1 << 40)  # 1 TiB
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) == 2000

        tune_for_input(spark, SMALL_INPUT_BYTES)  # exactly at threshold: big path
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) >= cores
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", "8")


def test_salted_join_equals_plain_join(spark):
    """salted_join must be a drop-in for an equi-join on a skewed key."""
    from coldata_spark.operators.skew import salted_join

    # skewed fact: one hot key owning ~90% of rows
    big = spark.range(0, 20000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 0 ELSE id % 7 END AS k", "id AS v"
    )
    small = spark.range(0, 7).selectExpr("id AS k", "id * 100 AS w")

    plain = big.join(small, "k").selectExpr("k", "v", "w")
    salted = salted_join(big, small, "k").selectExpr("k", "v", "w")
    assert plain.count() == salted.count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    left_plain = big.join(small.filter("k < 3"), "k", "left")
    left_salted = salted_join(big, small.filter("k < 3"), "k", how="left")
    assert sorted(map(tuple, left_plain.select("k", "v", "w").collect())) == sorted(
        map(tuple, left_salted.select("k", "v", "w").collect())
    )


def test_salted_join_refuses_outer_preserving_small_side(spark):
    """right/full outer would emit each unmatched small-side row once per
    salt — the operator must refuse rather than silently duplicate."""
    import pytest

    from coldata_spark.operators.skew import salted_join

    big = spark.range(5).selectExpr("id AS k", "id AS v")
    small = spark.range(10).selectExpr("id AS k", "id AS w")
    for how in ("right", "full", "right_outer", "full_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(big, small, "k", how=how)
