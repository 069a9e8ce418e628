"""Versioned-table commit protocol: snapshot isolation, time travel,
constant-cost append, and optimistic-concurrency conflict detection."""

from __future__ import annotations

import pytest

from coldata_spark.operators.table import VersionConflict, VersionedTable


def test_commit_read_time_travel(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    v0 = t.commit(spark.range(0, 100), mode="overwrite")
    v1 = t.commit(spark.range(100, 150), mode="append")
    v2 = t.commit(spark.range(0, 10), mode="overwrite")
    assert (v0, v1, v2) == (0, 1, 2)

    assert t.read(spark, 0).count() == 100
    assert t.read(spark, 1).count() == 150  # append references v0's files
    assert t.read(spark, 2).count() == 10   # overwrite starts fresh
    assert t.read(spark).count() == 10      # latest
    # append preserved exact contents
    assert set(r.id for r in t.read(spark, 1).collect()) == set(range(150))

    assert t.history() == [
        {"version": 0, "mode": "overwrite", "n_dirs": 1},
        {"version": 1, "mode": "append", "n_dirs": 2},
        {"version": 2, "mode": "overwrite", "n_dirs": 1},
    ]


def test_version_conflict_detected(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    t.commit(spark.range(10))
    # writer A plans against v0, intending to land v1 ...
    intended = t.latest_version() + 1
    # ... but writer B lands v1 first
    t.commit(spark.range(99, 100))
    with pytest.raises(VersionConflict):
        t.commit(spark.range(5), expected_version=intended)
    # A re-plans against latest and succeeds
    assert t.commit(spark.range(5)) == 2


def test_snapshot_diff_between_versions(spark, tmp_path):
    """Versions feed the q127-style diff: classify rows across snapshots."""
    from pyspark.sql import functions as F

    t = VersionedTable(str(tmp_path / "tbl"))
    t.commit(spark.range(0, 20).withColumn("s", F.lit("a")))
    t.commit(spark.range(10, 30).withColumn("s", F.lit("b")))

    v1 = t.read(spark, 0).alias("a")
    v2 = t.read(spark, 1).alias("b")
    j = v1.join(v2, F.col("a.id") == F.col("b.id"), "full")
    change = (
        F.when(F.col("a.id").isNull(), "added")
        .when(F.col("b.id").isNull(), "removed")
        .when(F.col("a.s") != F.col("b.s"), "changed")
        .otherwise("unchanged")
    )
    got = {
        r.change_type: r.n
        for r in j.select(change.alias("change_type"))
        .groupBy("change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == {"added": 10, "removed": 10, "changed": 10}
