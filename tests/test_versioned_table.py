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


def test_streaming_append_exactly_once(spark, tmp_path):
    """foreachBatch sink: replayed micro-batches are no-ops (batch_id is
    recorded atomically in the manifest), fresh batches append."""
    t = VersionedTable(str(tmp_path / "tbl"))
    assert t.commit_batch(spark.range(0, 10), batch_id=0) == 0
    assert t.commit_batch(spark.range(0, 10), batch_id=0) is None  # replay
    assert t.read(spark).count() == 10
    assert t.commit_batch(spark.range(10, 15), batch_id=1) == 1
    assert t.read(spark).count() == 15

    src_dir = tmp_path / "stream_in"
    src_dir.mkdir()
    spark.range(100, 120).write.parquet(str(src_dir / "drop0"))
    stream = spark.readStream.schema("id LONG").parquet(str(src_dir) + "/*")
    q = (
        stream.writeStream.foreachBatch(lambda b, i: t.commit_batch(b, 1000 + i))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert t.read(spark).count() == 35


def test_batch_replay_rejected_after_vacuum(spark, tmp_path):
    """The exactly-once marker must survive vacuum: every manifest carries
    the full applied-batch set forward, so a late replay of a batch whose
    original manifest was vacuumed is still a no-op."""
    t = VersionedTable(str(tmp_path / "tbl"))
    assert t.commit_batch(spark.range(0, 10), batch_id=0) == 0
    assert t.commit_batch(spark.range(10, 20), batch_id=1) == 1
    assert t.commit_batch(spark.range(20, 30), batch_id=2) == 2
    t.vacuum(retain_versions=1, grace_seconds=0)  # drops batches 0,1 manifests
    assert t.commit_batch(spark.range(0, 10), batch_id=0) is None
    assert t.commit_batch(spark.range(10, 20), batch_id=1) is None
    assert t.read(spark).count() == 30
    # the marker set also rides through non-batch commits (e.g. a MERGE)
    t.commit(spark.range(100), mode="overwrite")
    assert t.commit_batch(spark.range(0, 10), batch_id=2) is None


def test_manifests_are_never_torn(spark, tmp_path):
    """Every published manifest must be complete at the instant it becomes
    visible (hard-link of fully-written content); a leftover zero-byte
    manifest from a crashed legacy writer is skipped, not fatal."""
    import json
    import os

    t = VersionedTable(str(tmp_path / "tbl"))
    t.commit(spark.range(10))
    mdir = os.path.join(str(tmp_path / "tbl"), "manifest")
    for f in os.listdir(mdir):
        assert not f.endswith(".tmp")  # publish leaves no temp files
        with open(os.path.join(mdir, f)) as fh:
            json.load(fh)  # parseable == complete
    # simulate a torn legacy manifest: readers must not crash on it
    open(os.path.join(mdir, "v99.json"), "w").close()
    assert t.versions() == [0]
    assert t.read(spark).count() == 10


def test_vacuum_removes_unreferenced_keeps_live(spark, tmp_path):
    import os

    t = VersionedTable(str(tmp_path / "tbl"))
    t.commit(spark.range(10))                     # v0 (aged out below)
    t.commit(spark.range(20))                     # v1 (aged out below)
    t.commit(spark.range(5), mode="append")       # v2 references v1's dir
    audit = t.vacuum(retain_versions=1, grace_seconds=0)
    assert audit["kept_versions"] == [2]
    assert audit["dropped_versions"] == [0, 1]
    # v2 still fully readable: its manifest references v1's data dir,
    # which vacuum must therefore have kept
    assert t.read(spark).count() == 25
    assert t.versions() == [2]
    # v0's dir is gone: only v2's referenced dirs remain on disk
    live = set(t._manifest(2)["dirs"])
    on_disk = {
        os.path.join(str(tmp_path / "tbl"), "data", d)
        for d in os.listdir(os.path.join(str(tmp_path / "tbl"), "data"))
    }
    assert on_disk == live


def test_changes_between_versions(spark, tmp_path):
    from pyspark.sql import functions as F

    t = VersionedTable(str(tmp_path / "tbl"))
    t.commit(
        spark.range(0, 20).select(
            "id", F.when(F.col("id") < 5, "x").otherwise("y").alias("s")
        )
    )
    t.commit(
        spark.range(10, 30).select(
            "id", F.when(F.col("id") % 2 == 0, "x").otherwise("y").alias("s")
        )
    )
    cdc = t.changes_between(spark, "id", 0, 1)
    counts = {
        r.change_type: r.n
        for r in cdc.groupBy("change_type").agg(F.count("*").alias("n")).collect()
    }
    assert counts["added"] == 10        # ids 20-29
    assert counts["removed"] == 10      # ids 0-9
    assert counts["added"] + counts["removed"] + counts.get("changed", 0) + counts.get(
        "unchanged", 0
    ) == 30
    row = {r.id: r for r in cdc.collect()}
    assert row[25].change_type == "added" and row[25].old_s is None
    assert row[3].change_type == "removed" and row[3].new_s is None
    # ids 10-19: v0 says 'y' (id>=5), v1 says x if even — odd ids unchanged
    assert row[12].change_type == "changed" and (row[12].old_s, row[12].new_s) == ("y", "x")
    assert row[11].change_type == "unchanged"


def test_transactional_merge_upsert(spark, tmp_path):
    from pyspark.sql import functions as F

    t = VersionedTable(str(tmp_path / "tbl"))
    base = spark.range(0, 10).select("id", F.lit("old").alias("s"))
    t.commit(base)
    updates = spark.range(5, 15).select("id", F.lit("new").alias("s"))
    v = t.merge(updates, pk="id")
    assert v == 1
    rows = {r.id: r.s for r in t.read(spark).collect()}
    assert len(rows) == 15
    assert rows[3] == "old" and rows[7] == "new" and rows[12] == "new"
    # the pre-merge snapshot is still readable (time travel)
    assert {r.s for r in t.read(spark, 0).collect()} == {"old"}


def test_merge_retries_after_commit_race(spark, tmp_path, monkeypatch):
    from pyspark.sql import functions as F

    from coldata_spark.operators import table as TB

    t = VersionedTable(str(tmp_path / "tbl"))
    t.commit(spark.range(0, 5).select("id", F.lit("a").alias("s")))

    real_commit = VersionedTable.commit
    raced = {"done": False}

    def racing_commit(self, df, mode="overwrite", expected_version=None, extra=None):
        # first merge attempt: another writer lands just before our claim
        if expected_version is not None and not raced["done"]:
            raced["done"] = True
            real_commit(
                self,
                df.sparkSession.range(0, 5).select("id", F.lit("b").alias("s")),
            )
        return real_commit(self, df, mode, expected_version, extra)

    monkeypatch.setattr(VersionedTable, "commit", racing_commit)
    v = t.merge(spark.range(3, 8).select("id", F.lit("m").alias("s")), pk="id")
    # raced commit took v1; the merge re-planned on it and landed v2
    assert v == 2
    rows = {r.id: r.s for r in t.read(spark).collect()}
    assert rows == {0: "b", 1: "b", 2: "b", 3: "m", 4: "m", 5: "m", 6: "m", 7: "m"}
