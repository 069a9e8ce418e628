"""Crash-window tests for the fold-commit protocol
(coldata_spark/streaming/foldcommit.py) — the exactly-once guarantee the
streaming sketch/rollup maintainers rely on.

Round-3 review found two crash windows in the old stage-swap-marker recipe:
a torn swap (table renamed away, crash before the stage rename) silently
dropped all prior state on replay, and a crash after the swap but before
the marker double-counted the batch.  These tests reconstruct each on-disk
crash state by hand and assert the replay converges to the correct table.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from coldata_spark.streaming import foldcommit as FC


def _merge(existing, part):
    return (
        existing.unionByName(part)
        .groupBy("k")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def _tbl(spark, rows):
    return spark.createDataFrame(rows, "k string, cnt long")


def _read(spark, path):
    return {
        (r.k, r.cnt) for r in spark.read.parquet(path).collect()
    }


@pytest.fixture()
def seeded(spark, tmp_path):
    """A table with batch 0 applied, plus the batch-1 partial."""
    table = str(tmp_path / "t")
    FC.fold_once(_tbl(spark, [("a", 1), ("b", 2)]), table, 0, _merge)
    part1 = _tbl(spark, [("b", 10), ("c", 20)])
    want_after_1 = {("a", 1), ("b", 12), ("c", 20)}
    return table, part1, want_after_1


def test_fold_once_basic_and_replay(spark, seeded):
    table, part1, want = seeded
    FC.fold_once(part1, table, 1, _merge)
    assert _read(spark, table) == want
    # replay of an applied batch is a no-op (additive fold, marker-gated)
    FC.fold_once(part1, table, 1, _merge)
    assert _read(spark, table) == want


def test_crash_between_swap_renames_keeps_prior_state(spark, seeded):
    """Torn swap: stage complete (sentinel present), table renamed to .old,
    crash before stage->table.  The old recipe replayed from the partial
    alone, dropping batch 0; now the committed stage is recovered."""
    table, part1, want = seeded
    # hand-build the crash state: merged stage + sentinel + half swap
    merged = _merge(spark.read.parquet(table), part1)
    merged.write.parquet(table + ".stage-1")
    open(table + ".done-1", "w").close()
    os.rename(table, table + ".old-1")
    assert not os.path.isdir(table)

    FC.fold_once(part1, table, 1, _merge)  # the replay
    assert _read(spark, table) == want
    assert FC.is_applied(table, 1)
    assert not os.path.exists(table + ".done-1")
    assert not os.path.isdir(table + ".old-1")
    # and a FURTHER replay still changes nothing
    FC.fold_once(part1, table, 1, _merge)
    assert _read(spark, table) == want


def test_crash_after_swap_before_marker_no_double_count(spark, seeded):
    """Swap finished, crash before the applied marker: the sentinel still
    exists, so the replay must recognize the batch as committed instead of
    folding the partial a second time (the old double-count hole)."""
    table, part1, want = seeded
    merged = _merge(spark.read.parquet(table), part1)
    staged = table + ".stage-1"
    merged.write.parquet(staged)
    open(table + ".done-1", "w").close()
    os.rename(table, table + ".old-1")
    os.rename(staged, table)  # swap complete; crash before marker

    FC.fold_once(part1, table, 1, _merge)  # the replay
    assert _read(spark, table) == want  # NOT b=22 / c=40
    assert FC.is_applied(table, 1)


def test_uncommitted_stage_is_discarded_and_refolded(spark, seeded):
    """Crash mid-stage-write (no sentinel): the partial stage is residue,
    not a commit — replay discards it and folds cleanly."""
    table, part1, want = seeded
    os.makedirs(table + ".stage-1")
    open(os.path.join(table + ".stage-1", "part-junk"), "w").write("x")

    FC.fold_once(part1, table, 1, _merge)
    assert _read(spark, table) == want


def test_legacy_half_swap_without_sentinel_restores_old(spark, seeded):
    """Residue from the OLD recipe: table missing, .old present, no
    sentinel.  recover() restores the newest .old so prior state survives,
    then the fold proceeds normally."""
    table, part1, want = seeded
    os.rename(table, table + ".old-1")

    FC.fold_once(part1, table, 1, _merge)
    assert _read(spark, table) == want


def test_idempotent_mode_refolds_same_batch_id(spark, tmp_path):
    """idempotent=True skips the marker early-return: manual max-merge
    callers may reuse a batch id and still fold new data."""
    table = str(tmp_path / "t")

    def merge_max(existing, part):
        return (
            existing.unionByName(part)
            .groupBy("k")
            .agg(F.max("cnt").cast("long").alias("cnt"))
        )

    FC.fold_once(_tbl(spark, [("a", 1)]), table, 0, merge_max, idempotent=True)
    FC.fold_once(_tbl(spark, [("a", 5), ("b", 3)]), table, 0, merge_max,
                 idempotent=True)
    assert _read(spark, table) == {("a", 5), ("b", 3)}


def test_crash_at_every_fs_operation_converges(spark, tmp_path, monkeypatch):
    """Fault-injection sweep: kill the fold at its 1st, 2nd, ... Nth
    filesystem mutation (rename/remove/rmtree/marker-write), then replay
    with the SAME batch id.  Whatever the crash point, the replay must
    land on exactly one of the two legal outcomes — batch applied once
    (never twice), prior state never lost."""
    import os as _os
    import shutil as _shutil

    table = str(tmp_path / "t")
    FC.fold_once(_tbl(spark, [("a", 1), ("b", 2)]), table, 0, _merge)
    before = {("a", 1), ("b", 2)}
    applied = {("a", 1), ("b", 12), ("c", 20)}

    real_rename, real_remove, real_rmtree = _os.rename, _os.remove, _shutil.rmtree

    class Boom(RuntimeError):
        pass

    def run_with_crash_budget(budget: list[int]) -> bool:
        """Returns True if the fold crashed (budget exhausted)."""

        def gate():
            if budget[0] == 0:
                raise Boom()
            budget[0] -= 1

        def g_rename(a, b):
            gate()
            return real_rename(a, b)

        def g_remove(p):
            gate()
            return real_remove(p)

        def g_rmtree(p, **kw):
            gate()
            return real_rmtree(p, **kw)

        monkeypatch.setattr(FC.os, "rename", g_rename)
        monkeypatch.setattr(FC.os, "remove", g_remove)
        monkeypatch.setattr(FC.shutil, "rmtree", g_rmtree)
        try:
            FC.fold_once(_tbl(spark, [("b", 10), ("c", 20)]), table, 1, _merge)
            return False
        except Boom:
            return True
        finally:
            monkeypatch.setattr(FC.os, "rename", real_rename)
            monkeypatch.setattr(FC.os, "remove", real_remove)
            monkeypatch.setattr(FC.shutil, "rmtree", real_rmtree)

    crash_point = 0
    while True:
        crashed = run_with_crash_budget([crash_point])
        state = _read(spark, table) if _os.path.isdir(table) else None
        # invariant at EVERY crash point: prior data is on disk or
        # recoverable (never a silently-empty table with data loss)
        if state is not None:
            assert state in (before, applied), f"crash@{crash_point}: {state}"
        # replay with no faults must converge to applied-exactly-once
        FC.fold_once(_tbl(spark, [("b", 10), ("c", 20)]), table, 1, _merge)
        assert _read(spark, table) == applied, f"replay after crash@{crash_point}"
        assert FC.is_applied(table, 1)
        if not crashed:
            break  # budget exceeded the op count: clean run, sweep done
        # reset for the next crash point: rebuild the pre-batch state
        real_rmtree(table, ignore_errors=True)
        real_rmtree(table + ".applied", ignore_errors=True)
        for leftover in ("stage-1", "done-1", "old-1"):
            p = f"{table}.{leftover}"
            (real_rmtree(p, ignore_errors=True) if _os.path.isdir(p)
             else (real_remove(p) if _os.path.exists(p) else None))
        FC.fold_once(_tbl(spark, [("a", 1), ("b", 2)]), table, 0, _merge)
        crash_point += 1
        assert crash_point < 30, "sweep did not terminate"


def test_recover_is_safe_on_clean_table(spark, tmp_path):
    table = str(tmp_path / "t")
    FC.fold_once(_tbl(spark, [("a", 1)]), table, 0, _merge)
    FC.recover(table)
    assert _read(spark, table) == {("a", 1)}
    shutil.rmtree(table)
    FC.recover(table)  # no table at all: still a no-op
    assert not os.path.isdir(table)


def test_concurrent_reader_healing_never_loses_table(spark, tmp_path):
    """The round-4 ADVICE race, driven hard: reader threads hammer
    recover() exactly when the table directory is missing (the mid-swap
    window) while the single writer folds a sequence of batches.  With the
    flock serialization neither side may crash, lose the table, or deviate
    from the expected fold result — and every intermediate read sees
    either the pre- or post-fold table, never a partial."""
    import threading

    table = str(tmp_path / "race")

    stop = threading.Event()
    errors: list[BaseException] = []

    def reader():
        while not stop.is_set():
            try:
                if not os.path.isdir(table):
                    # the reader-side healing trigger: table missing —
                    # reader mode must never touch a live writer's stage,
                    # INCLUDING during the first-ever fold where the table
                    # directory is legitimately missing for the whole
                    # stage write
                    FC.recover(table, reader=True)
            except BaseException as e:  # noqa: BLE001 - collected for assert
                errors.append(e)
                return

    # readers start BEFORE the first fold: the table is missing while
    # batch 0's sentinel-less stage is being written — the exact window
    # where a stage-discarding healer would silently lose the batch
    threads = [threading.Thread(target=reader) for _ in range(4)]
    for t in threads:
        t.start()
    try:
        for b in range(6):
            FC.fold_once(_tbl(spark, [("a", 1)]), table, b, _merge)
    finally:
        stop.set()
        for t in threads:
            t.join()
    assert not errors, f"concurrent healer crashed: {errors[:1]}"
    assert _read(spark, table) == {("a", 6)}
    # no residue: every stage/old/sentinel consumed
    residue = [
        p
        for p in os.listdir(tmp_path)
        if p.startswith("race.") and not p.endswith((".applied", ".lock"))
    ]
    assert residue == [], residue
