"""Crash-safe fold-commit protocol shared by the streaming sketch/rollup
maintainers (rollup.py, quantiles.py, cardinality.py).

The naive stage-swap-marker recipe has two crash windows (flagged in round-3
review):

* a crash between ``rename(table -> old)`` and ``rename(stage -> table)``
  leaves NO table, so a replay rebuilds from the partial alone and silently
  drops all prior state;
* a crash after the swap but before the applied-batch marker is written
  double-counts the batch on replay (fatal for additive folds).

This module closes both by making the *completed stage* the commit point:
after the stage parquet write finishes, a ``.done-{batch}`` sentinel is
created; everything after the sentinel (swap, old-cleanup, marker) is a
deterministic, resumable epilogue.  ``recover()`` runs on every fold entry:

* any batch whose sentinel exists is COMMITTED — its swap is finished and
  its applied marker written (replay becomes a no-op);
* any residue without a sentinel is rolled back — partial stages are
  discarded and a half-swapped ``.old`` directory is restored as the table.

All paths are driver-local renames; like the rest of the streaming twins
this assumes the sketch/rollup table lives on a filesystem the driver can
see (at cluster scale: a Delta/Iceberg MERGE replaces this whole file).
"""

from __future__ import annotations

import contextlib
import fcntl
import glob
import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame


@contextlib.contextmanager
def _locked(base: str):
    """Serialize healers/committers on ``base`` with an advisory flock.

    The reader-vs-writer race (round-4 ADVICE): between the writer's
    rename(base -> old) and rename(stage -> base) the table is momentarily
    missing, which is exactly the reader-side healing trigger — an
    unserialized concurrent _complete could then observe half-swapped
    state, mis-resolve it, and delete the only copy of the table.  ENOENT
    tolerance on individual renames cannot distinguish "the other healer
    finished" from "the other healer crashed mid-swap", so the swap
    epilogue is made MUTUALLY EXCLUSIVE instead: every recover()/
    _complete() holds this lock.  flock is released automatically on
    process death, so a crash while holding it never wedges the table —
    the next locker heals.  All paths are driver-local by module contract,
    so one host's flock is sufficient."""
    os.makedirs(os.path.dirname(base) or ".", exist_ok=True)
    with open(base + ".lock", "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(lk, fcntl.LOCK_UN)


def _fsync_path(path: str) -> None:
    """fsync a file or directory so a completed commit survives power loss,
    not just a process crash (VersionedTable.commit sets the precedent).
    Missing paths and filesystems that refuse directory fsync are ignored —
    durability degrades to process-crash-only there, never to corruption."""
    try:
        fd = os.open(path, os.O_RDONLY)
    except OSError:
        return
    try:
        os.fsync(fd)
    except OSError:
        pass
    finally:
        os.close(fd)


def _marker(base: str, batch_id: int) -> str:
    return os.path.join(base + ".applied", f"batch-{batch_id}")


def is_applied(table_path: str, batch_id: int) -> bool:
    return os.path.exists(_marker(table_path.rstrip("/"), batch_id))


def _mark_applied(base: str, batch_id: int) -> None:
    os.makedirs(base + ".applied", exist_ok=True)
    marker = _marker(base, batch_id)
    fd = os.open(marker, os.O_CREAT | os.O_WRONLY, 0o644)
    try:
        os.fsync(fd)
    except OSError:
        pass
    finally:
        os.close(fd)
    _fsync_path(base + ".applied")


def mark_applied(table_path: str, batch_id: int) -> None:
    """Public marker write for sinks that implement their own idempotent
    apply step (e.g. the deterministic-filename batch append in
    streaming/vectors.py) and only need the applied-batch bookkeeping."""
    _mark_applied(table_path.rstrip("/"), batch_id)


def _complete(base: str, batch_id: int) -> None:
    with _locked(base):
        _complete_unlocked(base, batch_id)


def _complete_unlocked(base: str, batch_id: int) -> None:
    """Epilogue for a committed batch (sentinel exists): finish the swap,
    drop the displaced table, write the applied marker, clear the
    sentinel.  Every step is idempotent, so this can resume from any crash
    point; the caller holds the table lock, so no concurrent healer can
    interleave with the renames (see _locked)."""
    stage = f"{base}.stage-{batch_id}"
    done = f"{base}.done-{batch_id}"
    old = f"{base}.old-{batch_id}"
    if os.path.isdir(stage):
        if os.path.isdir(base):
            os.rename(base, old)
        os.rename(stage, base)
    shutil.rmtree(old, ignore_errors=True)
    # make the swap durable before the applied marker references it
    _fsync_path(os.path.dirname(base) or ".")
    _mark_applied(base, batch_id)
    try:
        os.remove(done)
    except FileNotFoundError:
        pass
    _fsync_path(os.path.dirname(base) or ".")


RESERVED_BATCH_ID = 10**15
"""Synthetic batch-id namespace for non-stream callers (compaction, the
runner's store fold).  Stream checkpoints hand out small sequential ids
starting at 0, so a synthetic fold marking ``batch-0`` would silently
swallow a fresh stream's first micro-batch; reserved ids cannot collide."""


def recover(table_path: str, reader: bool = False) -> None:
    """Heal all crash residue around ``table_path`` before a fold decision.

    MUTATING: finishes committed swaps and (writer mode only) discards
    uncommitted stages.  The single writer calls this unconditionally;
    READERS pass ``reader=True``: a sentinel-less stage may belong to a
    LIVE writer mid-fold (the stage parquet write runs outside the lock,
    and on a first-ever fold the table directory is legitimately missing
    the whole time), so reader-mode never touches stages — completing
    sentineled swaps and restoring a legacy half-swap is all a reader
    needs to make the table readable again.  The pass holds the table
    lock, and reader mode also revalidates the missing-table trigger
    under it (the writer may have finished the swap in the meantime)."""
    base = table_path.rstrip("/")
    with _locked(base):
        if reader and os.path.isdir(base):
            return  # swap finished while we waited for the lock
        # numeric batch order (string sort would put done-10 before done-2
        # and let an older batch's swap clobber a newer one's committed
        # state)
        for _bid, _done in sorted(
            (int(p.rsplit("-", 1)[1]), p)
            for p in glob.glob(glob.escape(base) + ".done-*")
        ):
            _complete_unlocked(base, _bid)
        if not reader:
            # No sentinel => the batch never committed: discard partial
            # stages.  Writer-only: the writer is the sole stage producer,
            # so inside its own recover() any leftover stage is crash
            # residue by definition; a reader cannot know that.
            for stage in glob.glob(glob.escape(base) + ".stage-*"):
                shutil.rmtree(stage, ignore_errors=True)
        # A lone .old with the table missing is a half-swap from the OLD
        # recipe (pre-sentinel); restore the newest so no prior state is
        # lost.
        olds = sorted(
            glob.glob(glob.escape(base) + ".old-*"),
            key=lambda p: int(p.rsplit("-", 1)[1]),
        )
        if olds and not os.path.isdir(base):
            os.rename(olds[-1], base)
        for old in olds:
            shutil.rmtree(old, ignore_errors=True)


def fold_once(
    partial: DataFrame,
    table_path: str,
    batch_id: int,
    merge: Callable[[DataFrame, DataFrame], DataFrame],
    idempotent: bool = False,
) -> None:
    """Fold ``partial`` into the parquet table at ``table_path`` exactly
    once per ``batch_id``, surviving a crash at any point.

    ``merge(existing, partial)`` produces the new table contents; it runs
    only when the table already exists.  For additive merges the applied
    marker is the exactly-once guarantee; pass ``idempotent=True`` for
    merges where replays are harmless (HLL max) — the marker early-return
    is skipped so repeat calls under the same batch_id still fold, while
    the sentinel swap still protects against torn-table crashes."""
    base = table_path.rstrip("/")
    recover(base)
    if not idempotent and is_applied(base, batch_id):
        return
    spark = partial.sparkSession
    if os.path.isdir(base):
        merged = merge(spark.read.parquet(base), partial)
    else:
        merged = partial
    stage = f"{base}.stage-{batch_id}"
    merged.write.mode("overwrite").parquet(stage)
    # Durability order matters: the staged DATA must reach disk BEFORE the
    # sentinel that declares it authoritative — Spark's local committer
    # does not fsync file contents on close, so without this a power loss
    # could leave a durable sentinel pointing at torn page-cache-only
    # parquet, which recover() would then promote over the table.  Sketch/
    # rollup stages are small, so the walk is cheap.
    for root, dirs, files in os.walk(stage, topdown=False):
        for name in files:
            _fsync_path(os.path.join(root, name))
        _fsync_path(root)
    # COMMIT POINT: the sentinel makes the completed stage authoritative.
    # fsync the sentinel AND its directory so the commit survives power
    # loss, not just process death (the docstring's "crash at any point").
    fd = os.open(f"{base}.done-{batch_id}", os.O_CREAT | os.O_WRONLY, 0o644)
    try:
        os.fsync(fd)
    except OSError:
        pass
    finally:
        os.close(fd)
    _fsync_path(os.path.dirname(base) or ".")
    _complete(base, batch_id)
