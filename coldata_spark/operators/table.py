"""Versioned parquet table — snapshot manifests with time travel
(an Iceberg/Delta-lite commit protocol from plain files).

The reference's store relies on MongoDB for in-place upsert; a 100 TB
Spark pipeline instead wants IMMUTABLE data files plus a tiny manifest
per committed version, so that:

  * readers pin a snapshot (no torn reads while a writer lands),
  * any historical version stays queryable (time travel — the input to
    the q127-style snapshot diff),
  * commits are atomic: data lands in a new directory, then the fully
    written manifest is hard-linked to its version name (atomic on
    POSIX); a version is visible iff its complete manifest exists,
  * concurrent writers conflict safely: os.link fails with EEXIST for
    the loser of a race, who gets VersionConflict instead of
    corrupting history (optimistic concurrency, Delta-style).

Layout:
    <path>/data/v<N>-<mode>/...parquet   immutable data directories
    <path>/manifest/v<N>.json            {"dirs": [...]} per version
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class VersionConflict(RuntimeError):
    """Another writer committed this version first — retry on latest."""


class VersionedTable:
    def __init__(self, path: str):
        self.path = path.rstrip("/")
        os.makedirs(os.path.join(self.path, "data"), exist_ok=True)
        os.makedirs(os.path.join(self.path, "manifest"), exist_ok=True)

    # -- manifest bookkeeping -------------------------------------------
    def versions(self) -> list[int]:
        mdir = os.path.join(self.path, "manifest")
        out = []
        for f in os.listdir(mdir):
            if f.startswith("v") and f.endswith(".json"):
                # zero-byte manifests can only be left by a pre-hard-link
                # writer that crashed between claim and publish — never by
                # the current commit path; skip them rather than crash
                if os.path.getsize(os.path.join(mdir, f)) > 0:
                    out.append(int(f[1:-5]))
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self.path, "manifest", f"v{version}.json")) as f:
            return json.load(f)

    # -- write path ------------------------------------------------------
    def commit(
        self,
        df: DataFrame,
        mode: str = "overwrite",
        expected_version: int | None = None,
        extra: dict | None = None,
    ) -> int:
        """Write ``df`` as a new immutable version; returns its number.

        ``overwrite``: the new version consists of just this data dir.
        ``append``: the new version references the previous version's
        dirs PLUS the new dir — no data is rewritten, the manifest grows
        by one path (constant-cost append at any table size).

        ``expected_version`` is the optimistic-concurrency handle: a
        writer that planned its change against version N-1 passes N; if
        another writer landed N first, the O_EXCL manifest claim fails
        and VersionConflict tells the caller to re-plan against latest.
        """
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be overwrite|append, got {mode!r}")
        prev = self.latest_version()
        version = (0 if prev is None else prev + 1) if expected_version is None \
            else expected_version
        # per-attempt unique data dir: racing writers never collide on
        # files, only on the manifest claim below; a loser's orphan dir is
        # unreferenced by any manifest and can be vacuumed later
        nonce = os.urandom(4).hex()
        data_dir = os.path.join(self.path, "data", f"v{version}-{mode}-{nonce}")
        df.write.mode("errorifexists").parquet(data_dir)
        dirs = [data_dir]
        applied_batches: set[int] = set()
        if prev is not None:
            pm = self._manifest(prev)
            if mode == "append":
                dirs = pm["dirs"] + dirs
            # the exactly-once marker set survives vacuum because EVERY new
            # manifest carries the full applied-batch history forward — a
            # late foreachBatch replay is detected even after the manifest
            # that originally recorded its batch_id was vacuumed away
            applied_batches.update(pm.get("applied_batches", []))
            if "batch_id" in pm:
                applied_batches.add(pm["batch_id"])
        extra = dict(extra or {})
        if "batch_id" in extra:
            applied_batches.add(extra["batch_id"])
        tmp = os.path.join(
            self.path, "manifest", f".v{version}-{nonce}.json.tmp"
        )
        final = os.path.join(self.path, "manifest", f"v{version}.json")
        manifest = {"version": version, "mode": mode, "dirs": dirs}
        if applied_batches:
            manifest["applied_batches"] = sorted(applied_batches)
        manifest.update(extra)
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            # atomic claim WITH content: hard-link the fully-written tmp to
            # the version name — EEXIST on a race, and no instant at which
            # readers can observe an empty/partial manifest (the O_EXCL
            # claim-then-replace it replaced published a torn empty file)
            os.link(tmp, final)
        except FileExistsError as ex:
            raise VersionConflict(
                f"version {version} already committed by another writer"
            ) from ex
        finally:
            os.unlink(tmp)
        # durability of the PUBLICATION, not just the content: the link
        # above creates a directory entry that only lives in the page
        # cache until the directory itself is fsynced — without this a
        # power loss after commit() returns could silently un-publish the
        # version and let a later writer reuse its number
        dirfd = os.open(os.path.dirname(final), os.O_RDONLY)
        try:
            os.fsync(dirfd)
        finally:
            os.close(dirfd)
        return version

    # -- read path -------------------------------------------------------
    def commit_batch(
        self, df: DataFrame, batch_id: int, max_retries: int = 5
    ) -> int | None:
        """Exactly-once streaming append: foreachBatch is at-least-once, so
        a replayed micro-batch must not append twice.  The manifest records
        which stream batch produced each version; a replay finds its
        batch_id already in history and returns None (no-op).  Combine with
        the atomic publish and the sink is exactly-once end to end:

            stream.writeStream.foreachBatch(
                lambda b, i: table.commit_batch(b, i)).start()

        The membership check is made ATOMIC with the commit by pinning
        expected_version to the manifest the check was read from: if a
        concurrent writer (zombie driver replaying the same batch) lands
        first, the os.link claim fails, and the retry re-checks membership
        against the NEW latest — two replayers can never both append."""
        for _ in range(max_retries):
            latest = self.latest_version()
            if latest is not None:
                m = self._manifest(latest)
                applied = set(m.get("applied_batches", []))
                if "batch_id" in m:
                    applied.add(m["batch_id"])
                if batch_id in applied:
                    return None
            # batch_id rides the manifest itself (one atomic publish) —
            # there is no window where the data is visible but the marker
            # is not; commit() folds it into applied_batches so every
            # later manifest (and therefore every post-vacuum latest)
            # still rejects a replay
            try:
                return self.commit(
                    df,
                    mode="append",
                    expected_version=0 if latest is None else latest + 1,
                    extra={"batch_id": batch_id},
                )
            except VersionConflict:
                continue
        raise VersionConflict(
            f"commit_batch({batch_id}) lost {max_retries} races; giving up"
        )

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Snapshot read; ``version=None`` pins the latest at call time."""
        if version is None:
            version = self.latest_version()
        if version is None:
            raise FileNotFoundError(f"no committed versions under {self.path}")
        return spark.read.parquet(*self._manifest(version)["dirs"])

    def merge(self, updates: DataFrame, pk: str, max_retries: int = 3) -> int:
        """Transactional MERGE upsert: read the latest snapshot, apply the
        full WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT merge
        (operators.upsert.merge_upsert), and commit the result as a new
        overwrite version pinned to the snapshot it was planned against
        (expected_version).  If another writer lands first, VersionConflict
        triggers a re-plan against the new latest — the Delta MERGE retry
        loop, bounded by ``max_retries``."""
        from coldata_spark.operators.upsert import merge_upsert

        spark = updates.sparkSession
        for _ in range(max_retries):
            base = self.latest_version()
            try:
                if base is None:
                    # pin version 0: if a concurrent first writer lands v0
                    # between our read and the link, the claim fails and
                    # the retry re-plans as a MERGE against their data
                    # (an unpinned commit here would overwrite it)
                    return self.commit(
                        updates.dropDuplicates([pk]), expected_version=0
                    )
                merged = merge_upsert(self.read(spark, base), updates, pk=pk)
                return self.commit(merged, expected_version=base + 1)
            except VersionConflict:
                continue
        raise VersionConflict(f"merge lost {max_retries} commit races; giving up")

    def changes_between(
        self,
        spark: SparkSession,
        pk: str,
        from_version: int,
        to_version: int,
        compare_cols: list[str] | None = None,
    ) -> DataFrame:
        """CDC read between two snapshots (Delta CDF / Iceberg changelog
        shape, the reusable form of q127): full-outer join the versions on
        the primary key and emit (change_type, pk) plus both sides'
        compared columns.  change_type in added/removed/changed/unchanged;
        'changed' compares ``compare_cols`` (default: all shared non-pk
        columns) null-safely.

        Plan: ONE full-outer pk shuffle join; under a bucketed/co-
        partitioned layout both snapshot reads arrive pre-partitioned and
        the diff is a zero-exchange sort-merge."""
        from pyspark.sql import functions as F

        a = self.read(spark, from_version).alias("a")
        b = self.read(spark, to_version).alias("b")
        cols = compare_cols or [
            c for c in a.columns if c != pk and c in b.columns
        ]
        differs = F.lit(False)
        for c in cols:
            differs = differs | ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
        change = (
            F.when(F.col(f"a.{pk}").isNull(), "added")
            .when(F.col(f"b.{pk}").isNull(), "removed")
            .when(differs, "changed")
            .otherwise("unchanged")
        )
        j = a.join(b, F.col(f"a.{pk}") == F.col(f"b.{pk}"), "full")
        return j.select(
            change.alias("change_type"),
            F.coalesce(F.col(f"a.{pk}"), F.col(f"b.{pk}")).alias(pk),
            *[F.col(f"a.{c}").alias(f"old_{c}") for c in cols],
            *[F.col(f"b.{c}").alias(f"new_{c}") for c in cols],
        )

    def vacuum(
        self, retain_versions: int = 1, grace_seconds: float = 24 * 3600
    ) -> dict:
        """Garbage-collect history: keep the newest ``retain_versions``
        manifests, delete older manifests and every data dir no surviving
        manifest references — both commit-race orphans and aged-out
        snapshots.  Readers of retained versions are unaffected (their
        dirs are, by definition, referenced).

        ``grace_seconds`` protects IN-FLIGHT commits: a writer that has
        finished its parquet write but not yet hard-linked its manifest
        owns a directory no manifest references yet — deleting it would
        corrupt the version about to publish.  Unreferenced dirs younger
        than the grace window are skipped (the same reason Delta's VACUUM
        has a retention check); pass 0 only when no writer can be active.
        Returns an audit dict."""
        import shutil
        import time

        if retain_versions < 1:
            raise ValueError("retain_versions must be >= 1")
        vs = self.versions()
        keep, drop = vs[-retain_versions:], vs[:-retain_versions]
        referenced: set[str] = set()
        for v in keep:
            referenced.update(self._manifest(v)["dirs"])
        removed_dirs = []
        data_root = os.path.join(self.path, "data")
        now = time.time()
        for d in os.listdir(data_root):
            full = os.path.join(data_root, d)
            if full in referenced:
                continue
            try:
                age = now - os.path.getmtime(full)
            except OSError:
                continue
            if age < grace_seconds:
                continue  # possibly an in-flight commit's data dir
            shutil.rmtree(full, ignore_errors=True)
            removed_dirs.append(full)
        for v in drop:
            os.unlink(os.path.join(self.path, "manifest", f"v{v}.json"))
        return {
            "kept_versions": keep,
            "dropped_versions": drop,
            "removed_dirs": len(removed_dirs),
        }

    def history(self) -> list[dict]:
        return [
            {
                "version": v,
                "mode": self._manifest(v)["mode"],
                "n_dirs": len(self._manifest(v)["dirs"]),
            }
            for v in self.versions()
        ]
