"""Insert-if-absent merge (SURVEY.md §2.1 S8, §2.9 R2).

The reference checks find_one({'index': pk}) per document and inserts only
when missing (/root/reference/src/coldata/crawler/crawler.py:39-50) — a
per-row round-trip.  The set-oriented Spark form is a single left anti-join
of the incoming batch against the existing table, then an append:

    new_rows = batch ⟕anti existing ON pk
    existing ∪ new_rows

Exactly-once at scale: with plain parquet, idempotence comes from writing
each ingest run to a run-scoped partition (overwrite-by-partition); with
Delta, MERGE WHEN NOT MATCHED INSERT gives txn atomicity.  Both reduce to
this same anti-join plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def new_rows(batch: DataFrame, existing: DataFrame, pk: str = "index") -> DataFrame:
    """Rows of ``batch`` whose pk is absent from ``existing`` (dedup within
    the batch too — first occurrence wins, deterministic by pk order)."""
    deduped = batch.dropDuplicates([pk])
    return deduped.join(existing.select(pk), pk, "left_anti")


def merge_append(batch: DataFrame, existing: DataFrame, pk: str = "index") -> DataFrame:
    """existing + insert-if-absent(batch).  Column order follows existing."""
    fresh = new_rows(batch, existing, pk)
    return existing.unionByName(fresh.select(*existing.columns))


def write_run_partition(
    batch: DataFrame, table_path: str, run_id: str, existing: DataFrame | None = None,
    pk: str = "index",
) -> None:
    """Exactly-once ingest on plain parquet (no Delta): each ingest run
    writes its new rows into a run-scoped partition with dynamic
    partition-overwrite, so a retried run REPLACES its own partition
    instead of appending duplicates — idempotence without a transaction
    log.  (With Delta available this is MERGE WHEN NOT MATCHED INSERT.)
    """
    spark = batch.sparkSession
    rows = batch.dropDuplicates([pk])
    if existing is not None:
        rows = rows.join(existing.select(pk), pk, "left_anti")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        rows.withColumn("_run_id", F.lit(run_id))
        .write.mode("overwrite")
        .partitionBy("_run_id")
        .parquet(table_path)
    )


def merge_upsert(
    existing: DataFrame, updates: DataFrame, pk: str = "index"
) -> DataFrame:
    """Full MERGE: WHEN MATCHED UPDATE (all non-pk columns) / WHEN NOT
    MATCHED INSERT — the Delta-MERGE generalization of the reference's
    insert-only path (crawler.py:39-50 never updates an existing doc).

    One full-outer join on the pk + per-column coalesce(update, existing) —
    a single shuffle; updates are deduped on pk first (last-writer ambiguity
    removed by keeping one deterministic row per pk).  Both inputs must
    share the same schema.
    """
    if set(existing.columns) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: existing={sorted(existing.columns)} "
            f"updates={sorted(updates.columns)}"
        )
    upd = updates.dropDuplicates([pk])
    e = existing.alias("e")
    u = upd.alias("u")
    merged = e.join(u, F.col(f"e.{pk}") == F.col(f"u.{pk}"), "full_outer")
    cols = [
        F.coalesce(F.col(f"u.{c}"), F.col(f"e.{c}")).alias(c)
        for c in existing.columns
    ]
    return merged.select(*cols)


def upsert_stats(batch: DataFrame, existing: DataFrame, pk: str = "index") -> DataFrame:
    """Counters the reference tracks per upload loop (A5, uci.py:87-93):
    how many batch rows were inserted vs skipped."""
    fresh = new_rows(batch, existing, pk).count()
    total = batch.dropDuplicates([pk]).count()
    spark = batch.sparkSession
    return spark.createDataFrame(
        [(total, fresh, total - fresh)], ["batch_size", "inserted", "skipped"]
    )
