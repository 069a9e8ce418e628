"""Continuous aggregate maintenance — the streaming twin of
q83_hypertable_rollup (TimescaleDB's continuous aggregates; the reference's
scheduler.py re-crawl loop applied to a rollup instead of a collection).

Each micro-batch folds its hourly partial aggregates into a persistent
rollup table keyed on (hour_start, event_type).  The merge is ADDITIVE
(counts/sums accumulate), so replay protection matters: a batch that wrote
but failed before the checkpoint commit would double-count on restart.
``foreachBatch`` is at-least-once by contract; the applied-batch marker
makes the fold idempotent — the standard exactly-once recipe for
non-idempotent sinks.

Scale: the partial aggregate shrinks each batch to (#hours x #types) rows
before touching the table; the fold itself is a tiny union+re-aggregate.
At 100 TB/day the rollup table stays small (it grows with time buckets,
not events), and the same foreachBatch body targets a Delta MERGE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coldata_spark.streaming.foldcommit import fold_once

ROLLUP_KEYS = ["hour_start", "event_type"]


def hourly_partial(events: DataFrame) -> DataFrame:
    """Per-batch partial: hourly event counts and value sums."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )


def fold_into_rollup(partial: DataFrame, table_path: str, batch_id: int) -> None:
    """Additively fold a partial aggregate into the rollup table, once:
    the fold_once sentinel protocol (streaming/foldcommit.py) makes the
    additive merge exactly-once with no torn-swap or double-count crash
    windows."""

    def merge(existing: DataFrame, part: DataFrame) -> DataFrame:
        return (
            existing.unionByName(part)
            .groupBy(*ROLLUP_KEYS)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("total_value").alias("total_value"),
            )
        )

    fold_once(partial, table_path, batch_id, merge)


def stream_rollup_maintain(stream_df: DataFrame, table_path: str, checkpoint: str):
    """availableNow run: fold all new event files into the rollup, then
    stop — a scheduler invokes this periodically, exactly like the
    reference's re-crawl cron.  Returns the finished StreamingQuery."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fold_into_rollup(hourly_partial(batch_df), table_path, batch_id)

    q = (
        stream_df.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
