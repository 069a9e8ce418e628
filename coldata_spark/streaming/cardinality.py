"""Continuous distinct-user cardinality — streaming maintenance of the
engine-portable HLL sketch (operators/sketches.py) per time bucket.

The additive rollup (streaming/rollup.py) can fold counts and sums, but
``count(DISTINCT user)`` is NOT additive across batches — re-aggregating
partial distinct counts overcounts users seen in several micro-batches.
The HLL register table IS mergeable (max per register), so maintaining the
registers instead of the count gives a streaming distinct-cardinality
rollup with bounded state: (#hours x 256) rows regardless of event volume,
and the estimate is readable at any time without touching raw events.

Unlike the additive fold, the register max-merge is IDEMPOTENT — replaying
a batch cannot change a max — so exactly-once here needs no applied-batch
marker; the atomic table swap alone suffices.  (The marker recipe in
rollup.py remains necessary for additive folds.)

Because the registers are the same integer-mixed hashes the DuckDB oracle
computes (ORACLE_PARITY.md rule 20), the persisted sketch table is readable
and mergeable by any engine downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coldata_spark.operators import sketches as SK
from coldata_spark.streaming.foldcommit import fold_once

BUCKET_KEYS = ["hour_start"]


def hourly_user_registers(events: DataFrame) -> DataFrame:
    """Per-batch HLL register partial: (hour_start, idx, mx) over user_id."""
    bucketed = events.select(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"), "user_id"
    )
    return SK.hll_registers(bucketed, BUCKET_KEYS, "user_id")


def merge_into_registers(
    partial: DataFrame, table_path: str, batch_id: int = 0
) -> None:
    """Max-merge a register partial into the persistent sketch table.
    Idempotent by construction (max), so replays are harmless without
    markers — fold_once(idempotent=True) skips the applied-marker gate but
    still provides the sentinel swap, closing the torn-table crash window
    the bare rename pair had."""
    fold_once(
        partial,
        table_path,
        batch_id,
        lambda existing, part: SK.hll_merge(
            existing.unionByName(part), BUCKET_KEYS
        ),
        idempotent=True,
    )


def distinct_users_estimate(spark, table_path: str) -> DataFrame:
    """Read the sketch table and estimate distinct users per hour."""
    import os

    from coldata_spark.streaming.foldcommit import recover

    if not os.path.isdir(table_path):
        # reader-mode healing: completes a crashed-mid-swap rename but
        # never touches stages (a sentinel-less stage may belong to a
        # LIVE writer mid-fold; see recover())
        recover(table_path, reader=True)
    return SK.hll_estimate(spark.read.parquet(table_path), BUCKET_KEYS)


def stream_cardinality_maintain(
    stream_df: DataFrame, table_path: str, checkpoint: str
):
    """availableNow run: fold new events' registers into the sketch table,
    then stop — periodic-scheduler shape like the reference's re-crawl."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_into_registers(
            hourly_user_registers(batch_df), table_path, batch_id
        )

    q = (
        stream_df.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
