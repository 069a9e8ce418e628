"""Continuous quantile maintenance — streaming twin of the histogram
quantile sketch (operators/sketches.py hist_*, batch query q158), completing
the per-sketch streaming set: additive rollup (rollup.py), HLL cardinality
(cardinality.py), and now value quantiles.

``approx_percentile`` over a stream would need raw-event state; the
histogram sketch needs (#buckets x n_bins) rows of state TOTAL, is
engine-portable (pure integer layout), and p50/p90/p99 are readable at any
time without touching raw events.

Histogram counts are ADDITIVE across batches — like the rollup fold and
unlike the idempotent HLL max-merge — so a replayed micro-batch would
double-count.  The applied-batch marker recipe from rollup.py makes the
fold exactly-once under foreachBatch's at-least-once contract.

Scale: each batch shrinks to at most (#hours x n_bins) partial rows before
touching the table; the table grows with time buckets, never with events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coldata_spark.operators import sketches as SK
from coldata_spark.streaming.foldcommit import fold_once

BUCKET_KEYS = ["hour_start"]
# q158's fixed centi-unit value domain: [0, 51199] in 256 bins of width 200
LO, HI, N_BINS = 0, 51199, 256


def hourly_value_hist(events: DataFrame) -> DataFrame:
    """Per-batch histogram partial: (hour_start, bin, cnt) over value."""
    bucketed = events.select(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"), "value"
    )
    return SK.hist_build(
        bucketed, BUCKET_KEYS, "floor(value * 100)", lo=LO, hi=HI, n_bins=N_BINS
    )


def fold_into_hist(partial: DataFrame, table_path: str, batch_id: int) -> None:
    """Additively fold a histogram partial into the sketch table, once:
    the fold_once sentinel protocol (streaming/foldcommit.py) closes the
    torn-swap and marker-race crash windows (counts are additive, so
    unlike the HLL max-merge this fold is NOT naturally idempotent)."""
    fold_once(
        partial,
        table_path,
        batch_id,
        lambda existing, part: SK.hist_merge(
            existing.unionByName(part), BUCKET_KEYS
        ),
    )


def read_quantiles(
    spark, table_path: str, q_ppms: list[int] | None = None
) -> DataFrame:
    """Current per-hour quantile estimates from the persisted sketch —
    readable at any time, touches only (#hours x n_bins) rows."""
    import os

    from coldata_spark.streaming.foldcommit import recover

    if not os.path.isdir(table_path):
        # reader-mode healing: completes a crashed-mid-swap rename but
        # never touches stages (a sentinel-less stage may belong to a
        # LIVE writer mid-fold; see recover())
        recover(table_path, reader=True)
    hist = spark.read.parquet(table_path)
    return SK.hist_quantile(
        hist,
        BUCKET_KEYS,
        q_ppms or [500000, 900000, 990000],
        lo=LO,
        hi=HI,
        n_bins=N_BINS,
    )


def stream_quantiles_maintain(
    stream_df: DataFrame, table_path: str, checkpoint: str
):
    """availableNow run: fold all new event files into the quantile sketch,
    then stop — the same scheduler-driven cadence as the rollup/cardinality
    twins.  Returns the finished StreamingQuery."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fold_into_hist(hourly_value_hist(batch_df), table_path, batch_id)

    q = (
        stream_df.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
