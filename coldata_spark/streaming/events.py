"""Event-time streaming over the ``events`` table (SURVEY.md §2.9 R1, R6).

The reference's only "streaming" is a wall-clock re-crawl scheduler
(/root/reference/src/scheduler.py:21-33) plus incremental insert-if-absent
(crawler/crawler.py:39-50).  The Spark-native equivalents:

  * R1 periodic refresh  -> file-source readStream + trigger(availableNow=True):
    each run processes exactly the new files, exactly-once via checkpoint.
  * R6 event-time ops    -> withWatermark + tumbling/sliding/session windows,
    dropDuplicatesWithinWatermark for late duplicate events.

Every streaming computation here has a batch twin in
queries/events_queries.py; tests assert stream == batch on the fixtures.

Scale notes: watermarks bound state; the windowed aggregations shuffle on
(window, key) with partial aggregation; at 100 TB/day the same topology runs
unchanged with more executors — state lives in the state store keyed by
window, so state size tracks #active-windows x #keys, not input volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(spark: SparkSession, dir_path: str) -> DataFrame:
    """File-source stream over a directory of events parquet files.

    maxFilesPerTrigger bounds per-batch work (the reference's politeness /
    rate-limit knob R3 re-expressed as source throttling).

    Like the batch path (tables._load_events), this normalizes the ts
    column's on-disk variants — TIMESTAMP(NANOS) (readable only as long
    ns via the legacy conf) and un-adjusted timestamp[us] (NTZ) — to one
    TIMESTAMP_LTZ event-time column whose stored micros are UTC epoch
    micros.  The variant is detected once, driver-side, from the parquet
    footers; the streaming schema must be declared up front anyway.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    try:
        nanos = dict(spark.read.parquet(dir_path).dtypes).get("ts") == "bigint"
    except Exception:
        # empty landing directory — the NORMAL initial state of a file
        # stream; default to the microsecond-timestamp variant (the probe
        # pins the variant from the first files once any exist)
        nanos = False
    raw = (
        spark.readStream.schema(
            _events_schema(T.LongType() if nanos else T.TimestampType())
        )
        .option("maxFilesPerTrigger", 4)
        .parquet(dir_path)
    )
    if nanos:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def hourly_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windowed aggregation with late-data watermark —
    streaming twin of q40_events_hourly."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_value_sum(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Sliding window (1 hour, sliding 30 min) per event_type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "total_value",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows per user (gap-based) — streaming counterpart
    of q42_events_sessionize."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def dedup_within_watermark(events: DataFrame) -> DataFrame:
    """Late-duplicate suppression keyed on event_id within the watermark —
    streaming form of the reference's insert-if-absent pk dedup (R2)."""
    return events.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user running
    totals maintained across micro-batches (the reference's per-crawler
    inserted-record counters, uci.py:87-93, generalized to keyed streaming
    state).  State = (n_events, total_value); emits the updated row per user
    per batch.  Watermark-less GroupStateTimeout keeps it simple; at scale
    state is per-key-bounded and lives in the state store."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(
    stream_df: DataFrame, checkpoint: str, out_table: str, mode: str = "update"
):
    """R1: process-everything-new-then-stop refresh (the scheduler.py loop
    re-expressed).  Returns the finished StreamingQuery.

    ``mode`` must match the stream's own semantics: ``update`` for
    watermarked aggregations and applyInPandasWithState (the default —
    state stays watermark-bounded), ``append`` for row streams like the
    watermark dedup.  The old hardcoded ``complete`` threw for
    non-aggregation streams and retained every window's state forever for
    the rest, defeating the watermark's state bound."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(out_table)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_merge_into(
    stream_df: DataFrame, table_path: str, checkpoint: str, pk: str = "index"
):
    """CDC-style streaming MERGE: each micro-batch of updates is merged into
    the parquet table with full upsert semantics (WHEN MATCHED UPDATE /
    WHEN NOT MATCHED INSERT via operators.upsert.merge_upsert) inside
    foreachBatch — the streaming twin of q73.

    Plain parquet has no transaction log, so the merged result is staged
    and swapped in via the fold_once sentinel protocol
    (streaming/foldcommit.py — a bare rename pair leaves a torn-table
    crash window between the two renames; idempotent=True because
    re-merging a replayed batch is a no-op, so only the swap needs the
    protection).  On object stores or with concurrent readers use Delta
    MERGE, which is this exact plan plus a txn commit.  Checkpoint +
    availableNow gives exactly-once across restarts.

    Returns the finished StreamingQuery.
    """
    from coldata_spark.operators.upsert import merge_upsert
    from coldata_spark.streaming.foldcommit import fold_once

    def do_merge(batch_df: DataFrame, batch_id: int) -> None:
        fold_once(
            batch_df.dropDuplicates([pk]),
            table_path,
            batch_id,
            lambda existing, part: merge_upsert(existing, part, pk=pk),
            idempotent=True,
        )

    q = (
        stream_df.writeStream.foreachBatch(do_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def clicks_joined_to_purchases(
    events: DataFrame, max_gap: str = "5 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval join: each purchase joined to the same user's
    clicks in the preceding ``max_gap`` — attribution as a streaming
    computation (the streaming twin of the q80 banded range join / q44
    as-of pattern).

    Both sides carry watermarks and the join condition bounds click_ts in
    [purchase_ts - max_gap, purchase_ts), so Spark can expire join state:
    without BOTH the watermark and the time bound, stream-stream join state
    grows forever — the 100 TB trap this operator exists to avoid.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        F.expr(
            f"""
            p_user = c_user
            AND click_ts < purchase_ts
            AND click_ts >= purchase_ts - INTERVAL {max_gap}
            """
        ),
        "inner",
    )
