"""Incremental near-dup maintenance — streaming twin of
q159_incremental_neardup: each micro-batch of newly crawled documents is
matched against the persisted corpus signature table, emits its near-dup
pairs, and folds its own signatures in so the NEXT batch matches against
them too.

This is the dedup shape a periodic re-crawl needs at 100 TB: the corpus is
never re-signed or re-paired (the batch operator would re-pair everything
every run); per batch the work is #new-doc signatures + a bucket join that
touches only colliding buckets.

State: ONE wide signature table (doc_id, h0..h7 — bounded by corpus size,
~72 bytes/doc) maintained with the crash-safe fold protocol
(foldcommit.py; the signature union is idempotent, replays are no-ops),
plus per-batch pair outputs under ``pairs_path/batch=<id>/`` (overwrite
per batch id = idempotent on replay).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from coldata_spark.operators import dedup as DD
from coldata_spark.streaming.foldcommit import fold_once


def process_batch(
    new_docs: DataFrame,
    sig_path: str,
    pairs_path: str,
    batch_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = 256,
) -> None:
    """Match one batch against the corpus, persist its pairs, fold its
    signatures in.  Replay-safe: corpus rows with this batch's doc ids are
    excluded before matching (so a replay AFTER the fold landed computes
    the same pairs), pair output is per-batch overwrite, and the signature
    fold is the idempotent sentinel protocol."""
    from coldata_spark.streaming.foldcommit import recover

    spark = new_docs.sparkSession
    recover(sig_path)  # heal residue before snapshotting the file listing
    new_wide_probe = DD.minhash_signatures_wide(new_docs, text_col, id_col)
    if os.path.isdir(sig_path):
        corpus_wide = spark.read.parquet(sig_path).join(
            new_docs.select(new_docs[id_col].alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        )
    else:
        corpus_wide = new_wide_probe.limit(0)
    pairs, new_wide = DD.minhash_neardup_incremental(
        new_docs,
        corpus_wide,
        text_col,
        id_col,
        max_bucket_size=max_bucket_size,
    )
    try:
        pairs.write.mode("overwrite").parquet(
            os.path.join(pairs_path, f"batch={batch_id}")
        )
        fold_once(
            new_wide,
            sig_path,
            batch_id,
            lambda existing, part: existing.unionByName(part).dropDuplicates(
                ["doc_id"]
            ),
            idempotent=True,
        )
    finally:
        # the operator caches the batch signatures (reused inside one
        # fold); a long-running maintainer would otherwise accumulate one
        # cached relation per micro-batch — including per FAILED attempt,
        # hence the finally
        new_wide.unpersist()


def read_pairs(spark, pairs_path: str) -> DataFrame:
    """All pairs emitted so far, across batches."""
    return spark.read.parquet(os.path.join(pairs_path, "batch=*"))


def stream_neardup_maintain(
    stream_df: DataFrame,
    sig_path: str,
    pairs_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """availableNow run: match + fold every new document file, then stop —
    the same scheduler-driven cadence as the rollup/cardinality/quantile
    twins.  Returns the finished StreamingQuery."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        process_batch(
            batch_df, sig_path, pairs_path, batch_id, text_col, id_col
        )

    q = (
        stream_df.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
