#!/usr/bin/env python
"""Incremental near-dup maintainer at scale: fold a 1% new batch against a
persisted corpus signature table and measure how batch latency moves as the
CORPUS grows (round-4 verdict ask #7).

The claim under test (operators/dedup.py minhash_neardup_incremental +
minhash_signatures_wide docstrings, gated structurally by
tests/test_plans.py::test_incremental_neardup_corpus_never_shuffles): the
corpus side is scan-only — band keys derive map-side and every
corpus-touching join broadcasts the batch/candidate side, so per-fold cost
is ONE linear scan of the corpus signatures plus work proportional to the
batch.  If that holds, batch latency grows far slower than corpus size
(scan bandwidth only); if the corpus were being re-shuffled or re-paired,
latency would track corpus size ~linearly or worse.

Per tier: corpus = sf0.1 documents replicated Nx with distinct ids and
texts, wide signatures PERSISTED to parquet once (that is the production
state — a billion-doc corpus signed exactly once, ever); batch = 1% of the
corpus row count, half genuinely-new texts, half byte-copies of corpus
texts (planted near-dups so the match path does real verification work).

Run: python tools/stress_incremental.py   (prints a table — paste into
STRESS.md)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from coldata_spark.operators import dedup as DD
from coldata_spark.session import get_spark, tune_for_input
from coldata_spark.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CAP = 256  # the streaming maintainer's default hot-bucket cap


def replicated_docs(spark, times: int):
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    parts = []
    for i in range(times):
        p = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        if i:
            p = p.withColumn("text", F.concat("text", F.lit(f" rep{i}")))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def new_batch(spark, corpus, n_batch: int):
    """1% batch with fresh ids: half planted near-dups (corpus text + one
    appended token -> high jaccard), half distinct texts."""
    base = corpus.orderBy("doc_id").limit(n_batch)
    return base.select(
        (F.col("doc_id") + F.lit(100_000_000_000)).alias("doc_id"),
        F.when(
            F.col("doc_id") % 2 == 0, F.concat("text", F.lit(" v2"))
        )
        .otherwise(
            F.concat(F.lit("entirely fresh document body "), "text",
                     F.reverse("text"))
        )
        .alias("text"),
    )


def main() -> None:
    spark = get_spark(app_name="stress_incremental")
    work = tempfile.mkdtemp(prefix="stress_incr_")
    print("| tier | corpus docs | batch docs | sign corpus s (one-time) | "
          "fold wall s | pairs |")
    print("|---|---|---|---|---|---|")
    try:
        for times in (1, 4, 16, 64):
            corpus = replicated_docs(spark, times)
            n_docs = corpus.count()
            tune_for_input(spark, n_docs * 2000)
            cpath = os.path.join(work, f"wide_{times}x")
            t0 = time.perf_counter()
            DD.minhash_signatures_wide(
                corpus, "text", "doc_id"
            ).write.mode("overwrite").parquet(cpath)
            t_sign = round(time.perf_counter() - t0, 2)
            corpus_wide = spark.read.parquet(cpath)

            batch = new_batch(spark, corpus, max(50, n_docs // 100))
            n_batch = batch.count()
            t0 = time.perf_counter()
            pairs, new_wide = DD.minhash_neardup_incremental(
                batch, corpus_wide, "text", "doc_id", max_bucket_size=CAP
            )
            n_pairs = pairs.count()
            t_fold = round(time.perf_counter() - t0, 2)
            new_wide.unpersist()
            print(
                f"| {times}x | {n_docs:,} | {n_batch:,} | {t_sign} "
                f"| {t_fold} | {n_pairs:,} |",
                flush=True,
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
