#!/usr/bin/env python
"""LSH hot-bucket skew stress: the one operator in the repo whose worst
case is quadratic, driven through its worst case on purpose.

A boilerplate-heavy corpus (30% of documents byte-identical — think empty
pages, cookie banners, template boilerplate at web scale) collapses 30% of
the corpus into ONE band bucket per band; the within-bucket self-join is
quadratic in bucket population, so uncapped work grows ~(0.3 N)^2 while
capped work stays linear.  This probe measures, per replication tier:

  * PREDICTED candidate pairs (sum n*(n-1)/2 over buckets — the q143
    diagnostic computed sketch-side, no join executed), capped vs not;
  * ACTUAL wall time + pair count for the capped path at every tier, and
    for the uncapped path only at tiers where it is feasible (the point
    of the cap is that the 64x uncapped join never should run).

Run: python tools/stress_lsh.py          (writes nothing; prints a table —
paste into STRESS.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from coldata_spark.operators import dedup as DD
from coldata_spark.session import get_spark, tune_for_input
from coldata_spark.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BOILER = (
    "cookie notice this site uses cookies accept decline privacy policy "
    "terms of service all rights reserved navigation home about contact"
)
CAP = 64


def boilerplate_corpus(
    spark, sf_dir: str, times: int, frac_pct: int = 30
) -> DataFrame:
    """N replicated document copies with ``frac_pct``% of doc ids rewritten
    to ONE byte-identical boilerplate text (replicas get distinct doc_ids,
    so the boilerplate group size is 0.3 * N * times)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    parts = []
    for i in range(times):
        p = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        if i:
            p = p.withColumn("text", F.concat("text", F.lit(f" r{i}")))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        "text",
        F.when(F.col("doc_id") % 100 < frac_pct, F.lit(BOILER)).otherwise(
            F.col("text")
        ),
    )


def predicted_pairs(corpus: DataFrame, cap: int | None) -> int:
    """Candidate pairs the banded join WOULD schedule: sum n*(n-1)/2 over
    band buckets (bucket-stats only, no join) — q143's diagnostic."""
    sig = DD.minhash_signatures(corpus, "text", "doc_id")
    banded = (
        sig.withColumn("band", (F.col("seed") / DD.BAND_SIZE).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                "|",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
                    lambda s: s["minhash"].cast("string"),
                ),
            ).alias("band_key")
        )
    )
    counts = banded.groupBy("band", "band_key").agg(F.count("*").alias("n"))
    if cap is not None:
        counts = counts.filter(F.col("n") <= cap)
    row = counts.agg(
        F.sum(F.expr("n * (n - 1) div 2")).cast("long").alias("pairs")
    ).first()
    return int(row["pairs"] or 0)


def run_candidates(corpus: DataFrame, cap: int | None) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = DD.minhash_neardup_pairs(
        corpus, "text", "doc_id", max_bucket_size=cap
    ).count()
    return round(time.perf_counter() - t0, 2), n


def main() -> None:
    spark = get_spark(app_name="stress_lsh")
    print(f"| tier | docs | predicted uncapped | predicted cap={CAP} | "
          "capped wall s | capped pairs | uncapped wall s |")
    print("|---|---|---|---|---|---|---|")
    for times in (1, 4, 16, 64):
        corpus = boilerplate_corpus(spark, SF_DIR, times)
        n_docs = corpus.count()
        tune_for_input(spark, n_docs * 2000)
        pred_un = predicted_pairs(corpus, None)
        pred_cap = predicted_pairs(corpus, CAP)
        t_cap, n_cap = run_candidates(corpus, CAP)
        # uncapped only where feasible: the predicted quadratic term tells
        # us before running — that is the point of the diagnostic
        if pred_un <= 50_000_000:
            t_un, _n_un = run_candidates(corpus, None)
            un = f"{t_un}"
        else:
            un = f"SKIPPED (predicted {pred_un:,} pairs)"
        print(
            f"| {times}x | {n_docs:,} | {pred_un:,} | {pred_cap:,} "
            f"| {t_cap} | {n_cap:,} | {un} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
