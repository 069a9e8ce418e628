#!/usr/bin/env python
"""Round-15 q141 probe: three shapes of the capped-bucket build, value-gated
against each other and timed under the sweep protocol (toPandas, warm +
best-of-2) at a replicated tier.

  A  r14 committed shape: collect_list EVERY shingle's doc list, then
     filter(size <= 64)  — unbounded per-key aggregation buffer (the
     VERDICT #1 OOM risk this round removes).
  B  count-prefilter + left-semi sort-merge join back (working-tree draft).
  C  count-prefilter via a window count over the shingle partition: ONE
     explode, ONE exchange, and the hot-key buffer is WindowExec's
     disk-spillable row array instead of a collect_list heap buffer.

Run: python tools/probe_q141_r15.py [tier_times]   (default 16)
"""

from __future__ import annotations

import gc
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window as W  # noqa: E402

REPEATS = 2


def _sh0(spark, tier_dir):
    from coldata_spark.tables import fan_out, load

    docs = load(spark, tier_dir, "documents")
    return fan_out(docs).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, greatest(1, length(text) - 4)),"
                    " i -> substring(text, i, 5))"
                )
            )
        ).alias("shingle"),
    )


def _buckets_a(sh0):
    return (
        sh0.groupBy("shingle")
        .agg(F.collect_list("doc_id").alias("ds"))
        .filter(F.size("ds") <= 64)
    )


def _buckets_b(sh0):
    ex = sh0.repartition("shingle")
    keep = (
        ex.groupBy("shingle")
        .agg(F.count("doc_id").alias("df"))
        .filter(F.col("df") <= 64)
        .select("shingle")
        .hint("shuffle_merge")
    )
    return (
        ex.join(keep, "shingle", "left_semi")
        .groupBy("shingle")
        .agg(F.collect_list("doc_id").alias("ds"))
    )


def _buckets_c(sh0):
    w = W.partitionBy("shingle")
    return (
        sh0.filter(F.col("shingle").isNotNull())
        .withColumn("df", F.count("doc_id").over(w))
        .filter(F.col("df") <= 64)
        .groupBy("shingle")
        .agg(F.collect_list("doc_id").alias("ds"))
    )


def _full_q141(spark, tier_dir, bucket_fn):
    b = bucket_fn(_sh0(spark, tier_dir)).localCheckpoint(eager=True)
    sizes = (
        b.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_sh"))
    )
    inter = (
        b.select(
            F.explode(
                F.expr(
                    "flatten(transform(ds, x ->"
                    " transform(filter(ds, y -> y != x),"
                    " y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    out = inter.join(
        sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a"
    ).select(
        "doc_a",
        "doc_b",
        "n_common",
        F.expr("CAST((1000000 * n_common) div n_sh AS BIGINT)").alias(
            "containment_ppm"
        ),
    )
    return out.filter(F.col("containment_ppm") >= 800000)


VARIANTS = {"A_collect_then_filter": _buckets_a,
            "B_semijoin_prefilter": _buckets_b,
            "C_window_prefilter": _buckets_c}


def main() -> None:
    times = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    only = set(sys.argv[2:])  # optional variant-name filter
    variants = {k: v for k, v in VARIANTS.items() if not only or k in only}
    from bench import _tier_dir, dir_bytes
    from coldata_spark.session import get_spark, tune_for_input

    tier = _tier_dir("/root/testdata/sf0.1", times)
    spark = get_spark(app_name="probe_q141_r15")
    spark.sparkContext.setLogLevel("ERROR")

    # value gate on sf0.01 first (fast): all variants must agree row-for-row
    frames = {}
    for name, fn in variants.items():
        pdf = (
            _full_q141(spark, "/root/testdata/sf0.01", fn)
            .toPandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        frames[name] = pdf
    base = frames[sorted(frames)[0]]
    for name, pdf in frames.items():
        ok = base.equals(pdf)
        print(f"value_gate {name}: rows={len(pdf)} equal_to_A={ok}")
        if not ok:
            sys.exit(1)

    tune_for_input(spark, dir_bytes(tier))
    for name, fn in variants.items():
        spark.sparkContext.setJobDescription(f"q141 probe {name} warm")
        _full_q141(spark, tier, fn).toPandas()
        best = float("inf")
        for i in range(REPEATS):
            gc.collect()
            spark.sparkContext.setJobDescription(f"q141 probe {name} run{i}")
            t0 = time.perf_counter()
            _full_q141(spark, tier, fn).toPandas()
            best = min(best, time.perf_counter() - t0)
        print(f"timing {times}x {name}: best_of_{REPEATS} = {best:.3f} s")
    spark.stop()


if __name__ == "__main__":
    main()
