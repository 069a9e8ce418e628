#!/usr/bin/env python
"""Round-14 A/B probe: old-vs-new forms of q108/q110/q120 under the EXACT
sweep_registry session + timing protocol (toPandas, warm + best-of-2,
parallelism-first AQE session), at the 16x tier.

Why: the targeted 16x re-sweep after the round-14 rewrites showed three
queries WORSE than their r13 rows (q108 2.7->3.7, q110 1.35->1.95,
q120 2.2->13.2) while the commit-time probes (bench-style tune_for_input
sessions, noop sink) had shown them better.  This probe holds the protocol
fixed and varies ONLY the disputed pipeline fragment, so the verdict is
about the code, not the session config.

Run: python tools/probe_r14_ab.py
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


def time_df(make_df):
    df = make_df().toPandas()
    n = len(df)
    del df
    gc.collect()
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        pdf = make_df().toPandas()
        best = min(best, time.perf_counter() - t0)
        del pdf
    gc.collect()
    return round(best, 3), n


def q120_variants(spark, tier_dir):
    from coldata_spark.tables import fan_out, load

    def build(dl_mode: str):
        docs = load(spark, tier_dir, "documents")
        toks = fan_out(docs).select(
            "doc_id",
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("term"),
        )
        if dl_mode == "new":
            dl = fan_out(docs).select(
                "doc_id",
                F.expr("size(regexp_extract_all(lower(text), '[a-z]+', 0))")
                .cast("long")
                .alias("dl"),
            )
        else:
            dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
        nd = docs.agg(F.count("*").alias("n_docs"))
        scalars = (
            dl.agg(F.sum("dl").alias("sum_dl"))
            .crossJoin(F.broadcast(nd))
            .select(
                "n_docs",
                F.expr("(sum_dl * 1000000) div n_docs").alias("avgdl_micro"),
            )
        )
        tf = (
            toks.filter(F.col("term").isin("scan", "window", "merge"))
            .groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf"))
        )
        dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
        term_score = (
            "((1000 * (2 * n_docs - 2 * df + 1)) div (2 * df + 1)"
            " * (tf * 2200000))"
            " div (tf * 1000000 + 300000 +"
            " (900000 * ((dl * 1000000) div avgdl_micro)) div 1000000)"
        )
        scored = (
            tf.join(F.broadcast(dfreq), "term")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(scalars))
            .select("doc_id", F.expr(term_score).alias("sterm"))
            .groupBy("doc_id")
            .agg(F.sum("sterm").alias("score_milli"))
        )
        top = scored.orderBy(F.col("score_milli").desc(), "doc_id").limit(10)
        return top.select(
            "doc_id",
            F.col("score_milli").cast("long").alias("score_milli"),
            F.row_number()
            .over(W.orderBy(F.col("score_milli").desc(), "doc_id"))
            .cast("long")
            .alias("rank"),
        )

    return {
        "q120_new_sizeexpr": lambda: build("new"),
        "q120_old_tokagg": lambda: build("old"),
    }


Q108_CAP = 64


def q108_variants(spark, tier_dir):
    from coldata_spark.tables import load

    def build(cap_mode: str):
        docs = load(spark, tier_dir, "documents")
        titles = docs.filter(F.col("doc_id") % 10 == 0).select(
            F.col("doc_id").alias("title_doc"),
            "lang",
            F.replace(
                F.substring("text", 1, 30), F.lit("a"), F.lit("@")
            ).alias("title"),
        )
        pref = docs.select(
            "doc_id", "lang", F.substring("text", 1, 30).alias("s")
        )
        pos = F.explode(F.sequence(F.lit(0), F.lit(6))).alias("pos")

        def chunks(df, id_col, s_col):
            return df.select(
                id_col, "lang", pos, F.col(s_col).alias("_s")
            ).select(
                id_col,
                "lang",
                "pos",
                F.expr("substring(_s, pos * 4 + 1, 4)").alias("chunk"),
            )

        dch = chunks(pref, "doc_id", "s")
        if cap_mode == "new":
            dk = (
                dch.withColumn(
                    "_n",
                    F.count("*").over(W.partitionBy("lang", "pos", "chunk")),
                )
                .filter(F.col("_n") <= Q108_CAP)
                .drop("_n")
            )
        else:
            keep = (
                dch.groupBy("lang", "pos", "chunk")
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") <= Q108_CAP)
                .drop("_n")
            )
            dk = dch.join(keep, ["lang", "pos", "chunk"])
        cand = (
            chunks(titles, "title_doc", "title")
            .join(dk, ["lang", "pos", "chunk"])
            .select("title_doc", "doc_id")
            .distinct()
        )
        scored = (
            cand.join(titles.select("title_doc", "title"), "title_doc")
            .join(pref.select("doc_id", "s"), "doc_id")
            .select(
                "title_doc",
                "doc_id",
                F.levenshtein("title", "s").alias("dist"),
            )
        )
        return (
            scored.groupBy("title_doc")
            .agg(F.min(F.struct("dist", "doc_id")).alias("b"))
            .select(
                "title_doc",
                F.col("b.doc_id").cast("long").alias("matched_doc"),
                F.col("b.dist").cast("long").alias("best_dist"),
            )
        )

    return {
        "q108_new_window": lambda: build("new"),
        "q108_old_aggjoin": lambda: build("old"),
    }


def q110_variants(spark, tier_dir):
    from coldata_spark.tables import load

    def build(ckpt: bool):
        docs = load(spark, tier_dir, "documents")
        total = docs.agg(F.count("*").alias("n_docs"))
        edges = (
            docs.crossJoin(F.broadcast(total))
            .select(
                F.col("doc_id").alias("src"),
                F.explode(F.expr("sequence(1, 1 + doc_id % 4)")).alias("k"),
                "n_docs",
            )
            .select(
                "src",
                ((F.col("src") * 31 + F.col("k")) % F.col("n_docs")).alias(
                    "dst"
                ),
            )
        )
        ids = docs.select("doc_id")
        if ckpt:
            edges = edges.localCheckpoint(eager=True)
            ids = ids.localCheckpoint(eager=True)
        ranks = ids.select("doc_id", F.lit(1000000).cast("long").alias("r"))
        for _ in range(3):
            contribs = (
                edges.join(ranks.withColumnRenamed("doc_id", "src"), "src")
                .select("dst", F.expr("r div (1 + src % 4)").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("in_sum"))
            )
            ranks = ids.join(
                contribs, ids.doc_id == contribs.dst, "left"
            ).select(
                "doc_id",
                F.expr(
                    "CAST(150000 + (850000 * coalesce(in_sum, 0)) div 1000000"
                    " AS BIGINT)"
                ).alias("r"),
            )
        return ranks.select("doc_id", F.col("r").alias("rank_micro"))

    return {
        "q110_new_ckpt": lambda: build(True),
        "q110_old_nockpt": lambda: build(False),
    }


def main() -> None:
    from tools.sweep_registry import _fresh_spark
    from bench import _tier_dir

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tier_dir = _tier_dir(sf_dir, 16)
    spark = _fresh_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for maker in (q120_variants, q108_variants, q110_variants):
        for name, mk in maker(spark, tier_dir).items():
            spark.sparkContext.setJobDescription(name)
            sec, rows = time_df(mk)
            out[name] = (sec, rows)
            print(f"{name:24s} {sec:8.3f} s  rows={rows}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
