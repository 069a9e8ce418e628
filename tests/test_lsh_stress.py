"""Bounded-work assertions for the MinHash-LSH hot-bucket cap
(operators/dedup.py minhash_neardup_pairs max_bucket_size) under the
boilerplate-skew worst case — the executable twin of the STRESS.md
skew-stress section (tools/stress_lsh.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from coldata_spark.operators import dedup as DD
from coldata_spark.tables import load
from tools.stress_lsh import BOILER, boilerplate_corpus, predicted_pairs

CAP = 32


def test_cap_bounds_quadratic_work(spark, sf_dir):
    """With 30% byte-identical docs, the uncapped quadratic term must be
    orders of magnitude above the capped one, and the executed capped
    join must do no more work than the bucket-stats bound predicts."""
    corpus = boilerplate_corpus(spark, sf_dir, times=1)
    n_docs = corpus.count()
    n_boiler = corpus.filter(F.col("text") == BOILER).count()
    assert n_boiler >= n_docs // 4  # the skew is actually planted

    pred_uncapped = predicted_pairs(corpus, None)
    pred_capped = predicted_pairs(corpus, CAP)
    # boilerplate bucket alone contributes ~n_boiler^2/2 per band uncapped
    assert pred_uncapped >= (n_boiler * (n_boiler - 1)) // 2
    assert pred_capped * 10 <= pred_uncapped

    capped = DD.minhash_neardup_pairs(
        corpus, "text", "doc_id", max_bucket_size=CAP
    )
    n_capped = capped.count()
    # executed pairs never exceed the sketch-side prediction (the bound
    # the production cap decision is made from)
    assert n_capped <= pred_capped
    # and no boilerplate-boilerplate pair survives: that bucket is over
    # the cap in EVERY band (byte-identical docs agree on all bands)
    boiler_ids = {
        r.doc_id for r in corpus.filter(F.col("text") == BOILER).collect()
    }
    sample = capped.limit(5000).collect()
    assert all(
        not (r.doc_a in boiler_ids and r.doc_b in boiler_ids) for r in sample
    )


def test_cap_keeps_legit_neardups(spark, sf_dir):
    """Capping must only shed degenerate buckets: a planted pair of
    nearly-identical NON-boilerplate documents still surfaces."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 100 >= 30)  # non-boiler range
    twin = base.limit(1).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    planted_src = base.limit(1).first()["doc_id"]
    corpus = boilerplate_corpus(spark, sf_dir, times=1).unionByName(twin)
    capped = DD.minhash_neardup_pairs(
        corpus, "text", "doc_id", max_bucket_size=CAP
    )
    pairs = {
        (r.doc_a, r.doc_b)
        for r in capped.filter(
            (F.col("doc_a") == planted_src)
            | (F.col("doc_b") == planted_src + 5_000_000)
        ).collect()
    }
    assert (planted_src, planted_src + 5_000_000) in pairs
