"""curate_corpus: the end-to-end ladder's cross-stage invariants.

Value parity with the composed DuckDB twin is covered by
tests/test_oracle.py over q169; these tests check the semantic contracts
that parity alone wouldn't localize when broken."""

from __future__ import annotations

from pyspark.sql import functions as F

from coldata_spark.pipeline import curate_corpus
from coldata_spark.tables import load


def _run(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return curate_corpus(
        docs.filter(F.col("doc_id") >= 20),
        bench=docs.filter(F.col("doc_id") < 20),
        seed="pipe",
    )


def test_manifest_shape_and_sequence(spark, sf_dir):
    rows = _run(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    # seq is an exact contiguous 0-based permutation of the survivors
    assert sorted(r["seq"] for r in rows) == list(range(n))
    # shards are round-robin over seq: balanced within one doc
    by_shard = {}
    for r in rows:
        assert r["shard"] == r["seq"] % 8
        by_shard[r["shard"]] = by_shard.get(r["shard"], 0) + 1
    assert max(by_shard.values()) - min(by_shard.values()) <= 1


def test_no_benchmark_grams_survive(spark, sf_dir):
    """Decontamination contract: no surviving doc shares a whitespace
    8-gram with the benchmark set."""
    from coldata_spark.functions.text import clean_text, eight_gram_md5s

    docs = load(spark, sf_dir, "documents")
    manifest = _run(spark, sf_dir).select("doc_id")
    surv_grams = eight_gram_md5s(
        docs.join(manifest, "doc_id").select(
            "doc_id", clean_text(F.col("text")).alias("t")
        ),
        "t",
    )
    bench_grams = eight_gram_md5s(
        docs.filter(F.col("doc_id") < 20).select(
            clean_text(F.col("text")).alias("t")
        ),
        "t",
    ).select("g")
    assert surv_grams.join(bench_grams, "g").count() == 0


def test_no_exact_dup_text_survives(spark, sf_dir):
    from coldata_spark.functions.text import clean_text

    docs = load(spark, sf_dir, "documents")
    manifest = _run(spark, sf_dir).select("doc_id")
    survivors = docs.join(manifest, "doc_id").select(
        clean_text(F.col("text")).alias("t")
    )
    assert survivors.count() == survivors.distinct().count()


def test_no_neardup_pair_survives(spark, sf_dir):
    """Near-dup contract: no surviving pair agrees on >= 4 of 8 minhash
    positions (est_jaccard >= 0.5)."""
    from coldata_spark.functions.text import clean_text
    from coldata_spark.operators.dedup import minhash_neardup_pairs

    docs = load(spark, sf_dir, "documents")
    manifest = _run(spark, sf_dir).select("doc_id")
    survivors = docs.join(manifest, "doc_id").select(
        "doc_id", clean_text(F.col("text")).alias("t")
    )
    pairs = minhash_neardup_pairs(survivors, "t", "doc_id")
    assert pairs.filter(F.col("est_jaccard") >= 0.5).count() == 0


def test_pipeline_drops_are_real(spark, sf_dir):
    """The fixture contains clones, contaminated docs and non-en docs, so
    a correct pipeline must drop a substantial fraction — a no-op ladder
    (all gates pass-through) would be a silent wiring bug."""
    docs = load(spark, sf_dir, "documents")
    n_corpus = docs.filter(F.col("doc_id") >= 20).count()
    n_out = _run(spark, sf_dir).count()
    assert 0 < n_out < n_corpus


def test_fold_appends_after_corpus(spark, sf_dir):
    """q170 contract: batch survivors continue the training order from
    the corpus survivor count (append-only, history never renumbered),
    contiguously and with round-robin shards."""
    from coldata_spark import registry

    spec = registry.specs()["q170_curation_pipeline_incremental"]
    rows = spec.fn(spark, sf_dir).collect()
    assert rows
    docs = load(spark, sf_dir, "documents")
    corpus_raw = docs.filter(
        (F.col("doc_id") >= 20) & (F.col("doc_id") % 10 != 9)
    )
    n_corpus = curate_corpus(
        corpus_raw, bench=docs.filter(F.col("doc_id") < 20), seed="pipe"
    ).count()
    seqs = sorted(r["seq"] for r in rows)
    assert seqs == list(range(n_corpus, n_corpus + len(rows)))
    assert all(r["shard"] == r["seq"] % 8 for r in rows)
    # every batch survivor is a genuine batch doc
    assert all(r["doc_id"] % 10 == 9 for r in rows)


def test_fold_plan_stays_bounded(spark, sf_dir):
    """The composed fold must cut lineage at the persisted-state
    artifacts: carrying the corpus ladder's lineage into the fold makes
    the logical plan explode combinatorially (measured: 283 MB of plan
    text, 111k scan nodes, ~90 s of driver-side analysis per collect).
    Gate the plan size so a refactor can't silently reintroduce it."""
    from coldata_spark import registry
    from tests.test_plans import plan_of

    spec = registry.specs()["q170_curation_pipeline_incremental"]
    plan = plan_of(spec.fn(spark, sf_dir))
    assert len(plan) < 5_000_000, f"fold plan exploded: {len(plan)} bytes"
