"""End-to-end corpus curation pipeline — the nightly composition.

Every rung exists as a standalone operator (and oracle-checked query);
this module composes them into the single lazy DataFrame DAG a
training-data pipeline actually runs, in the canonical order:

    clean -> language-ID gate -> quality gate -> exact dedup
          -> benchmark decontamination -> near-dup (MinHash-LSH) drop
          -> deterministic training-order shuffle + shard assignment

Reference parity: the reference curates per-source documents imperatively
(crawler loops + store upserts); this is the published-pipeline upgrade —
C4/Gopher-style gates, Lee et al. 2022-family dedup, GPT-3-appendix
n-gram decontamination, and a seeded reproducible shuffle — expressed as
ONE Catalyst plan so the optimizer pipelines every scan-side gate into
the first pass over the corpus.

Why composition order matters at 100 TB: the language and quality gates
are scan-side expressions (no shuffle) and run FIRST, so every shuffle
that follows (exact-dedup groupBy, minhash signature aggregation, LSH
band join) sees only surviving rows.  The benchmark gram set and the
near-dup drop list are both tiny and broadcast; the corpus side shuffles
exactly twice (text groupBy; signature groupBy) and is never collected.

Every stage is integer/string/deterministic-double arithmetic, so the
WHOLE pipeline is value-hash-checkable against an independent engine —
q169 in queries/curation_queries.py carries the composed DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coldata_spark.functions import text as TX
from coldata_spark.functions.text import eight_gram_md5s
from coldata_spark.operators.dedup import minhash_neardup_pairs
from coldata_spark.operators.ordering import deterministic_shuffle


def curate_corpus(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    quality_min: float = 0.5,
    jaccard_min: float = 0.5,
    n_shards: int = 8,
    seed: str = "pipe",
    materialize: bool = True,
    max_bucket_size: int | None = 64,
) -> DataFrame:
    """Run the full curation ladder over ``docs``; returns the training
    manifest ``(doc_id, quality, n_tokens, seq, shard)``.

    ``bench`` is the held-out evaluation set: any document sharing a
    whitespace-token 8-gram with it is dropped (decontamination).  The
    gates run in scan order (cheap expression filters first), dedup keeps
    the smallest id per identical cleaned text, near-dup keeps the
    smaller id of every MinHash pair with estimated jaccard >=
    ``jaccard_min``, and the survivors get a seeded reproducible global
    order (``seq``) and round-robin ``shard``.

    ``quality_min`` compares the UNROUNDED score (both engines compute
    the identical double); ``jaccard_min`` compares the 8-position
    signature-agreement fraction (multiples of 1/8, exact in binary).

    ``materialize`` (default on) inserts explicit materialization
    barriers (``persist``) at the two points the DAG re-references its
    own upstream: the decontaminated survivor set feeds the minhash
    signature build AND the final anti-join, and the manifest feeds both
    deterministic_shuffle's bucket-count pass and the output plan.
    Without barriers a lazy DAG re-evaluates the whole ladder per
    reference (Catalyst's ReuseExchange dedupes identical exchanges but
    not differently-keyed subtree copies) — at 100 TB that is the
    difference between scanning the corpus once and scanning it four
    times.  A production run checkpoints these to managed storage via
    the staged-swap protocol instead; persist is the in-session form.

    ``max_bucket_size`` (default 64) is the LSH hot-bucket cap — NOT
    optional posture at scale: a boilerplate band key is quadratic in
    its bucket population inside ONE task, and running this pipeline
    uncapped on the 64x replicated fixture wedges a single straggler on
    ~billions of within-bucket pairs (measured; STRESS.md's 19.3B
    uncapped prediction, reproduced through the full ladder).  The cap
    is a deterministic population count, so the DuckDB twin reproduces
    it bit-for-bit and oracle parity is preserved.
    """
    # 1. clean: non-printables -> space, whitespace collapsed, trimmed.
    #    After this, the only whitespace in `t` is plain spaces — every
    #    later \s+ split is engine-identical by construction.
    cleaned = docs.select(
        F.col(id_col).alias("doc_id"),
        TX.clean_text(F.col(text_col)).alias("t"),
    )

    # 2. language gate: marker-vocabulary argmax (q22 semantics; ties
    #    resolve to `lang` iff its hit count equals the max).
    scores = TX.lang_scores(F.col("t"))
    best = F.greatest(*scores.values())
    gated = cleaned.filter(scores[lang] == best)

    # 3. quality gate: length saturation + alpha ratio (q87 semantics).
    gated = gated.filter(TX.quality_score_raw(F.col("t")) >= quality_min)
    if materialize:
        # the gates are the corpus-wide expression pass (20 marker scans +
        # quality regexes over every doc) and the DAG below references
        # them FOUR times (keepers + dedup join, each under two deduped
        # references) — measured at the 64x tier: persisting here cuts the
        # ladder from 4 gate evaluations to 1
        gated = gated.persist()

    # 4. exact dedup: keep min doc_id per identical cleaned text.
    keepers = gated.groupBy("t").agg(F.min("doc_id").alias("doc_id"))
    deduped = gated.join(keepers.select("doc_id"), "doc_id")

    # 5. decontamination: drop any doc sharing an 8-gram with the
    #    benchmark set.  The gram set is tiny (eval suites are small by
    #    definition) and broadcast; the corpus side never shuffles here.
    bench_grams = (
        eight_gram_md5s(
            bench.select(TX.clean_text(F.col(text_col)).alias("t")), "t"
        )
        .select("g")
        .distinct()
    )
    contaminated = (
        eight_gram_md5s(deduped, "t")
        .join(F.broadcast(bench_grams), "g")
        .select("doc_id")
        .distinct()
    )
    clean_docs = deduped.join(contaminated, "doc_id", "left_anti")
    if materialize:
        clean_docs = clean_docs.persist()

    # 6. near-dup drop: LSH-banded MinHash pairs over the survivors; the
    #    larger id of every verified pair is dropped (the standard
    #    keep-first policy; q59's connected components is the
    #    transitive-closure variant when groups matter).
    pairs = minhash_neardup_pairs(
        clean_docs, "t", "doc_id", max_bucket_size=max_bucket_size
    )
    drops = (
        pairs.filter(F.col("est_jaccard") >= jaccard_min)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    final = clean_docs.join(F.broadcast(drops), "doc_id", "left_anti")

    # 7. reproducible training order + shards: seeded md5 permutation
    #    with exact contiguous sequence numbers, no global window.
    manifest = final.select(
        "doc_id",
        F.round(TX.quality_score_raw(F.col("t")), 6).alias("quality"),
        TX.token_count(F.col("t")).cast("long").alias("n_tokens"),
    )
    if materialize:
        # the shuffle's bucket-count pass executes at call time; persisting
        # first means it also WARMS the cache the output plan reads — the
        # ladder above runs exactly once end to end
        manifest = manifest.persist()
    ordered = deterministic_shuffle(manifest, "doc_id", seed=seed)
    return ordered.select(
        "doc_id",
        "quality",
        "n_tokens",
        F.col("seq").cast("long").alias("seq"),
        (F.col("seq") % n_shards).cast("long").alias("shard"),
    )
