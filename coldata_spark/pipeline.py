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


def gate_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    quality_min: float = 0.5,
) -> DataFrame:
    """The scan-side expression gates, stages 1-3 of the ladder:

    1. clean: non-printables -> space, whitespace collapsed, trimmed
       (after this the only whitespace in ``t`` is plain spaces, so
       every later ``\\s+`` split is engine-identical by construction);
    2. language gate: marker-vocabulary argmax (q22 semantics; ties
       resolve to ``lang`` iff its hit count equals the max);
    3. quality gate: length saturation + alpha ratio (q87 semantics).

    Returns ``(doc_id, t)``.  Pure expressions — Catalyst fuses all
    three into the scan, no shuffle."""
    cleaned = docs.select(
        F.col(id_col).alias("doc_id"),
        TX.clean_text(F.col(text_col)).alias("t"),
    )
    scores = TX.lang_scores(F.col("t"))
    best = F.greatest(*scores.values())
    gated = cleaned.filter(scores[lang] == best)
    return gated.filter(TX.quality_score_raw(F.col("t")) >= quality_min)


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
    barriers: list[DataFrame] | None = None,
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
    ``barriers`` (optional list) receives every persisted intermediate
    so long-lived callers — notebooks, the driver's query loop — can
    ``unpersist()`` them once the manifest is consumed instead of
    reaching for a global ``clearCache()``.

    ``max_bucket_size`` (default 64) is the LSH hot-bucket cap — NOT
    optional posture at scale: a boilerplate band key is quadratic in
    its bucket population inside ONE task, and running this pipeline
    uncapped on the 64x replicated fixture wedges a single straggler on
    ~billions of within-bucket pairs (measured; STRESS.md's 19.3B
    uncapped prediction, reproduced through the full ladder).  The cap
    is a deterministic population count, so the DuckDB twin reproduces
    it bit-for-bit and oracle parity is preserved.
    """
    gated = gate_documents(docs, id_col, text_col, lang, quality_min)
    if materialize:
        # the gates are the corpus-wide expression pass (20 marker scans +
        # quality regexes over every doc) and the DAG below references
        # them FOUR times (keepers + dedup join, each under two deduped
        # references) — measured at the 64x tier: persisting here cuts the
        # ladder from 4 gate evaluations to 1
        gated = gated.persist()
        if barriers is not None:
            barriers.append(gated)

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
        if barriers is not None:
            barriers.append(clean_docs)

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
    # no broadcast hint: near-dup loser sets can be a large fraction of a
    # boilerplate-heavy corpus (same rule as dedup._apply_losers) — AQE
    # picks a broadcast when the set is actually small
    final = clean_docs.join(drops, "doc_id", "left_anti")

    # 7. reproducible training order + shards: seeded md5 permutation
    #    with exact contiguous sequence numbers, no global window.
    manifest = final.select(
        "doc_id",
        TX.quality_score(F.col("t")).alias("quality"),
        TX.token_count(F.col("t")).cast("long").alias("n_tokens"),
    )
    if materialize:
        # the shuffle's bucket-count pass executes at call time; persisting
        # first means it also WARMS the cache the output plan reads — the
        # ladder above runs exactly once end to end
        manifest = manifest.persist()
        if barriers is not None:
            barriers.append(manifest)
    ordered = deterministic_shuffle(manifest, "doc_id", seed=seed)
    return ordered.select(
        "doc_id",
        "quality",
        "n_tokens",
        F.col("seq").cast("long").alias("seq"),
        (F.col("seq") % n_shards).cast("long").alias("shard"),
    )


def fold_corpus_batch(
    batch: DataFrame,
    corpus_texts: DataFrame,
    corpus_wide: DataFrame,
    corpus_count: int,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    quality_min: float = 0.5,
    jaccard_min: float = 0.5,
    n_shards: int = 8,
    seed: str = "pipe",
    max_bucket_size: int | None = 64,
    barriers: list[DataFrame] | None = None,
) -> DataFrame:
    """The DAILY FOLD of the curation ladder: run a NEW batch through
    every rung against the PERSISTED corpus state, without rescanning or
    re-shuffling the corpus — the incremental form of curate_corpus, the
    way a production pipeline actually runs after day one.

    Persisted state (the artifacts a fold writes via the staged-swap
    protocol, passed in explicitly):

      * ``corpus_texts``   — (doc_id, t) of the curated survivors
                             (exact-dedup membership checks);
      * ``corpus_wide``    — their wide minhash signatures
                             (minhash_signatures_wide output);
      * ``corpus_count``   — survivor count (the batch's seq offset:
                             appended docs continue the training order,
                             history is never renumbered).

    Fold semantics (engine-checkable, all deterministic):

      1. gates: identical to curate_corpus;
      2. exact dedup: drop batch docs whose cleaned text matches ANY
         corpus survivor (anti-join on ``t``; the corpus side is the
         tiny-per-bucket build side of one broadcast-or-shuffle hash
         join on text — never re-aggregated), then keep min doc_id per
         identical text WITHIN the batch;
      3. decontamination: identical (the benchmark set is static);
      4. near-dup: minhash_neardup_incremental — the corpus signatures
         are scanned once and never shuffled (plan-gated at the operator
         level); a batch doc drops if it pairs (est >= ``jaccard_min``)
         with any corpus survivor, or with a smaller-id batch doc;
      5. order: survivors get seq = ``corpus_count`` + their rank under
         the seeded permutation WITHIN the batch — append-only training
         order, so data loaders resume without re-reading history.

    Returns the batch manifest (doc_id, quality, n_tokens, seq, shard).
    ``barriers`` (optional list) receives the persisted intermediates
    (clean_docs, manifest, the batch's cached wide signatures) so
    long-lived callers can ``unpersist()`` them once consumed.
    Note the fold is NOT rebuild-identical by design: a full rebuild
    could elect a smaller-id batch doc as a dup-group keeper and
    renumber everything; the fold keeps the persisted corpus immutable —
    the production contract (same stance as q159's incremental
    near-dup).
    """
    from coldata_spark.operators.dedup import minhash_neardup_incremental

    gated = gate_documents(batch, id_col, text_col, lang, quality_min)

    # 2. exact dedup vs corpus, then within-batch keep-first
    fresh = gated.join(corpus_texts.select("t"), "t", "left_anti")
    keepers = fresh.groupBy("t").agg(F.min("doc_id").alias("doc_id"))
    deduped = fresh.join(keepers.select("doc_id"), "doc_id")

    # 3. decontamination (static benchmark set, broadcast)
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
    clean_docs = deduped.join(contaminated, "doc_id", "left_anti").persist()
    if barriers is not None:
        barriers.append(clean_docs)

    # 4. incremental near-dup: batch vs persisted corpus signatures
    pairs, new_wide = minhash_neardup_incremental(
        clean_docs,
        corpus_wide,
        "t",
        "doc_id",
        max_bucket_size=max_bucket_size,
    )
    hits = pairs.filter(F.col("est_jaccard") >= jaccard_min)
    drops = (
        hits.filter(F.col("pair_type") == "new_corpus")
        .select(F.col("doc_a").alias("doc_id"))
        .unionByName(
            hits.filter(F.col("pair_type") == "new_new").select(
                F.col("doc_b").alias("doc_id")
            )
        )
        .distinct()
    )
    # no broadcast hint (same rule as curate_corpus / dedup._apply_losers):
    # near-dup loser sets can be a large fraction of a boilerplate-heavy
    # batch; AQE sees the built size and picks broadcast when it fits
    final = clean_docs.join(drops, "doc_id", "left_anti")

    # 5. append-only training order: seq continues from the corpus
    manifest = final.select(
        "doc_id",
        TX.quality_score(F.col("t")).alias("quality"),
        TX.token_count(F.col("t")).cast("long").alias("n_tokens"),
    ).persist()
    if barriers is not None:
        barriers.append(manifest)
        barriers.append(new_wide)
    ordered = deterministic_shuffle(manifest, "doc_id", seed=seed)
    # new_wide stays cached: unpersisting it here would non-cascading-
    # invalidate (re-plan) the dependent cached manifest mid-build; the
    # production fold writes new_wide to the corpus signature table and
    # lets the session end instead
    return ordered.select(
        "doc_id",
        "quality",
        "n_tokens",
        (F.col("seq") + F.lit(corpus_count)).cast("long").alias("seq"),
        ((F.col("seq") + F.lit(corpus_count)) % n_shards)
        .cast("long")
        .alias("shard"),
    )
