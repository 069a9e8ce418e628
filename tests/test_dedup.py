"""Dedup-ladder semantics: idempotence, locality, agreement between levels
(SURVEY §5.4 property tests)."""

from __future__ import annotations

from pyspark.sql import functions as F

from coldata_spark.operators import dedup as DD
from coldata_spark.tables import load


def test_exact_dedup_idempotent(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    groups = DD.exact_dedup(docs, "text", "doc_id")
    # dedup of a dedup'd set changes nothing
    keepers = docs.join(
        groups.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
    )
    again = DD.exact_dedup(keepers, "text", "doc_id")
    assert again.count() == groups.count()
    assert again.filter(F.col("n_dups") > 1).count() == 0


def test_fingerprint_insensitive_to_case_punct_ws(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello, World!  How are you?"),
            (2, "hello world how are you"),
            (3, "HELLO   world... how ARE you"),
            (4, "completely different text"),
        ],
        ["doc_id", "text"],
    )
    groups = DD.fingerprint_dedup(df, "text", "doc_id").collect()
    sizes = sorted(g.n_dups for g in groups)
    assert sizes == [1, 3]


def test_simhash_locality(spark):
    base = "the quick brown fox jumps over the lazy dog " * 8
    near = base.replace("lazy", "sleepy")
    far = "completely unrelated content about database engines " * 8
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], ["doc_id", "text"]
    )
    sig = {r.doc_id: r.simhash for r in DD.simhash_signatures(df, "text", "doc_id").collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(sig[1], sig[2]) < ham(sig[1], sig[3])
    assert ham(sig[1], sig[2]) <= 8  # one-word change flips few bits
    # determinism
    sig2 = {r.doc_id: r.simhash for r in DD.simhash_signatures(df, "text", "doc_id").collect()}
    assert sig == sig2


def test_minhash_estimates_jaccard(spark):
    """est_jaccard from signatures tracks true shingle jaccard for dups."""
    a = "data engine spark query optimizer shuffle partition " * 6
    df = spark.createDataFrame(
        [(1, a), (2, a), (3, "zebra yak xylophone walrus " * 6)],
        ["doc_id", "text"],
    )
    pairs = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in DD.minhash_neardup_pairs(df, "text", "doc_id").collect()
    }
    assert pairs.get((1, 2)) == 1.0  # identical docs: all minhashes agree
    assert (1, 3) not in pairs and (2, 3) not in pairs  # no band collision


def test_connected_components_chain_and_clique(spark):
    """Chain 1-2-3 and clique 10-11-12 plus isolated pair 20-21."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (10, 12), (11, 12), (20, 21)],
        ["doc_a", "doc_b"],
    )
    comp = {r.id: r.component for r in DD.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dedup_keepers_end_to_end(spark):
    """Duplicate texts -> minhash pairs -> components -> keepers."""
    a = "spark shuffle partition broadcast join window " * 6
    b = "zebra walrus xylophone yak quokka narwhal " * 6
    df = spark.createDataFrame(
        [(1, a), (2, a), (3, a), (4, b), (5, b), (6, "unique text about nothing else")],
        ["doc_id", "text"],
    )
    pairs = DD.minhash_neardup_pairs(df, "text", "doc_id").filter(
        F.col("est_jaccard") >= 0.9
    )
    kept = sorted(r.doc_id for r in DD.dedup_keepers(df, pairs).collect())
    assert kept == [1, 4, 6]


def test_embedding_neardup_threshold(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").limit(200)
    pairs = DD.embedding_neardup_pairs(emb, threshold=0.9)
    rows = pairs.collect()
    for r in rows:
        assert r.cos_sim >= 0.9
        assert r.id_a < r.id_b


def test_embedding_neardup_lsh_recall(spark, sf_dir):
    """LSH blocking must find the high-similarity pairs the exact path
    finds (surviving pairs are verified, so precision is 1 by construction;
    recall at cos>=0.9 should be high with 4x4-bit bands)."""
    emb = load(spark, sf_dir, "embeddings")
    exact = {
        (r.id_a, r.id_b)
        for r in DD.embedding_neardup_pairs(emb, threshold=0.9).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in DD.embedding_neardup_lsh(emb, threshold=0.9).collect()
    }
    assert lsh <= exact  # verified candidates only
    if exact:
        recall = len(lsh & exact) / len(exact)
        assert recall >= 0.6, f"recall {recall} over {len(exact)} pairs"


def test_q39_surfaces_planted_neardups(spark, sf_dir):
    """q39 plants scaled copies (cosine ~1 after quantization); the
    integer-exact LSH path must surface every planted pair regardless of
    fixture randomness, and the integer dot/norms must reconstruct a
    cosine that close to 1."""
    import math

    from coldata_spark.queries.vector_queries import q39_embedding_neardup_lsh
    from coldata_spark.tables import load

    planted_ids = {
        r.vec_id
        for r in load(spark, sf_dir, "embeddings")
        .filter("vec_id % 50 = 0")
        .select("vec_id")
        .collect()
    }
    got = {
        (r.id_a, r.id_b): (r.dot_q, r.norm_a, r.norm_b)
        for r in q39_embedding_neardup_lsh(spark, sf_dir).collect()
    }
    for vid in planted_ids:
        assert (vid, vid + 1000000) in got, f"planted pair for {vid} missing"
        dot_q, na, nb = got[(vid, vid + 1000000)]
        assert dot_q / math.sqrt(na * nb) >= 0.999


def test_lsh_exact_seeds_give_independent_plane_families(spark, sf_dir):
    """q39 (seed=100) and q152 (seed=0) must exercise DIFFERENT hyperplane
    families — otherwise the two window entries would verify one frozen
    configuration twice.  Planted pairs survive both (cos ~1 collides
    under any family); the distinguishing signal is the candidate sets of
    *non-planted* bucket collisions differing between seeds at the same
    threshold."""
    from coldata_spark.operators import dedup as DD
    from coldata_spark.queries.vector_queries import _planted_base

    base = _planted_base(spark, sf_dir)
    pairs_by_seed = [
        {
            (r.id_a, r.id_b)
            for r in DD.embedding_neardup_lsh_exact(
                base, vec_col="e", thresh_num=0, thresh_den=100, seed=s
            ).collect()
        }
        for s in (0, 100)
    ]
    # threshold 0 keeps every positive-dot bucket collision, so the
    # surviving set IS the candidate topology — different plane families
    # must bucket differently
    assert pairs_by_seed[0] != pairs_by_seed[1]


def test_minhash_hot_bucket_cap_bounds_quadratic_join(spark):
    """A degenerate band bucket (many identical docs) must be skippable:
    with max_bucket_size set, the oversized bucket contributes no pairs,
    while normal-sized buckets keep pairing."""
    hot = [(i, "identical boilerplate text repeated everywhere") for i in range(40)]
    pair = [
        (100, "quick brown fox jumps over the lazy dog tonight"),
        (101, "quick brown fox jumps over the lazy dog tonight"),
    ]
    df = spark.createDataFrame(hot + pair, ["doc_id", "text"])

    uncapped = DD.minhash_neardup_pairs(df, "text", "doc_id").collect()
    # the hot clique alone is 40*39/2 = 780 pairs
    assert len(uncapped) >= 780

    capped = DD.minhash_neardup_pairs(
        df, "text", "doc_id", max_bucket_size=10
    ).collect()
    got = {(r.doc_a, r.doc_b) for r in capped}
    assert (100, 101) in got          # normal bucket survives
    assert all(a >= 100 for a, _ in got)  # hot clique fully skipped


def test_incremental_agrees_with_batch_global(spark, sf_dir):
    """Consistency across the two near-dup entry points: folding a batch
    against a pre-signed corpus must surface EXACTLY the batch-global
    operator's pairs that touch the batch, with identical est_jaccard —
    the incremental path is an optimization, never a semantic fork.
    (Uncapped on both sides so no bucket-cap asymmetry can hide drift.)"""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0).unionByName(
        # planted near-dups of corpus texts under fresh ids
        corpus.filter(F.col("doc_id") % 7 == 1).select(
            (F.col("doc_id") + 500000).alias("doc_id"),
            F.concat("text", F.lit(" tail")).alias("text"),
        )
    )
    full = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in DD.minhash_neardup_pairs(
            corpus.unionByName(batch), "text", "doc_id"
        ).collect()
    }
    corpus_wide = DD.minhash_signatures_wide(corpus, "text", "doc_id")
    pairs, new_wide = DD.minhash_neardup_incremental(
        batch, corpus_wide, "text", "doc_id"
    )
    inc = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b)): r.est_jaccard
        for r in pairs.collect()
    }
    new_wide.unpersist()
    batch_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    touching = {
        k: v for k, v in full.items() if k[0] in batch_ids or k[1] in batch_ids
    }
    assert inc == touching
    assert len(inc) > 0  # the planted dups guarantee a non-trivial check


def test_repeated_ngram_windows_marks_planted_span(spark):
    """A paragraph shared verbatim by two docs must flag exactly its
    windows (with positions usable for clipping); unique text stays
    unflagged."""
    shared = "the quick brown fox jumps over the lazy dog"  # 9 tokens
    df = spark.createDataFrame(
        [
            (1, f"alpha beta gamma delta {shared} omega unique tail one"),
            (2, f"{shared} totally different continuation words here now"),
            (3, "no overlap with anything else in this tiny corpus at all"),
        ],
        ["doc_id", "text"],
    )
    rows = DD.repeated_ngram_windows(df, "text", "doc_id").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 2: the shared 9 tokens start at pos 1 -> windows 1 and 2 dup
    dup2 = sorted(r.pos for r in by_doc[2] if r.dup)
    assert dup2 == [1, 2]
    # doc 1: shared span starts at token 5 -> windows 5 and 6 dup
    dup1 = sorted(r.pos for r in by_doc[1] if r.dup)
    assert dup1 == [5, 6]
    # doc 3: nothing flagged
    assert not any(r.dup for r in by_doc[3])
    # flagged windows agree across docs by hash
    h1 = {r.gram_hash for r in by_doc[1] if r.dup}
    h2 = {r.gram_hash for r in by_doc[2] if r.dup}
    assert h1 == h2


def test_clip_repeated_spans_canonical_keeps_text(spark):
    """The smallest-id occurrence keeps its span; every other doc loses
    exactly the covered tokens; untouched docs come back whitespace-
    normalized but otherwise intact."""
    shared = "one two three four five six seven eight"  # exactly 8 tokens
    df = spark.createDataFrame(
        [
            (1, f"{shared} plus unique suffix tokens here"),
            (2, f"prefix words then {shared} and more trailing"),
            (3, "completely   unrelated\ttext with odd   spacing kept"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in DD.clip_repeated_spans(df, "text", "doc_id").collect()}
    # doc 1 is canonical (min id): nothing removed
    assert out[1].n_tokens_removed == 0
    assert out[1].clean_text.startswith(shared)
    # doc 2: the 8 shared tokens clipped, the rest survives in order
    assert out[2].n_tokens_removed == 8
    assert out[2].clean_text == "prefix words then and more trailing"
    # doc 3: untouched but whitespace-normalized
    assert out[3].n_tokens_removed == 0
    assert out[3].clean_text == "completely unrelated text with odd spacing kept"


def test_clip_repeated_spans_edges(spark):
    """The edges most likely to regress: an all-clipped doc must collapse
    to '' (not NULL), NULL text comes out as '' with 0 removed (matching
    the DuckDB twin's coalesce), and leading/trailing non-space whitespace
    must not leave a phantom empty token in the rebuilt text or counts."""
    shared = "one two three four five six seven eight"  # exactly 8 tokens
    df = spark.createDataFrame(
        [
            (1, f"{shared} anchor"),
            (2, shared),  # every token covered -> clean_text ''
            (3, None),  # NULL text
            (4, "short trailing newline text\n"),
            (5, "\tleading tab text"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r for r in DD.clip_repeated_spans(df, "text", "doc_id").collect()
    }
    assert out[2].clean_text == "" and out[2].n_tokens_removed == 8
    assert out[3].clean_text == "" and out[3].n_tokens_removed == 0
    assert out[4].clean_text == "short trailing newline text"
    assert out[5].clean_text == "leading tab text"
    # phantom '' tokens must not reach the gram windows either: a 7-token
    # doc with a trailing newline has NO 8-token window
    seven = "a b c d e f g\n"
    wins = DD.repeated_ngram_windows(
        spark.createDataFrame([(1, seven)], ["doc_id", "text"]),
        "text",
        "doc_id",
    ).collect()
    assert wins == []


def test_semantic_dedup_keep_rule(spark):
    """SemDeDup keeps the LOWER-centroid-similarity member of a dup pair
    (the paper's keep-the-outlier rule) and leaves singletons alone.  The
    fixture derives centroid 0 from the same md5 family as the operator,
    aligns two near-duplicate vectors with it — one strictly closer to the
    centroid — and plants one unrelated singleton."""
    import hashlib

    import numpy as np

    seed, dim = 7, 64
    c0 = np.array(
        [
            (int(hashlib.md5(f"{0 + seed}_{i}".encode()).hexdigest()[:8], 16)
             % 2001) - 1000
            for i in range(1, dim + 1)
        ],
        dtype=float,
    )
    u = c0 / np.linalg.norm(c0)
    rng = np.random.default_rng(3)
    perp = rng.standard_normal(dim)
    perp -= perp @ u * u
    perp /= np.linalg.norm(perp)
    a = 0.5 * u                      # perfectly aligned with centroid 0
    b = 0.5 * (0.95 * u + 0.05 * perp)  # same direction, slightly off-axis
    lone = 0.5 * perp                # unrelated singleton
    assert (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b)) > 0.95
    df = spark.createDataFrame(
        [(1, [float(x) for x in a]),
         (2, [float(x) for x in b]),
         (3, [float(x) for x in lone])],
        "vec_id bigint, e array<double>",
    )
    out = {r.vec_id: r for r in DD.semantic_dedup_exact(df, vec_col="e").collect()}
    assert out[1].cell == 0 and out[2].cell == 0
    # vec 1 hugs the centroid -> dropped; vec 2 is the outlier -> kept
    assert out[1].kept == 0
    assert out[2].kept == 1
    assert out[3].kept == 1


def test_semantic_dedup_incremental_equals_rebuild(spark, tmp_path):
    """Property: folding a batch into a persisted census is bit-identical
    to rerunning the full rebuild on corpus+batch — including corpus rows
    the batch displaces (a batch doc closer to no centroid... rather,
    farther from the centroid than a kept corpus near-dup must flip that
    corpus row to kept=0)."""
    import numpy as np

    rng = np.random.default_rng(11)
    dim = 64
    base = rng.standard_normal((40, dim)) * 0.3
    corpus_rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    # batch: clones of corpus vectors (some closer to, some farther from
    # their centroid via small radial scaling) + fresh singletons
    batch_rows = []
    for i in range(0, 40, 5):
        batch_rows.append((1000 + i, [float(x) for x in base[i] * 1.02]))
    fresh = rng.standard_normal((5, dim)) * 0.3
    batch_rows += [(2000 + i, [float(x) for x in fresh[i]]) for i in range(5)]
    schema = "vec_id bigint, e array<double>"
    corpus = spark.createDataFrame(corpus_rows, schema)
    batch = spark.createDataFrame(batch_rows, schema)

    kw = dict(vec_col="e", n_clusters=8, thresh_num=90, thresh_den=100)
    rebuild = {
        r.vec_id: r
        for r in DD.semantic_dedup_exact(corpus.unionByName(batch), **kw).collect()
    }
    cpath = str(tmp_path / "census")
    DD.semdedup_census(corpus, **kw).write.partitionBy("cell").parquet(cpath)
    census = spark.read.parquet(cpath)
    inc = {
        r.vec_id: r
        for r in DD.semantic_dedup_incremental(census, batch, **kw).collect()
    }
    assert set(inc) == set(rebuild)
    for vid, r in rebuild.items():
        got = inc[vid]
        assert (got.cell, got.cdot, got.norm_q, got.kept) == (
            r.cell, r.cdot, r.norm_q, r.kept
        ), vid
    # the scenario is non-trivial: some batch rows dropped, and at least
    # one vector's kept flag differs between corpus-alone and the union
    assert any(inc[v].kept == 0 for v, _ in batch_rows[:8])


def test_np_dup_mask_boundary_exactness():
    """_np_dup_mask's float screen + Python-int band recheck must classify
    pairs exactly AT the cross-multiplied boundary the way pure integer
    arithmetic does — the one place the vectorized engines could diverge
    from the decimal expression chain they replaced.  Construct dots that
    land exactly on, just above, and just below dab^2*den2 == na*nb*num2
    with values large enough that float64 alone could not decide."""
    import numpy as np

    from coldata_spark.operators.dedup import _np_dup_mask

    num2, den2 = 80 * 80, 100 * 100
    # na*nb chosen so na*nb*num2 is a perfect square times den2:
    # pick dab, derive na*nb = dab^2*den2/num2 exactly
    dab = np.array([8_000_000.0, 8_000_000.0, 8_000_000.0, -5.0, 0.0])
    na = np.array([10_000_000.0, 10_000_000.0, 10_000_000.0, 1.0, 1.0])
    # nb at boundary: dab^2*den2/(na*num2) = 64e12*1e4/(1e7*6400) = 1e7
    nb_at = 8_000_000.0**2 * den2 / (10_000_000.0 * num2)
    nb = np.array([nb_at, nb_at + 1, nb_at - 1, 1.0, 1.0])
    got = _np_dup_mask(dab, na, nb, num2, den2)
    want = [
        int(d) > 0 and int(d) * int(d) * den2 >= int(a) * int(b) * num2
        for d, a, b in zip(dab, na, nb)
    ]
    assert got.tolist() == want
    # at the exact boundary the pair IS a dup (>=); one ulp under is not
    assert got[0] and not got[1] and got[2] is not None
    assert got.tolist()[:3] == [True, False, True]


def test_np_exact_guard_refuses_oversized_components():
    """Round-14 advice (medium): the float64 BLAS engines are exact only
    while |component| <= sqrt(2^53/dim).  The guard must refuse oversized
    quantized vectors with a resize hint instead of returning silently
    wrong dots, and must pass the ordinary quant=1000 regime untouched."""
    import math

    import numpy as np
    import pandas as pd
    import pytest

    from coldata_spark.operators.dedup import _np_block, _np_exact_guard

    dim = 64
    limit = math.floor(math.sqrt((1 << 53) / dim))
    ok = np.full((3, dim), float(limit))
    _np_exact_guard(ok, "t")  # at the bound: fine
    bad = ok.copy()
    bad[1, 7] = float(limit + 1)
    with pytest.raises(ValueError, match="2\\^53"):
        _np_exact_guard(bad, "t")
    # the guard is wired into the census block reader
    pdf = pd.DataFrame(
        {
            "vec_id": [1, 2],
            "q": [[-float(limit + 2)] * dim, [1.0] * dim],
            "cdot": [0.0, 0.0],
            "norm_q": [1.0, 1.0],
        }
    )
    with pytest.raises(ValueError, match="quant"):
        _np_block(pdf)
    # empty frames never trip it
    _np_exact_guard(np.empty((0, dim)), "t")
