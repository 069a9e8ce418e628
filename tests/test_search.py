"""End-to-end search engine API (the reference's update/search surface)."""

from __future__ import annotations

from pyspark.sql import functions as F

from coldata_spark import search as S
from coldata_spark.tables import load


def test_build_and_search(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents")
    idx = S.build_index(docs, str(tmp_path / "search_idx"), nlist=8)

    # query with each document's FIRST CHUNK (the indexed unit): the parent
    # must appear in the top-k with a ~perfect score (another doc can tie
    # only with an identical chunk)
    targets = docs.orderBy("doc_id").limit(2).collect()
    queries = [t.text[:128] for t in targets]
    results = S.search(spark, idx, docs, queries, k=4).collect()
    by_q = {}
    for r in results:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == {0, 1}
    for qid, target in enumerate(targets):
        rows = sorted(by_q[qid], key=lambda r: r.rank)
        assert len(rows) <= 4
        assert rows[0].score > 0.99, f"query {qid}"
        assert target.doc_id in [r.doc_id for r in rows], f"query {qid}"
        assert rows[0].preview.endswith("...")
        # ranks are contiguous from 1 and scores non-increasing
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_streaming_ingest_feeds_index(spark, sf_dir, tmp_path):
    """The full refresh loop (scheduler.py:21-33 re-crawl -> vdb.update
    rebuild) as INCREMENTAL streaming: new document files arrive -> embed ->
    append to the existing IVF index via foreachBatch; appended docs are
    immediately searchable."""
    import shutil

    from pyspark.sql import functions as F

    from coldata_spark import embed as E
    from coldata_spark.operators import ivf

    docs = load(spark, sf_dir, "documents")
    half = docs.filter(F.col("doc_id") < 250)
    rest = docs.filter(F.col("doc_id") >= 250)

    # initial index over half the corpus (doc-level vectors for simplicity)
    emb_half = E.embed_documents(half).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    assigned, centroids = ivf.build_ivf(emb_half, nlist=4)
    path = str(tmp_path / "stream_index")
    ivf.write_ivf(assigned, path)

    # the other half arrives as a stream of parquet files
    in_dir = tmp_path / "incoming"
    in_dir.mkdir()
    rest.write.parquet(str(in_dir / "batch0"))
    stream = (
        spark.readStream.schema(rest.schema).parquet(str(in_dir) + "/*")
    )

    def absorb(batch_df, batch_id):
        vecs = E.embed_documents(batch_df).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        )
        ivf.append_to_index(vecs, centroids, path)

    q = (
        stream.writeStream.foreachBatch(absorb)
        .option("checkpointLocation", str(tmp_path / "ckpt_ingest"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert spark.read.parquet(path).count() == docs.count()
    # a late-arriving document is searchable
    target = rest.orderBy("doc_id").first()
    qdf = E.embed_queries(spark, [target.text]).select("q_id", "q_vec")
    hits = ivf.search_ivf(spark, path, qdf, centroids, k=1, nprobe=4).collect()
    assert hits and hits[0].vec_id == target.doc_id


def test_search_pruned_probe_still_finds_self(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents")
    idx = S.build_index(docs, str(tmp_path / "search_idx2"), nlist=8)
    target = docs.orderBy("doc_id").first()
    res = S.search(spark, idx, docs, [target.text[:128]], k=2, nprobe=2).collect()
    # the probed cell containing the query's own chunk must surface a
    # perfect-score hit (the chunk's own cell is always the best-scoring one)
    assert res and res[0].score > 0.99


def test_pq_encode_compresses_and_recalls(spark, sf_dir):
    """PQ: codes are m small ints; ADC candidate list at 5x over-fetch must
    recover most of the exact L2 top-10 (the IVF-PQ re-rank contract)."""
    import numpy as np

    from coldata_spark.operators import ivf
    from coldata_spark.tables import load

    emb = load(spark, sf_dir, "embeddings").withColumnRenamed("vec_id", "item_id")
    codebook = ivf.pq_train(emb, m=8, k=16, sample_limit=500)
    assert codebook.shape == (8, 16, 8)

    codes = ivf.pq_encode(emb, codebook)
    row = codes.first()
    assert len(row["pq_codes"]) == 8
    assert all(0 <= c < 16 for c in row["pq_codes"])

    q = np.array(emb.select("embedding").first()[0], dtype=np.float64)
    cands = {
        r["item_id"]
        for r in ivf.pq_search(codes, q, codebook, top_k=50).collect()
    }
    # exact L2 top-10, numpy-side (500 rows at sf0.001)
    import pandas as pd

    pdf = emb.select("item_id", "embedding").toPandas()
    x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    d2 = ((x - q[None, :]) ** 2).sum(axis=1)
    exact10 = set(pdf["item_id"].to_numpy()[np.argsort(d2, kind="stable")[:10]])
    hit = len(cands & exact10)
    assert hit >= 6, f"PQ candidates recovered only {hit}/10 exact neighbors"


def test_ivf_pq_end_to_end_recall(spark, sf_dir):
    """IVF-PQ with full probe + re-rank must recover most of the exact
    top-4 (PQ error is confined to candidate selection; re-rank restores
    exact scores)."""
    from coldata_spark.operators import ivf
    from coldata_spark.operators.similarity import knn_join
    from coldata_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    queries = (
        emb.limit(5)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    )
    index, centroids, codebook = ivf.build_ivf_pq(emb, nlist=8, m=8, k_codes=16)

    got = ivf.search_ivf_pq(
        index, queries, centroids, codebook, k=4, nprobe=8, overfetch=8,
        metric="COSINE",
    )
    exact = knn_join(queries, emb, k=4, metric="COSINE")

    got_pairs = {(r["q_id"], r["vec_id"]) for r in got.collect()}
    exact_pairs = {(r["q_id"], r["vec_id"]) for r in exact.collect()}
    recall = len(got_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.75, f"IVF-PQ recall {recall}"
    # returned scores are exact (re-ranked), so overlapping pairs agree
    got_scores = {(r["q_id"], r["vec_id"]): r["score"] for r in got.collect()}
    for r in exact.collect():
        key = (r["q_id"], r["vec_id"])
        if key in got_scores:
            assert abs(got_scores[key] - r["score"]) < 1e-9


def test_search_parent_ids_with_underscores(spark, sf_dir, tmp_path):
    """Round-4 ADVICE (medium): parent recovery used
    substring_index(vec_id, '_', 1), truncating any caller-supplied parent
    id at its FIRST underscore — "web_001" and "web_002" merged into "web"
    and their rows vanished at the documents join.  Only the trailing chunk
    ordinal may be stripped."""
    docs = (
        load(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .limit(6)
        .select(
            F.concat(F.lit("web_00"), F.col("doc_id")).alias("doc_id"),
            "text",
        )
    )
    idx = S.build_index(docs, str(tmp_path / "us_idx"), nlist=4)
    targets = docs.orderBy("doc_id").limit(2).collect()
    queries = [t.text[:128] for t in targets]
    rows = S.search(spark, idx, docs, queries, k=3).collect()
    assert rows, "underscored parents dropped every result"
    ids = {r.doc_id for r in rows}
    # every returned id must be a REAL document id, not a truncated prefix
    real = {r.doc_id for r in docs.collect()}
    assert ids <= real, f"truncated parent ids leaked: {ids - real}"
    # and each query's own parent must be findable
    for qid, t in enumerate(targets):
        got = [r.doc_id for r in rows if r.q_id == qid]
        assert t.doc_id in got, f"query {qid}: {t.doc_id} not in {got}"


def test_pq_train_ragged_vectors_clear_error(spark):
    """Round-8 ADVICE: np.stack raises numpy's bare 'all input arrays must
    have the same shape' on mixed-length vectors, losing the guarded
    pq_train error the old np.array object-array path produced."""
    import pytest

    from coldata_spark.operators import ivf

    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0]), (2, [1.0, 2.0])], ["id", "embedding"]
    )
    with pytest.raises(ValueError, match="ragged"):
        ivf.pq_train(ragged, m=2, k=4, sample_limit=10)
    # non-numeric payloads keep numpy's own conversion diagnosis — the
    # ragged relabel must not swallow a different defect
    bad = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["c", "d"])], ["id", "embedding"]
    )
    with pytest.raises(ValueError) as ei:
        ivf.pq_train(bad, m=2, k=4, sample_limit=10)
    assert "ragged" not in str(ei.value)
