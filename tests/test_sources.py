"""Source/sink roundtrips (S4, S5, S7, S13) on fixture-derived data."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from coldata_spark.sources import io as IO
from coldata_spark.tables import load


def test_csv_roundtrip_with_schema(spark, sf_dir, tmp_path):
    cust = load(spark, sf_dir, "customer")
    path = str(tmp_path / "cust_csv")
    cust.write.option("header", "true").csv(path)
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    )
    back = IO.read_csv(spark, path, schema)
    assert back.count() == cust.count()
    assert back.schema == schema
    # kaggle.py:50-61 shape: dedup + join works on the csv-sourced frame
    assert back.dropDuplicates(["c_custkey"]).count() == cust.count()


def test_csv_schema_inference(spark, sf_dir, tmp_path):
    nat = load(spark, sf_dir, "nation")
    path = str(tmp_path / "nat_csv")
    nat.write.option("header", "true").csv(path)
    inferred = IO.read_csv(spark, path)
    assert dict(inferred.dtypes)["n_nationkey"] == "int"
    assert inferred.count() == 25


def test_json_roundtrip_and_embedded_decode(spark, sf_dir, tmp_path):
    ev = load(spark, sf_dir, "events").limit(500)
    path = str(tmp_path / "events_json")
    ev.select("event_id", "event_type", "props").write.json(path)
    back = IO.read_json(spark, path)
    assert back.count() == 500
    decoded = IO.decode_json_column(
        back, "props", T.StructType([T.StructField("k", T.LongType())])
    )
    ks = decoded.select(F.col("props.k").alias("k")).filter(F.col("k").isNotNull())
    assert ks.count() == 500


def test_checkpoint_cuts_lineage(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    ck = IO.checkpoint(docs, str(tmp_path / "ck"))
    assert ck.count() == docs.count()
    # checkpointed plan is a bare scan — the upstream filter predicate is
    # gone (it was materialized at write time, lineage cut)
    plan = ck._jdf.queryExecution().executedPlan().toString()
    assert "doc_id % 2" not in plan and "FileScan" in plan


def test_backup_restore(spark, sf_dir, tmp_path):
    emb = load(spark, sf_dir, "embeddings")
    IO.backup(emb, str(tmp_path / "bk"))
    back = IO.restore(spark, str(tmp_path / "bk"))
    assert back.count() == emb.count()
    assert set(back.columns) == set(emb.columns)
    a = back.agg(F.sum("vec_id")).collect()[0][0]
    b = emb.agg(F.sum("vec_id")).collect()[0][0]
    assert a == b


def test_compact_small_files(spark, sf_dir, tmp_path):
    from coldata_spark.sources.io import compact

    t = str(tmp_path / "frag_table")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    li.repartition(40).write.parquet(t)  # fragment: 40 tiny files
    import os

    assert len([f for f in os.listdir(t) if f.endswith(".parquet")]) == 40
    before = spark.read.parquet(t)
    n_rows, checksum = before.count(), before.agg(F.sum("l_quantity")).collect()[0][0]

    n_files = compact(spark, t, target_file_bytes=1 << 20, sort_by=["l_orderkey"])
    assert n_files < 40
    after = spark.read.parquet(t)
    assert after.count() == n_rows
    assert after.agg(F.sum("l_quantity")).collect()[0][0] == checksum


def test_merge_schema_read(spark, tmp_path):
    from coldata_spark.sources.io import read_parquet_merged_schema

    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id bigint, name string").write.parquet(
        p + "/batch=1"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, name string, score double"
    ).write.parquet(p + "/batch=2")
    df = read_parquet_merged_schema(spark, p)
    assert set(df.columns) >= {"id", "name", "score"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5


def test_ignore_corrupt_files_read(spark, tmp_path):
    """Operational resilience: one corrupt object in a 100 TB prefix must
    not fail the whole scan when ignoreCorruptFiles is on (the batch-read
    analogue of a crawler skipping one bad page)."""
    p = tmp_path / "with_corruption"
    p.mkdir()
    spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string").coalesce(
        1
    ).write.parquet(str(p / "good"))
    (p / "good" / "part-corrupt.parquet").write_bytes(b"PAR1 this is not parquet")

    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        got = spark.read.parquet(str(p / "good")).count()
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
    assert got == 2


def test_export_jsonl_shards_roundtrip(spark, sf_dir, tmp_path):
    """Shard export: n_shards JSONL dirs, lossless round-trip, and shard
    membership matching the q106 audit query's deterministic assignment."""
    from pyspark.sql import functions as F

    from coldata_spark.queries.curation_queries import q106_shard_assignment
    from coldata_spark.sources.io import export_jsonl_shards
    from coldata_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    out = str(tmp_path / "shards")
    n = export_jsonl_shards(docs, out, n_shards=16)
    assert n == 16

    back = spark.read.json(out)
    assert back.count() == docs.count()

    got = {
        (r.shard, r.n_docs)
        for r in back.groupBy("shard").agg(F.count("*").alias("n_docs")).collect()
    }
    want = {
        (r.shard, r.n_docs)
        for r in q106_shard_assignment(spark, sf_dir).collect()
    }
    assert got == want


def test_register_views_sql_surface(spark, sf_dir):
    from coldata_spark.tables import load, register_views

    names = register_views(spark, sf_dir)
    assert len(names) == 10
    got = spark.sql("SELECT count(*) AS n FROM lineitem").first()["n"]
    assert got == load(spark, sf_dir, "lineitem").count()
    # a cross-table SQL join resolves through the same loaders (events ts
    # normalization included: date_trunc over the LTZ column must work)
    top = spark.sql(
        """
        SELECT r.r_name, count(*) AS n
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY n DESC, r.r_name LIMIT 1
        """
    ).first()
    assert top["n"] == 5
    assert spark.sql(
        "SELECT count(DISTINCT date_trunc('hour', ts)) AS h FROM events"
    ).first()["h"] > 0


def test_export_tar_shards_roundtrip(spark, sf_dir, tmp_path):
    """WebDataset-style tar shards: deterministic membership (same md5
    bucket as the JSONL exporter), lossless payload+metadata round-trip,
    and byte-reproducible re-export."""
    import hashlib
    import json
    import tarfile

    from pyspark.sql import functions as F

    from coldata_spark.sources.io import export_tar_shards
    from coldata_spark.tables import load

    docs = (
        load(spark, sf_dir, "documents")
        .limit(60)
        .select(
            "doc_id",
            F.encode(F.col("text"), "utf-8").alias("payload"),
            "source",
            "lang",
        )
    )
    out = str(tmp_path / "tars")
    n = export_tar_shards(
        docs,
        out,
        n_shards=4,
        payload_col="payload",
        meta_cols=("source", "lang"),
        ext="txt",
    )
    assert n == 4

    rows = {
        r["doc_id"]: r
        for r in docs.withColumn(
            "shard",
            F.expr(
                "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10)"
                " as bigint) % 4"
            ),
        ).collect()
    }
    seen = {}
    for sid in range(4):
        with tarfile.open(f"{out}/shard-{sid:05d}.tar") as tar:
            names = tar.getnames()
            payloads = {
                m.name: tar.extractfile(m).read() for m in tar.getmembers()
            }
        for name in names:
            key, ext = name.rsplit(".", 1)
            doc_id = int(key)
            assert rows[doc_id]["shard"] == sid, (doc_id, sid)
            if ext == "txt":
                assert payloads[name] == bytes(rows[doc_id]["payload"])
                seen[doc_id] = True
            else:
                meta = json.loads(payloads[name])
                assert meta == {
                    "source": rows[doc_id]["source"],
                    "lang": rows[doc_id]["lang"],
                }
    assert set(seen) == set(rows)

    # re-export is byte-identical (fixed mtimes + sorted members)
    digest1 = {
        sid: hashlib.md5(open(f"{out}/shard-{sid:05d}.tar", "rb").read()).hexdigest()
        for sid in range(4)
    }
    out2 = str(tmp_path / "tars2")
    export_tar_shards(
        docs, out2, n_shards=4, payload_col="payload",
        meta_cols=("source", "lang"), ext="txt",
    )
    digest2 = {
        sid: hashlib.md5(open(f"{out2}/shard-{sid:05d}.tar", "rb").read()).hexdigest()
        for sid in range(4)
    }
    assert digest1 == digest2


def test_read_tar_shards_roundtrip(spark, sf_dir, tmp_path):
    """read_tar_shards re-ingests export_tar_shards output losslessly:
    every (key, payload, meta) row comes back byte-identical."""
    import json

    from pyspark.sql import functions as F

    from coldata_spark.sources.io import export_tar_shards, read_tar_shards
    from coldata_spark.tables import load

    docs = (
        load(spark, sf_dir, "documents")
        .limit(40)
        .select(
            "doc_id",
            F.encode(F.col("text"), "utf-8").alias("payload"),
            "source",
            "lang",
        )
    )
    out = str(tmp_path / "rt_tars")
    export_tar_shards(
        docs, out, n_shards=4, payload_col="payload",
        meta_cols=("source", "lang"), ext="txt",
    )
    back = {
        r.key: (bytes(r.payload), json.loads(r.meta), r.shard)
        for r in read_tar_shards(spark, out, ext="txt").collect()
    }
    want = {
        str(r.doc_id): (bytes(r.payload), {"source": r.source, "lang": r.lang})
        for r in docs.collect()
    }
    assert set(back) == set(want)
    for k, (payload, meta) in want.items():
        got_payload, got_meta, got_shard = back[k]
        assert got_payload == payload
        assert got_meta == meta
        assert got_shard.startswith("shard-") and got_shard.endswith(".tar")
    # the streaming pairing path: batch_records smaller than a shard's
    # record count forces mid-shard pandas-batch yields (each shard holds
    # 10 records here) — the result must be identical
    streamed = {
        r.key: (bytes(r.payload), json.loads(r.meta), r.shard)
        for r in read_tar_shards(
            spark, out, ext="txt", batch_records=3
        ).collect()
    }
    assert streamed == back
