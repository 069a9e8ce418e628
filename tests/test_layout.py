"""Z-order clustering: multi-dimensional data skipping via parquet
footer stats (operators/layout.py)."""

from __future__ import annotations

from coldata_spark.operators.layout import (
    files_overlapping,
    write_zordered,
    zorder_key,
)
from coldata_spark.tables import load


def test_zorder_prunes_every_dimension(spark, sf_dir, tmp_path):
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    n = li.count()
    stats = li.selectExpr(
        "min(l_partkey)", "max(l_partkey)", "min(l_suppkey)", "max(l_suppkey)"
    ).first()

    zpath = str(tmp_path / "z_idx")
    write_zordered(li, zpath, ["l_partkey", "l_suppkey"], n_files=8)
    lpath = str(tmp_path / "lin_idx")
    (
        li.repartitionByRange(8, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    # lossless rewrite, original schema
    back = spark.read.parquet(zpath)
    assert back.count() == n and set(back.columns) == set(li.columns)

    # 1/8th-range box in each dimension
    pk = (stats[0], stats[0] + (stats[1] - stats[0]) // 8)
    sk = (stats[2], stats[2] + (stats[3] - stats[2]) // 8)

    lin_sk_hit, total = files_overlapping(lpath, "l_suppkey", *sk)
    z_sk_hit, _ = files_overlapping(zpath, "l_suppkey", *sk)
    z_pk_hit, _ = files_overlapping(zpath, "l_partkey", *pk)

    # single-column sort cannot skip anything for the OTHER column...
    assert lin_sk_hit == total
    # ...while the z-order layout prunes in BOTH dimensions: the suppkey
    # box (linear's blind spot) skips at least half the files, and the
    # partkey box still skips files despite sharing curve bits
    assert z_sk_hit <= total // 2
    assert z_pk_hit <= total - 2


def test_zorder_key_is_deterministic_and_bounded(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").limit(200)
    key = zorder_key(li, ["l_partkey", "l_suppkey"], bits=8)
    vals = [r.k for r in li.select(key.alias("k")).collect()]
    assert all(0 <= v < (1 << 16) for v in vals)
    vals2 = [r.k for r in li.select(key.alias("k")).collect()]
    assert vals == vals2


def test_compact_small_files_preserves_rows_and_hits_target(spark, sf_dir, tmp_path):
    from coldata_spark.operators.layout import compact_parquet_dir

    li = load(spark, sf_dir, "lineitem")
    frag = str(tmp_path / "fragmented")
    li.repartition(64).write.parquet(frag)

    dst = str(tmp_path / "compacted")
    audit = compact_parquet_dir(spark, frag, dst, target_bytes=4 << 20)

    assert audit["files_before"] == 64
    assert audit["files_after"] == audit["target_files"] < 64
    # lossless: same rows, same content hash on a stable projection
    a = spark.read.parquet(frag)
    b = spark.read.parquet(dst)
    assert a.count() == b.count()
    cols = sorted(a.columns)
    ha = a.select(*cols).orderBy("l_orderkey", "l_linenumber").toPandas()
    hb = b.select(*cols).orderBy("l_orderkey", "l_linenumber").toPandas()
    assert ha.equals(hb)


def test_compact_refuses_in_place_overwrite(spark, sf_dir, tmp_path):
    """dst == src would overwrite the directory being lazily read."""
    import pytest

    from coldata_spark.operators.layout import compact_parquet_dir

    src = str(tmp_path / "frag")
    spark.read.parquet(f"{sf_dir}/nation.parquet").write.parquet(src)
    with pytest.raises(ValueError, match="dst == src"):
        compact_parquet_dir(spark, src, src)
    # a relative alias of the same dir must be caught too
    alias = src + "/../" + src.rsplit("/", 1)[-1]
    with pytest.raises(ValueError, match="dst == src"):
        compact_parquet_dir(spark, src, alias)
