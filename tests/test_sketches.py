"""Sketch-layer properties beyond oracle parity (tests/test_oracle.py):
mergeability — the algebraic property that makes both sketches valid
map-side partials at scale — and the count-min overcount guarantee.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from coldata_spark.queries import sketch_queries as SK
from coldata_spark.tables import load

SF = "/root/testdata/sf0.001"


def _hll_registers(spark, df, key):
    h = df.select(
        F.expr(
            f"cast(conv(substring(md5(cast({key} as string)), 1, 8), 16, 10)"
            " as bigint)"
        ).alias("h32")
    )
    return (
        h.select(
            F.expr("h32 div 16777216").alias("idx"),
            F.expr(
                "case when h32 % 16777216 = 0 then 25"
                " else 25 - length(bin(h32 % 16777216)) end"
            ).alias("rank"),
        )
        .groupBy("idx")
        .agg(F.max("rank").alias("mx"))
    )


def _hll_estimate(regs) -> int:
    rows = {r["idx"]: r["mx"] for r in regs.collect()}
    s = sum(1 << (25 - mx) for mx in rows.values()) + (256 - len(rows)) * (1 << 25)
    return SK._HLL_C // s


def test_hll_split_merge_equals_whole(spark):
    """max-merging the register tables of two disjoint halves must yield the
    whole input's registers exactly — HLL's partial-aggregation contract."""
    li = load(spark, SF, "lineitem").select("l_orderkey")
    a = li.filter("l_orderkey % 2 = 0")
    b = li.filter("l_orderkey % 2 = 1")
    whole = _hll_registers(spark, li, "l_orderkey")
    merged = (
        _hll_registers(spark, a, "l_orderkey")
        .unionByName(_hll_registers(spark, b, "l_orderkey"))
        .groupBy("idx")
        .agg(F.max("mx").alias("mx"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))
    assert _hll_estimate(whole) == _hll_estimate(merged)


def test_hll_estimate_within_expected_error(spark):
    """p=8 gives ~6.5% standard error; assert within 3 sigma of exact."""
    li = load(spark, SF, "lineitem").select("l_orderkey")
    exact = li.distinct().count()
    est = _hll_estimate(_hll_registers(spark, li, "l_orderkey"))
    assert abs(est - exact) / exact < 0.20


def test_cms_estimate_never_undercounts(spark):
    out = SK.q115_cms_heavy_hitters(spark, SF).collect()
    assert len(out) > 0
    for r in out:
        assert r["cms_est"] >= r["exact_cnt"], r
        assert r["overcount"] == r["cms_est"] - r["exact_cnt"]


def test_cms_split_merge_equals_whole(spark):
    """Summing the two halves' sketch counters must equal the whole sketch —
    CM's linearity, i.e. what lets partial sketches merge across tasks."""

    def sketch_of(df):
        four = F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("j")
        return (
            df.select("l_partkey", four)
            .select(
                "j",
                F.expr(
                    "cast(conv(substring(md5(concat(cast(j as string), ':',"
                    " cast(l_partkey as string))), 1, 8), 16, 10) as bigint)"
                    " % 1024"
                ).alias("bucket"),
            )
            .groupBy("j", "bucket")
            .agg(F.count("*").alias("cnt"))
        )

    li = load(spark, SF, "lineitem").select("l_partkey")
    whole = {(r["j"], r["bucket"]): r["cnt"] for r in sketch_of(li).collect()}
    merged: dict = {}
    for half in (li.filter("l_partkey % 2 = 0"), li.filter("l_partkey % 2 = 1")):
        for r in sketch_of(half).collect():
            k = (r["j"], r["bucket"])
            merged[k] = merged.get(k, 0) + r["cnt"]
    assert whole == merged
