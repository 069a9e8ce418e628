"""Sketch-operator properties beyond oracle parity (tests/test_oracle.py):
mergeability — the algebraic property that makes both sketches valid
map-side partials and persistable per-slice artifacts — and the count-min
overcount guarantee.  Exercises the public operator API
(coldata_spark/operators/sketches.py) that q114/q115 are built on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from coldata_spark.operators import sketches as SK
from coldata_spark.queries import sketch_queries as SQ
from coldata_spark.tables import load

SF = "/root/testdata/sf0.001"


def _keys(spark):
    return (
        load(spark, SF, "lineitem")
        .select(F.lit("g").alias("g"), "l_orderkey")
    )


def _estimate(spark, df) -> int:
    row = SK.hll_estimate(SK.hll_registers(df, ["g"], "l_orderkey"), ["g"]).first()
    return row["hll_estimate"]


def test_hll_split_merge_equals_whole(spark):
    """hll_merge over two disjoint halves' registers must equal the whole
    input's registers exactly — HLL's partial-aggregation contract."""
    keys = _keys(spark)
    a = keys.filter("l_orderkey % 2 = 0")
    b = keys.filter("l_orderkey % 2 = 1")
    whole = SK.hll_registers(keys, ["g"], "l_orderkey")
    merged = SK.hll_merge(
        SK.hll_registers(a, ["g"], "l_orderkey").unionByName(
            SK.hll_registers(b, ["g"], "l_orderkey")
        ),
        ["g"],
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))
    est_whole = SK.hll_estimate(whole, ["g"]).first()["hll_estimate"]
    est_merged = SK.hll_estimate(merged, ["g"]).first()["hll_estimate"]
    assert est_whole == est_merged


def test_hll_estimate_within_expected_error(spark):
    """p=8 gives ~6.5% standard error; assert within 3 sigma of exact."""
    keys = _keys(spark)
    exact = keys.select("l_orderkey").distinct().count()
    est = _estimate(spark, keys)
    assert abs(est - exact) / exact < 0.20


def test_cms_estimate_never_undercounts(spark):
    out = SQ.q115_cms_heavy_hitters(spark, SF).collect()
    assert len(out) > 0
    for r in out:
        assert r["cms_est"] >= r["exact_cnt"], r
        assert r["overcount"] == r["cms_est"] - r["exact_cnt"]


def test_cms_split_merge_equals_whole(spark):
    """Summing the two halves' sketch counters must equal the whole sketch —
    CM's linearity, i.e. what lets partial sketches merge across tasks."""
    li = load(spark, SF, "lineitem").select("l_partkey")
    whole = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in SK.cms_build(li, "l_partkey").collect()
    }
    merged: dict = {}
    for half in (li.filter("l_partkey % 2 = 0"), li.filter("l_partkey % 2 = 1")):
        for r in SK.cms_build(half, "l_partkey").collect():
            k = (r["j"], r["bucket"])
            merged[k] = merged.get(k, 0) + r["cnt"]
    assert whole == merged


def test_cms_lookup_matches_exact_on_unique_buckets(spark):
    """cms_lookup over a tiny key set with no collisions returns exact
    counts (estimate == truth when no other keys share any bucket row)."""
    spark_df = spark.range(1, 6).select(F.col("id").alias("k"))
    # stream with known frequencies: key k appears k times
    stream = spark_df.select(
        F.explode(F.expr("sequence(1, k)")).alias("_i"), "k"
    ).select("k")
    sketch = SK.cms_build(stream, "k")
    got = {
        r["k"]: r["cms_est"] for r in SK.cms_lookup(sketch, spark_df, "k").collect()
    }
    assert got == {1: 1, 2: 2, 3: 3, 4: 4, 5: 5}


# -- property-based (hypothesis): the Spark operators vs an independent
# pure-Python reference on arbitrary key sets, not just the fixtures ------

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

key_lists = st.lists(
    st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=300
)


def _trunc_div(a: int, b: int) -> int:
    """Spark's bigint ``div``: truncation toward zero (Python // floors)."""
    q = abs(a) // b
    return q if a >= 0 else -q


def _ref_h32(k: int) -> int:
    """The operator's murmur3 finalizer over the folded key, in plain
    Python — mirrors _spark_fold64 + _mix32_steps bit for bit."""
    h = (k % (1 << 32)) ^ (_trunc_div(k, 1 << 32) % (1 << 32))
    h ^= h >> 16
    h = (h * SK._MIX_C1) % (1 << 32)
    h ^= h >> 13
    h = (h * SK._MIX_C2) % (1 << 32)
    h ^= h >> 16
    return h


def _ref_hll_registers(keys) -> dict[int, int]:
    regs: dict[int, int] = {}
    for k in set(keys):
        h32 = _ref_h32(k)
        idx, w24 = h32 // (1 << 24), h32 % (1 << 24)
        rank = 25 if w24 == 0 else 25 - w24.bit_length()
        regs[idx] = max(regs.get(idx, 0), rank)
    return regs


@settings(max_examples=5, deadline=None)
@given(key_lists)
def test_hll_registers_match_python_reference(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k LONG").select(
        F.lit("g").alias("g"), "k"
    )
    got = {
        r["idx"]: r["mx"]
        for r in SK.hll_registers(df, ["g"], "k").collect()
    }
    assert got == _ref_hll_registers(keys)


@settings(max_examples=5, deadline=None)
@given(key_lists)
def test_cms_overcount_holds_on_arbitrary_keys(spark, keys):
    from collections import Counter

    truth = Counter(keys)
    df = spark.createDataFrame([(k,) for k in keys], "k LONG")
    sketch = SK.cms_build(df, "k")
    probes = spark.createDataFrame([(k,) for k in set(keys)], "k LONG")
    est = {r["k"]: r["cms_est"] for r in SK.cms_lookup(sketch, probes, "k").collect()}
    for k, n in truth.items():
        assert est[k] >= n


def test_hist_split_merge_equals_whole(spark):
    """Histogram sketches are additive: per-slice builds merged by summing
    counts give exactly the whole-input sketch."""
    ev = load(spark, SF, "events")
    args = dict(value_expr="floor(value * 100)", lo=0, hi=51199, n_bins=256)
    whole = {
        (r["event_type"], r["bin"]): r["cnt"]
        for r in SK.hist_build(ev, ["event_type"], **args).collect()
    }
    a = SK.hist_build(
        ev.filter(F.col("user_id") % 2 == 0), ["event_type"], **args
    )
    b = SK.hist_build(
        ev.filter(F.col("user_id") % 2 == 1), ["event_type"], **args
    )
    merged = {
        (r["event_type"], r["bin"]): r["cnt"]
        for r in SK.hist_merge(a.unionByName(b), ["event_type"]).collect()
    }
    assert merged == whole


def test_hist_quantile_one_sided_within_bin_width(spark):
    """Each estimate is a bin lower bound at the ceil-rank: it can sit at
    most one bin width (200 centi-units) below the true quantile, never
    above it."""
    ev = load(spark, SF, "events")
    hist = SK.hist_build(
        ev, ["event_type"], "floor(value * 100)", lo=0, hi=51199, n_bins=256
    )
    est = {
        (r["event_type"], r["q_ppm"]): r["est"]
        for r in SK.hist_quantile(
            hist, ["event_type"], [500000, 990000], lo=0, hi=51199, n_bins=256
        ).collect()
    }
    vals = {}
    for r in ev.select("event_type", F.expr("CAST(floor(value*100) AS BIGINT)").alias("v")).collect():
        vals.setdefault(r["event_type"], []).append(r["v"])
    for (etype, q_ppm), e in est.items():
        xs = sorted(vals[etype])
        rank = -(-q_ppm * len(xs) // 1_000_000)  # ceil
        true_q = xs[rank - 1]
        assert e <= true_q, (etype, q_ppm, e, true_q)
        assert true_q - e < 200, (etype, q_ppm, e, true_q)


def test_hist_build_clamps_out_of_domain(spark):
    """Round-4 fix: values outside [lo, hi] clamp to the edge bins, so the
    sketch stays bounded at n_bins rows per group under dirty data and
    negative values cannot hit the Spark-div/DuckDB-floor divergence."""
    df = spark.createDataFrame(
        [("g", -500.0), ("g", -0.01), ("g", 0.0), ("g", 99.0),
         ("g", 100.0), ("g", 100000.0), ("g", None)],
        "grp string, v double",
    )
    rows = SK.hist_build(
        df, ["grp"], "floor(v)", lo=0, hi=99, n_bins=10
    ).collect()
    bins = {r["bin"]: r["cnt"] for r in rows}
    assert set(bins) <= set(range(10)) | {None}, bins  # bounded
    assert bins[0] == 3  # two negatives clamp down to bin 0, plus 0.0
    assert bins[9] == 3  # 99 in-domain, 100 and 100000 clamp up
    # NULL values stay in their own NULL-bin row (least/greatest skip
    # nulls, so without the CASE guard they'd land in the top bin)
    assert bins.get(None) == 1


def test_hist_quantile_excludes_null_bin(spark):
    """Round-4 review fix: NULL values (NULL-bin rows) must not count as
    below-lo mass in the quantile read-out."""
    rows = [("g", float(v)) for v in range(1, 101)] + [("g", None)] * 100
    df = spark.createDataFrame(rows, "grp string, v double")
    hist = SK.hist_build(df, ["grp"], "floor(v)", lo=1, hi=100, n_bins=100)
    est = {
        r["q_ppm"]: r["est"]
        for r in SK.hist_quantile(
            hist, ["grp"], [500000], lo=1, hi=100, n_bins=100
        ).collect()
    }
    # true non-null median ~50; with the 100 NULLs counted it was ~1
    assert 45 <= est[500000] <= 55, est
