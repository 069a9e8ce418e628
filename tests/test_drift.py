"""operators/drift.py — cross-snapshot PSI: the VersionedTable entry
point, zero-drift identity, shift detection, null exclusion, and the
generated-SQL twin staying in lockstep with the Spark plan (the value
check itself is q177's oracle row)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from coldata_spark.operators import drift as D
from coldata_spark.operators.table import VersionedTable


def _mk(spark, vals):
    return spark.createDataFrame([(i, float(v)) for i, v in enumerate(vals)],
                                 "id BIGINT, x DOUBLE")


def test_identical_snapshots_zero_psi(spark):
    a = _mk(spark, [1, 2, 3, 10, 20, 20, 30])
    rows = D.distribution_drift(a, a, "x", nbins=4).collect()
    assert rows, "bins with data must be emitted"
    assert all(r.psi_term_fp == 0 for r in rows)
    assert all(r.p_ppm == r.q_ppm for r in rows)
    total = D.psi_total(D.distribution_drift(a, a, "x", nbins=4)).collect()[0]
    assert total.psi_fp == 0


def test_shifted_distribution_positive_psi(spark):
    a = _mk(spark, [1] * 50 + [2] * 50)
    b = _mk(spark, [1] * 10 + [9] * 90)  # mass moved to the top bin
    out = {r.bin: r for r in D.distribution_drift(a, b, "x", nbins=4).collect()}
    total = D.psi_total(D.distribution_drift(a, b, "x", nbins=4)).collect()[0]
    assert total.psi_fp > 0
    # every term's sign matches the direction the mass moved: the bottom
    # bin lost mass in b (p > q -> positive term), the top bin gained
    # (p < q -> log-ratio negative -> still positive product)
    assert all(r.psi_term_fp >= 0 for r in out.values())


def test_nulls_excluded_and_nbins_validated(spark):
    a = spark.createDataFrame([(1, 1.0), (2, None)], "id BIGINT, x DOUBLE")
    rows = D.distribution_drift(a, a, "x", nbins=2).collect()
    # only the non-null value participates
    assert sum(r.n_a for r in rows) == 1
    with pytest.raises(ValueError, match="nbins"):
        D.distribution_drift(a, a, "x", nbins=1)


def test_snapshot_drift_over_versioned_table(spark, tmp_path):
    """The production path: two commits of a VersionedTable, drift read
    through time travel — equal to distribution_drift over the same
    frames, and the shifted commit registers positive PSI."""
    t = VersionedTable(str(tmp_path / "tbl"))
    base = _mk(spark, [1, 1, 2, 2, 3, 3, 8, 9])
    shifted = base.withColumn("x", F.col("x") + F.lit(6.0))
    v0 = t.commit(base)
    v1 = t.commit(shifted)
    via_table = D.snapshot_drift(spark, t, "id", "x", v0, v1).collect()
    direct = D.distribution_drift(base, shifted, "x").collect()
    assert sorted(map(tuple, via_table)) == sorted(map(tuple, direct))
    assert sum(r.psi_term_fp for r in via_table) > 0


def test_drift_sql_twin_matches_spark(spark):
    """drift_sql(dialect='duckdb') over the same data produces the same
    rows — the generated-twin contract q177 relies on, checked here on
    a frame small enough to eyeball."""
    import duckdb

    a = _mk(spark, [1, 2, 3, 4, 5, 6, 7, 8])
    b = _mk(spark, [5, 6, 7, 8, 9, 10, 11, 12])
    got = sorted(
        map(tuple, D.distribution_drift(a, b, "x", nbins=4).collect())
    )
    con = duckdb.connect()
    con.register("ta", a.toPandas())
    con.register("tb", b.toPandas())
    sql = D.drift_sql("SELECT x FROM ta", "SELECT x FROM tb", "x", nbins=4)
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want


def test_categorical_drift_identity_and_shift(spark):
    import duckdb

    a = spark.createDataFrame(
        [(i, v) for i, v in enumerate(["en"] * 6 + ["de"] * 3 + ["fr"])],
        "id BIGINT, x STRING",
    )
    same = D.categorical_drift(a, a, "x", top_k=2).collect()
    assert all(r.psi_term_fp == 0 for r in same)
    # top-2 + <other>: fr folds into the bucket
    assert {r.value for r in same} == {"en", "de", D.OTHER}
    b = spark.createDataFrame(
        [(i, v) for i, v in enumerate(["zz"] * 8 + ["en"] * 2)],
        "id BIGINT, x STRING",
    )
    shifted = D.categorical_drift(a, b, "x", top_k=2)
    assert sum(r.psi_term_fp for r in shifted.collect()) > 0
    with pytest.raises(ValueError, match="top_k"):
        D.categorical_drift(a, b, "x", top_k=0)
    # generated twin agrees
    con = duckdb.connect()
    con.register("ta", a.toPandas())
    con.register("tb", b.toPandas())
    sql = D.categorical_drift_sql(
        "SELECT x FROM ta", "SELECT x FROM tb", top_k=2
    )
    got = sorted(map(tuple, shifted.collect()))
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want


def test_sub_unit_range_still_bins(spark):
    """Round-11 review: the integer-domain '+1' span guard collapsed any
    sub-1 range into bin 0 — a [0,0.01] vs [0.04,0.05] shift (score/rate
    columns) must register, not hash to zero drift."""
    a = _mk(spark, [0.001 * i for i in range(1, 11)])      # [0.001, 0.01]
    b = _mk(spark, [0.04 + 0.001 * i for i in range(1, 11)])
    rows = D.distribution_drift(a, b, "x", nbins=4).collect()
    assert len({r.bin for r in rows}) > 1, rows
    total = D.psi_total(D.distribution_drift(a, b, "x", nbins=4)).collect()[0]
    assert total.psi_fp > 0
    # degenerate mx == mn still defines (single clamped bin, zero drift)
    c = _mk(spark, [0.5, 0.5, 0.5])
    same = D.distribution_drift(c, c, "x", nbins=4).collect()
    assert len(same) == 1 and same[0].psi_term_fp == 0


def test_psi_term_sign_is_exact(spark):
    """Round-11 review: the intlog2 surrogate's ~0.086 bit/call error can
    flip a near-zero true log-ratio's sign, and the naive signed product
    then CANCELS real drift out of psi_total.  The term is now
    |p_ppm - q_ppm| * |log_ratio| — non-negative by construction, like
    the true statistic — so every cell term is >= 0 even on the
    adversarial near-equal-ratio cell (p=3/4 vs q=16/22, where the raw
    surrogate reads the ratio NEGATIVE)."""
    import duckdb

    a = _mk(spark, [7, 8])
    b = _mk(spark, [1, 2, 3, 4, 4] + [6, 7, 8] * 5)
    rows = D.distribution_drift(a, b, "x", nbins=2).collect()
    assert all(r.psi_term_fp >= 0 for r in rows), rows
    hot = next(r for r in rows if r.n_a == 2 and r.n_b == 15)
    assert hot.psi_term_fp > 0  # sign-corrected, not zeroed
    con = duckdb.connect()
    con.register("ta", a.toPandas())
    con.register("tb", b.toPandas())
    sql = D.drift_sql("SELECT x FROM ta", "SELECT x FROM tb", "x", nbins=2)
    assert sorted(map(tuple, rows)) == sorted(
        map(tuple, con.execute(sql).fetchall())
    )


def test_drift_sql_threads_the_column(spark):
    """drift_sql must project the CALLER's column name, not assume the
    subquery pre-aliased it to x (round-11 review)."""
    import duckdb

    a = _mk(spark, [1, 2, 3, 4])
    con = duckdb.connect()
    con.register("ta", a.toPandas().rename(columns={"x": "score"}))
    sql = D.drift_sql(
        "SELECT score FROM ta", "SELECT score FROM ta", "score", nbins=2
    )
    rows = con.execute(sql).fetchall()
    assert rows and all(r[-1] == 0 for r in rows)


def test_drift_from_histograms_matches_raw_path(spark):
    """The zero-rescan path: drift over two persisted hist_build
    sketches has the same statistic SHAPE and invariants as the raw
    path — zero terms for identical sketches, positive total for a
    shift, non-negative everywhere, totals preserved through the
    full-outer join.  (Exact raw-path equality is NOT claimed: hist_build
    bins by the integer span hi-lo+1 while distribution_drift bins by
    mx-mn, so the binnings differ in general — round-11 review.)"""
    from coldata_spark.operators import sketches as SK

    a = _mk(spark, [1, 1, 2, 3, 5, 8, 9, 9])
    b = _mk(spark, [6, 7, 8, 9, 9, 9, 9, 2])
    ha = SK.hist_build(a, [], "cast(x as bigint)", 1, 9, n_bins=4)
    hb = SK.hist_build(b, [], "cast(x as bigint)", 1, 9, n_bins=4)
    via_hist = {r.bin: r for r in D.drift_from_histograms(ha, hb, 4).collect()}
    assert sum(r.psi_term_fp for r in via_hist.values()) > 0
    assert all(r.psi_term_fp >= 0 for r in via_hist.values())
    # identical sketches -> all-zero terms
    same = D.drift_from_histograms(ha, ha, 4).collect()
    assert all(r.psi_term_fp == 0 for r in same)
    # n_a/n_b totals preserved through the join
    assert sum(r.n_a for r in via_hist.values()) == 8
    assert sum(r.n_b for r in via_hist.values()) == 8


def _mk3(spark, rows):
    return spark.createDataFrame(
        [(i, float(p), float(c), float(s)) for i, (p, c, s) in enumerate(rows)],
        "id BIGINT, price DOUBLE, cust DOUBLE, prio DOUBLE",
    )


def test_drift_many_matches_single_column(spark):
    """Per-column drift_many rows are BIT-IDENTICAL to running
    distribution_drift per column — including a shifted column, an
    unshifted one, a constant one (mx == mn guard), and per-column null
    exclusion (a row null in one column still contributes the others)."""
    a = _mk3(spark, [(1, 10, 0), (2, 20, 0), (3, 30, 0), (8, 40, 0)])
    b = _mk3(spark, [(5, 10, 0), (6, 20, 0), (7, 30, 0), (8, 40, 0)])
    # inject a null into one column of one side
    a = a.withColumn(
        "cust", F.when(F.col("id") == 0, None).otherwise(F.col("cust"))
    )
    cols = ["price", "cust", "prio"]
    many = D.drift_many(a, b, cols, nbins=4).collect()
    for c in cols:
        got = sorted(
            (r.bin, r.n_a, r.n_b, r.p_ppm, r.q_ppm, r.psi_term_fp)
            for r in many
            if r.column == c
        )
        want = sorted(
            map(tuple, D.distribution_drift(a, b, c, nbins=4).collect())
        )
        assert got == want, c
    with pytest.raises(ValueError, match="duplicate"):
        D.drift_many(a, b, ["price", "price"])
    with pytest.raises(ValueError, match="at least one"):
        D.drift_many(a, b, [])
    with pytest.raises(ValueError, match="quote"):
        D.drift_many(a, b, ["pr'ice"])


def test_drift_many_sql_twin_matches_spark(spark):
    """drift_many_sql (the UNION ALL of per-column twins) reproduces
    drift_many's rows exactly — the q180 oracle contract."""
    import duckdb

    a = _mk3(spark, [(1, 10, 0), (2, 20, 0), (3, 30, 0), (8, 40, 0)])
    b = _mk3(spark, [(5, 15, 0), (6, 25, 0), (7, 35, 0), (8, 40, 0)])
    cols = ["price", "cust", "prio"]
    got = sorted(
        (r.column, r.bin, r.n_a, r.n_b, r.p_ppm, r.q_ppm, r.psi_term_fp)
        for r in D.drift_many(a, b, cols, nbins=4).collect()
    )
    con = duckdb.connect()
    con.register("ta", a.toPandas())
    con.register("tb", b.toPandas())
    sql = D.drift_many_sql(
        "SELECT price, cust, prio FROM ta",
        "SELECT price, cust, prio FROM tb",
        cols,
        nbins=4,
    )
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want


def test_drift_many_two_scans_total(spark, tmp_path):
    """The scale contract: 2 scans of each snapshot TOTAL, independent
    of how many columns are watched — the naive per-column loop would
    plan 2 scans PER column."""
    from tests.test_plans import plan_of as _formatted

    pa, pb = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    _mk3(spark, [(1, 10, 0), (2, 20, 0)]).write.parquet(pa)
    _mk3(spark, [(3, 30, 0), (4, 40, 0)]).write.parquet(pb)
    a, b = spark.read.parquet(pa), spark.read.parquet(pb)
    plan1 = _formatted(D.drift_many(a, b, ["price"], nbins=4))
    plan3 = _formatted(D.drift_many(a, b, ["price", "cust", "prio"], nbins=4))
    # count TREE nodes ("Scan parquet  (7)"), not the details section
    # which re-prints every node as "(7) Scan parquet"
    tree = lambda plan: len(re.findall(r"Scan parquet\s+\(\d+\)", plan))
    assert tree(plan1) == 4, plan1  # stats pass + binned pass, each reading a and b
    assert tree(plan3) == 4, plan3  # unchanged with 3x the columns
