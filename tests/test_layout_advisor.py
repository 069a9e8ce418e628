"""Layout advisor (round-6 verdict ask #6): the clustered tier's
hand-written bucket/sort spec must fall out of the engine itself.

advise_layout reads the optimized plans of a query set and emits the
bucket/sort prescription; these tests prove (1) the prescription for the
three layout-bound headline queries IS the clustered tier's _SPECS, and
(2) materializing the prescription with apply_layout reproduces the
clustered tier's zero-exchange / zero-sort physical plans."""

from __future__ import annotations

import os
import re

import pytest

from coldata_spark import registry
from coldata_spark.operators.layout import advise_layout, apply_layout
from coldata_spark.tables import load
from tools import clustered as CL

_QSET = (
    "q02_top_orders_by_revenue",
    "q116_time_weighted_avg",
    "q83_hypertable_rollup",
)


def _advice(spark, sf_dir, buckets=4, min_bytes=0):
    specs = registry.specs()
    qs = [specs[n].fn(spark, sf_dir) for n in _QSET]
    return advise_layout(spark, sf_dir, qs, buckets=buckets, min_bytes=min_bytes)


def test_advisor_reproduces_clustered_tier_spec(spark, sf_dir):
    """The advisor must derive tools/clustered.py _SPECS — bucket key AND
    within-bucket sort order — from the queries alone."""
    out = _advice(spark, sf_dir)
    for table, (key, sort_keys) in CL._SPECS.items():
        assert table in out, f"advisor missed {table}"
        assert out[table].bucket_col == key
        assert list(out[table].sort_cols) == sort_keys
    # computed keys (q83's hour buckets) attribute to no base table: the
    # advisor must not have invented a spec for a table q83 aggregates on
    assert set(out) <= set(CL._SPECS) | {"customer"}


def test_advisor_size_gate_drops_small_dims(spark, sf_dir):
    """Small dims broadcast — clustering them buys nothing, so a size
    floor must exclude them (the _FLAT_COPY judgment, mechanized)."""
    assert _advice(spark, sf_dir, min_bytes=10**15) == {}
    out = _advice(spark, sf_dir, min_bytes=0)
    assert "customer" in out  # advised when the floor allows it
    assert out["customer"].bucket_col == "c_custkey"


def test_advisor_weights_resolve_conflicting_workloads(spark, sf_dir):
    """orders is joined on o_orderkey by q02 but on o_custkey by q04/q05
    (anti/semi joins from customer).  The advice must track the WORKLOAD
    mix, not a fixed prior: weighting the orderkey query up wins orderkey,
    weighting the custkey queries up wins custkey."""
    specs = registry.specs()
    q02 = specs["q02_top_orders_by_revenue"].fn(spark, sf_dir)
    q04 = specs["q04_customers_without_orders"].fn(spark, sf_dir)
    q05 = specs["q05_customers_with_urgent_orders"].fn(spark, sf_dir)

    orderkey_heavy = advise_layout(
        spark, sf_dir, [(q02, 10.0), (q04, 1.0), (q05, 1.0)], min_bytes=0
    )
    assert orderkey_heavy["orders"].bucket_col == "o_orderkey"

    custkey_heavy = advise_layout(
        spark, sf_dir, [(q02, 1.0), (q04, 10.0), (q05, 10.0)], min_bytes=0
    )
    assert custkey_heavy["orders"].bucket_col == "o_custkey"


def test_advisor_broad_workload_stays_sane(spark, sf_dir):
    """Over a diverse slice of the registry the advice must stay
    well-formed: every advised bucket column belongs to its table, and
    the events hypertable spec is stable (nothing competes with user_id)."""
    specs = registry.specs()
    names = (
        "q01_pricing_summary",
        "q02_top_orders_by_revenue",
        "q04_customers_without_orders",
        "q06_kaggle_style_left_joins",
        "q42_events_sessionize",
        "q80_events_range_join",
        "q112_gapfill_locf",
        "q116_time_weighted_avg",
    )
    out = advise_layout(
        spark, sf_dir, [specs[n].fn(spark, sf_dir) for n in names], min_bytes=0
    )
    for t, ls in out.items():
        cols = {f.name for f in load(spark, sf_dir, t).schema.fields}
        assert ls.bucket_col in cols, f"{t}: {ls.bucket_col} not a column"
        assert set(ls.sort_cols) <= cols
        assert ls.sort_cols[0] == ls.bucket_col
    assert out["events"].bucket_col == "user_id"


def test_advise_zorder_from_range_predicates(spark, sf_dir, tmp_path):
    """The advisor's scan-pruning half: range predicates on two lineitem
    columns must yield a Z-order recommendation for exactly those columns
    (weighted order), and materializing it must actually skip files in
    BOTH dimensions (footer min/max stats — the same gate the hand-picked
    zorder test uses)."""
    from pyspark.sql import functions as F

    from coldata_spark.operators.layout import (
        advise_zorder,
        files_overlapping,
        write_zordered,
    )

    li = load(spark, sf_dir, "lineitem")
    qs = [
        li.filter(
            (F.col("l_partkey") > 10) & (F.col("l_partkey") < 100)
        ).select("l_orderkey"),
        (li.filter(F.col("l_suppkey") >= 3).select("l_orderkey"), 2.0),
        li.filter(
            (F.col("l_partkey") > 5) & (F.col("l_suppkey") <= 7)
        ).select("l_orderkey"),
    ]
    advice = advise_zorder(spark, sf_dir, qs)
    # l_suppkey outweighs l_partkey 3.0 (2.0 + 1.0) vs 2.0
    assert advice == {"lineitem": ("l_suppkey", "l_partkey")}

    # equality-only predicates advise nothing (hash bucketing serves them)
    assert (
        advise_zorder(
            spark, sf_dir, [li.filter(F.col("l_partkey") == 7).select("l_orderkey")]
        )
        == {}
    )

    stats = li.selectExpr(
        "min(l_partkey)", "max(l_partkey)", "min(l_suppkey)", "max(l_suppkey)"
    ).first()
    zpath = str(tmp_path / "advised_z")
    write_zordered(
        li.select("l_orderkey", "l_partkey", "l_suppkey"),
        zpath,
        list(advice["lineitem"]),
        n_files=8,
    )
    pk = (stats[0], stats[0] + (stats[1] - stats[0]) // 8)
    sk = (stats[2], stats[2] + (stats[3] - stats[2]) // 8)
    pk_hit, total = files_overlapping(zpath, "l_partkey", *pk)
    sk_hit, _ = files_overlapping(zpath, "l_suppkey", *sk)
    assert pk_hit < total and sk_hit < total, "advised z-order must prune both dims"


@pytest.fixture(scope="module")
def advised_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("advised"))
    specs = registry.specs()
    qs = [specs[n].fn(spark, sf_dir) for n in _QSET]
    spec = advise_layout(spark, sf_dir, qs, buckets=4, min_bytes=0)
    # production stance: big facts clustered, small dims flat (broadcast)
    spec.pop("customer", None)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    apply_layout(spark, sf_dir, out, spec, table_suffix="_c", register=True)
    load(spark, sf_dir, "customer").write.mode("overwrite").parquet(
        os.path.join(out, "customer")
    )
    yield out
    for name in spec:
        spark.sql(f"DROP TABLE IF EXISTS {name}_c")
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
    )


def test_advised_layout_reproduces_zero_exchange_plans(spark, advised_dir):
    """The advised layout must yield the clustered tier's plans: q02 with
    zero shuffle exchanges and zero sorts (bucket sort feeds the SMJ),
    q116 with zero exchanges entirely — same gates as test_clustered."""
    q02 = CL.q02_clustered(spark, advised_dir)
    plan = q02._jdf.queryExecution().executedPlan().toString()
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
    assert not re.search(r"\+- Sort ", plan), "bucket sort must be reused"

    q116 = CL.q116_clustered(spark, advised_dir)
    plan = q116._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert not re.search(r"\+- Sort ", plan)


def test_maintain_layout_rewrites_only_on_drift(spark, sf_dir, tmp_path):
    """The maintenance form: first pass materializes everything, a stable
    workload costs zero rewrites (sidecar compare), and a workload drift
    re-buckets exactly the table whose prescription changed."""
    from coldata_spark.operators.layout import maintain_layout

    specs = registry.specs()
    q02 = lambda: specs["q02_top_orders_by_revenue"].fn(spark, sf_dir)  # noqa: E731
    q04 = lambda: specs["q04_customers_without_orders"].fn(spark, sf_dir)  # noqa: E731
    out = str(tmp_path / "maint")
    try:
        r1 = maintain_layout(
            spark, sf_dir, out, [(q02(), 10.0), (q04(), 1.0)],
            buckets=4, min_bytes=0, table_suffix="_m",
        )
        assert "orders" in r1["rewritten"] and not r1["reused"]
        assert r1["advised"]["orders"]["bucket_col"] == "o_orderkey"
        stamp = os.path.getmtime(os.path.join(out, "orders"))

        r2 = maintain_layout(
            spark, sf_dir, out, [(q02(), 10.0), (q04(), 1.0)],
            buckets=4, min_bytes=0, table_suffix="_m",
        )
        assert not r2["rewritten"] and set(r2["reused"]) == set(r1["rewritten"])
        assert os.path.getmtime(os.path.join(out, "orders")) == stamp
        assert spark.table("orders_m").count() > 0  # re-registered, readable

        r3 = maintain_layout(
            spark, sf_dir, out, [(q02(), 1.0), (q04(), 10.0)],
            buckets=4, min_bytes=0, table_suffix="_m",
        )
        assert "orders" in r3["rewritten"], "drifted key must re-bucket"
        assert r3["advised"]["orders"]["bucket_col"] == "o_custkey"
        assert "lineitem" in r3["reused"], "stable table must not rewrite"
    finally:
        for t in ("orders", "lineitem", "customer", "events"):
            spark.sql(f"DROP TABLE IF EXISTS {t}_m")


def test_maintain_layout_self_heals_missing_dir(spark, sf_dir, tmp_path):
    """The filesystem is the truth, the sidecar a cache: a bucket dir
    deleted out from under an unchanged spec must re-materialize, not be
    reported 'reused' while registration fails forever."""
    import shutil

    from coldata_spark.operators.layout import maintain_layout

    specs = registry.specs()
    q02 = lambda: specs["q02_top_orders_by_revenue"].fn(spark, sf_dir)  # noqa: E731
    out = str(tmp_path / "heal")
    try:
        r1 = maintain_layout(
            spark, sf_dir, out, [q02()], buckets=4, min_bytes=0, table_suffix="_h"
        )
        assert "orders" in r1["rewritten"]
        shutil.rmtree(os.path.join(out, "orders"))
        r2 = maintain_layout(
            spark, sf_dir, out, [q02()], buckets=4, min_bytes=0, table_suffix="_h"
        )
        assert "orders" in r2["rewritten"], "missing dir must count as drift"
        assert "lineitem" in r2["reused"]
        assert spark.table("orders_h").count() > 0
    finally:
        for t in ("orders", "lineitem", "customer"):
            spark.sql(f"DROP TABLE IF EXISTS {t}_h")


def test_maintain_layout_sidecar_survives_workload_gaps(spark, sf_dir, tmp_path):
    """A table temporarily absent from the query log keeps its sidecar
    entry while its dir exists, so returning with an unchanged spec costs
    zero rewrites instead of a needless full re-bucketing."""
    from coldata_spark.operators.layout import maintain_layout

    specs = registry.specs()
    q02 = lambda: specs["q02_top_orders_by_revenue"].fn(spark, sf_dir)  # noqa: E731
    q116 = lambda: specs["q116_time_weighted_avg"].fn(spark, sf_dir)  # noqa: E731
    out = str(tmp_path / "gap")
    try:
        r1 = maintain_layout(
            spark, sf_dir, out, [q02(), q116()], buckets=4, min_bytes=0,
            table_suffix="_g",
        )
        assert {"orders", "events"} <= set(r1["rewritten"])
        # day 2: the log happens to contain no events queries — and a
        # FRESH session (catalog entry gone) runs maintenance mid-gap; the
        # sidecar-retained table must be re-registered, not left without
        # its catalog entry until the workload returns (round-7 ADVICE)
        spark.sql("DROP TABLE IF EXISTS events_g")
        r2 = maintain_layout(
            spark, sf_dir, out, [q02()], buckets=4, min_bytes=0, table_suffix="_g"
        )
        assert "events" not in r2["advised"]
        assert spark.table("events_g").count() > 0, (
            "gap table must be registered from the sidecar"
        )
        stamp = os.path.getmtime(os.path.join(out, "events"))
        # day 3: events queries return with the identical spec
        r3 = maintain_layout(
            spark, sf_dir, out, [q02(), q116()], buckets=4, min_bytes=0,
            table_suffix="_g",
        )
        assert "events" in r3["reused"], "unchanged returning spec must reuse"
        assert os.path.getmtime(os.path.join(out, "events")) == stamp
    finally:
        for t in ("orders", "lineitem", "customer", "events"):
            spark.sql(f"DROP TABLE IF EXISTS {t}_g")


def test_maintain_layout_owns_both_advisor_halves(spark, sf_dir, tmp_path):
    """zorder=True makes the maintenance job own scan pruning too: a
    range-scanned table the bucket advisor leaves flat is z-ordered
    (files prune in both advised dimensions), registered as a session
    view under the same naming, reused while the advice is stable, and
    rewritten when the workload's range columns drift — while a
    bucket-advised table in the same workload stays on the bucket path."""
    from pyspark.sql import functions as F

    from coldata_spark.operators.layout import files_overlapping, maintain_layout

    specs = registry.specs()
    q116 = lambda: specs["q116_time_weighted_avg"].fn(spark, sf_dir)  # noqa: E731
    li = lambda: load(spark, sf_dir, "lineitem")  # noqa: E731
    scan_pk_sk = lambda: li().filter(  # noqa: E731
        (F.col("l_partkey") > 10) & (F.col("l_suppkey") < 90)
    ).select("l_orderkey")
    scan_pk_ln = lambda: li().filter(  # noqa: E731
        (F.col("l_partkey") > 10) & (F.col("l_linenumber") < 3)
    ).select("l_orderkey")
    out = str(tmp_path / "zmaint")
    try:
        r1 = maintain_layout(
            spark, sf_dir, out, [q116(), scan_pk_sk()],
            buckets=4, min_bytes=0, table_suffix="_zm", zorder=True,
        )
        assert r1["advised"]["events"]["bucket_col"] == "user_id"
        assert r1["advised"]["lineitem"] == {
            "zorder": ["l_partkey", "l_suppkey"], "files": 8,
        }
        assert {"events", "lineitem"} <= set(r1["rewritten"])
        # the materialized layout must actually skip files in BOTH dims
        stats = li().selectExpr(
            "min(l_partkey)", "max(l_partkey)", "min(l_suppkey)", "max(l_suppkey)"
        ).first()
        pk_hit, total = files_overlapping(
            os.path.join(out, "lineitem"), "l_partkey",
            stats[0], stats[0] + (stats[1] - stats[0]) // 8,
        )
        sk_hit, _ = files_overlapping(
            os.path.join(out, "lineitem"), "l_suppkey",
            stats[2], stats[2] + (stats[3] - stats[2]) // 8,
        )
        assert pk_hit < total and sk_hit < total
        assert spark.table("lineitem_zm").count() == li().count()
        # stable advice: second pass reuses both halves, no rewrite
        stamp = os.path.getmtime(os.path.join(out, "lineitem"))
        r2 = maintain_layout(
            spark, sf_dir, out, [q116(), scan_pk_sk()],
            buckets=4, min_bytes=0, table_suffix="_zm", zorder=True,
        )
        assert not r2["rewritten"]
        assert {"events", "lineitem"} <= set(r2["reused"])
        assert os.path.getmtime(os.path.join(out, "lineitem")) == stamp
        # drifted range columns: exactly the z-ordered table rewrites
        r3 = maintain_layout(
            spark, sf_dir, out, [q116(), scan_pk_ln()],
            buckets=4, min_bytes=0, table_suffix="_zm", zorder=True,
        )
        assert r3["rewritten"] == ["lineitem"]
        assert r3["advised"]["lineitem"]["zorder"] == ["l_linenumber", "l_partkey"]
        assert "events" in r3["reused"]
    finally:
        for t in ("events", "lineitem", "orders", "customer"):
            spark.sql(f"DROP TABLE IF EXISTS {t}_zm")
            try:
                spark.catalog.dropTempView(f"{t}_zm")
            except Exception:
                pass


def test_maintain_layout_skips_non_numeric_zorder_advice(spark, sf_dir, tmp_path):
    """String range predicates get advisor votes, but strings can't ride
    the Morton curve (zorder_key's cast('long') nulls out) — the
    maintenance job must filter advised columns by type and skip a table
    left with <2 usable dimensions, not crash the scheduled run."""
    from pyspark.sql import functions as F

    from coldata_spark.operators.layout import maintain_layout

    orders = load(spark, sf_dir, "orders")
    q = orders.filter(
        (F.col("o_totalprice") > 100.5) & (F.col("o_orderpriority") > "1")
    ).select("o_orderkey")
    out = str(tmp_path / "zskip")
    r = maintain_layout(
        spark, sf_dir, out, [q], min_bytes=0, zorder=True,
        table_suffix="_zs", register=False,
    )
    # one numeric survivor (o_totalprice) is a plain sort, not a z-order
    assert "orders" not in r["advised"]
    assert r["rewritten"] == []


def test_advise_zorder_attributes_cast_wrapped_columns(spark, sf_dir):
    """Type-promoted comparisons print as cast(col#id as ...) > lit in
    the optimized plan; the attribution must still land the vote."""
    from pyspark.sql import functions as F

    from coldata_spark.operators.layout import advise_zorder

    li = load(spark, sf_dir, "lineitem")
    # integer column vs fractional literal forces a cast around the attr
    qs = [
        li.filter(
            (F.col("l_partkey") > 10.5) & (F.col("l_suppkey") < 99.5)
        ).select("l_orderkey")
    ]
    advice = advise_zorder(spark, sf_dir, qs)
    assert advice.get("lineitem") == ("l_partkey", "l_suppkey")


def test_advise_zorder_handles_paren_typed_casts(spark, sf_dir):
    """A decimal-typed cast prints NESTED parens — `cast(col#5 as
    decimal(12,4)) > 24.5000` — which a `[^)]*` type pattern cuts short
    at the inner ')', silently dropping the vote (round-7 ADVICE).
    double→decimal casts survive UnwrapCastInBinaryComparison, so this is
    a real plan shape, not a contrived one."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from coldata_spark.operators.layout import advise_zorder

    li = load(spark, sf_dir, "lineitem")
    qs = [
        li.filter(
            (F.col("l_extendedprice").cast("decimal(12,4)") > F.lit(Decimal("24.5")))
            & (F.col("l_discount").cast("decimal(12,4)") < F.lit(Decimal("0.05")))
        ).select("l_orderkey")
    ]
    advice = advise_zorder(spark, sf_dir, qs)
    assert advice.get("lineitem") == ("l_discount", "l_extendedprice")


def test_advise_layout_attributes_cast_wrapped_join_keys(spark, sf_dir):
    """Type-promoted equi-joins print cast-wrapped keys — `Join Inner,
    (cast(l_partkey#1L as decimal(20,0)) = cast(p_partkey#11L as
    decimal(20,0)))` — whose weight-3 votes a bare-attr pattern silently
    dropped (round-7 ADVICE)."""
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part")
    q = li.join(
        pt,
        li.l_partkey.cast("decimal(20,0)") == pt.p_partkey.cast("decimal(20,0)"),
    ).select("l_orderkey", "p_name")
    out = advise_layout(spark, sf_dir, [q], min_bytes=0)
    assert "lineitem" in out and out["lineitem"].bucket_col == "l_partkey"
    assert "part" in out and out["part"].bucket_col == "p_partkey"


def test_advised_layout_results_match_flat(spark, sf_dir, advised_dir):
    """Layout changes plans, never answers."""
    specs = registry.specs()
    for name in ("q02_top_orders_by_revenue", "q116_time_weighted_avg"):
        got = sorted(map(tuple, CL.CLUSTERED_QUERIES[name](spark, advised_dir).collect()))
        want = sorted(map(tuple, specs[name].fn(spark, sf_dir).collect()))
        assert got == want, f"{name} diverges under the advised layout"


def test_zorder_type_ok_exact_names_not_prefixes():
    """Round-8 ADVICE: prefix matching let 'interval day to second'
    through the gate (startswith('int')); cast('long') on an interval
    yields null and zorder_key raises after the bucket half already
    rewrote tables.  The gate must match exact type names, with
    decimal's '(p,s)' suffix handled."""
    from coldata_spark.operators.layout import zorder_type_ok

    assert zorder_type_ok("int")
    assert zorder_type_ok("bigint")
    assert zorder_type_ok("decimal(12,4)")
    assert zorder_type_ok("timestamp")
    assert zorder_type_ok("timestamp_ntz")  # long-castable like ltz
    assert not zorder_type_ok("interval day to second")
    assert not zorder_type_ok("interval")
    assert not zorder_type_ok("string")
    assert not zorder_type_ok("date")
    assert not zorder_type_ok("")


def test_advised_vector_spec_verdict(spark, sf_dir):
    """Round-8 verdict #1: the vector workload's advised layout.  The
    join-backs (hits->embeddings on vec_id, parents->documents on doc_id)
    are the only layout-addressable operations; q30's top-k partitions on
    the computed q_id and must advise nothing for it."""
    spec = CL.advised_vector_spec(spark, sf_dir, buckets=4)
    assert spec["embeddings"].bucket_col == "vec_id"
    assert spec["documents"].bucket_col == "doc_id"


def test_vector_fixture_layout_only_same_answers(spark, sf_dir, tmp_path):
    """build_vector_fixture rewrites files, never semantics: the
    registered flat q30/q31 read the advised dirs unchanged and must
    return identical rows."""
    out = str(tmp_path / "vec_advised")
    CL.build_vector_fixture(spark, sf_dir, sf_dir, out, buckets=4)
    specs = registry.specs()
    for name in ("q30_knn_cosine_topk", "q31_search_group_best"):
        got = sorted(map(tuple, specs[name].fn(spark, out).collect()))
        want = sorted(map(tuple, specs[name].fn(spark, sf_dir).collect()))
        assert got == want, f"{name} diverges on the advised vector layout"


def test_advised_vector_layout_join_back_no_exchange_on_bucketed_side(
    spark, sf_dir, tmp_path
):
    """The vector advisor's verdict (embeddings bucketed by vec_id) exists
    for the hits->vectors join-back at scale: registered as a bucketed
    catalog table, the EMBEDDINGS side of that join must read in place —
    no Exchange above its scan (the probe side still shuffles to match
    buckets; at 100 TB that is the difference between shuffling the
    corpus per search batch and never shuffling it).  q30 itself gets no
    such win (computed q_id) — measured and published in SCALE.md; this
    gate proves the advice pays where it was derived."""
    import re

    from pyspark.sql import functions as F

    from coldata_spark.operators.layout import apply_layout

    spec = CL.advised_vector_spec(spark, sf_dir, buckets=4)
    out = str(tmp_path / "vec_bucketed")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        apply_layout(
            spark,
            sf_dir,
            out,
            {"embeddings": spec["embeddings"]},
            table_suffix="_vb",
            register=True,
        )
        hits = (
            load(spark, sf_dir, "embeddings")
            .select(F.col("vec_id"), F.lit(0.5).alias("score"))
        )
        emb = spark.table("embeddings_vb")
        joined = emb.join(hits.hint("merge"), "vec_id").select(
            "vec_id", "score", "embedding"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # exactly ONE exchange (the probe side); the bucketed corpus scan
        # feeds the SMJ directly
        n_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
        assert n_exchanges == 1, f"expected 1 exchange (probe side):\n{plan}"
        assert "SortMergeJoin" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS embeddings_vb")
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
        )
