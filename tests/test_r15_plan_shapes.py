"""Plan-shape regression gates for the round-15 optimization rewrites.

Value parity stays pinned by tests/test_oracle.py; these pin the structure
each round-15 change bought so a later refactor can't silently reintroduce
the removed term:

- q141 bucket build: the <=64 doc-frequency cap must be decided by a
  WINDOW COUNT (disk-spillable per-key state) BEFORE any collect_list —
  round 14 collected every shingle's full doc list first, an unbounded
  in-memory aggregation buffer on a hot (boilerplate) shingle at scale.
- q02 past the broadcast gate: the orders side must hash-build
  (ShuffledHashJoin), not sort the 5x-larger lineitem stream
  (SortMergeJoin) — measured 7.6-7.9 s vs 5.0-6.1 s at the 256x tier.
  Gated on the bench's materialized 256x fixture being present.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _sh0(spark, sf_dir):
    from coldata_spark.tables import fan_out, load

    docs = load(spark, sf_dir, "documents")
    return fan_out(docs).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, greatest(1, length(text) - 4)),"
                    " i -> substring(text, i, 5))"
                )
            )
        ).alias("shingle"),
    )


def test_q141_count_prefilter_feeds_collect(spark, sf_dir):
    from coldata_spark.queries.text_queries import _q141_capped_buckets

    plan = _executed_plan(_q141_capped_buckets(_sh0(spark, sf_dir)))
    # the Window count must appear BELOW the collect_list aggregate: the
    # plan string prints top-down, so the aggregate's collect_list must
    # come before (above) the Window node
    i_collect = plan.find("collect_list")
    i_window = plan.find("Window")
    assert i_collect != -1, "bucket build lost its collect_list aggregate"
    assert i_window != -1, (
        "the window count prefilter is gone — collect_list is buffering "
        "uncapped doc lists again (r14 OOM-risk shape)"
    )
    assert i_collect < i_window, (
        "collect_list no longer sits above the window count prefilter"
    )
    # exactly one row exchange between the explode and the collect: the
    # collect aggregation must REUSE the window's shingle partitioning
    gen = plan.find("Generate explode")
    assert gen != -1
    assert plan[:gen].count("Exchange") <= 1, (
        "the collect aggregation stopped reusing the window's exchange"
    )


def test_q141_capped_buckets_value_identity(spark, sf_dir):
    """The prefilter must compute exactly the r14 collect-then-filter
    buckets (order-insensitively within each doc list)."""
    from coldata_spark.queries.text_queries import _q141_capped_buckets

    sh0 = _sh0(spark, sf_dir)
    new = {
        r["shingle"]: sorted(r["ds"])
        for r in _q141_capped_buckets(sh0).collect()
    }
    old = {
        r["shingle"]: sorted(r["ds"])
        for r in (
            sh0.groupBy("shingle")
            .agg(F.collect_list("doc_id").alias("ds"))
            .filter(F.size("ds") <= 64)
        ).collect()
    }
    assert new == old


_TIER256 = "/root/repo/.bench_cache/256x"


@pytest.mark.skipif(
    not os.path.exists(os.path.join(_TIER256, "_REPLICATED_OK")),
    reason="256x tier fixture not materialized (run bench.py once)",
)
def test_q02_hash_builds_past_broadcast_gate(spark):
    """Past the 256 MiB broadcast gate q02 must hash-build the pruned
    orders side (ShuffledHashJoin) when the per-partition build fits
    execution memory — NOT sort the 5x-larger lineitem stream."""
    from coldata_spark.queries.relational import q02_top_orders_by_revenue

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        plan = _executed_plan(q02_top_orders_by_revenue(spark, _TIER256))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    assert "ShuffledHashJoin" in plan, (
        "q02 lost the shuffled-hash fact join at the 256x tier "
        "(sort-merge sorts the larger streamed lineitem side — "
        "measured 1.3-1.5x slower)"
    )
    assert "SortMergeJoin" not in plan


def test_q02_hint_drops_out_when_build_exceeds_partition_budget(spark):
    """At a scale where est // partitions > 64 MiB the hint must NOT
    fire: the spill-safe sort-merge is the right default there.  Proxied
    by shrinking the partition count to 1 against the 256x tier."""
    if not os.path.exists(os.path.join(_TIER256, "_REPLICATED_OK")):
        pytest.skip("256x tier fixture not materialized")
    from coldata_spark.queries.relational import q02_top_orders_by_revenue

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        plan = _executed_plan(q02_top_orders_by_revenue(spark, _TIER256))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    assert "ShuffledHashJoin" not in plan, (
        "the shuffle_hash hint must drop out when the estimated "
        "per-partition build no longer fits execution memory"
    )


_TIER64 = "/root/repo/.bench_cache/64x"


@pytest.mark.skipif(
    not os.path.exists(os.path.join(_TIER64, "_REPLICATED_OK")),
    reason="64x tier fixture not materialized (run bench.py once)",
)
def test_q77_q68_fact_join_broadcasts_pruned_orders(spark):
    """The flat q77/q68 fact-fact orderkey join must broadcast the pruned
    orders side while the raw orders estimate fits the 256 MiB gate — the
    planner cannot see the region/date selectivity through the scan
    estimate and sort-merges otherwise (64x: q77 3.78->1.69 s,
    q68 4.17->2.08 s)."""
    from coldata_spark.queries.tpch_extra import (
        q68_market_share,
        q77_local_supplier_volume,
    )

    p77 = _executed_plan(q77_local_supplier_volume(spark, _TIER64))
    # the one allowed SMJ is orders x customers INSIDE the broadcast build
    assert p77.count("SortMergeJoin") <= 1 and "BroadcastHashJoin" in p77, (
        "q77's lineitem join stopped broadcasting the pruned ord_eu side"
    )
    p68 = _executed_plan(q68_market_share(spark, _TIER64))
    assert "SortMergeJoin" not in p68 and "BroadcastHashJoin" in p68, (
        "q68's lineitem join stopped broadcasting the pruned orders side"
    )
