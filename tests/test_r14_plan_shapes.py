"""Plan-shape regression gates for the round-14 operator rewrites.

These pin the STRUCTURE each optimization bought (value parity is already
pinned by tests/test_oracle.py) so a later refactor can't silently
reintroduce the removed term:

- cms_build: the distinct-first engine is all-JVM — no Python-boundary
  node may reappear in its plan, and the digest expressions must sit
  ABOVE the per-key aggregate (hash distinct keys, not rows).
- q143: band keys derive map-side from the wide signature frame — the
  collect_list/array_sort re-aggregation must not return.
- minhash_neardup_pairs (q26 engine): the band self-join's two sides are
  one reused exchange, not two builds of the signature pipeline.
- q133: one fact scan feeds every profiled column's moments.
"""

from __future__ import annotations

PY_NODES = ("BatchEvalPython", "ArrowEvalPython", "MapInArrow", "MapInPandas")


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cms_build_has_no_python_boundary(spark, sf_dir):
    from coldata_spark.operators.sketches import cms_build
    from coldata_spark.tables import load

    li = load(spark, sf_dir, "lineitem")
    plan = _executed_plan(cms_build(li, "l_partkey"))
    for node in PY_NODES:
        assert node not in plan, f"{node} reappeared in cms_build's plan"
    # distinct-first: md5 runs above an aggregate, so the expression must
    # reference the aggregate's key alias (_k), not the raw fact column
    import re

    assert re.search(r"md5\(cast\(cast\(_k#\d+", plan), (
        "cms digest no longer computed over the distinct-key alias _k — "
        "the per-row hashing term is back"
    )
    assert "md5(cast(cast(l_partkey" not in plan.replace(" ", "")


def test_q143_bands_derive_map_side(spark, sf_dir):
    from coldata_spark.registry import specs

    df = specs()["q143_lsh_bucket_balance"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "collect_list" not in plan, (
        "q143's groupBy(doc_id, band) + collect_list re-aggregation is back"
    )


def test_minhash_pairs_reuse_one_signature_pipeline(spark, sf_dir):
    from coldata_spark.operators.dedup import minhash_neardup_pairs
    from coldata_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    # ReuseExchange is applied by the STATIC planner; with AQE on, the
    # initial plan prints duplicate subtrees that stage-level reuse dedupes
    # only at runtime (the gen_plans_r14.py rationale) — so gate with AQE
    # off, like the sub-2GiB bench tiers run anyway (tune_for_input).
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _executed_plan(minhash_neardup_pairs(docs, "text", "doc_id"))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert plan.count("shingle") > 0
    assert "ReusedExchange" in plan, (
        "the band self-join no longer shares one exchange — the signature "
        "pipeline is being built once per side again"
    )


def test_q133_profiles_all_columns_from_one_scan(spark, sf_dir):
    from coldata_spark.registry import specs

    df = specs()["q133_join_key_skew_profile"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    # one exploded scan: the lineitem parquet relation appears once
    assert plan.count("Scan parquet") == 1, (
        f"q133 re-grew a per-column scan: {plan.count('Scan parquet')} scans"
    )

