"""Plan-shape regression gates for the round-15 optimization rewrites.

Value parity stays pinned by tests/test_oracle.py; these pin the structure
each round-15 change bought so a later refactor can't silently reintroduce
the removed term:

- q141 bucket build: the <=64 doc-frequency cap must be decided by a
  WINDOW COUNT (disk-spillable per-key state) BEFORE any collect_list —
  round 14 collected every shingle's full doc list first, an unbounded
  in-memory aggregation buffer on a hot (boilerplate) shingle at scale.
"""

from __future__ import annotations

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
