"""Runtime-filter optimizer gates: Spark's runtime bloom filter prunes the
fact side of a shuffle join using a filter built from the selective side —
the mechanism that replaces hand-written semi-join pre-filters at 100 TB.
"""

from __future__ import annotations

from coldata_spark.tables import load
from tests.conftest import SF_DIR_ORACLE as SF

_CONFS = {
    # let the planner consider any scan size (fixtures are tiny)
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    # force a shuffle join: broadcast joins don't need a runtime filter
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _join(spark):
    li = load(spark, SF, "lineitem")
    orders = load(spark, SF, "orders").filter("o_orderpriority = '1-URGENT'")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .count()
    )


def test_runtime_bloom_filter_injected_and_result_unchanged(spark):
    baseline = {tuple(r) for r in _join(spark).collect()}
    saved = {k: spark.conf.get(k, None) for k in _CONFS}
    try:
        for k, v in _CONFS.items():
            spark.conf.set(k, v)
        df = _join(spark)
        plan = _formatted(df)
        # creation side: a bloom_filter_agg is built over the selective keys
        assert "bloom_filter_agg" in plan, plan[:2000]
        # application side: the fact scan is pre-filtered via might_contain
        assert "might_contain" in plan, plan[:2000]
        assert {tuple(r) for r in df.collect()} == baseline
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
