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


def test_advised_layout_results_match_flat(spark, sf_dir, advised_dir):
    """Layout changes plans, never answers."""
    specs = registry.specs()
    for name in ("q02_top_orders_by_revenue", "q116_time_weighted_avg"):
        got = sorted(map(tuple, CL.CLUSTERED_QUERIES[name](spark, advised_dir).collect()))
        want = sorted(map(tuple, specs[name].fn(spark, sf_dir).collect()))
        assert got == want, f"{name} diverges under the advised layout"
