"""Oracle parity for every registered query with SQL — mirrors the driver's
CORRECTNESS check (row count + schema + order-insensitive values)."""

from __future__ import annotations

import pytest

from coldata_spark import registry
from tests.oracle_utils import compare, duck_connection

ALL = registry.specs()
WITH_SQL = sorted(n for n, s in ALL.items() if s.sql is not None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_SQL)
def test_oracle_parity(spark, sf_dir, duck, name):
    spec = ALL[name]
    sdf = spec.fn(spark, sf_dir)
    oracle = duck.execute(spec.sql).df()
    problems = compare(sdf, oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_rows_only_queries_run(spark, sf_dir):
    for name, spec in ALL.items():
        if spec.sql is None:
            df = spec.fn(spark, sf_dir)
            assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"q_id", "parent_id", "best_score", "source", "snippet"}
