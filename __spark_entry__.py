"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship search pipeline (the reference's
vdb.py:88-122 semantics Spark-first) on sf0.001.  ``queries()`` /
``oracle_sql()`` expose every implemented SURVEY.md §2 operator from the
central registry (coldata_spark/registry.py); the driver compares each pair
against DuckDB at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from coldata_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact cosine k-NN search -> chunk->parent group-best ->
    join-back to documents (SURVEY §3.3's minimum end-to-end slice)."""
    from coldata_spark.queries.vector_queries import q31_search_group_best

    return q31_search_group_best(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
