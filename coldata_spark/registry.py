"""Query registry — the single source of truth behind __spark_entry__.

Every implemented operator from SURVEY.md §2 registers here with
  * a Spark plan: ``fn(spark, sf_dir) -> DataFrame``
  * (when SQL-expressible) the equivalent DuckDB SQL oracle string.

The driver runs both sides at sf0.01 and compares row-count + schema +
order-insensitive value hash, so:
  * every computed column is aliased identically on both sides,
  * floating-point aggregates are rounded identically on both sides,
  * top-k / limit queries use fully deterministic tie-broken orderings.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle; None => rows-only check
    survey_ids: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None = None, survey: str = ""):
    """Decorator: register a query plan under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        ids = tuple(s.strip() for s in survey.split(",") if s.strip())
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, sql=sql, survey_ids=ids)
        return fn

    return deco


def specs() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in specs().items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.sql for n, s in specs().items() if s.sql is not None}


_loaded = False


def _ensure_loaded() -> None:
    """Import all query modules so their @register decorators run."""
    global _loaded
    if _loaded:
        return
    from coldata_spark.queries import events_queries  # noqa: F401
    from coldata_spark.queries import multimodal_queries  # noqa: F401
    from coldata_spark.queries import relational  # noqa: F401
    from coldata_spark.queries import text_queries  # noqa: F401
    from coldata_spark.queries import tpch_extra  # noqa: F401
    from coldata_spark.queries import vector_queries  # noqa: F401

    _loaded = True
