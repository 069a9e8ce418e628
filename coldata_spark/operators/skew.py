"""Skew mitigation (SURVEY.md — 'skewed keys -> salting or AQE skew-join').

AQE's skew-join splitting (enabled in session.py) handles skewed JOINS at
runtime.  Skewed AGGREGATIONS — a handful of keys owning most rows, e.g.
one crawl source with 90% of documents — need salting: aggregate on
(key, salt) first so the hot key's rows spread over N reducers, then
re-aggregate on key.  Works for any algebraic aggregate (sum/count/min/max
and their compositions like avg = sum/count).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) -> groupBy(keys).

    ``aggs`` maps output column name -> (phase1 aggregate over input rows,
    phase2 aggregate over phase1 partials).  Example:

        salted_agg(df, ["source"], {
            "n":     (F.count("*"),        F.sum("n")),
            "total": (F.sum("value"),      F.sum("total")),
            "mx":    (F.max("value"),      F.max("mx")),
        })

    The salt is a deterministic spread (crc32 of the whole row's offset is
    unnecessary — a uniform random-ish hash of monotonically_increasing_id
    suffices and keeps the plan deterministic per execution).
    """
    salted = df.withColumn(
        "_salt", (F.crc32(F.monotonically_increasing_id().cast("string")) % n_salts)
    )
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[a1.alias(name) for name, (a1, _) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[a2.alias(name) for name, (_, a2) in aggs.items()]
    )
