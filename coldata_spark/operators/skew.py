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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Hot-key replication join: spread each skewed big-side key over
    ``n_salts`` reducers by salting the big side and exploding the small
    side once per salt, then join on (key, salt).

    When to reach for it: AQE's skew-join split (on in session.py) handles
    most cases at runtime, but it only splits the STREAM side of a sort-
    merge join after a shuffle materializes — it can't help when the
    downstream operator re-partitions on the same hot key again, or when
    stats mislead the planner.  This operator bakes the spread into the
    plan: the big side never has more than rows(key)/n_salts in one task.
    Cost: the small side is replicated n_salts x — use only when the small
    side is modest (but too big / unwanted to broadcast) and key skew is
    known, e.g. the crawl-source or language dimension joined to a
    power-law document table.

    The salt must depend only on the big row (here: a crc32 spread, as in
    salted_agg), never on the key alone — salting the key deterministically
    would re-create the same hot partition.

    Only inner/left/left_semi/left_anti are correct under replication: a
    right or full outer join would emit every unmatched small-side row
    once per salt (n_salts duplicates).  Swap the sides (the unmatched-
    preserved side must be the salted one) or dedup downstream instead.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join(how={how!r}): replication of the small side makes "
            "right/full outer joins emit unmatched small rows once per salt; "
            "use how in {inner, left, left_semi, left_anti}"
        )
    salted_big = big.withColumn(
        "_salt",
        (F.crc32(F.monotonically_increasing_id().cast("string")) % n_salts).cast(
            "int"
        ),
    )
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("_salt")
    replicated_small = small.select("*", salts)
    out = salted_big.join(replicated_small, [on, "_salt"], how)
    return out.drop("_salt")
