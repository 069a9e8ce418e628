"""Generic as-of join — the time-series primitive (pandas merge_asof /
kdb aj / QuestDB ASOF JOIN) Spark lacks natively.

Semantics: for every left row, attach the single right row with the
largest ``on`` not exceeding (``strict``: strictly below) the left row's
``on``, within the same ``by`` group, optionally within ``tolerance``.

Implementation is the union-stream trick, NOT a range join: tag both
inputs, union them, and carry the latest right payload forward with one
partition-local window.  Cost = one shuffle on ``by`` + one sort — at
100 TB this is the only shape that survives: an interval/range join
explodes candidate pairs quadratically inside hot groups, while this
plan's state is exactly one payload struct per stream position.
(q44_asof_last_click_before_purchase is this operator specialized to a
single self-joined table; reference has no counterpart — its store is a
document DB with no temporal join at all.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
    strict: bool = False,
    suffix: str = "_right",
) -> DataFrame:
    """As-of join ``left`` to ``right`` on event-time column ``on``.

    * ``direction='backward'`` (the classic as-of): latest right row at or
      before the left row; ``'forward'``: earliest right row at or after.
    * ``strict=True`` excludes exact-``on`` ties (strictly before/after).
    * ``tolerance``: max allowed |left.on - right.on| as a Column interval
      or numeric expression over the two values; matches beyond it become
      NULL (pandas merge_asof semantics).

    Right's non-key columns come back suffixed (``<col><suffix>``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by_cols = [by] if isinstance(by, str) else list(by or [])

    rpay_cols = [c for c in right.columns if c not in by_cols]
    l_tagged = left.select(
        *by_cols,
        F.col(on).alias("_on"),
        F.lit(1).alias("_tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lpay"),
        F.lit(None).cast(
            right.select(F.struct(*rpay_cols).alias("s")).schema["s"].dataType
        ).alias("_rpay"),
    )
    # a NULL-timestamp right row can never be "at or before" anything, but
    # Spark's ascending sort puts NULL first, where the carry-forward
    # window would hand its payload to every early left row — drop them
    # (pandas merge_asof likewise never matches NaT rows)
    r_tagged = right.filter(F.col(on).isNotNull()).select(
        *by_cols,
        F.col(on).alias("_on"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_lpay"),
        F.struct(*[F.col(c) for c in rpay_cols]).alias("_rpay"),
    )
    both = l_tagged.unionByName(r_tagged)

    # Order so the qualifying right rows precede the left row:
    #   backward non-strict: right ties sort BEFORE left (tag asc)
    #   backward strict:     right ties sort AFTER  left (tag desc)
    # forward mirrors backward on the reversed time axis.
    asc = direction == "backward"
    on_order = F.col("_on").asc() if asc else F.col("_on").desc()
    tie = F.col("_tag").desc() if strict else F.col("_tag").asc()
    w = (
        W.partitionBy(*by_cols)
        .orderBy(on_order, tie)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    matched = (
        both.withColumn("_match", F.last("_rpay", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )

    if tolerance is not None:
        gap = (
            F.col("_on") - F.col(f"_match.{on}")
            if direction == "backward"
            else F.col(f"_match.{on}") - F.col("_on")
        )
        matched = matched.withColumn(
            "_match", F.when(gap <= tolerance, F.col("_match"))
        )

    out_cols = [F.col(f"_lpay.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"_match.{c}").alias(c + suffix if c in left.columns else c)
        for c in rpay_cols
    ]
    return matched.select(*out_cols)
