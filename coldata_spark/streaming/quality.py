"""Continuous data-quality monitoring — the streaming twin of q174's
constraints audit (operators/quality.py), the check a production ingest
runs on every micro-batch instead of discovering bad data at training
time.

ROW-rule violation counts are ADDITIVE across micro-batches: every row
passes through exactly one batch, so per-batch (rule, violations,
checked) partials fold into a persistent monitor table by summing —
the same additive exactly-once recipe as the hourly rollup
(streaming/rollup.py), sharing the fold_once sentinel protocol so a
batch that wrote but crashed before the checkpoint commit cannot
double-count on replay.

UNIQUE and FOREIGN-KEY rules are deliberately REJECTED here: key
uniqueness across the corpus is a property of the MERGED table, not a
sum of per-batch answers (two batches can each be internally unique and
still collide), and an fk verdict against a mutable dimension changes
retroactively.  Those run as the batch audit over the maintained table
(q174's shape) on whatever cadence the pipeline schedules — refusing to
fold them here keeps the monitor's numbers exact rather than silently
wrong.

Scale: each batch shrinks to one row per rule before touching the
table; the monitor table's size is the rule count, at any event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coldata_spark.operators.quality import Rule, audit
from coldata_spark.streaming.foldcommit import fold_once


def _row_rules_only(rules: list) -> list[Rule]:
    bad = [r for r in rules if not isinstance(r, Rule)]
    if bad:
        raise ValueError(
            "streaming quality monitor folds ROW rules only; "
            f"{[getattr(r, 'name', r) for r in bad]} need the batch audit "
            "over the merged table (per-batch answers don't sum: two "
            "internally-unique batches can still collide on a key)"
        )
    return rules


def quality_partial(batch_df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Per-batch audit partial: one (rule, violations, checked) row per
    rule — the same single scan+aggregate as the batch operator."""
    return audit(batch_df, _row_rules_only(rules))


def fold_into_quality(partial: DataFrame, table_path: str, batch_id: int) -> None:
    """Additively fold a partial audit into the monitor table, once."""

    def merge(existing: DataFrame, part: DataFrame) -> DataFrame:
        return (
            existing.unionByName(part)
            .groupBy("rule")
            .agg(
                F.sum("violations").cast("long").alias("violations"),
                F.sum("checked").cast("long").alias("checked"),
            )
        )

    fold_once(partial, table_path, batch_id, merge)


def stream_quality_monitor(
    stream_df: DataFrame, rules: list[Rule], table_path: str, checkpoint: str
):
    """availableNow run: audit all new files into the monitor table,
    then stop — scheduler-driven, like the rollup maintenance.  Returns
    the finished StreamingQuery."""
    rules = _row_rules_only(rules)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fold_into_quality(quality_partial(batch_df, rules), table_path, batch_id)

    q = (
        stream_df.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
