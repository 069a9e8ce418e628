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

ADDITIVE dataset rules (round 11) fold too: row_count and null_ppm
measurements are pure functions of additive components (rows, nulls),
so the monitor stores the folded components and dataset_verdicts()
re-derives measurement + verdict at read time — a continuously-updated
table-level expectation check at zero extra scan cost.

UNIQUE, FOREIGN-KEY and exact distinct_ppm rules are deliberately
REJECTED here: key uniqueness across the corpus is a property of the
MERGED table, not a sum of per-batch answers (two batches can each be
internally unique and still collide), an fk verdict against a mutable
dimension changes retroactively, and per-batch distinct counts don't
sum.  Those run as the batch audit over the maintained table (q174's
shape) on whatever cadence the pipeline schedules — refusing to fold
them here keeps the monitor's numbers exact rather than silently
wrong.  The SKETCHED distinct expectation (distinct_ratio_ppm_hll)
IS streamable: per-batch HLL registers max-merge exactly (see the
register-monitor section below), which is the standard production
answer for continuous distinct monitoring.

Scale: each batch shrinks to one row per rule before touching the
table; the monitor table's size is the rule count, at any event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coldata_spark.operators.quality import DatasetRule, Rule, _check_rules
from coldata_spark.streaming.foldcommit import fold_once

# Dataset-rule kinds whose measurement is a pure function of ADDITIVE
# per-batch components: row_count (rows sum), null_ppm (nulls and rows
# both sum; the ppm ratio is computed at READ time from the folded
# sums).  distinct_ppm is structurally excluded: per-batch distinct
# counts don't sum (the same value in two batches is one distinct value,
# not two) — like unique/fk it needs the batch audit over the merged
# table.
_ADDITIVE_DATASET_KINDS = frozenset({"row_count", "null_ppm"})


def _monitor_rules(rules: list) -> list:
    # the same fail-fast validation the batch audit runs: duplicate rule
    # names would SILENTLY merge in the monitor fold (groupBy('rule')
    # sums two rules' counts into one corrupted row), and quote/';'
    # names would die as an opaque parse error inside stack() — this
    # path stopped routing through audit() in round 11, so it must call
    # the validator itself (round-11 review finding)
    _check_rules(rules)
    bad = [
        r
        for r in rules
        if not (
            isinstance(r, Rule)
            or (
                isinstance(r, DatasetRule)
                and r.kind in _ADDITIVE_DATASET_KINDS
            )
        )
    ]
    if bad:
        raise ValueError(
            "streaming quality monitor folds ROW rules and additive "
            "dataset rules (row_count, null_ppm) only; "
            f"{[getattr(r, 'name', r) for r in bad]} need the batch audit "
            "over the merged table (per-batch answers don't sum: two "
            "internally-unique batches can still collide on a key, and a "
            "batch's distinct count says nothing about the corpus's); "
            "distinct_hll rules fold through the REGISTER monitor "
            "(hll_partial/fold_into_quality_hll) instead"
        )
    return rules


def quality_partial(batch_df: DataFrame, rules: list) -> DataFrame:
    """Per-batch partial: one (rule, violations, checked) row per rule,
    ONE scan+aggregate like the batch operator.  The two columns are an
    additive (numerator, denominator) pair: for a row rule that is
    literally (violations, rows checked); for an additive dataset rule
    it is the measurement's components (row_count: rows, rows; null_ppm:
    nulls, rows) — NOT the batch-local verdict, which would not fold.
    dataset_verdicts() turns the folded sums back into audit() semantics
    at read time."""
    rules = _monitor_rules(rules)
    row_rules = [r for r in rules if isinstance(r, Rule)]
    ds_rules = [r for r in rules if isinstance(r, DatasetRule)]
    aggs = [
        F.coalesce(F.sum(F.when(~r.pred, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias(f"_r_{i}")
        for i, r in enumerate(row_rules)
    ] + [
        (
            F.count(F.lit(1)).cast("long")
            if r.kind == "row_count"
            else F.coalesce(
                F.sum(F.when(F.col(r.col).isNull(), 1).otherwise(0)),
                F.lit(0),
            ).cast("long")
        ).alias(f"_d_{i}")
        for i, r in enumerate(ds_rules)
    ]
    wide = batch_df.agg(
        F.count(F.lit(1)).cast("long").alias("_checked"), *aggs
    )
    triples = [
        f"'{r.name}', _r_{i}, _checked" for i, r in enumerate(row_rules)
    ] + [f"'{r.name}', _d_{i}, _checked" for i, r in enumerate(ds_rules)]
    return wide.selectExpr(
        f"stack({len(triples)}, {', '.join(triples)}) "
        "as (rule, violations, checked)"
    )


def dataset_verdicts(monitor: DataFrame, rules: list) -> DataFrame:
    """Evaluate dataset expectations over the FOLDED monitor sums,
    restoring audit()'s output semantics: (rule, violations 0/1,
    checked = measurement).  Row rules pass through unchanged — their
    folded sums already ARE audit()'s semantics.  One projection over a
    #rules-row table; no scan of any data."""
    rules = _monitor_rules(rules)
    ds = {r.name: r for r in rules if isinstance(r, DatasetRule)}
    if not ds:
        return monitor
    whens = None
    for r in ds.values():
        m = (
            F.col("violations")
            if r.kind == "row_count"
            else F.when(F.col("checked") == 0, F.lit(0)).otherwise(
                F.expr("(1000000 * violations) div checked")
            )
        )
        verdict = F.when(
            (m < int(r.lo)) | (m > int(r.hi)), F.lit(1)
        ).otherwise(F.lit(0))
        pair = F.struct(
            verdict.cast("long").alias("v"), m.cast("long").alias("c")
        )
        whens = (
            F.when(F.col("rule") == r.name, pair)
            if whens is None
            else whens.when(F.col("rule") == r.name, pair)
        )
    fallback = F.struct(
        F.col("violations").alias("v"), F.col("checked").alias("c")
    )
    out = whens.otherwise(fallback)
    return monitor.select(
        "rule",
        out["v"].alias("violations"),
        out["c"].alias("checked"),
    )


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
    rules = _monitor_rules(rules)

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


# ---- distinct-ratio monitoring via mergeable HLL registers (round 11) ----
#
# Per-batch DISTINCT COUNTS don't sum — but per-batch HLL REGISTERS
# max-merge EXACTLY: max over batches of per-batch register maxima == the
# register the whole corpus would build, because max is idempotent,
# commutative and associative and every row lands in exactly one batch.
# So the one distinct expectation a stream can fold is the sketched one
# (quality.distinct_ratio_ppm_hll); the register monitor table holds
# (rule, idx, mx) — at most 256 rows per rule at ANY event volume.


def hll_partial(batch_df: DataFrame, rules: list) -> DataFrame:
    """Per-batch register partial for the distinct_hll rules: one
    (rule, idx, mx) row set per rule — a register build per rule over
    the batch (shuffle <= 256 rows each)."""
    from coldata_spark.operators import sketches as SK

    hll_rules = [
        r
        for r in rules
        if isinstance(r, DatasetRule) and r.kind == "distinct_hll"
    ]
    if not hll_rules:
        raise ValueError("hll_partial needs at least one distinct_hll rule")
    _check_rules(hll_rules)
    parts = [
        SK.hll_registers(batch_df.select(r.col), [], r.col).select(
            F.lit(r.name).alias("rule"), "idx", "mx"
        )
        for r in hll_rules
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def fold_into_quality_hll(
    partial: DataFrame, table_path: str, batch_id: int
) -> None:
    """Max-merge a register partial into the register monitor, once
    (the same fold_once sentinel protocol as the count monitor)."""

    def merge(existing: DataFrame, part: DataFrame) -> DataFrame:
        return (
            existing.unionByName(part)
            .groupBy("rule", "idx")
            .agg(F.max("mx").alias("mx"))
        )

    fold_once(partial, table_path, batch_id, merge)


def hll_verdicts(
    registers: DataFrame, rules: list, total_rows: int
) -> DataFrame:
    """Evaluate distinct_hll expectations over the FOLDED register
    monitor: same (rule, violations, checked = estimated ratio ppm)
    semantics as the batch audit.  ``total_rows`` comes from the count
    monitor's row_count rule (fold both monitors side by side); the
    estimate formula is the q114 integer fixed-point one, so stream and
    batch agree bit-for-bit once their registers match."""
    from coldata_spark.operators.sketches import (
        hll_estimate_sql,
        hll_present_sum_expr,
    )

    hll_rules = {
        r.name: r
        for r in rules
        if isinstance(r, DatasetRule) and r.kind == "distinct_hll"
    }
    if not hll_rules:
        raise ValueError("hll_verdicts needs at least one distinct_hll rule")
    # LEFT-join the folded registers onto the RULE LIST: a rule whose
    # monitored column has been all-NULL (or that was just added) has
    # ZERO register rows, and grouping the registers alone would emit no
    # verdict at all — the exact constant-column regression the rule
    # exists to catch (round-11 review finding).  Zero registers means
    # nothing was ever observed: estimate 0, matching the batch audit's
    # empty-register coalesce bit-for-bit.
    spark = registers.sparkSession
    names = spark.createDataFrame(
        [(n,) for n in hll_rules], "rule string"
    )
    per_rule = names.join(
        registers.groupBy("rule").agg(
            F.count(F.lit(1)).alias("n_used"),
            F.sum(F.expr(hll_present_sum_expr())).alias("s_present"),
        ),
        "rule",
        "left",
    ).select(
        "rule",
        F.coalesce("n_used", F.lit(0)).alias("n_used"),
        "s_present",
    )
    # The division itself comes from sketches.hll_estimate_sql — one
    # implementation feeds both the batch audit and this read-out, so a
    # register-math change cannot silently break stream==batch parity.
    est = (
        f"case when n_used = 0 then 0 else "
        f"coalesce({hll_estimate_sql()}, 0) end"
    )
    n = int(total_rows)
    m = f"cast(case when {n} = 0 then 0 else (1000000 * {est}) div {n} end as bigint)"
    whens = None
    for r in hll_rules.values():
        verdict = (
            f"cast(case when {m} < {int(r.lo)} or {m} > {int(r.hi)} "
            "then 1 else 0 end as bigint)"
        )
        pair = F.expr(f"struct({verdict} as v, {m} as c)")
        cond = F.col("rule") == r.name
        whens = (
            F.when(cond, pair) if whens is None else whens.when(cond, pair)
        )
    out = whens.otherwise(F.expr("struct(cast(null as bigint) as v, cast(null as bigint) as c)"))
    return per_rule.select(
        "rule", out["v"].alias("violations"), out["c"].alias("checked")
    ).where(F.col("violations").isNotNull())


def stream_hll_monitor(
    stream_df: DataFrame, rules: list, table_path: str, checkpoint: str
):
    """availableNow run of the REGISTER monitor: build per-batch HLL
    registers for the distinct_hll rules and max-merge them into the
    register table, then stop — the distinct-side twin of
    stream_quality_monitor (run both against the same source, two
    checkpoints; hll_verdicts reads the verdicts out with the row count
    from the count monitor)."""
    hll_rules = [
        r
        for r in rules
        if isinstance(r, DatasetRule) and r.kind == "distinct_hll"
    ]
    if not hll_rules:
        raise ValueError("stream_hll_monitor needs distinct_hll rules")

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fold_into_quality_hll(
            hll_partial(batch_df, hll_rules), table_path, batch_id
        )

    q = (
        stream_df.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
