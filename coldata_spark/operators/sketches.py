"""Engine-portable probabilistic sketches as reusable operators.

Unlike Spark's built-in ``approx_count_distinct`` / ``approx_percentile``
(HLL++ / KLL with engine-internal layouts), these sketches are defined by
pure integer column expressions over md5 — any engine (the DuckDB oracle,
a downstream warehouse) can rebuild or merge them bit-for-bit.  That makes
them safe to persist as table artifacts: build registers per partition/day,
store them, and merge across arbitrary slices later without rescanning.

Both are algebraic (register max / counter sum), i.e. valid map-side
partials — the property tests in tests/test_sketches.py assert
split-merge == whole.

Used by queries/sketch_queries.py (q114/q115), whose DuckDB oracle SQL
mirrors these expressions literally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---- HyperLogLog (p=8, m=256 registers, 32-bit md5-derived hash) ----------
# Estimate alpha_m * m^2 / sum(2^-M_j) in pure integers: scale 2^-M_j by
# 2^25 (max rank 25, so every term 2^(25-M_j) is integral) and divide the
# precomputed constant C = floor(alpha * m^2 * 2^25).
HLL_P = 8
HLL_M = 1 << HLL_P
HLL_C = 1_579_498_136_381  # floor(0.7213/(1+1.079/256) * 256^2 * 2^25)
_W_BITS = 32 - HLL_P  # 24-bit rank field
_W_MOD = 1 << _W_BITS
_MAX_RANK = _W_BITS + 1  # 25


def _h32(key_col: str) -> Column:
    return F.expr(
        f"cast(conv(substring(md5(cast({key_col} as string)), 1, 8), 16, 10)"
        " as bigint)"
    )


def hll_registers(
    df: DataFrame, group_cols: list[str], key_col: str
) -> DataFrame:
    """Per-group HLL register table: (group..., idx, mx).

    One md5 + bit-split per row map-side, then a groupBy max whose shuffle
    carries at most groups x 256 rows regardless of input size.  The
    output is the sketch artifact — persistable, mergeable (hll_merge)."""
    b = df.select(
        *group_cols,
        _h32(key_col).alias("h32"),
    ).select(
        *group_cols,
        F.expr(f"h32 div {_W_MOD}").alias("idx"),
        F.expr(
            f"case when h32 % {_W_MOD} = 0 then {_MAX_RANK}"
            f" else {_MAX_RANK} - length(bin(h32 % {_W_MOD})) end"
        ).alias("rank"),
    )
    return b.groupBy(*group_cols, "idx").agg(F.max("rank").alias("mx"))


def hll_merge(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register tables (from unions of per-slice sketches): max wins."""
    return regs.groupBy(*group_cols, "idx").agg(F.max("mx").alias("mx"))


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Per-group cardinality estimate from a register table."""
    per_group = regs.groupBy(*group_cols).agg(
        F.count("*").alias("n_used"),
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), {_MAX_RANK} - mx)")
        ).alias("s_present"),
    )
    empty_term = 1 << _MAX_RANK  # empty register contributes 2^-0 scaled
    return per_group.select(
        *group_cols,
        F.col("n_used").cast("long").alias("n_registers"),
        F.expr(
            f"{HLL_C} div (s_present + ({HLL_M} - n_used) * {empty_term})"
        ).cast("long").alias("hll_estimate"),
    )


# ---- Count-min sketch (d rows x w buckets, md5 row-hashes) ----------------


def _bucket(key_col: str, width: int) -> Column:
    return F.expr(
        f"cast(conv(substring(md5(concat(cast(j as string), ':',"
        f" cast({key_col} as string))), 1, 8), 16, 10) as bigint) % {width}"
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build a count-min sketch (j, bucket, cnt) over ``key_col``.

    A depth-x row explode map-side plus ONE combine aggregation bounded by
    depth*width counters — the fixed-size frequency summary at any scale.
    Counter sum is linear, so per-slice sketches merge by adding counts."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("j")
    return (
        df.select(key_col, rows)
        .select("j", _bucket(key_col, width).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_lookup(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate counts for ``keys``: min over the depth row-hashes.

    The estimate is one-sided (>= true count, the CM guarantee — asserted
    in tests/test_sketches.py).  Probe rows join the depth*width-row
    sketch broadcast-side; empty buckets count as 0."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("j")
    probes = keys.select(key_col, rows).select(
        key_col, "j", _bucket(key_col, width).alias("bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("cms_est"))
    )
