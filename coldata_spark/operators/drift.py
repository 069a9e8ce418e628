"""Cross-snapshot distribution drift: fixed-point PSI over equi-width bins.

The monitoring a versioned training-data table needs between two commits
(operators/table.py): did a re-crawl/re-curation SHIFT a column's
distribution, not just add/remove rows?  Row-level CDC
(VersionedTable.changes_between / q127) answers WHICH rows moved; this
operator answers whether the POPULATION moved — the Population Stability
Index gate every feature-store deployment runs before trusting a new
snapshot.  Reference basis: the reference's scheduler re-crawls daily
with no distribution check at all (src/coldata/scheduler.py:21-33).

Semantics — engine-exact by construction (ORACLE_PARITY.md rule 5):

  * Bins: equi-width over the SHARED [min, max] of both snapshots —
    ``least(floor((x - mn) * nbins / (mx - mn)), nbins - 1)`` with a
    mx == mn guard — identical IEEE arithmetic in any SQL engine (the
    q122 integer idiom's ``+ 1`` span guard is for INTEGER domains; on
    a continuous column it collapses any sub-1 range into bin 0, hiding
    real drift on score/rate columns in [0, 1] — round-11 review
    finding).  NULLs are excluded (they are null_ppm's job, not PSI's).
  * Proportions: Laplace-smoothed integer ppm — p_i = (1e6 * (n_i + 1))
    div (N + nbins) — so an empty-on-one-side bin never divides by zero
    and ppm values hash exactly.
  * The log-ratio MAGNITUDE uses the integer fixed-point log2 surrogate
    (functions/intmath.py, the q166 CCNet device) in its SUM form
    ``L(n_a+1) - L(N_a+nbins) - L(n_b+1) + L(N_b+nbins)`` — arguments
    stay <= N, keeping int64 headroom to ~8.7e12 rows per snapshot
    (the product form n_i * N overflows 2^63 at ~3e9 rows).  Its sign
    is discarded: the surrogate's per-call error (~0.086 bits) can flip
    a near-zero true ratio's sign, and a PSI term doesn't need it —
    see the next bullet and _psi_parts' docstring (which also records
    why an exact cross-multiplied sign was tried and was the WRONG
    algebra).
  * psi_term_fp = |p_ppm - q_ppm| * |log-ratio-fp|: units are
    ppm x 2^-20 log2-steps — a scaled PSI surrogate, comparable across
    runs and engines bit-for-bit, and >= 0 in every cell BY
    CONSTRUCTION, exactly like the true statistic (a PSI term's two
    factors always share sign).  A cell whose true ratio sits within
    the surrogate's error band may overstate its tiny magnitude, never
    produce a negative term that cancels real drift out of psi_total.

Plan shape — the scale contract: TWO passes over the snapshot pair
(round-12 review correction; an earlier draft claimed one): first the
tiny min/max + totals aggregate (whose one-row result is broadcast into
the bin expression), then the map-side (side, bin) combine agg (shuffle
bounded by 2 x nbins groups).  At 100 TB the monitoring cost is two
full scans of both snapshots — cache/checkpoint the projected union
when a single scan matters, or feed persisted sketches to
drift_from_histograms (zero rescans).  For MANY columns use drift_many:
still the same two passes TOTAL, not per column.  Nothing is ever
per-row beyond the projection; no window, no join wider than the
cells-row result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coldata_spark.functions.intmath import intlog2_fp


def _psi_parts(den: str, dialect: str) -> tuple[str, str, str]:
    """(p_ppm, q_ppm, psi_term) SQL snippets over cell columns n_a/n_b
    and totals na/nb, with Laplace denominator ``<total> + den``.  ONE
    builder for both dialects and both cell kinds (numeric bins,
    categorical values) so the four call sites cannot drift apart.

    The term is ``|p_ppm - q_ppm| * |log_ratio_fp|`` — non-negative BY
    CONSTRUCTION, which is exactly the true statistic's shape: the two
    factors of a PSI term always share sign ((p - q) and log(p/q) flip
    together), so the true term is >= 0 in every cell and |.|*|.| is
    its faithful surrogate.  The round-11 review caught the naive
    ``(p_ppm - q_ppm) * lr`` form going NEGATIVE when the intlog2
    surrogate's ~0.086 bit/call error flipped a near-zero log-ratio's
    sign — negative terms cancel real drift out of psi_total, the one
    thing a drift gate must never do.  (A first fix multiplied in an
    exact cross-multiplied ratio sign — wrong algebra: that sign
    belongs to BOTH factors at once, and signing the product flipped
    mass-LOSING cells negative, cancelling symmetric shifts to a zero
    total.)  Magnitude error stays bounded by the surrogate's per-call
    band; direction per cell is read from p_ppm vs q_ppm directly."""
    L = lambda m: intlog2_fp(m, dialect)  # noqa: E731
    div = "//" if dialect == "duckdb" else "div"
    p = f"((1000000 * (n_a + 1)) {div} (na + {den}))"
    q = f"((1000000 * (n_b + 1)) {div} (nb + {den}))"
    lr = (
        f"({L('n_a + 1')} - {L(f'na + {den}')}"
        f" - {L('n_b + 1')} + {L(f'nb + {den}')})"
    )
    term = f"(abs({p} - {q}) * abs({lr}))"
    return p, q, term



def distribution_drift(
    a: DataFrame, b: DataFrame, col: str, nbins: int = 16
) -> DataFrame:
    """Per-bin drift of ``col`` between snapshot ``a`` (baseline) and
    ``b`` (current): (bin, n_a, n_b, p_ppm, q_ppm, psi_term_fp), one row
    per bin that holds data on either side.  Sum psi_term_fp for the
    scalar PSI (psi_total)."""
    if nbins < 2:
        raise ValueError("nbins must be >= 2")
    xa = a.select(F.col(col).cast("double").alias("x")).where(
        F.col("x").isNotNull()
    )
    xb = b.select(F.col(col).cast("double").alias("x")).where(
        F.col("x").isNotNull()
    )
    both = xa.select("x", F.lit(0).alias("side")).unionByName(
        xb.select("x", F.lit(1).alias("side"))
    )
    # shared edges + per-side totals in ONE tiny aggregate (broadcast)
    stats = both.agg(
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0))
        .cast("long")
        .alias("nb"),
    )
    binned = both.crossJoin(F.broadcast(stats)).select(
        F.least(
            F.expr(
                f"cast(floor((x - mn) * {nbins} / "
                f"(case when mx = mn then 1.0 else mx - mn end)) as bigint)"
            ),
            F.lit(nbins - 1).cast("long"),
        ).alias("bin"),
        "side",
        "na",
        "nb",
    )
    counts = binned.groupBy("bin", "na", "nb").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    p_ppm, q_ppm, term = _psi_parts(str(nbins), "spark")
    return counts.selectExpr(
        "bin",
        "n_a",
        "n_b",
        f"cast({p_ppm} as bigint) as p_ppm",
        f"cast({q_ppm} as bigint) as q_ppm",
        f"cast({term} as bigint) as psi_term_fp",
    )


def _validate_drift_cols(cols: list[str]) -> None:
    """Shared name checks for every entry point that splices column names
    into SQL/stack() literals (drift_many AND drift_many_sql — a quoted
    name that only the Spark side rejected would silently generate broken
    or injected SQL in the oracle twin)."""
    if not cols:
        raise ValueError("drift_many needs at least one column")
    if len(set(cols)) != len(cols):
        raise ValueError(f"duplicate columns in {cols!r}")
    for c in cols:
        if "'" in c or "`" in c or '"' in c:
            raise ValueError(
                f"column name {c!r} contains a quote/backtick — it is "
                "spliced into stack()/SQL literals"
            )
        if c in ("side", "column", "x"):
            raise ValueError(
                f"column name {c!r} collides with drift_many's internal "
                "side/column/x names — alias it in the snapshot projection"
            )


def drift_many(
    a: DataFrame, b: DataFrame, cols: list[str], nbins: int = 16
) -> DataFrame:
    """Per-bin drift for MANY numeric columns in TWO passes over the
    snapshot pair TOTAL — not two per column.  Output: (column, bin,
    n_a, n_b, p_ppm, q_ppm, psi_term_fp); per-column rows are
    bit-identical to distribution_drift(a, b, col, nbins) (the plan
    test and the q180 oracle both pin this), so a nightly gate watching
    50 columns pays 2 scans instead of 100.

    Shape: pass 1 is ONE wide stats aggregate (per-column min/max +
    per-side non-null totals — 4k scalar aggs for k columns, one row
    out, broadcast); pass 2 unpivots each row into k (column, x) cells
    with stack() — an Expand, still one scan — picks each cell's edges
    out of the broadcast stats row by column name, and runs the same
    map-side (column, bin, side) combine agg.  Shuffle bounded by
    k x 2 x nbins groups.  NULLs excluded per column (a row null in one
    column still contributes its other columns, exactly like running
    the single-column op k times)."""
    if nbins < 2:
        raise ValueError("nbins must be >= 2")
    _validate_drift_cols(cols)
    proj = [F.col(c).cast("double").alias(c) for c in cols]
    both = a.select(*proj, F.lit(0).alias("side")).unionByName(
        b.select(*proj, F.lit(1).alias("side"))
    )
    aggs = []
    for i, c in enumerate(cols):
        aggs += [
            F.min(c).alias(f"mn_{i}"),
            F.max(c).alias(f"mx_{i}"),
            F.sum(
                F.when((F.col("side") == 0) & F.col(c).isNotNull(), 1)
                .otherwise(0)
            ).cast("long").alias(f"na_{i}"),
            F.sum(
                F.when((F.col("side") == 1) & F.col(c).isNotNull(), 1)
                .otherwise(0)
            ).cast("long").alias(f"nb_{i}"),
        ]
    stats = both.agg(*aggs)
    stacked = both.selectExpr(
        "side",
        "stack({n}, {cells}) as (column, x)".format(
            n=len(cols),
            cells=", ".join(f"'{c}', `{c}`" for c in cols),
        ),
    ).where(F.col("x").isNotNull())
    pick = lambda pre: F.coalesce(  # noqa: E731
        *[
            F.when(F.col("column") == c, F.col(f"{pre}_{i}"))
            for i, c in enumerate(cols)
        ]
    )
    binned = stacked.crossJoin(F.broadcast(stats)).select(
        "column",
        "side",
        F.least(
            F.floor(
                (F.col("x") - pick("mn"))
                * nbins
                / F.when(pick("mx") == pick("mn"), F.lit(1.0)).otherwise(
                    pick("mx") - pick("mn")
                )
            ).cast("long"),
            F.lit(nbins - 1).cast("long"),
        ).alias("bin"),
        pick("na").alias("na"),
        pick("nb").alias("nb"),
    )
    counts = binned.groupBy("column", "bin", "na", "nb").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    p_ppm, q_ppm, term = _psi_parts(str(nbins), "spark")
    return counts.selectExpr(
        "column",
        "bin",
        "n_a",
        "n_b",
        f"cast({p_ppm} as bigint) as p_ppm",
        f"cast({q_ppm} as bigint) as q_ppm",
        f"cast({term} as bigint) as psi_term_fp",
    )


def drift_many_sql(
    a_sql: str,
    b_sql: str,
    cols: list[str],
    nbins: int = 16,
    dialect: str = "duckdb",
) -> str:
    """Engine-twin SQL of drift_many: a UNION ALL of per-column
    drift_sql bodies, each labelled with its column name.  The oracle
    deliberately takes the SIMPLE 2-scans-PER-COLUMN shape — per-column
    results are defined to equal the single-column operator's, so the
    cheapest provably-identical SQL is k copies of that operator's
    already-verified twin; the 2-scans-TOTAL plan is the Spark side's
    job and is pinned by the plan test, not the oracle."""
    _validate_drift_cols(cols)
    # "column" is a reserved word in DuckDB (ALTER ... ADD COLUMN) —
    # quote it there; Spark takes it bare (and backticks elsewhere).
    label = '"column"' if dialect == "duckdb" else "column"
    parts = [
        f"SELECT '{c}' AS {label}, * FROM ("
        + drift_sql(a_sql, b_sql, c, nbins=nbins, dialect=dialect)
        + ")"
        for c in cols
    ]
    return " UNION ALL ".join(parts)


def psi_total(drift: DataFrame) -> DataFrame:
    """Collapse a distribution_drift frame to the scalar statistic."""
    return drift.agg(
        F.coalesce(F.sum("psi_term_fp"), F.lit(0))
        .cast("long")
        .alias("psi_fp"),
        F.count(F.lit(1)).cast("long").alias("bins_present"),
    )


def drift_sql(
    a_sql: str, b_sql: str, col: str, nbins: int = 16, dialect: str = "duckdb"
) -> str:
    """The engine-twin SQL of distribution_drift over two snapshot
    subqueries — generated from the SAME constants and the SAME intlog2
    snippet so the Spark plan and the oracle can never drift apart
    (the q166 pattern: one term generator, two dialects)."""
    p_ppm, q_ppm, term = _psi_parts(str(nbins), dialect)
    return f"""
    WITH both_sides AS (
        SELECT CAST({col} AS DOUBLE) AS x, 0 AS side FROM ({a_sql})
        WHERE {col} IS NOT NULL
        UNION ALL
        SELECT CAST({col} AS DOUBLE) AS x, 1 AS side FROM ({b_sql})
        WHERE {col} IS NOT NULL
    ),
    stats AS (
        SELECT min(x) AS mn, max(x) AS mx,
               CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS na,
               CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS nb
        FROM both_sides
    ),
    counts AS (
        SELECT least(CAST(floor((x - mn) * {nbins} /
                          (CASE WHEN mx = mn THEN 1.0 ELSE mx - mn END))
                          AS BIGINT), {nbins - 1}) AS bin,
               na, nb,
               CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_a,
               CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_b
        FROM both_sides, stats
        GROUP BY bin, na, nb
    )
    SELECT bin, n_a, n_b,
           CAST({p_ppm} AS BIGINT) AS p_ppm,
           CAST({q_ppm} AS BIGINT) AS q_ppm,
           CAST({term} AS BIGINT) AS psi_term_fp
    FROM counts
    """


def snapshot_drift(
    spark,
    table,
    pk_col: str,
    value_col: str,
    from_version: int,
    to_version: int,
    nbins: int = 16,
) -> DataFrame:
    """Drift between two commits of a VersionedTable
    (operators/table.py) — the production entry point: read both
    snapshots through the manifest (time travel) and hand the value
    column to distribution_drift.  ``pk_col`` is unused by the
    statistic but documents what identifies a row in the table (the
    same signature family as changes_between)."""
    va = table.read(spark, from_version)
    vb = table.read(spark, to_version)
    return distribution_drift(va, vb, value_col, nbins=nbins)


OTHER = "<other>"


def categorical_drift(
    a: DataFrame, b: DataFrame, col: str, top_k: int = 16
) -> DataFrame:
    """Per-category drift of a STRING column between snapshots — the
    categorical twin of distribution_drift (PSI over category cells is
    the standard form; equi-width bins only exist for numerics).

    Cells are the top_k values by COMBINED count (ties to the smaller
    string, both engines) plus one ``<other>`` bucket, so the result is
    bounded whatever the column's cardinality.  The top-K selection runs
    over the (value, n_a, n_b) COUNT table — already shrunk to the
    column's distinct values by one map-side-combined aggregate; for
    unbounded-cardinality columns shrink first with the heavy-hitters
    sketch (q115), then drift over its output.  Same integer fixed-point
    ppm + intlog2 term as the numeric path; NULLs excluded (null_ppm's
    job).  A real category literally named '<other>' would fold into
    the bucket — rename upstream if that ever matters."""
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    xa = a.select(F.col(col).cast("string").alias("x")).where(
        F.col("x").isNotNull()
    )
    xb = b.select(F.col(col).cast("string").alias("x")).where(
        F.col("x").isNotNull()
    )
    both = xa.select("x", F.lit(0).alias("side")).unionByName(
        xb.select("x", F.lit(1).alias("side"))
    )
    counts = both.groupBy("x").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.orderBy((F.col("n_a") + F.col("n_b")).desc(), F.col("x").asc())
    )
    cells = (
        counts.withColumn("_rn", rn)
        .select(
            F.when(F.col("_rn") <= top_k, F.col("x"))
            .otherwise(F.lit(OTHER))
            .alias("value"),
            "n_a",
            "n_b",
        )
        .groupBy("value")
        .agg(F.sum("n_a").cast("long").alias("n_a"),
             F.sum("n_b").cast("long").alias("n_b"))
    )
    totals = cells.agg(
        F.sum("n_a").cast("long").alias("na"),
        F.sum("n_b").cast("long").alias("nb"),
        F.count(F.lit(1)).cast("long").alias("ncells"),
    )
    p_ppm, q_ppm, term = _psi_parts("ncells", "spark")
    return cells.crossJoin(F.broadcast(totals)).selectExpr(
        "value",
        "n_a",
        "n_b",
        f"cast({p_ppm} as bigint) as p_ppm",
        f"cast({q_ppm} as bigint) as q_ppm",
        f"cast({term} as bigint) as psi_term_fp",
    )


def categorical_drift_sql(
    a_sql: str, b_sql: str, top_k: int = 16, dialect: str = "duckdb",
    col: str = "x",
) -> str:
    """Engine-twin SQL of categorical_drift over two snapshot
    subqueries projecting ``col`` — generated from the same constants
    and intlog2 snippet, like drift_sql."""
    p_ppm, q_ppm, term = _psi_parts("ncells", dialect)
    return f"""
    WITH both_sides AS (
        SELECT CAST({col} AS VARCHAR) AS x, 0 AS side FROM ({a_sql})
        WHERE {col} IS NOT NULL
        UNION ALL
        SELECT CAST({col} AS VARCHAR) AS x, 1 AS side FROM ({b_sql})
        WHERE {col} IS NOT NULL
    ),
    counts AS (
        SELECT x,
               CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_a,
               CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_b
        FROM both_sides GROUP BY x
    ),
    cells AS (
        SELECT value, CAST(sum(n_a) AS BIGINT) AS n_a,
               CAST(sum(n_b) AS BIGINT) AS n_b
        FROM (
            SELECT CASE WHEN row_number() OVER (
                            ORDER BY n_a + n_b DESC, x ASC) <= {top_k}
                        THEN x ELSE '{OTHER}' END AS value,
                   n_a, n_b
            FROM counts
        ) GROUP BY value
    ),
    totals AS (
        SELECT CAST(sum(n_a) AS BIGINT) AS na,
               CAST(sum(n_b) AS BIGINT) AS nb,
               CAST(count(*) AS BIGINT) AS ncells
        FROM cells
    )
    SELECT value, n_a, n_b,
           CAST({p_ppm} AS BIGINT) AS p_ppm,
           CAST({q_ppm} AS BIGINT) AS q_ppm,
           CAST({term} AS BIGINT) AS psi_term_fp
    FROM cells, totals
    """


def drift_from_histograms(
    hist_a: DataFrame, hist_b: DataFrame, nbins: int
) -> DataFrame:
    """Drift between two PERSISTED histogram sketches
    (operators/sketches.py hist_build over the SAME (lo, hi, n_bins)
    spec) — the zero-rescan path: a pipeline that already maintains
    per-snapshot histograms (mergeable, additive) compares versions by
    joining two (bin, cnt) tables, never touching raw data again.  Same
    (bin, n_a, n_b, p_ppm, q_ppm, psi_term_fp) output and the same
    fixed-point term as distribution_drift, so gates written against
    one feed accept the other.  ``nbins`` is the sketch's n_bins (the
    Laplace cell count); NULL-bin rows (hist_build tracks nulls as a
    NULL bin) are excluded like distribution_drift excludes NULLs.
    Caller contract: both sketches were built with the same spec —
    joining histograms of different [lo, hi] domains compares
    incomparable bins (same caveat as hist_merge)."""
    a = hist_a.where(F.col("bin").isNotNull()).select(
        "bin", F.col("cnt").alias("n_a")
    )
    b = hist_b.where(F.col("bin").isNotNull()).select(
        "bin", F.col("cnt").alias("n_b")
    )
    cells = (
        a.join(b, "bin", "full")
        .select(
            "bin",
            F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"),
        )
    )
    totals = cells.agg(
        F.sum("n_a").cast("long").alias("na"),
        F.sum("n_b").cast("long").alias("nb"),
    )
    p_ppm, q_ppm, term = _psi_parts(str(nbins), "spark")
    return cells.crossJoin(F.broadcast(totals)).selectExpr(
        "bin",
        "n_a",
        "n_b",
        f"cast({p_ppm} as bigint) as p_ppm",
        f"cast({q_ppm} as bigint) as q_ppm",
        f"cast({term} as bigint) as psi_term_fp",
    )
