"""Z-order file clustering — multi-dimensional data skipping.

A table sorted on one column prunes row groups only for filters on that
column; filters on any other column touch every file.  Interleaving the
bits of several columns' bucket ranks (a Morton / Z-order curve) clusters
rows so that a range filter on ANY of the z-ordered columns overlaps only
a fraction of the files — the layout Delta's OPTIMIZE ZORDER BY and
Iceberg's sort orders produce, built here from plain column expressions.

Everything is codegen expression work except one 1-row min/max aggregate
(layout-time only, like compaction itself).  At 100 TB this runs as a
maintenance job: scan → z-key map-side → range repartition on the key →
sorted parquet write; readers need no changes — parquet row-group min/max
stats do the pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8) -> Column:
    """Morton-interleaved key over ``cols`` (numeric), ``bits`` per column.

    Each column is min/max-scaled to a 2^bits bucket rank (one tiny 1-row
    aggregate supplies the ranges), then rank bits are interleaved
    round-robin so locality is preserved in every dimension equally.
    """
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("long")).alias(f"mn_{c}"))
        aggs.append(F.max(F.col(c).cast("long")).alias(f"mx_{c}"))
    rng = df.agg(*aggs).first()

    n = len(cols)
    key: Column | None = None
    for idx, c in enumerate(cols):
        if rng[f"mn_{c}"] is None or rng[f"mx_{c}"] is None:
            raise TypeError(
                f"zorder_key: column {c!r} has no long-castable range "
                "(string/date/all-null columns cannot ride the Morton "
                "curve) — z-order numeric or timestamp columns"
            )
        mn = int(rng[f"mn_{c}"])
        span = max(1, int(rng[f"mx_{c}"]) - mn + 1)
        bucket = F.floor(
            ((F.col(c).cast("long") - F.lit(mn)) * F.lit(1 << bits)) / F.lit(span)
        ).cast("long")
        bucket = F.least(bucket, F.lit((1 << bits) - 1))
        for j in range(bits):
            bit = F.shiftright(bucket, j).bitwiseAND(F.lit(1))
            term = F.shiftleft(bit, j * n + idx)
            key = term if key is None else key + term
    assert key is not None, "zorder_key needs at least one column"
    return key.cast("long")


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 8, bits: int = 8
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered on the Z-order
    curve of ``cols``: range-partition by the z-key (each file owns a curve
    segment), sort within files so row-group stats are tight, drop the key
    before writing (readers see the original schema)."""
    keyed = df.withColumn("_zorder", zorder_key(df, cols, bits))
    (
        keyed.repartitionByRange(n_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode("overwrite")
        .parquet(path)
    )


def files_overlapping(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    """Data-skipping audit: (#files whose [min,max] for ``col`` overlaps
    [lo, hi], total #files), read from parquet footer stats — exactly the
    decision a scan's row-group pruning makes."""
    import os

    import pyarrow.parquet as pq

    hit = total = 0
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        total += 1
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        fmin = fmax = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                column = md.row_group(rg).column(ci)
                if column.path_in_schema == col and column.statistics is not None:
                    s = column.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is not None and not (hi < fmin or lo > fmax):
            hit += 1
    return hit, total


def drop_table_clean(spark, name: str) -> None:
    """Drop catalog table ``name`` AND its orphaned default warehouse
    location.  ``saveAsTable`` raises LOCATION_ALREADY_EXISTS when a
    previously killed run left ``spark-warehouse/<name>`` on disk with no
    catalog entry (DROP TABLE alone can't see it) — clearing both makes
    every bucketed-table writer self-healing regardless of how the prior
    process died.

    When the table EXISTS, its actual location is read from the catalog
    (a table created with a custom LOCATION or in a non-default database
    does not live at ``spark-warehouse/<name>``); the managed-location
    rmtree only fires for paths inside the warehouse dir, so an EXTERNAL
    table's data is never touched.  When the table does not exist, only
    the orphaned DEFAULT location is cleared, with the ``<db>.db/``
    prefix applied for db-qualified names."""
    import os
    import shutil

    location = None
    try:
        if spark.catalog.tableExists(name):
            # take the LAST 'Location' row: DESCRIBE EXTENDED prints the
            # schema first, so a data column literally named 'Location'
            # would shadow the detailed-info row if we took the first
            rows = (
                spark.sql(f"DESCRIBE TABLE EXTENDED {name}")
                .where("col_name = 'Location'")
                .select("data_type")
                .collect()
            )
            if rows:
                location = rows[-1][0].removeprefix("file:")
    except Exception:
        location = None  # catalog edge (temp view, etc.) — fall back
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = os.path.abspath(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix(
            "file:"
        )
    )
    if location is None:
        # table absent: clear the orphaned DEFAULT managed location only
        parts = [p.lower() for p in name.split(".") if p]
        if len(parts) >= 2 and parts[-2] != "default":
            location = os.path.join(warehouse, parts[-2] + ".db", parts[-1])
        else:
            location = os.path.join(warehouse, parts[-1])
    location = os.path.abspath(location)
    # guard: only remove directories the warehouse manages
    if location.startswith(warehouse + os.sep) and os.path.isdir(location):
        shutil.rmtree(location, ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    path: str,
    bucket_col: str,
    sort_cols: list[str] | None = None,
    buckets: int = 32,
) -> None:
    """Write ``df`` as a bucketed+sorted parquet table at ``path`` — the
    co-located layout that turns every later join/window/agg on
    ``bucket_col`` into a ZERO-EXCHANGE plan (and, with ``sort_cols``,
    zero-sort: SMJ and window sorts ride the bucket files).  At 100 TB
    this is the difference between shuffling the fact table per join and
    never shuffling it.

    The repartition onto the bucket column before bucketBy guarantees ONE
    file per bucket (Spark's hash partitioner and bucket hasher agree),
    which is the precondition for the scan to report sortedness — see
    register_bucketed.  The transient catalog entry is dropped; the files
    (bucket ids encoded in their names) are the durable artifact."""
    import hashlib
    import os

    sort_cols = sort_cols or [bucket_col]
    # deterministic name (md5, not per-process-randomized hash()): a
    # crashed write's orphaned catalog entry gets reused/cleaned by the
    # retry instead of accumulating under an unguessable name
    tmp = (
        "_bucketed_write_"
        + hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:12]
    )
    drop_table_clean(df.sparkSession, tmp)
    (
        df.repartition(buckets, bucket_col)
        .write.mode("overwrite")
        .bucketBy(buckets, bucket_col)
        .sortBy(*sort_cols)
        .option("path", os.path.abspath(path))
        .saveAsTable(tmp)
    )
    df.sparkSession.sql(f"DROP TABLE IF EXISTS {tmp}")


def register_bucketed(
    spark,
    path: str,
    table: str,
    bucket_col: str,
    sort_cols: list[str] | None = None,
    buckets: int = 32,
) -> None:
    """Register an existing write_bucketed directory as catalog table
    ``table`` in THIS session.  Bucket/sort specs are catalog metadata,
    not file metadata, so a fresh session must re-declare them — a
    CREATE TABLE ... CLUSTERED BY ... SORTED BY ... LOCATION DDL over the
    existing files restores the zero-exchange property without rewriting
    a byte.  The LOCATION must be absolute (a relative path silently
    resolves under spark-warehouse and registers an EMPTY table).

    For sort elision also set
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` — safe for
    tables produced by write_bucketed, whose one-file-per-bucket layout is
    the only case the flag reports ordering for."""
    import os

    abspath = os.path.abspath(path)
    schema = spark.read.parquet(abspath).schema
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )
    sort = ", ".join(sort_cols or [bucket_col])
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"CREATE TABLE {table} ({cols}) USING parquet "
        f"CLUSTERED BY ({bucket_col}) SORTED BY ({sort}) "
        f"INTO {buckets} BUCKETS LOCATION '{abspath}'"
    )


from dataclasses import dataclass


@dataclass(frozen=True)
class LayoutSpec:
    """Physical layout prescription for one table: bucket (hash-cluster)
    column, within-bucket sort order, bucket count — exactly the arguments
    write_bucketed/register_bucketed take."""

    bucket_col: str
    sort_cols: tuple[str, ...]
    buckets: int = 32


# One plan-line attribute reference, bare or cast-wrapped — type-promoted
# expressions print as `cast(col#5 as bigint)`, and the target type may
# itself carry parenthesized parameters (`cast(col#5 as decimal(12,4))`),
# so the type part tolerates ONE nested paren group before the closing
# paren.  Shared by advise_layout's join-key tally and advise_zorder's
# range-predicate tally so both halves attribute the same spellings.
_CAST_ATTR = r"(?:cast\()?(\w+)#\d+L?(?:\s+as\s+[^()]*(?:\([^)]*\))?\))?"


def _top_level_groups(line: str) -> list[str]:
    """Top-level ``[...]`` group contents of a plan line, in order —
    nested brackets (lambdas, windowspecdefinition args) stay inside
    their group."""
    groups, depth, start = [], 0, -1
    for i, ch in enumerate(line):
        if ch == "[":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and start >= 0:
                groups.append(line[start:i])
                start = -1
    return groups


def _column_attribution(spark, sf_dir: str) -> tuple[dict, dict]:
    """Shared advisor attribution: (column name -> owning table, table ->
    on-disk bytes) over the sf_dir fixtures.  Ambiguous names (present in
    two tables) are dropped rather than guessed."""
    import os

    from coldata_spark.session import dir_bytes
    from coldata_spark.tables import TABLES, load

    col_table: dict[str, str] = {}
    ambiguous: set[str] = set()
    sizes: dict[str, int] = {}
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(path):
            continue
        sizes[t] = dir_bytes(path) if os.path.isdir(path) else os.path.getsize(path)
        for f in load(spark, sf_dir, t).schema.fields:
            if f.name in col_table and col_table[f.name] != t:
                ambiguous.add(f.name)
            col_table[f.name] = t
    for name in ambiguous:
        col_table.pop(name, None)
    return col_table, sizes


def advise_layout(
    spark,
    sf_dir: str,
    queries: list[DataFrame],
    buckets: int = 32,
    min_bytes: int = 0,
) -> dict[str, "LayoutSpec"]:
    """Recommend the bucket/sort layout a query set wants — the mechanism
    behind the clustered bench tier's hand-written spec (tools/clustered.py
    _SPECS), so "store it co-clustered" is an engine decision, not folklore.

    Reads each query's OPTIMIZED logical plan and tallies, per base table:
      * equi-join keys        (weight 3 per occurrence — a co-bucketed join
                               removes BOTH sides' exchanges),
      * window partition keys (weight 3 — bucketing removes the exchange
                               AND the bucket sort removes the window sort),
      * aggregate grouping keys (weight 1 — partial aggregation already
                               halves the shuffle, so layout helps less).
    The winning column per table becomes the bucket key; if a window
    partitions on that key, its order columns (same table only) extend the
    within-bucket sort — the hypertable shape (user_id, ts, event_id).
    Computed/aliased keys (e.g. q83's hour buckets) attribute to no base
    table and correctly advise nothing.

    Each entry of ``queries`` is a DataFrame or a ``(DataFrame, weight)``
    pair — weight models the query's frequency/cost share in the workload
    log, so one hourly dashboard query counts more than a monthly backfill.
    Conflicting workloads resolve by weighted vote: if custkey joins
    dominate orderkey joins on ``orders``, the advisor buckets by custkey
    — the advice tracks the workload, not a fixed prior.

    Column->table attribution is BY NAME against the sf_dir table schemas
    (this engine's data model prefixes every fact/dim column, so names are
    unambiguous; ambiguous names are dropped rather than guessed).  Tables
    whose on-disk size is below ``min_bytes`` are excluded — small dims
    broadcast, so clustering them buys nothing (the same judgment
    tools/clustered.py encodes as _FLAT_COPY).

    At 100 TB this runs as a planning step over the workload's query log;
    apply_layout materializes the verdict and the plan gates in
    tests/test_layout_advisor.py prove the advised layout reproduces the
    clustered tier's zero-exchange/zero-sort plans."""
    import re
    from collections import Counter, defaultdict

    col_table, sizes = _column_attribution(spark, sf_dir)
    attr = re.compile(r"(\w+)#\d+")
    weight: dict[str, Counter] = defaultdict(Counter)
    # (table, partition col) -> observed window order sequences
    win_orders: dict[tuple[str, str], Counter] = defaultdict(Counter)

    def bump(col: str, w: float) -> None:
        t = col_table.get(col)
        if t is not None:
            weight[t][col] += w

    for entry in queries:
        q, qw = entry if isinstance(entry, tuple) else (entry, 1.0)
        plan = q._jdf.queryExecution().optimizedPlan().toString()
        for line in plan.splitlines():
            s = line.lstrip(" +-:")
            if s.startswith("Join "):
                # either key may be cast-wrapped (type-promoted joins,
                # e.g. `cast(a#1 as bigint) = b#2`) — a bare-attr pattern
                # would silently drop those weight-3 votes
                for a, b in re.findall(
                    _CAST_ATTR + r"\s*=\s*" + _CAST_ATTR, s
                ):
                    bump(a, 3 * qw)
                    bump(b, 3 * qw)
            elif s.startswith("Window "):
                groups = _top_level_groups(s)
                if len(groups) >= 3:
                    parts = attr.findall(groups[-2])
                    order = [
                        m.group(1)
                        for m in re.finditer(r"(\w+)#\d+L? (?:ASC|DESC)", groups[-1])
                    ]
                    for p in parts:
                        bump(p, 3 * qw)
                        t = col_table.get(p)
                        if t is not None:
                            same_t = tuple(
                                o for o in order if col_table.get(o) == t
                            )
                            if same_t:
                                win_orders[(t, p)][same_t] += qw
            elif s.startswith("Aggregate "):
                groups = _top_level_groups(s)
                if groups:
                    for g in attr.findall(groups[0]):
                        bump(g, 1 * qw)

    out: dict[str, LayoutSpec] = {}
    for t, counts in weight.items():
        if sizes.get(t, 0) < min_bytes:
            continue
        # deterministic winner: highest weight, then name
        bucket_col = min(counts, key=lambda c: (-counts[c], c))
        sort_cols = (bucket_col,)
        orders = win_orders.get((t, bucket_col))
        if orders:
            best = min(orders, key=lambda o: (-orders[o], o))
            sort_cols = (bucket_col,) + tuple(
                o for o in best if o != bucket_col
            )
        out[t] = LayoutSpec(bucket_col=bucket_col, sort_cols=sort_cols, buckets=buckets)
    return out


def advise_zorder(
    spark,
    sf_dir: str,
    queries,
    min_cols: int = 2,
    max_cols: int = 3,
    min_bytes: int = 0,
) -> dict[str, tuple[str, ...]]:
    """The advisor's other half: Z-ORDER advice from range predicates.

    advise_layout targets shuffle removal (joins/windows/aggs); this
    targets SCAN removal.  It tallies the columns appearing in range
    comparisons (>, <, >=, <=) in each query's optimized plan — equality
    predicates are ignored (hash bucketing serves those) — and for any
    table with >= ``min_cols`` distinct range-filtered columns recommends
    the top-``max_cols`` (by workload weight) as a Z-order clustering,
    the multi-dimension file-skipping layout write_zordered produces.
    One sorted dimension prunes one predicate column and is blind on the
    rest; Morton interleaving makes range filters on ANY advised column
    skip files via footer min/max stats.

    Same conventions as advise_layout: entries are DataFrames or
    ``(DataFrame, weight)`` pairs, attribution is by unambiguous column
    name, small tables fall to ``min_bytes``.  Combine: tables that got a
    bucket spec keep it (their within-bucket sort already prunes the sort
    prefix); Z-order is for the scan-heavy tables the bucket advisor left
    flat."""
    import re
    from collections import Counter, defaultdict

    col_table, sizes = _column_attribution(spark, sf_dir)

    # Attribute on either side of the comparison (Catalyst usually
    # normalizes literals right, but not always), with the attribute
    # either bare or cast-wrapped — including paren-typed casts like
    # `cast(col#5 as decimal(12,4)) > 24.0` (_CAST_ATTR allows one nested
    # paren group in the type).  The right-side lookbehind keeps null-safe
    # equality `<=>` (an equality, bucketing's job) from donating its
    # trailing `>` as a fake range op.
    left = re.compile(r"\(" + _CAST_ATTR + r"\s*(?:>=|<=|>|<)\s")
    right = re.compile(r"(?<![<=>])(?:>=|<=|>|<)\s*" + _CAST_ATTR)
    weight: dict[str, Counter] = defaultdict(Counter)
    for entry in queries:
        q, qw = entry if isinstance(entry, tuple) else (entry, 1.0)
        plan = q._jdf.queryExecution().optimizedPlan().toString()
        seen: set[str] = set()
        for line in plan.splitlines():
            s = line.lstrip(" +-:")
            if s.startswith("Filter ") or s.startswith("Join "):
                seen.update(left.findall(s))
                seen.update(right.findall(s))
        for c in seen:  # per-query dedup: a BETWEEN is one vote, not two
            t = col_table.get(c)
            if t is not None:
                weight[t][c] += qw

    out: dict[str, tuple[str, ...]] = {}
    for t, counts in weight.items():
        if sizes.get(t, 0) < min_bytes:
            continue
        cols = sorted(counts, key=lambda c: (-counts[c], c))[:max_cols]
        if len(cols) >= min_cols:
            out[t] = tuple(cols)
    return out


def apply_layout(
    spark,
    sf_dir: str,
    out_dir: str,
    spec: dict[str, "LayoutSpec"],
    table_suffix: str = "_a",
    register: bool = True,
) -> None:
    """Materialize an advise_layout verdict: write each table bucketed and
    sorted per its spec and (optionally) register the catalog DDL that
    restores the zero-exchange property in this session."""
    import os

    from coldata_spark.tables import load

    for t, ls in spec.items():
        path = os.path.join(out_dir, t)
        write_bucketed(
            load(spark, sf_dir, t),
            path,
            bucket_col=ls.bucket_col,
            sort_cols=list(ls.sort_cols),
            buckets=ls.buckets,
        )
        if register:
            register_bucketed(
                spark,
                path,
                f"{t}{table_suffix}",
                bucket_col=ls.bucket_col,
                sort_cols=list(ls.sort_cols),
                buckets=ls.buckets,
            )


# Only long-castable columns can ride the Morton curve (zorder_key
# min/max-scales via cast('long'); strings/dates yield null and would
# crash the whole scheduled job after the bucket half already rewrote
# tables).  Exact names, not prefixes: startswith("int") also matched
# "interval ..." dtypes, whose cast('long') probe yields null; decimal
# carries "(p,s)" so it is matched on the name before the paren.
_Z_OK = {
    "tinyint", "smallint", "int", "bigint",
    "float", "double", "decimal", "timestamp",
    # ntz is long-castable exactly like ltz (micros value); the exact-name
    # fix must not narrow the gate past the interval bug it fixed — Spark 4
    # infers un-normalized parquet timestamps as TIMESTAMP_NTZ
    "timestamp_ntz",
}


def zorder_type_ok(dtype: str) -> bool:
    """True when a column of this Spark dtype can be a z-order dimension
    (advise_zorder tallies ANY range predicate — the materializer
    validates types here before committing to a rewrite)."""
    return dtype.split("(", 1)[0] in _Z_OK


def maintain_layout(
    spark,
    sf_dir: str,
    out_dir: str,
    queries,
    buckets: int = 32,
    min_bytes: int = 0,
    table_suffix: str = "_m",
    register: bool = True,
    zorder: bool = False,
    zorder_files: int = 8,
) -> dict:
    """The advisor as a MAINTENANCE JOB: advise over the current workload,
    rewrite only the tables whose prescription CHANGED since the last
    pass, re-register everything advised (bucket specs are catalog
    metadata — every fresh session needs the DDL even when no byte
    moved).  The materialized prescription persists in a
    ``_LAYOUT_SPEC.json`` sidecar next to the bucket dirs, so the
    idempotence is durable across sessions, exactly like the bench tier's
    marker files.

    With ``zorder=True`` the job owns BOTH advisor halves: tables that
    won a bucket spec get shuffle removal, and scan-heavy tables the
    bucket advisor left flat get advise_zorder's multi-dimension
    file-skipping layout (write_zordered), same sidecar drift rules.  A
    bucket spec wins when both halves advise the same table — its
    within-bucket sort already prunes the sort prefix, and one table
    can't hold two physical orders.  Z-ordered tables are plain parquet
    (footer min/max stats do the pruning, no catalog spec), so
    registration is a session temp view under the same
    ``<table><suffix>`` naming.

    This is the piece that makes layout a CONTINUOUS engine decision:
    drive it from scheduler.run_scheduled at the same cadence as the
    reference's crawl refresh and the storage follows the workload as it
    drifts — a new dominant join key triggers exactly one re-bucketing
    pass, a stable workload costs one advise + sidecar compare.

    The default ``table_suffix`` is ``_m`` (maintenance) — deliberately
    NOT the clustered bench tier's ``_c`` namespace, so a session that
    registered the tier's tables can run maintenance without the
    register step silently re-pointing the tier's catalog names.

    Returns ``{"advised": spec, "rewritten": [...], "reused": [...]}``
    (zorder entries appear in all three under the same table names, as
    ``{"zorder": [cols], "files": n}`` values in "advised").
    """
    import json
    import os

    from coldata_spark.tables import load

    spec = advise_layout(
        spark, sf_dir, queries, buckets=buckets, min_bytes=min_bytes
    )
    cur = {
        t: {
            "bucket_col": ls.bucket_col,
            "sort_cols": list(ls.sort_cols),
            "buckets": ls.buckets,
        }
        for t, ls in spec.items()
    }
    if zorder:
        for t, cols in advise_zorder(
            spark, sf_dir, queries, min_bytes=min_bytes
        ).items():
            if t in cur:  # bucket spec wins where both halves advise
                continue
            dtypes = dict(load(spark, sf_dir, t).dtypes)
            keep = [c for c in cols if zorder_type_ok(dtypes.get(c, ""))]
            if len(keep) >= 2:  # one dimension is a plain sort, not zorder
                cur[t] = {"zorder": keep, "files": zorder_files}
    os.makedirs(out_dir, exist_ok=True)
    sidecar = os.path.join(out_dir, "_LAYOUT_SPEC.json")
    try:
        with open(sidecar) as f:
            prev = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        prev = {}
    # self-heal: the FILESYSTEM is the truth, the sidecar is a cache — a
    # spec match with a missing bucket dir (partial restore, cleanup)
    # must rewrite, not report "reused" and fail registration forever
    changed = sorted(
        t
        for t in cur
        if prev.get(t) != cur[t] or not os.path.isdir(os.path.join(out_dir, t))
    )
    reused = sorted(t for t in cur if t not in changed)
    bucket_changed = {t for t in changed if "bucket_col" in cur[t]}
    if bucket_changed:
        if register:
            # advice can flip zorder -> bucket: a stale session temp view
            # would shadow the catalog table apply_layout registers
            for t in bucket_changed:
                try:
                    spark.catalog.dropTempView(f"{t}{table_suffix}")
                except Exception:
                    pass
        apply_layout(
            spark,
            sf_dir,
            out_dir,
            {t: spec[t] for t in bucket_changed},
            table_suffix=table_suffix,
            register=register,
        )
    for t in changed:
        if t in bucket_changed:
            continue
        write_zordered(
            load(spark, sf_dir, t),
            os.path.join(out_dir, t),
            cur[t]["zorder"],
            n_files=cur[t]["files"],
        )
    # merge over prev: a table the CURRENT query log happens not to
    # mention keeps its sidecar entry while its materialized dir exists,
    # so returning to the workload with an unchanged spec costs zero
    # rewrites instead of a needless full re-bucketing
    merged = {
        t: v
        for t, v in prev.items()
        if t not in cur and os.path.isdir(os.path.join(out_dir, t))
    }
    if register:
        # one registration pass over everything apply_layout didn't just
        # register itself: reused tables (bucket specs are catalog
        # metadata — every fresh session needs the DDL even when no byte
        # moved), freshly-zordered tables (write_zordered registers
        # nothing), AND sidecar-retained gap tables (workload gap: dir
        # kept, spec preserved, absent from the CURRENT query log — a
        # fresh session running maintenance mid-gap would otherwise lack
        # the `<table><suffix>` entry until the workload returns)
        regs = {t: cur[t] for t in reused}
        regs.update({t: cur[t] for t in changed if t not in bucket_changed})
        regs.update(merged)
        for t, v in sorted(regs.items()):
            name = f"{t}{table_suffix}"
            if "bucket_col" in v:
                try:  # see the zorder->bucket shadowing note above
                    spark.catalog.dropTempView(name)
                except Exception:
                    pass
                register_bucketed(
                    spark,
                    os.path.join(out_dir, t),
                    name,
                    bucket_col=v["bucket_col"],
                    sort_cols=list(v["sort_cols"]),
                    buckets=v["buckets"],
                )
            else:
                # advice can also flip bucket -> zorder: the catalog
                # table a previous bucket pass registered would resolve
                # for qualified names (default.<name>) and in fresh
                # sessions over the now-plain-parquet files ("Invalid
                # bucket file") — drop it before the view takes over
                spark.sql(f"DROP TABLE IF EXISTS {name}")
                spark.read.parquet(
                    os.path.join(out_dir, t)
                ).createOrReplaceTempView(name)
    merged.update(cur)
    with open(sidecar, "w") as f:
        json.dump(merged, f, indent=2, sort_keys=True)
    return {"advised": cur, "rewritten": changed, "reused": reused}


def compact_parquet_dir(
    spark,
    src: str,
    dst: str,
    target_bytes: int = 128 << 20,
) -> dict:
    """Small-file compaction (Delta OPTIMIZE / Iceberg rewrite_data_files
    equivalent): rewrite a fragmented parquet directory into
    ceil(total_bytes / target_bytes) files of ~target size.

    Small files are the classic slow death of a 100 TB table — every one
    costs a scan task, a footer read and a namenode entry, and streaming
    sinks (streaming/vectors.py, upsert batches) produce them constantly.
    Compaction here is a pure coalesce write: ``coalesce`` merges input
    splits WITHOUT a shuffle (unlike repartition, which would move every
    row over the network just to change file counts), so the maintenance
    job's cost is one read + one write.  Returns a before/after audit.
    """
    import math
    import os

    from coldata_spark.session import dir_bytes

    def _file_count(path: str) -> int:
        n = 0
        for _root, _dirs, files in os.walk(path):
            n += sum(1 for f in files if f.endswith(".parquet"))
        return n

    if os.path.realpath(dst) == os.path.realpath(src):
        raise ValueError(
            f"compact_parquet_dir: dst == src ({src}) — overwrite-writing "
            "the directory being lazily read would destroy the source; "
            "compact into a fresh dir and swap afterwards"
        )
    total = dir_bytes(src)
    n_out = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(src)
    df.coalesce(n_out).write.mode("overwrite").parquet(dst)
    return {
        "files_before": _file_count(src),
        "files_after": _file_count(dst),
        "bytes_before": total,
        "bytes_after": dir_bytes(dst),
        "target_files": n_out,
    }
