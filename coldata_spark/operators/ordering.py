"""Deterministic global ordering / training-order shuffle.

A training pipeline needs a REPRODUCIBLE global shuffle of the corpus
(same seed => same order, on any cluster size) plus a contiguous sequence
number per example (to slice epochs / resume mid-stream / shard round-robin
across data-loader workers).  Reference parity: the reference feeds its
collection to consumers in insertion order (mongodb.py cursor iteration);
this operator supplies the published-pipeline upgrade — a seeded
permutation — the way a distributed engine has to.

The naive Spark form is ``row_number() OVER (ORDER BY hash)`` — a GLOBAL
window that funnels every row through one partition, the exact anti-pattern
SCALE.md bans.  The scalable form used here:

1. permutation key ``sigma = md5(seed || '|' || id)`` — uniform,
   deterministic, collision-free per distinct id in practice (128-bit);
2. STATIC range bucketing: ``bucket = u32(sigma[:8]) * P div 2^32``.
   md5 is uniform, so buckets are balanced without sampling — and unlike
   ``repartitionByRange`` (whose reservoir-sampled boundaries depend on
   the RDD instance) the bucket of a row is a pure function of its id,
   so recomputing any stage can never disagree with the count pass below.
   Buckets are ORDERED intervals of sigma-space: every sigma in bucket b
   sorts before every sigma in bucket b+1;
3. per-bucket counts -> driver cumulative sum (P longs, not rows) ->
   broadcast offsets;
4. ``row_number()`` PARTITION-LOCAL within each bucket, plus the bucket's
   offset = the exact global 0-based sequence number.

Total cost: one tiny count aggregate + one bucket-hash shuffle for the
window — the zipWithIndex shape, expressed in DataFrame ops so the main
pass stays in whole-stage codegen, with no persist/caching dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_sigma_bucket(
    df: DataFrame, id_col: str, seed: str, parts: int
) -> DataFrame:
    # coalesce: a NULL id must still hash to a bucket (concat is
    # null-propagating, and a NULL bucket key would crash the driver-side
    # cumulative sum).  All NULL ids share one sigma; their mutual order
    # is tie-broken by id_col only, i.e. not reproducible between them —
    # use a real unique key for meaningful permutations.
    sigma = F.md5(
        F.concat(
            F.lit(seed),
            F.lit("|"),
            F.coalesce(F.col(id_col).cast("string"), F.lit("")),
        )
    )
    # first 8 hex chars as u32; bucket boundaries are exact sigma-order
    # intervals because the prefix is the most significant 32 bits
    u32 = F.conv(F.substring(sigma, 1, 8), 16, 10).cast("bigint")
    bucket = ((u32 * parts) / F.lit(float(1 << 32))).cast("int")
    return df.withColumn("_sigma", sigma).withColumn("_bucket", bucket)


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    seed: str = "0",
    num_partitions: int | None = None,
    seq_col: str = "seq",
) -> DataFrame:
    """Return ``df`` with ``seq_col`` = exact 0-based position under the
    seeded global permutation ``order by (md5(seed || '|' || id), id)``.
    No global window; the count pass moves one long per bucket.

    PRECONDITION: ``df`` must be deterministic across re-evaluations — the
    count pass and the sequence pass each recompute the input, so a row set
    that differs between executions (``sample()`` without a seed, rand-based
    filters, source files mutating mid-job) yields stale counts.  Rows whose
    bucket never appeared in the count pass are caught by a fail-fast guard
    (``raise_error`` on a null joined offset) rather than silently dropped;
    rows *missing* relative to the count pass shift later seq numbers and
    cannot be detected here — persist such inputs first."""
    spark = df.sparkSession
    parts = num_partitions or spark.sparkContext.defaultParallelism
    keyed = _with_sigma_bucket(df, id_col, seed, parts)
    counts = {
        r["_bucket"]: r["n"]
        for r in keyed.groupBy("_bucket").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = [], 0
    for b in sorted(counts):
        offsets.append((b, acc))
        acc += counts[b]
    # explicit schema: createDataFrame cannot infer types from an empty
    # list (offsets == [] when df itself is empty)
    off_df = spark.createDataFrame(offsets, "_bucket INT, _off BIGINT")
    # id tie-break keeps the order total even under a (cosmically unlikely)
    # md5 collision, and makes the oracle's ORDER BY fully deterministic
    w = Window.partitionBy("_bucket").orderBy("_sigma", id_col)
    # LEFT join + assert_true: an inner join would silently drop any row
    # whose bucket was absent from the count pass (only possible when the
    # input violates the determinism precondition above) — fail loudly.
    guarded_off = F.coalesce(
        F.col("_off"),
        F.raise_error(
            F.lit(
                "deterministic_shuffle: row landed in a bucket absent from "
                "the count pass — input row set is non-deterministic across "
                "re-evaluations; persist() the input first"
            )
        ).cast("bigint"),
    )
    return (
        keyed.join(F.broadcast(off_df), "_bucket", "left")
        .withColumn(
            seq_col,
            (F.row_number().over(w) - 1 + guarded_off).cast("long"),
        )
        .drop("_sigma", "_bucket", "_off")
    )
