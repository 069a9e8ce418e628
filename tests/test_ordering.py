"""deterministic_shuffle: the distributed global-sequence operator must
reproduce the semantic spec (row_number over the seeded md5 permutation)
exactly, for any partition count, with no global window in the plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from coldata_spark.operators.ordering import deterministic_shuffle
from coldata_spark.tables import load


def _spec_order(spark, df, id_col, seed):
    """The semantic spec, allowed to use the global window at test scale."""
    from pyspark.sql import Window as W

    sigma = F.md5(F.concat(F.lit(seed), F.lit("|"), F.col(id_col).cast("string")))
    w = W.orderBy(sigma, id_col)
    return df.select(id_col, (F.row_number().over(w) - 1).alias("seq"))


def test_shuffle_is_exact_permutation(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    out = deterministic_shuffle(docs, "doc_id", seed="s1")
    seqs = sorted(r["seq"] for r in out.select("seq").collect())
    assert seqs == list(range(n))


def test_shuffle_matches_global_spec(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id")
    got = {
        r["doc_id"]: r["seq"]
        for r in deterministic_shuffle(docs, "doc_id", seed="s2").collect()
    }
    want = {
        r["doc_id"]: r["seq"]
        for r in _spec_order(spark, docs, "doc_id", "s2").collect()
    }
    assert got == want


def test_shuffle_stable_across_partition_counts(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id")
    a = {
        r["doc_id"]: r["seq"]
        for r in deterministic_shuffle(
            docs, "doc_id", seed="s3", num_partitions=3
        ).collect()
    }
    b = {
        r["doc_id"]: r["seq"]
        for r in deterministic_shuffle(
            docs.repartition(7), "doc_id", seed="s3", num_partitions=17
        ).collect()
    }
    assert a == b


def test_shuffle_seed_changes_order(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id")
    a = {
        r["doc_id"]: r["seq"]
        for r in deterministic_shuffle(docs, "doc_id", seed="sA").collect()
    }
    b = {
        r["doc_id"]: r["seq"]
        for r in deterministic_shuffle(docs, "doc_id", seed="sB").collect()
    }
    assert a != b  # 500+ docs: identical permutations would be a bug


def test_shuffle_plan_has_no_global_window(spark, sf_dir):
    """The whole point: every Window in the physical plan must be
    partitioned (partition-local row_number), never empty-partition
    (global single-task funnel)."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    out = deterministic_shuffle(docs, "doc_id", seed="s4")
    plan = out._jdf.queryExecution().executedPlan().toString()
    saw_window = False
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            saw_window = True
            assert "_bucket" in line, f"global window in plan: {line}"
    # not vacuous: a refactor that drops/renames the Window operator must
    # fail here, not silently pass (mirrors the q169 plan test)
    assert saw_window, "expected a partitioned Window operator in the plan"

def test_shuffle_empty_input(spark):
    """Empty batch (e.g. a filter that selects nothing) must return an
    empty frame with the seq column, not crash on schema inference from
    an empty offsets list (round-6 review finding)."""
    docs = spark.createDataFrame([], "doc_id BIGINT")
    out = deterministic_shuffle(docs, "doc_id", seed="s5")
    assert out.columns == ["doc_id", "seq"]
    assert out.count() == 0


def test_shuffle_null_ids_do_not_crash(spark):
    """NULL ids hash to one sigma bucket instead of propagating a NULL
    bucket key into the driver-side cumulative sum (round-6 review
    finding).  Sequence numbers must still be an exact permutation."""
    docs = spark.createDataFrame(
        [(1,), (2,), (None,), (None,), (5,)], "doc_id BIGINT"
    )
    out = deterministic_shuffle(docs, "doc_id", seed="s6").collect()
    assert sorted(r["seq"] for r in out) == list(range(5))
    # non-null ids still match the spec permutation computed the same way
    by_id = {r["doc_id"]: r["seq"] for r in out if r["doc_id"] is not None}
    assert len(by_id) == 3
