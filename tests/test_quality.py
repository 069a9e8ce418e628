"""operators/quality.py — declarative constraints: audit counts, the
quarantine split invariant, NULL three-valued-logic, and the one-scan
plan shape for row rules."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from coldata_spark.operators import quality as Q


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "alice", 10, "en"),
            (2, "bob", 200, "en"),
            (3, None, 30, "de"),
            (4, "dave", None, "xx"),
            (5, "eve", -1, None),
            (5, "eve2", 7, "en"),  # duplicate id
        ],
        "id BIGINT, name STRING, score BIGINT, lang STRING",
    )


def _counts(df):
    return {r["rule"]: (r["violations"], r["checked"]) for r in df.collect()}


def test_audit_counts_every_rule_kind(spark, frame):
    dim = spark.createDataFrame([("en",), ("de",)], "code STRING")
    got = _counts(
        Q.audit(
            frame,
            [
                Q.not_null("name"),
                Q.in_range("score", 0, 100),
                Q.in_set("lang", ["en", "de"]),
                Q.matches("name", "^[a-z]+$"),
                Q.unique(["id"]),
                Q.foreign_key("lang", dim, "code"),
            ],
        )
    )
    assert got["not_null(name)"] == (1, 6)
    # NULL score passes in_range (3VL); 200 and -1 violate
    assert got["in_range(score,0,100)"] == (2, 6)
    # NULL lang passes in_set; 'xx' violates
    assert got["in_set(lang)"] == (1, 6)
    # NULL name passes matches; 'eve2' violates the regex
    assert got["matches(name)"] == (1, 6)
    # BOTH rows of the duplicated id count as violations
    assert got["unique(id)"] == (2, 6)
    # fk: NULL lang skipped; 'xx' missing from the dim
    assert got["fk(lang->code)"] == (1, 6)


def test_quarantine_split_is_complementary(frame):
    rules = [Q.not_null("name"), Q.in_range("score", 0, 100)]
    clean, bad = Q.quarantine(frame, rules)
    n_clean, n_bad = clean.count(), bad.count()
    assert n_clean + n_bad == frame.count()
    # clean side carries no extra column and no violating row
    assert clean.columns == frame.columns
    assert clean.filter(F.col("name").isNull()).count() == 0
    # bad side names its failures in declaration order
    viols = {r["id"]: r["_violations"] for r in bad.collect()}
    assert viols[3] == "not_null(name)"
    assert viols[2] == "in_range(score,0,100)"
    assert viols[5] == "in_range(score,0,100)"  # the -1 row


def test_row_rules_share_one_scan(frame):
    """Any number of row rules must audit in a single aggregate over a
    single scan: exactly one Scan node and no shuffle Exchange beyond
    the one-row final aggregate's."""
    plan = Q.audit(
        frame,
        [
            Q.not_null("name"),
            Q.in_range("score", 0, 100),
            Q.in_set("lang", ["en", "de"]),
            Q.matches("name", "^[a-z]+$"),
        ],
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") == 1, plan


def test_rule_validation(frame, spark):
    """Fail fast with the reason: empty rule sets, duplicate names, and
    names that would break the stack() literal or the ';' list."""
    with pytest.raises(ValueError, match="at least one rule"):
        Q.audit(frame, [])
    with pytest.raises(ValueError, match="quote, backtick or ';'"):
        Q.audit(frame, [Q.expr_rule("price's positive", "score > 0")])
    dim = spark.createDataFrame([("en",), ("de",)], "code STRING")
    with pytest.raises(ValueError, match="duplicate rule name"):
        Q.audit(
            frame,
            [Q.foreign_key("lang", dim, "code"),
             Q.foreign_key("lang", dim, "code")],
        )
    # distinct dim_name labels make the same col->key pair legal
    got = _counts(
        Q.audit(
            frame,
            [Q.foreign_key("lang", dim, "code", dim_name="v1"),
             Q.foreign_key("lang", dim.limit(1), "code", dim_name="v2")],
        )
    )
    assert got["fk(lang->v1)"][0] <= got["fk(lang->v2)"][0]
    # a pre-existing marker column must not be silently overwritten
    marked = Q.with_violations(frame, [Q.not_null("name")])
    with pytest.raises(ValueError, match="already exists"):
        Q.with_violations(marked, [Q.not_null("name")])


def test_audit_empty_table_reports_zero(spark):
    empty = spark.createDataFrame([], "id BIGINT, name STRING")
    got = _counts(Q.audit(empty, [Q.not_null("name"), Q.unique(["id"])]))
    assert got["not_null(name)"] == (0, 0)
    assert got["unique(id)"] == (0, 0)


def test_violation_list_splits_losslessly(spark):
    """Generated rule names contain commas (in_range(col,lo,hi)); the
    ';' separator must split the list back into exact rule names."""
    df = spark.createDataFrame([(None, 500)], "name STRING, score BIGINT")
    rules = [Q.not_null("name"), Q.in_range("score", 0, 100)]
    row = Q.with_violations(df, rules).collect()[0]
    assert row["_violations"].split(";") == [
        "not_null(name)", "in_range(score,0,100)"
    ]


def test_stream_quality_monitor_equals_batch(spark, sf_dir, tmp_path):
    """streaming/quality.py: per-batch audits fold additively into the
    monitor table; the folded counts equal the batch audit over
    everything ingested; replayed batch ids are no-ops; non-additive
    rule kinds are rejected with the reason."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from coldata_spark.streaming import quality as SQ
    from coldata_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    rules = [
        Q.not_null("text"),
        Q.expr_rule("min_length", "n_chars >= 200"),
        Q.in_set("lang", ["en", "de", "fr"]),
    ]
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)

    in_dir = tmp_path / "q_in"
    in_dir.mkdir()
    table = str(tmp_path / "q_monitor")
    ckpt = str(tmp_path / "q_ckpt")

    def expected(df):
        return {
            (r.rule, r.violations, r.checked)
            for r in Q.audit(df, rules).collect()
        }

    def src():
        return spark.readStream.schema(docs.schema).parquet(str(in_dir) + "/*")

    first.write.parquet(str(in_dir / "drop0"))
    SQ.stream_quality_monitor(src(), rules, table, ckpt)
    got = {
        (r.rule, r.violations, r.checked)
        for r in spark.read.parquet(table).collect()
    }
    assert got == expected(first)

    # replayed batch id: no double-count (fold_once sentinel)
    SQ.fold_into_quality(SQ.quality_partial(first, rules), table, batch_id=0)
    assert {
        (r.rule, r.violations, r.checked)
        for r in spark.read.parquet(table).collect()
    } == got

    # a later drop accumulates; folded == batch audit over the union
    second.write.parquet(str(in_dir / "drop1"))
    SQ.stream_quality_monitor(src(), rules, table, ckpt)
    assert {
        (r.rule, r.violations, r.checked)
        for r in spark.read.parquet(table).collect()
    } == expected(docs)

    # non-additive kinds are refused, not silently mis-folded
    with _pytest.raises(ValueError, match="batch audit over the merged"):
        SQ.quality_partial(docs, rules + [Q.unique(["doc_id"])])


def test_dataset_rules_verdicts_and_measurements(spark, frame):
    """Dataset rules report (verdict 0/1, measurement) with integer ppm
    arithmetic; bounds are inclusive; they fold into the same audit."""
    got = _counts(
        Q.audit(
            frame,
            [
                Q.row_count_between(1, 10),        # 6 rows -> pass
                Q.row_count_between(10, 20),       # fail low
                Q.null_fraction_ppm_max("name", 200_000),  # 1/6 -> 166666
                Q.null_fraction_ppm_max("lang", 100_000),  # 1/6 -> fail
                Q.distinct_ratio_ppm_between("id", 900_000, 1_000_000),
            ],
        )
    )
    assert got["row_count(1,10)"] == (0, 6)
    assert got["row_count(10,20)"] == (1, 6)
    assert got["null_ppm(name,200000)"] == (0, 166_666)
    assert got["null_ppm(lang,100000)"] == (1, 166_666)
    # 5 distinct ids over 6 rows = 833333 ppm -> below the band
    assert got["distinct_ppm(id,900000,1000000)"] == (1, 833_333)


def test_dataset_rules_share_the_one_scan(frame):
    """Adding dataset rules (incl. a distinct_ppm, which routes through
    Spark's multi-distinct Expand) must not add a table scan."""
    plan = Q.audit(
        frame,
        [
            Q.not_null("name"),
            Q.row_count_between(1, 10),
            Q.null_fraction_ppm_max("name", 0),
            Q.distinct_ratio_ppm_between("lang", 1, 1_000_000),
        ],
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") == 1, plan


def test_dataset_rules_empty_table(spark):
    """Empty table: ratio measurements define to 0 (no divide-by-zero);
    row_count bounds still judge the 0."""
    empty = spark.createDataFrame([], "id BIGINT, name STRING")
    got = _counts(
        Q.audit(
            empty,
            [
                Q.row_count_between(1, 10),
                Q.null_fraction_ppm_max("name", 0),
                Q.distinct_ratio_ppm_between("id", 1, 10),
            ],
        )
    )
    assert got["row_count(1,10)"] == (1, 0)
    assert got["null_ppm(name,0)"] == (0, 0)
    assert got["distinct_ppm(id,1,10)"] == (1, 0)


def test_dataset_rules_not_quarantinable(frame):
    """A dataset rule has no per-row verdict — quarantine must refuse it
    with the reason, not crash on a missing attribute."""
    with pytest.raises(ValueError, match="no per-row verdict"):
        Q.with_violations(frame, [Q.row_count_between(1, 10)])
    with pytest.raises(ValueError, match="no per-row verdict"):
        Q.quarantine(frame, [Q.not_null("name"), Q.unique(["id"])])


def test_stream_monitor_additive_dataset_rules(spark, sf_dir, tmp_path):
    """row_count / null_ppm expectations fold across micro-batches as
    additive components; dataset_verdicts over the folded monitor equals
    the batch audit over everything ingested.  distinct_ppm is refused
    with the reason."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from coldata_spark.streaming import quality as SQ
    from coldata_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    rules = [
        Q.not_null("text"),
        Q.row_count_between(1, 100),       # fails once >100 rows arrive
        Q.null_fraction_ppm_max("text", 0),
    ]
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    table = str(tmp_path / "ds_monitor")

    SQ.fold_into_quality(SQ.quality_partial(first, rules), table, batch_id=0)
    SQ.fold_into_quality(SQ.quality_partial(second, rules), table, batch_id=1)

    folded = SQ.dataset_verdicts(spark.read.parquet(table), rules)
    got = {(r.rule, r.violations, r.checked) for r in folded.collect()}
    want = {
        (r.rule, r.violations, r.checked)
        for r in Q.audit(docs, rules).collect()
    }
    assert got == want

    with _pytest.raises(ValueError, match="distinct count"):
        SQ.quality_partial(
            docs, rules + [Q.distinct_ratio_ppm_between("lang", 1, 10)]
        )


def test_stream_monitor_validates_rules(spark):
    """Round-11 review: quality_partial stopped routing through audit()
    and lost _check_rules — a duplicate rule name would silently merge
    two rules' counts into one corrupted monitor row.  The monitor path
    must fail fast like the batch audit."""
    import pytest as _pytest

    from coldata_spark.streaming import quality as SQ

    df = spark.createDataFrame([(1, "a")], "id BIGINT, name STRING")
    with _pytest.raises(ValueError, match="duplicate rule name"):
        SQ.quality_partial(df, [Q.not_null("name"), Q.not_null("name")])
    with _pytest.raises(ValueError, match="quote, backtick"):
        SQ.quality_partial(df, [Q.expr_rule("bad'name", "id > 0")])


def test_audit_table_stats_is_footer_only_and_equal(spark, sf_dir):
    """audit_table_stats answers row_count/null_ppm from parquet footer
    statistics: the scan must carry PushedAggregation (no data pages),
    verdicts must equal audit()'s bit-for-bit, and value-needing rules
    are refused with the reason."""
    import os

    from coldata_spark.tables import load

    path = os.path.join(sf_dir, "documents.parquet")
    rules = [
        Q.row_count_between(1, 100),          # fails
        Q.row_count_between(1, 10_000_000),   # passes
        Q.null_fraction_ppm_max("text", 0),
    ]
    got = {
        (r.rule, r.violations, r.checked)
        for r in Q.audit_table_stats(spark, path, rules).collect()
    }
    want = {
        (r.rule, r.violations, r.checked)
        for r in Q.audit(spark.read.parquet(path), rules).collect()
    }
    assert got == want

    # the plan the fast path builds must actually push the aggregates
    with Q._aggregate_pushdown(spark):
        import pyspark.sql.functions as F

        plan = (
            spark.read.parquet(path)
            .agg(F.count(F.lit(1)), F.count("text"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    assert "PushedAggregation" in plan, plan[:500]
    # confs restored after the scope
    assert spark.conf.get("spark.sql.parquet.aggregatePushdown") == "false"

    with pytest.raises(ValueError, match="need\nrow values|need row values"):
        Q.audit_table_stats(spark, path, rules + [Q.not_null("text")])
    with pytest.raises(ValueError, match="row values"):
        Q.audit_table_stats(
            spark, path, rules + [Q.distinct_ratio_ppm_between("lang", 1, 9)]
        )


def test_hll_register_monitor_stream_equals_batch(spark, sf_dir, tmp_path):
    """distinct_ratio_ppm_hll is the ONE streamable distinct expectation:
    per-batch registers max-merge exactly, so the folded monitor's
    verdicts equal the batch audit bit-for-bit; replayed batch ids are
    no-ops; non-hll rules are refused from the register path."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from coldata_spark.streaming import quality as SQ
    from coldata_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    rules = [
        Q.distinct_ratio_ppm_hll("doc_id", 800_000, 1_200_000),
        Q.distinct_ratio_ppm_hll("n_chars", 1, 10),
    ]
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "hll_regs")
    SQ.fold_into_quality_hll(SQ.hll_partial(a, rules), path, 0)
    SQ.fold_into_quality_hll(SQ.hll_partial(b, rules), path, 1)
    SQ.fold_into_quality_hll(SQ.hll_partial(a, rules), path, 0)  # replay
    regs = spark.read.parquet(path)
    got = {
        tuple(r)
        for r in SQ.hll_verdicts(regs, rules, docs.count()).collect()
    }
    want = {(r.rule, r.violations, r.checked) for r in Q.audit(docs, rules).collect()}
    assert got == want
    # register monitor table is bounded: <= 256 rows per rule
    assert regs.count() <= 256 * len(rules)
    # the availableNow wrapper folds the same registers exactly-once
    in_dir = tmp_path / "hll_in"
    in_dir.mkdir()
    docs.write.parquet(str(in_dir / "drop0"))
    stream = spark.readStream.schema(docs.schema).parquet(str(in_dir) + "/*")
    wrapped = str(tmp_path / "hll_regs_stream")
    SQ.stream_hll_monitor(stream, rules, wrapped, str(tmp_path / "hll_ckpt"))
    got_w = {
        tuple(r)
        for r in SQ.hll_verdicts(
            spark.read.parquet(wrapped), rules, docs.count()
        ).collect()
    }
    assert got_w == want
    with _pytest.raises(ValueError, match="distinct_hll"):
        SQ.hll_partial(docs, [Q.row_count_between(1, 10)])
    # the count monitor still refuses the exact kind with the reason
    with _pytest.raises(ValueError, match="distinct count"):
        SQ.quality_partial(docs, [Q.distinct_ratio_ppm_between("lang", 1, 9)])


def test_commit_if_clean_gates_the_versioned_table(spark, tmp_path):
    """The refresh gate: a clean batch commits and becomes latest; a dirty
    batch is REFUSED — the table's latest version stays the last clean
    one and the report names the firing rules."""
    from coldata_spark.operators.table import VersionedTable

    t = VersionedTable(str(tmp_path / "gated"))
    clean = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id BIGINT, name STRING"
    )
    rules = [Q.not_null("name"), Q.row_count_between(1, 10)]
    v0, report = Q.commit_if_clean(t, clean, rules)
    assert v0 == 0 and all(v == 0 for _, v, _ in report)

    dirty = spark.createDataFrame(
        [(3, None)] * 20, "id BIGINT, name STRING"
    )
    v1, report = Q.commit_if_clean(t, dirty, rules)
    assert v1 is None
    fired = {name for name, v, _ in report if v}
    assert fired == {"not_null(name)", "row_count(1,10)"}
    # latest readable version is still the clean one
    assert t.latest_version() == 0
    assert t.read(spark, 0).count() == 2
