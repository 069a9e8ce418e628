"""tools/clustered.py — the co-clustered bench tier machinery, validated
at test scale: the builder writes one file per bucket, a FRESH-style DDL
re-registration yields zero-exchange plans, and the clustered query twins
return exactly what the registered flat-layout queries return."""

from __future__ import annotations

import os

import pytest

from coldata_spark import registry
from tools import clustered as CL


@pytest.fixture(scope="module")
def clustered_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("clus"))
    CL.build_clustered_fixture(spark, sf_dir, out, buckets=4)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    CL.register_clustered(spark, out, buckets=4)
    yield out
    for name in CL._SPECS:
        spark.sql(f"DROP TABLE IF EXISTS {name}_c")
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
    )


def test_one_file_per_bucket(clustered_dir):
    """The sorted-scan flag is only safe with single-file buckets; the
    builder must guarantee it."""
    for name in CL._SPECS:
        files = [
            f
            for f in os.listdir(os.path.join(clustered_dir, name))
            if f.endswith(".parquet") and not f.startswith(".")
        ]
        assert len(files) == 4, f"{name}: {len(files)} files for 4 buckets"


def test_clustered_plans_have_no_shuffle_or_sort(spark, clustered_dir):
    """q02: zero shuffle exchanges (broadcast of the dim is fine), zero
    sorts (bucket sort feeds the SMJ); q116: zero exchanges entirely."""
    import re

    q02 = CL.q02_clustered(spark, clustered_dir)
    plan = q02._jdf.queryExecution().executedPlan().toString()
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
    assert not re.search(r"\+- Sort ", plan), "bucket sort must be reused"

    q116 = CL.q116_clustered(spark, clustered_dir)
    plan = q116._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert not re.search(r"\+- Sort ", plan)


def test_clustered_results_match_flat(spark, sf_dir, clustered_dir):
    """Same rows as the registered flat-layout queries on the same data."""
    specs = registry.specs()
    for name, fn in {
        **CL.CLUSTERED_QUERIES,
        **CL.CLUSTERED_JOIN_QUERIES,
    }.items():
        got = sorted(map(tuple, fn(spark, clustered_dir).collect()))
        want = sorted(map(tuple, specs[name].fn(spark, sf_dir).collect()))
        assert got == want, f"{name} diverges from flat layout"


def test_clustered_join_twins_no_fact_exchange(spark, clustered_dir):
    """r13 verdict asks #3/#5: on the orderkey-clustered layout the
    q56/q68/q77/q148 fact-fact join must be zero-exchange — no Exchange
    keyed on the bucket key anywhere in the plan (downstream aggregates
    exchange on their own small group keys, which is fine).  Round 15:
    the join may be sort-merge OR shuffled-hash — q77's twin hash-builds
    the pruned ord_eu side (verdict ask #4; both shapes consume the
    bucketed distribution without an exchange).  Auto-broadcast is
    disabled so tiny test inputs cannot hide the join shape; the
    dimension broadcasts are explicit hints and survive."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name, fn in CL.CLUSTERED_JOIN_QUERIES.items():
            plan = fn(spark, clustered_dir)._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, (
                f"{name}: expected a non-broadcast co-partitioned join\n{plan}"
            )
            for key in ("l_orderkey", "o_orderkey"):
                assert f"hashpartitioning({key}" not in plan, (
                    f"{name}: fact exchange on {key} — bucketing not used\n{plan}"
                )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_duck_views_cover_clustered_query_tables(clustered_dir):
    for t in CL.DUCK_VIEWS:
        assert os.path.isdir(os.path.join(clustered_dir, t))


def test_tier_is_advisor_built(clustered_dir):
    """Round-7 verdict ask #5: the tier's layout must be the ADVISOR's
    output end-to-end — the sidecar the builder persisted (and which
    register_clustered consumes) must carry exactly the documented spec,
    derived, not hand-written."""
    import json

    with open(os.path.join(clustered_dir, CL._SIDECAR)) as f:
        spec = json.load(f)
    assert set(spec) == set(CL._SPECS)
    for name, (key, sort_keys) in CL._SPECS.items():
        assert spec[name]["bucket_col"] == key
        assert spec[name]["sort_cols"] == sort_keys
        assert spec[name]["buckets"] == 4


def test_deep_tier_builders_skip_source_when_cached(spark, tmp_path, monkeypatch):
    """Round-9 review: a valid cached deep tier must NOT trigger a
    multi-GB 256x source replication — the source dependency is resolved
    inside the builder, only when the derived tier's own marker is
    missing/stale."""
    import tools.replicate as R
    from tools.clustered import build_embeddings_tier, build_events_tier

    out_e = tmp_path / "emb_tier"
    out_v = tmp_path / "ev_tier"
    src_sf = tmp_path / "src_sf"  # static source: stamped ONCE, never mutated
    out_e.mkdir(), out_v.mkdir(), src_sf.mkdir()
    (src_sf / "some.parquet").write_bytes(b"x")
    # current-format markers: source content version folded in, so the
    # validity check never needs the intermediate 256x dir (embeddings
    # deep stamp is v3 since the round-13 replica isometry; events stayed
    # v3 from round 12 — untouched by the perturbation)
    (out_e / "_OK").write_text(f"v3|4|{R.source_stamp(str(src_sf))}")
    (out_v / "_OK").write_text(f"v3|4|{R.source_stamp(str(src_sf))}")

    def boom(*a, **k):
        raise AssertionError("source replicated despite a valid tier cache")

    monkeypatch.setattr(R, "replicate_fixture", boom)
    # source tier dir doesn't even exist — the cached marker must win
    missing_src = str(tmp_path / "no_such_256x")
    assert build_embeddings_tier(
        spark, missing_src, str(out_e), replicas=4, sf_dir=str(src_sf)
    ) == str(out_e)
    assert build_events_tier(
        spark, missing_src, str(out_v), replicas=4, sf_dir=str(src_sf)
    ) == str(out_v)


def test_jitter_wrapped_never_crosses_a_second(spark):
    """The replica jitter must stay inside each event's own second for
    ANY base data — the adversarial case that crashed the round-10 bench
    (base timestamps with ~zero sub-second headroom, max micros 999997
    in the regenerated fixtures) AND pre-epoch timestamps, where Spark's
    sign-following % would compute a negative sub-second and let the
    jitter escape into the next second (pmod regression)."""
    import pyspark.sql.functions as F

    from tools.replicate import jitter_wrapped

    base = spark.createDataFrame(
        [
            (1_000_000_999_999,),
            (1_000_000_000_000,),
            (999_999_999_997,),
            (-5,),  # 1969-12-31 23:59:59.999995
            (-1_000_000,),  # exactly one pre-epoch second boundary
        ],
        "us BIGINT",
    ).select(F.timestamp_micros("us").alias("ts"))
    floor_sec = lambda c: F.floor(F.unix_micros(c) / 1_000_000)  # noqa: E731
    for off in (1, 15, 255, 256 * 15):
        out = base.select(
            floor_sec("ts").alias("sec_a"),
            floor_sec(jitter_wrapped("ts", off)).alias("sec_b"),
            F.pmod(F.unix_micros("ts"), F.lit(1_000_000)).alias("sub_a"),
            F.pmod(
                F.unix_micros(jitter_wrapped("ts", off)), F.lit(1_000_000)
            ).alias("sub_b"),
        )
        for r in out.collect():
            assert r.sec_a == r.sec_b, f"offset {off} moved the second"
            assert r.sub_b == (r.sub_a + off) % 1_000_000


def test_replicated_tier_marker_carries_source_version(tmp_path, spark):
    """A regenerated source dir must stale the tier MARKER: the written
    stamp folds in the source's content version, so path+times alone can
    never validate a tier built from vanished bytes.  Exercises the real
    replicate_fixture end-to-end at the smallest fixture."""
    import tools.replicate as R

    sf = "/root/testdata/sf0.001"
    dst = str(tmp_path / "2x")
    R.replicate_fixture(spark, sf, dst, times=2)
    marker = (tmp_path / "2x" / "_REPLICATED_OK").read_text()
    assert marker == f"v4|{sf}|2|{R.source_stamp(sf)}", marker
    # reverting to a path+times-only stamp (the pre-v3 format) must read
    # as stale: the builder would rebuild, not cache-hit
    assert f"v2|{sf}|2" != marker
    assert R.source_stamp(sf) in marker


def test_perturb_isometry_invariants(spark):
    """The per-replica embedding transform must be an EXACT isometry:
    norms and within-replica inner products bit-identical to the base
    (±1 multiplication and reordering are lossless in IEEE float), while
    cross-replica copies of the same vector decorrelate — the property
    that makes tier near-dup structure scale linearly instead of
    squaring (round-12 verdict #1).  Replica 0 must be the identity
    (query batches at vec_id < 8 live there)."""
    import math
    import random

    import pyspark.sql.functions as F

    from tools.replicate import perturb_isometry

    rng = random.Random(13)
    vecs = [
        [rng.uniform(-1, 1) for _ in range(64)] for _ in range(6)
    ]
    base = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id INT, embedding ARRAY<FLOAT>",
    )
    got = {}
    for i in (0, 1, 7, 255, 3 * 1_000_003):
        rows = base.select(
            "vec_id", perturb_isometry("embedding", i).alias("e")
        ).collect()
        got[i] = {r.vec_id: list(r.e) for r in rows}
    base_rows = {r.vec_id: list(r.embedding) for r in base.collect()}
    dot = lambda u, v: sum(a * b for a, b in zip(u, v))  # noqa: E731
    assert got[0] == base_rows, "replica 0 must be the identity"
    for i in (1, 7, 255, 3 * 1_000_003):
        for vid, v in got[i].items():
            # exact norm preservation: same multiset of |components|
            assert sorted(abs(x) for x in v) == sorted(
                abs(x) for x in base_rows[vid]
            ), f"replica {i} changed component magnitudes"
            assert v != base_rows[vid], f"replica {i} left vec {vid} verbatim"
        # within-replica inner products preserved exactly
        for a in range(3):
            for b in range(a + 1, 4):
                assert math.isclose(
                    dot(got[i][a], got[i][b]),
                    dot(base_rows[a], base_rows[b]),
                    rel_tol=1e-9,
                    abs_tol=1e-9,
                )
        # cross-replica copies of the SAME base vector decorrelate: far
        # below any near-dup threshold (|cos| bound is loose — random
        # signed rotations of a 64-dim vector concentrate near 0)
        for vid, v in got[i].items():
            u = base_rows[vid]
            cos = dot(u, v) / math.sqrt(dot(u, u) * dot(v, v))
            assert abs(cos) < 0.55, (
                f"replica {i} vec {vid} still correlated: cos={cos}"
            )


def test_deep_tier_isometry_stream_disjoint_from_inner(spark):
    """build_embeddings_tier's perturbation indices (r * 1_000_003) must
    not reproduce an inner replica's transform: with a plain vec_id
    shift, deep replica r of inner replica 0 carried the SAME vector as
    inner replica r of the same base row (both T_r(base)) — verbatim
    duplicates one level up.  Apply both transform streams to one vector
    and assert every (inner i, deep r) pair differs."""
    import pyspark.sql.functions as F

    from tools.replicate import perturb_isometry

    base = spark.createDataFrame(
        [(0, [float(((j * 37) % 19) - 9) for j in range(64)])],
        "vec_id INT, embedding ARRAY<FLOAT>",
    )

    def apply(i):
        return tuple(
            base.select(perturb_isometry("embedding", i).alias("e"))
            .first()["e"]
        )

    inner = {i: apply(i) for i in (1, 2, 3, 35, 6, 9)}
    deep = {r: apply(r * 1_000_003) for r in (1, 2, 3)}
    for r, dv in deep.items():
        for i, iv in inner.items():
            assert dv != iv, (
                f"deep replica {r} reproduces inner replica {i}'s vector"
            )
