#!/usr/bin/env python
"""Dump full .explain("formatted") output for the round-14 optimization
targets to plans/r14/<query>_<tag>.txt.

Run: python tools/gen_plans_r14.py before|after [query ...]
(no query args = the full default target list)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coldata_spark import registry
from coldata_spark.session import get_spark

# every query examined or touched in the r14 optimization round
TARGETS = [
    "q25_minhash_signatures",
    "q26_minhash_neardup_pairs",
    "q29_ngram_jaccard",
    "q41_events_json_props",
    "q56_priority_order_counts",
    "q59_dedup_groups",
    "q68_market_share",
    "q74_distinct_counts",
    "q77_local_supplier_volume",
    "q108_fuzzy_match",
    "q110_pagerank",
    "q115_cms_heavy_hitters",
    "q123_profile_orders",
    "q127_snapshot_diff",
    "q132_source_keyness",
    "q135_weekday_hour_heatmap",
    "q137_integrity_audit",
    "q140_cluster_aware_split",
    "q141_shingle_containment",
    "q143_lsh_bucket_balance",
    "q148_ship_latency_histogram",
    "q149_hll_error_envelope",
    "q153_unigram_logprob_quality",
    "q12_rollup_revenue",
    "q67_volume_shipping",
    "q133_join_key_skew_profile",
    "q126_interval_coverage",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or TARGETS
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    # AQE off: the bench's sub-2GiB tiers run with AQE disabled
    # (session.tune_for_input), and the static planner is also the one that
    # applies ReuseExchange visibly in explain output — with AQE on the
    # initial plan prints duplicate subtrees that stage-level reuse would
    # dedupe only at runtime, hiding exactly the evidence these dumps exist
    # to record.
    spark = get_spark(
        app_name=f"gen_plans_r14_{tag}",
        shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    specs = registry.specs()
    for name in names:
        df = specs[name].fn(spark, "/root/testdata/sf0.01")
        tree = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(tree)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
