#!/usr/bin/env python
"""Dump full .explain("formatted") output for the round-15 optimization
targets to plans/r15/<query>_<tag>.txt.

Run: python tools/gen_plans_r15.py before|after [query ...]
(no query args = the full default target list)

Registered queries dump from the registry; the clustered twins (prefixed
"clustered:") register the clustered fixture's catalog tables first and
dump the twin's plan — their layout claims (zero fact exchange) are
checked against these files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coldata_spark import registry
from coldata_spark.session import get_spark

# every query examined or touched in the r15 optimization round
TARGETS = [
    "q141_shingle_containment",
    "q141_buckets",
    "q125_hourly_anomalies",
    "q135_weekday_hour_heatmap",
    "q74_distinct_counts",
    "q123_profile_orders",
    "clustered:q77_local_supplier_volume",
    "clustered:q68_market_share",
]


def _dump(df, out_dir: str, name: str, tag: str) -> None:
    tree = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(out_dir, f"{name}_{tag}.txt")
    with open(path, "w") as f:
        f.write(tree)
    print(f"wrote {path}")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or TARGETS
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    os.makedirs(out_dir, exist_ok=True)
    # AQE off: same rationale as gen_plans_r14 — the static planner is the
    # one that applies ReuseExchange visibly in explain output.
    spark = get_spark(
        app_name=f"gen_plans_r15_{tag}",
        shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    specs = registry.specs()
    clustered_ready = False
    for name in names:
        if name == "q141_buckets":
            # the localCheckpoint in q141's body truncates the bucket-build
            # pipeline out of the registered query's explain — dump the
            # pre-checkpoint subplan separately so the count-prefilter
            # evidence (Window df<=64 feeding collect_list, ONE Exchange)
            # is on record
            from pyspark.sql import functions as F

            from coldata_spark.queries.text_queries import _q141_capped_buckets
            from coldata_spark.tables import fan_out, load

            docs = load(spark, "/root/testdata/sf0.01", "documents")
            sh0 = fan_out(docs).select(
                "doc_id",
                F.explode(
                    F.array_distinct(
                        F.expr(
                            "transform(sequence(1, greatest(1,"
                            " length(text) - 4)), i -> substring(text, i, 5))"
                        )
                    )
                ).alias("shingle"),
            )
            _dump(_q141_capped_buckets(sh0), out_dir, name, tag)
            continue
        if name.startswith("clustered:"):
            qname = name.split(":", 1)[1]
            from bench import _tier_dir
            from tools.clustered import CLUSTERED_JOIN_QUERIES, register_clustered

            out = _tier_dir("/root/testdata/sf0.1", 256) + "_clustered"
            if not os.path.isdir(out):
                print(f"skip {name}: clustered fixture absent ({out})")
                continue
            if not clustered_ready:
                spark.conf.set(
                    "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
                )
                register_clustered(spark, out)
                clustered_ready = True
            df = CLUSTERED_JOIN_QUERIES[qname](spark, out)
            _dump(df, out_dir, f"{qname}_clustered", tag)
            continue
        df = specs[name].fn(spark, "/root/testdata/sf0.01")
        _dump(df, out_dir, name, tag)
    spark.stop()


if __name__ == "__main__":
    main()
