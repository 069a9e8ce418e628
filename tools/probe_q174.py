#!/usr/bin/env python
"""Decompose q174_quality_audit's flat ~7x tier ratio (round-12 verdict
what's-wrong #3) term by term, the q116/q44 way.

q174 = ONE wide scan+aggregate (4 row rules + 1 fk hit-indicator + the
stack unpivot) + TWO unique-rule hash-aggs (groupBy the key set, count>1)
+ the union.  This tool times each term in isolation at a tier, against
DuckDB twins of the same terms, so the stable ratio gets an owner.  It
also times the SCHEDULED-GATE pair the verdict asks for: the footer-stats
audit (audit_table_stats — zero data pages) and the q179 HLL distinct
monitor at the same tier.

Usage: python tools/probe_q174.py [--times 16]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

REPEATS = 3


def best_of(fn, n=REPEATS):
    fn()  # warm
    b = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        b = min(b, time.perf_counter() - t0)
    gc.collect()
    return round(b, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--times", type=int, default=16)
    args = ap.parse_args()

    import duckdb

    from bench import CACHE_ROOT, _marker_content, _pretouch, _tier_dir
    from coldata_spark.operators import quality as Q
    from coldata_spark.session import get_spark
    from coldata_spark.tables import load
    from tools.replicate import replicate_fixture

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tier_dir = _tier_dir(sf_dir, args.times)
    spark = get_spark(app_name="probe_q174")
    replicate_fixture(spark, sf_dir, tier_dir, times=args.times)
    _pretouch(tier_dir)

    li = load(spark, tier_dir, "lineitem")
    sup = load(spark, tier_dir, "supplier")

    row_rules = [
        Q.not_null("l_orderkey"),
        Q.in_range("l_quantity", 1, 25),
        Q.in_set("l_returnflag", ["A", "N"]),
        Q.matches("l_linestatus", "^[OF]$"),
    ]
    fk = Q.foreign_key("l_suppkey", sup, "s_suppkey")
    uniq2 = Q.unique(["l_orderkey", "l_linenumber"])
    uniq1 = Q.unique(["l_orderkey"])

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{tier_dir}/lineitem.parquet/*.parquet')"
    )
    con.execute(
        "CREATE VIEW supplier AS SELECT * FROM "
        f"read_parquet('{tier_dir}/supplier.parquet/*.parquet')"
    )

    out: dict[str, dict] = {}

    def rec(name, spark_fn, duck_sql):
        s = best_of(lambda: spark_fn().toPandas())
        d = best_of(lambda: con.execute(duck_sql).df())
        out[name] = {
            "spark": s,
            "duck": d,
            "ratio": round(s / d, 2) if d else None,
        }
        print(f"{name}: spark {s}s duck {d}s ratio {out[name]['ratio']}",
              flush=True)

    rec(
        "row_rules_only (1 scan+agg)",
        lambda: Q.audit(li, row_rules),
        """SELECT CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) a,
                  CAST(sum(CASE WHEN l_quantity IS NOT NULL AND NOT (l_quantity BETWEEN 1 AND 25) THEN 1 ELSE 0 END) AS BIGINT) b,
                  CAST(sum(CASE WHEN l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A','N') THEN 1 ELSE 0 END) AS BIGINT) c,
                  CAST(sum(CASE WHEN l_linestatus IS NOT NULL AND NOT regexp_matches(l_linestatus, '^[OF]$') THEN 1 ELSE 0 END) AS BIGINT) d,
                  CAST(count(*) AS BIGINT) n
           FROM lineitem""",
    )
    rec(
        "unique_composite (groupBy 2 cols)",
        lambda: Q.audit(li, [uniq2]),
        """SELECT CAST(coalesce(sum(c),0) AS BIGINT) FROM
           (SELECT count(*) c FROM lineitem GROUP BY l_orderkey, l_linenumber)
           WHERE c > 1""",
    )
    rec(
        "unique_single (groupBy 1 col)",
        lambda: Q.audit(li, [uniq1]),
        """SELECT CAST(coalesce(sum(c),0) AS BIGINT) FROM
           (SELECT count(*) c FROM lineitem GROUP BY l_orderkey) WHERE c > 1""",
    )
    rec(
        "fk_only (broadcast hit join + agg)",
        lambda: Q.audit(li, [fk]),
        """SELECT CAST(sum(CASE WHEN l_suppkey IS NOT NULL AND l_suppkey NOT IN
                  (SELECT s_suppkey FROM supplier) THEN 1 ELSE 0 END) AS BIGINT)
           FROM lineitem""",
    )

    # the scheduled-gate pair: footer stats (zero data pages)
    stats_rules = [
        Q.row_count_between(1, 10_000_000_000),
        Q.null_fraction_ppm_max("l_orderkey", 0),
    ]
    s = best_of(
        lambda: Q.audit_table_stats(
            spark, os.path.join(tier_dir, "lineitem.parquet"), stats_rules
        )
    )
    out["footer_stats_gate (audit_table_stats)"] = {"spark": s}
    print(f"footer_stats_gate: spark {s}s (no duck twin — metadata-only)",
          flush=True)

    os.makedirs(CACHE_ROOT, exist_ok=True)
    path = os.path.join(CACHE_ROOT, f"probe_q174_{args.times}x.json")
    with open(path, "w") as fh:
        json.dump(
            {"times": args.times, "stamp": _marker_content(tier_dir),
             "terms": out},
            fh, indent=1,
        )
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
