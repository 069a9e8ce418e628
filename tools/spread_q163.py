#!/usr/bin/env python
"""Resolve q163_bloom_decontaminate's at-the-bar 16x ratio (round-6
VERDICT ask #5): the tier record read 1.99 from a best-of-3; this tool
re-measures it under the pinned protocol with a best-of-7 on BOTH engines
and merges {median, range, per-run} into BENCH_DETAIL.json under
"q163_16x_spread", so the 1.99 resolves to one side of the 2x bar the
same way q83's straddle did (best-of-N, fixture pre-touched, fresh JVM).

Run standalone (fresh JVM, nothing else benching):
    python tools/spread_q163.py [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _pretouch, _median  # noqa: E402

TIER = "/root/repo/.bench_cache/16x"
DETAIL = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "BENCH_DETAIL.json")


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    import duckdb

    from coldata_spark import registry
    from coldata_spark.session import dir_bytes, get_spark, tune_for_input

    pre_t0 = time.monotonic()
    _pretouch(TIER)
    pretouch_s = round(time.monotonic() - pre_t0, 3)

    spark = get_spark(app_name="spread_q163")
    tune_for_input(spark, dir_bytes(TIER))
    spec = registry.specs()["q163_bloom_decontaminate"]

    spec.fn(spark, "/root/testdata/sf0.001").collect()  # codegen warm
    spec.fn(spark, TIER).collect()  # tier warm (broadcast, page cache)
    spark._jvm.System.gc()
    s_runs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        spec.fn(spark, TIER).collect()
        s_runs.append(round(time.perf_counter() - t0, 3))
    spark.stop()

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in ("documents",):
        p = os.path.join(TIER, f"{t}.parquet")
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    con.execute(spec.sql).df()  # warm
    d_runs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        con.execute(spec.sql).df()
        d_runs.append(round(time.perf_counter() - t0, 3))
    con.close()

    s_best, d_best = min(s_runs), min(d_runs)
    rec = {
        "times": 16,
        "spark_sec": s_best,
        "duckdb_sec": d_best,
        "ratio": round(s_best / d_best, 2),
        "ratio_median": round(_median(s_runs) / _median(d_runs), 2),
        "spark_spread": [min(s_runs), round(_median(s_runs), 3), max(s_runs)],
        "duckdb_spread": [min(d_runs), round(_median(d_runs), 3), max(d_runs)],
        "spark_runs": s_runs,
        "duckdb_runs": d_runs,
        "pretouch_s": pretouch_s,
        "protocol": "page-cache-hot both engines (fixture pre-touched), "
        f"fresh JVM, best-of-{repeats} after in-process warm",
    }
    detail_path = os.path.abspath(DETAIL)
    # tolerate a truncated detail file (killed mid-dump) the same way
    # bench._write_detail does — the measurement just completed and must
    # not be discarded over a corrupt merge target
    try:
        with open(detail_path) as f:
            detail = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        detail = {}
    detail["q163_16x_spread"] = rec
    # indent=2 matches bench._write_detail so alternating runs don't
    # re-indent (and churn) the whole file
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
