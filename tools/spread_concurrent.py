#!/usr/bin/env python
"""Best-of-N band for the CONCURRENT batch modes (round 9): the honest
fresh-exec numbers sit near engine parity (~1.0x), which is a boundary
claim — exactly the class the repo's stamped-spread protocol exists for.
Runs bench_concurrent N times, each in a fresh FAIR-scheduled
SparkSession.  One launcher JVM hosts all repeats (spark.stop() does not
kill the py4j gateway), so codegen/JIT state persists across them — the
repeats share JVM warmth and are correlated, not cross-JVM independent;
the protocol string says so.  Records the per-mode band in
BENCH_DETAIL.json as ``concurrent_spread``.

Run standalone (nothing else benching):
    python tools/spread_concurrent.py [repeats]
"""
from __future__ import annotations

import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _headline_stamp, _median, bench_concurrent  # noqa: E402
from coldata_spark import registry  # noqa: E402
from coldata_spark.session import (  # noqa: E402
    dir_bytes,
    get_spark,
    tune_for_input,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL = os.path.join(REPO, "BENCH_DETAIL.json")


def measure(repeats: int = 3) -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = registry.specs()
    runs = []
    for i in range(repeats):
        spark = get_spark(
            app_name=f"spread_concurrent_{i}",
            extra_conf={"spark.scheduler.mode": "FAIR"},
        )
        tune_for_input(spark, dir_bytes(sf_dir))
        runs.append(bench_concurrent(spark, sf_dir, specs))
        spark.stop()

    def band(key: str) -> list[float]:
        vals = [r[key] for r in runs]
        return [min(vals), round(_median(vals), 3), max(vals)]

    return {
        # stamped like every *_spread record (test_spread_staleness_gate):
        # the "query" is the whole concurrent batch, and the fixture stamp
        # is the sf dir's content version
        "query": "concurrent_batch",
        "tier_key": None,
        "tier_ratio_at_measurement": None,
        "fixture_stamp": _headline_stamp(sf_dir),
        "measured": datetime.date.today().isoformat(),
        "repeats": repeats,
        "prepared_sec_band": band("prepared_sec"),
        "serve_sec_band": band("serve_sec"),
        "uncached_client_sec_band": band("uncached_client_sec"),
        "duckdb_sec_band": band("duckdb_sec"),
        "prepared_ratio_band": band("prepared_ratio"),
        "serve_ratio_band": band("serve_ratio"),
        "uncached_client_ratio_band": band("uncached_client_ratio"),
        "protocol": f"{repeats} fresh FAIR-scheduled SparkSessions in one "
        "launcher JVM (repeats share JVM/JIT warmth — correlated, not "
        "cross-JVM independent), each running the full bench_concurrent "
        "protocol (fresh_exec per submission, best worker count per mode, "
        "DuckDB re-measured per repeat)",
    }


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rec = measure(repeats)
    try:
        with open(DETAIL) as f:
            detail = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        detail = {}
    detail["concurrent_spread"] = rec
    with open(DETAIL, "w") as f:
        json.dump(detail, f, indent=2)
    print("concurrent_spread")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
