#!/usr/bin/env python
"""Emulate the driver's CORRECTNESS gate before the driver runs it:
execute the first 50 registry entries (the curated window) at sf0.01,
compare each against its DuckDB oracle with the same row/schema/value
check (tests/oracle_utils.compare), and print one JSON summary.

Run: python tools/driver_dryrun.py   (~2 min; exits 1 on any red row)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coldata_spark import registry
from coldata_spark.session import get_spark
from tests.oracle_utils import compare, duck_connection


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="driver_dryrun")
    con = duck_connection(sf_dir)
    results: dict[str, dict] = {}
    red = 0
    for name, spec in list(registry.specs().items())[:50]:
        try:
            sdf = spec.fn(spark, sf_dir)
            if spec.sql is None:
                results[name] = {"rows": sdf.count(), "check": "rows_only"}
                continue
            problems = compare(sdf, con.execute(spec.sql).df())
            results[name] = {"check": "ok" if not problems else problems}
            red += bool(problems)
        except Exception as ex:  # a red row, not a crash of the dry-run
            results[name] = {"check": f"error: {ex}"}
            red += 1
    print(json.dumps({"sf_dir": sf_dir, "red": red, "results": results}, default=str))
    return 1 if red else 0


if __name__ == "__main__":
    sys.exit(main())
