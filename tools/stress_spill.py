#!/usr/bin/env python
"""Spill/degradation stress (round-11 verdict ask #4): run the curation
ladder + minhash dedup at a replicated tier under CONSTRAINED memory and
record that the shuffles SPILL AND COMPLETE with bounded slowdown — the
one 100 TB behavior a 128 GiB sandbox never exercises on its own.

Modes:
  normal        the bench protocol's session (8g heap, default
                spark.memory.fraction 0.6, cores-many shuffle partitions)
  constrained   2g heap, spark.memory.fraction=0.2 (execution+storage
                pool ~400 MB), 8 shuffle partitions (bigger per-partition
                working sets) — the shape of an overcommitted executor

Spill totals come from the Spark UI REST API (the status store's
per-stage memoryBytesSpilled/diskBytesSpilled), summed over all stages
of each query's run window.

Run standalone (fresh JVM, nothing else benching):
    python tools/stress_spill.py [tier] [mode]   # prints one JSON line
Defaults: tier=64x mode=constrained.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "q25_minhash_signatures",
    "q26_minhash_neardup_pairs",
    "q169_curation_pipeline",
]

CONSTRAINED_CONF = {
    "spark.memory.fraction": "0.2",
    "spark.sql.shuffle.partitions": "8",
}


def _spill_totals(ui_port: int, app_id: str) -> dict:
    url = f"http://localhost:{ui_port}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.load(r)
    return {
        "stages": len(stages),
        "memory_spilled_mb": round(
            sum(s.get("memoryBytesSpilled", 0) for s in stages) / 1e6, 1
        ),
        "disk_spilled_mb": round(
            sum(s.get("diskBytesSpilled", 0) for s in stages) / 1e6, 1
        ),
        "shuffle_write_mb": round(
            sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6, 1
        ),
    }


def run(tier: str, mode: str) -> dict:
    os.environ["SPARK_UI"] = "true"
    if mode == "constrained":
        os.environ["SPARK_DRIVER_MEM"] = "2g"
    from bench import _pretouch
    from coldata_spark import registry
    from coldata_spark.session import dir_bytes, get_spark, tune_for_input

    tier_dir = os.path.join("/root/repo/.bench_cache", tier)
    if not os.path.isdir(tier_dir):
        raise SystemExit(f"tier fixture {tier_dir} missing — run bench.py first")
    _pretouch(tier_dir)
    extra = dict(CONSTRAINED_CONF) if mode == "constrained" else {}
    spark = get_spark(app_name=f"stress_spill_{mode}", extra_conf=extra)
    if mode == "constrained":
        # get_spark sizes shuffle partitions to cores AFTER extra_conf;
        # re-pin the constrained value on the live session (runtime conf,
        # takes effect per query)
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            CONSTRAINED_CONF["spark.sql.shuffle.partitions"],
        )
    else:
        tune_for_input(spark, dir_bytes(tier_dir))
    ui_port = int(spark.conf.get("spark.ui.port", "4040") or "4040")
    app_id = spark.sparkContext.applicationId
    specs = registry.specs()
    out = {"tier": tier, "mode": mode, "heap": os.environ.get("SPARK_DRIVER_MEM", "8g"),
           "conf": extra, "queries": {}}
    before = _spill_totals(ui_port, app_id)
    for name in QUERIES:
        t0 = time.perf_counter()
        specs[name].fn(spark, tier_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        secs = round(time.perf_counter() - t0, 1)
        after = _spill_totals(ui_port, app_id)
        out["queries"][name] = {
            "sec": secs,
            "memory_spilled_mb": round(
                after["memory_spilled_mb"] - before["memory_spilled_mb"], 1
            ),
            "disk_spilled_mb": round(
                after["disk_spilled_mb"] - before["disk_spilled_mb"], 1
            ),
        }
        before = after
    spark.stop()
    return out


if __name__ == "__main__":
    tier = sys.argv[1] if len(sys.argv) > 1 else "64x"
    mode = sys.argv[2] if len(sys.argv) > 2 else "constrained"
    print(json.dumps(run(tier, mode)))
