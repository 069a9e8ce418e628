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


def _spill_totals(ui_base: str, app_id: str) -> dict:
    url = f"{ui_base}/api/v1/applications/{app_id}/stages?status=complete"
    # 60 s: the status-store endpoint can take >10 s to respond when the
    # whole test suite saturates all cores (one flaky timeout observed in a
    # full-suite run; the tool passes in isolation in ~20 s)
    with urllib.request.urlopen(url, timeout=60) as r:
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


GATE_CONF = {
    # force UnsafeExternalSorter spills deterministically at tiny scale:
    # the REGRESSION GATE (tests/test_spill_gate.py) must prove the
    # spill path completes on every build without needing a 64x fixture
    # or minutes of wall clock — memory-pressure realism is this tool's
    # constrained mode, determinism is the gate's job
    "spark.shuffle.spill.numElementsForceSpillThreshold": "500",
    "spark.sql.windowExec.buffer.spill.threshold": "500",
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold": "500",
    "spark.sql.shuffle.partitions": "2",
}

GATE_QUERIES = ["q116_time_weighted_avg", "q25_minhash_signatures"]


def run(tier: str, mode: str) -> dict:
    os.environ["SPARK_UI"] = "true"
    if mode == "constrained":
        os.environ["SPARK_DRIVER_MEM"] = "2g"
    from bench import _pretouch
    from coldata_spark import registry
    from coldata_spark.session import dir_bytes, get_spark, tune_for_input

    if mode == "gate":
        tier_dir = os.environ.get(
            "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
        )
        # the record must name the fixture actually measured, not the
        # CLI's tier argument (gate mode always runs the tiny sf dir)
        tier = os.path.basename(tier_dir.rstrip("/"))
    else:
        tier_dir = os.path.join("/root/repo/.bench_cache", tier)
    if not os.path.isdir(tier_dir):
        raise SystemExit(f"tier fixture {tier_dir} missing — run bench.py first")
    _pretouch(tier_dir)
    extra = {
        "constrained": dict(CONSTRAINED_CONF),
        "gate": dict(GATE_CONF),
    }.get(mode, {})
    spark = get_spark(app_name=f"stress_spill_{mode}", extra_conf=extra)
    if "spark.sql.shuffle.partitions" in extra:
        # get_spark sizes shuffle partitions to cores AFTER extra_conf;
        # re-pin the constrained value on the live session (runtime conf,
        # takes effect per query)
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            extra["spark.sql.shuffle.partitions"],
        )
    if mode == "normal":
        tune_for_input(spark, dir_bytes(tier_dir))
    # the ACTUAL bound UI address (a concurrent session shifts 4040 ->
    # 4041+; reading the conf would poll a stranger's application)
    ui_base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    specs = registry.specs()
    out = {"tier": tier, "mode": mode, "heap": os.environ.get("SPARK_DRIVER_MEM", "8g"),
           "conf": extra, "queries": {}}
    before = _spill_totals(ui_base, app_id)
    for name in GATE_QUERIES if mode == "gate" else QUERIES:
        t0 = time.perf_counter()
        specs[name].fn(spark, tier_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        secs = round(time.perf_counter() - t0, 1)
        after = _spill_totals(ui_base, app_id)
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
