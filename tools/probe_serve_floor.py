#!/usr/bin/env python
"""Serve-floor decomposition (round-11 verdict ask #5): where do q44's
~0.1 s per-submission go once the plan is cached?

registry.serve amortizes CONSTRUCTION (python plan building + analysis).
Each submission still pays, in order:
  replan     optimizer + physical planning + codegen source gen on the
             fresh QueryExecution (fresh_exec's lit(True) filter)
  schedule   DAG submission, task launch, stage boundaries (AQE adds
             per-stage replanning round-trips)
  execute    the actual scan/window/agg work
  deliver    noop sink vs a <=10-row collect

Slices measured (best-of-7 after deep warm, headline sf dir):
  full            fresh_exec + noop save — the shipped serve protocol
  plan_only       fresh_exec + force executedPlan + codegen source
                  (no job submitted): the replan term
  reuse_dataset   save the SAME Dataset again (shuffle/stage reuse):
                  bounds schedule+deliver with execution skipped
  full_noaqe      full, with spark.sql.adaptive.enabled=false for the
                  submission (runtime conf, restored after): bounds
                  AQE's per-stage replanning share
  collect_small   fresh_exec + .collect() instead of noop (q44 emits
                  ~thousands of rows at sf0.1 — included to bound the
                  driver-delivery delta, not as the protocol)

Run: python tools/probe_serve_floor.py [query] (one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _pretouch, fresh_exec, run_plan
from coldata_spark import registry
from coldata_spark.session import dir_bytes, get_spark, tune_for_input

name = sys.argv[1] if len(sys.argv) > 1 else "q44_asof_last_click_before_purchase"
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_pretouch(sf_dir)
spark = get_spark(app_name="probe_serve_floor")
tune_for_input(spark, dir_bytes(sf_dir))

df = registry.serve(spark, sf_dir, name)


def plan_only():
    f = fresh_exec(df)
    qe = f._jdf.queryExecution()
    qe.executedPlan()  # optimizer + physical planning
    # force whole-stage codegen SOURCE generation (compile is cached by
    # the Janino cache after the first submission, like a warm server)
    qe.explainString(spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))


def reuse_dataset():
    run_plan(df)  # same Dataset object: DAGScheduler skips map stages


variants = {
    "full": lambda: run_plan(fresh_exec(df)),
    "plan_only": plan_only,
    "reuse_dataset": reuse_dataset,
    "collect_small": lambda: fresh_exec(df).collect(),
}
out = {"query": name, "sf_dir": sf_dir, "rows": df.count()}
for _ in range(6):
    run_plan(fresh_exec(df))  # deep warm (codegen, broadcast, page cache)
for vname, fn in variants.items():
    fn()  # warm the variant's own path
    runs = []
    for _ in range(7):
        t0 = time.perf_counter()
        fn()
        runs.append(round(time.perf_counter() - t0, 3))
    out[vname] = runs

# AQE-off control last (runtime conf, restored)
spark.conf.set("spark.sql.adaptive.enabled", "false")
run_plan(fresh_exec(df))
runs = []
for _ in range(7):
    t0 = time.perf_counter()
    run_plan(fresh_exec(df))
    runs.append(round(time.perf_counter() - t0, 3))
out["full_noaqe"] = runs
spark.conf.set("spark.sql.adaptive.enabled", "true")
spark.stop()
print(json.dumps(out))
