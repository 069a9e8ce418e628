"""Spill-path regression gate (round-11 verdict ask #4): the engine must
COMPLETE its queries when operators are forced to spill — the degradation
behavior a 128 GiB sandbox never exercises on its own.  The gate runs
tools/stress_spill.py's deterministic ``gate`` mode in a subprocess (own
JVM: force-spill thresholds + UI for the metrics API are per-context
static confs the shared test session can't adopt) at sf0.001, so it's
fast on every build; the 64x constrained-memory measurements live in
STRESS.md via the same tool's ``constrained`` mode."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_forced_spill_completes_and_actually_spills():
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_TEST_SF_DIR", None)  # pin the fast sf0.001 run
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "stress_spill.py"),
         "16x", "gate"],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["mode"] == "gate"
    qs = rec["queries"]
    # both queries complete under forced spilling...
    assert set(qs) == {"q116_time_weighted_avg", "q25_minhash_signatures"}
    # ...and the window/sort query demonstrably exercised the spill path
    # (memoryBytesSpilled counts what the sorter pushed out; tiny runs
    # can compress the on-disk side below the MB rounding)
    assert qs["q116_time_weighted_avg"]["memory_spilled_mb"] > 0, rec
