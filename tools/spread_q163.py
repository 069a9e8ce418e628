#!/usr/bin/env python
"""Resolve q163_bloom_decontaminate's at-the-bar 16x ratio (round-6
VERDICT ask #5) with a best-of-7 on BOTH engines under the pinned
protocol.  Since round 8 this is a thin wrapper over the generic
tools/spread.py (one protocol implementation, stamped records); kept
under its original name because committed records and docs cite it.

Run standalone (fresh JVM, nothing else benching):
    python tools/spread_q163.py [repeats]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.spread import main as spread_main  # noqa: E402

if __name__ == "__main__":
    repeats = sys.argv[1] if len(sys.argv) > 1 else "7"
    sys.argv = [sys.argv[0], "q163_bloom_decontaminate", "16x", repeats]
    spread_main()
