"""Measure the knn_join arrow-vs-expr crossover (VERDICT r6 ask #1).

The round-6 hypothesis: the arrow strategy pays a fixed Python-worker
round-trip, so below some input size the JVM expr path should win and
`auto` should size-gate between them.  MEASURED CONCLUSION (recorded in
SCALE.md "kNN strategy crossover" and knn_join's docstring): the
crossover DOES NOT EXIST for this operator — arrow wins at every tier,
warm and cold, because _sized_for_arrow_stage already amortizes the
round-trip while the expr fold costs ~25 ns per vector element per pair.
`auto` therefore resolves to arrow unconditionally; this tool is kept so
the refutation stays reproducible against future engine versions.

Usage: python tools/bench_knn_strategy.py [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coldata_spark.operators.similarity import knn_join, _estimated_bytes
from coldata_spark.queries.vector_queries import _queries_df, TOP_K
from coldata_spark.session import get_spark
from coldata_spark.tables import load

TIERS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("16x", "/root/repo/.bench_cache/16x"),
    ("64x", "/root/repo/.bench_cache/64x"),
    ("256x", "/root/repo/.bench_cache/256x"),
]


def run_one(spark, sf_dir: str, strategy: str) -> float:
    emb = load(spark, sf_dir, "embeddings")
    out = knn_join(
        _queries_df(spark, sf_dir),
        emb.select("vec_id", "embedding"),
        k=TOP_K,
        metric="COSINE",
        exclude_self=True,
        strategy=strategy,
    )
    t0 = time.monotonic()
    n = out.count()
    dt = time.monotonic() - t0
    assert n > 0
    return dt


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="knn-strategy-bench")
    rows = []
    for name, sf_dir in TIERS:
        if not os.path.isdir(sf_dir):
            continue
        emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        est = _estimated_bytes(emb)
        rec = {"tier": name, "est_bytes": est}
        for strategy in ("expr", "arrow"):
            times = [run_one(spark, sf_dir, strategy) for _ in range(repeats)]
            rec[strategy] = round(min(times), 3)
            rec[strategy + "_all"] = [round(t, 3) for t in times]
        rec["winner"] = "expr" if rec["expr"] <= rec["arrow"] else "arrow"
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    spark.stop()
    print(json.dumps({"summary": rows}))


if __name__ == "__main__":
    main()
