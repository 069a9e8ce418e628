"""Search demo CLI — the reference's demo surface (demo.py Gradio textbox +
main.py:44-58 ranked printout) as a command line:

    python -m coldata_spark.demo "time series sensor data" "image dataset"

Builds (or reuses) an IVF index over the documents fixture, embeds the
queries, searches, and prints ranked results with previews.  Pass
--sf-dir to point at another corpus; --rebuild to renew the index
(vdb.py:199-201's renew flag).
"""

from __future__ import annotations

import argparse
import os
import tempfile


def main() -> None:
    ap = argparse.ArgumentParser(description="coldata_spark dataset search demo")
    ap.add_argument("queries", nargs="+", help="free-text search queries")
    ap.add_argument(
        "--sf-dir", default="/root/testdata/sf0.001", help="fixture directory"
    )
    ap.add_argument("--k", type=int, default=4, help="results per query")
    ap.add_argument("--nprobe", type=int, default=None, help="IVF cells to probe")
    ap.add_argument("--rebuild", action="store_true", help="force index rebuild")
    args = ap.parse_args()

    from coldata_spark import search as S
    from coldata_spark.session import get_spark
    from coldata_spark.tables import load

    spark = get_spark(app_name="coldata_spark_demo")
    docs = load(spark, args.sf_dir, "documents")

    index_dir = os.path.join(
        tempfile.gettempdir(), f"coldata_demo_idx_{os.path.basename(args.sf_dir)}"
    )
    if args.rebuild or not os.path.isdir(index_dir):
        print(f"building index at {index_dir} ...")
        idx = S.build_index(docs, index_dir, nlist=8)
    else:
        from coldata_spark.operators import ivf as _ivf

        # reload centroids by re-deriving from the stored assignment
        stored = spark.read.parquet(index_dir)
        _, centroids = _ivf.build_ivf(stored.drop("centroid_id"), nlist=8)
        idx = S.SearchIndex(path=index_dir, centroids=centroids, nlist=8)

    results = S.search(
        spark, idx, docs, args.queries, k=args.k, nprobe=args.nprobe
    ).collect()

    by_q: dict[int, list] = {}
    for r in results:
        by_q.setdefault(r.q_id, []).append(r)
    for qid in sorted(by_q):
        rows = sorted(by_q[qid], key=lambda r: r.rank)
        print(f"\n=== query: {rows[0].q_text!r}")
        for r in rows:
            print(f"  [{r.rank}] doc {r.doc_id}  score={r.score:.4f}")
            print(f"      {r.preview[:120]}")


if __name__ == "__main__":
    main()
