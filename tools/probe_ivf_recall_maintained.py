#!/usr/bin/env python
"""Recall-per-IO under skew: what IVF maintenance actually buys at scale.

A hot cell doesn't just cost balance — it degrades the recall/IO trade:
every query whose nearest centroid is the hot cell scans the whole blob
(IO ~ ratio x mean per probe), while queries elsewhere lose recall
because the hot cell swallowed vectors their nprobe budget never reaches.
After maintain_ivf splits the hot cell, the same SCAN BUDGET covers
finer, better-centered cells.

Protocol: embeddings + 8 skewed batches (copies of the seed cell under
fresh ids); exact cosine top-4 as truth for 32 queries; for each nprobe,
measure recall and the mean rows scanned per query (sum of probed cell
sizes, from the audit + the probe lists) on the UNMAINTAINED (nlist=4)
vs MAINTAINED (post-split) index.

Run: python tools/probe_ivf_recall_maintained.py   (table for STRESS.md)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from coldata_spark.operators import ivf
from coldata_spark.operators.similarity import knn_join
from coldata_spark.session import get_spark
from coldata_spark.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def probe_cells(spark, queries, centroids, nprobe):
    """(q_id -> probed cell ids) via the same knn_join the search uses."""
    probe = knn_join(
        queries,
        centroids.select(
            F.col("centroid_id").alias("vec_id"), F.col("cvec").alias("embedding")
        ),
        k=nprobe,
        metric="COSINE",
        score_decimals=None,
    ).select("q_id", F.col("vec_id").alias("centroid_id"))
    out = {}
    for r in probe.collect():
        out.setdefault(r.q_id, set()).add(r.centroid_id)
    return out


def eval_index(spark, path, centroids, queries, exact, sizes, nprobe):
    hits = ivf.search_ivf(
        spark, path, queries, centroids, k=4, nprobe=nprobe
    ).collect()
    got = {(r.q_id, r.vec_id) for r in hits}
    recall = len(got & exact) / len(exact)
    cells = probe_cells(spark, queries, centroids, nprobe)
    rows = [sum(sizes.get(c, 0) for c in cs) for cs in cells.values()]
    return recall, sum(rows) / len(rows)


def main():
    spark = get_spark(app_name="probe_ivf_recall_maintained")
    emb = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    with tempfile.TemporaryDirectory() as workdir:
        assigned, centroids = ivf.build_ivf(emb, nlist=4)
        path = os.path.join(workdir, "idx")
        ivf.write_ivf(assigned, path)
        hot_cid = (
            assigned.groupBy("centroid_id")
            .count()
            .orderBy(F.desc("count"))
            .first()
        ).centroid_id
        seed = assigned.filter(F.col("centroid_id") == hot_cid).select(
            "vec_id", "embedding"
        )
        live = emb
        for i in range(1, 9):
            batch = seed.select(
                (F.col("vec_id") + 1_000_000 * i).alias("vec_id"), "embedding"
            )
            ivf.append_to_index(batch, centroids, path)
            live = live.unionByName(batch)

        queries = (
            live.filter(F.col("vec_id") % 97 == 3)
            .limit(32)
            .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
        )
        exact = {
            (r.q_id, r.vec_id)
            for r in ivf.search_exact(queries, live, k=4).collect()
        }
        pre_sizes = {
            r.centroid_id: r.n
            for r in ivf.audit_ivf_cells(spark, path, centroids).collect()
        }
        new_cents, report = ivf.maintain_ivf(
            spark, path, centroids, max_cell_ratio=2.0, min_cell_rows=8
        )
        ivf.vacuum_ivf(spark, path, new_cents)
        post_sizes = {
            r.centroid_id: r.n
            for r in ivf.audit_ivf_cells(spark, path, new_cents).collect()
        }
        n_pre, n_post = len(pre_sizes), len(post_sizes)
        total = sum(post_sizes.values())
        print(
            f"sf={SF_DIR} corpus={total} cells {n_pre}->{n_post} "
            f"splits={report['splits']} "
            f"max_ratio {report['max_ratio_before']}->{report['max_ratio_after']}"
        )
        print("index | nprobe | recall@4 | mean rows scanned/query (% corpus)")
        # unmaintained numbers must come from the PRE-split cell set; the
        # superseded hot partition was vacuumed, so rebuild it for the
        # unmaintained arm in a sibling dir
        path2 = os.path.join(workdir, "idx_unmaint")
        ivf.write_ivf(
            ivf.assign_to_centroids(live, centroids), path2
        )
        for nprobe in (1, 2, 3, 4):
            r, io = eval_index(
                spark, path2, centroids, queries, exact, pre_sizes, nprobe
            )
            print(
                f"unmaintained(nlist={n_pre}) | {nprobe} | {r:.3f} | "
                f"{io:.0f} ({100*io/total:.0f}%)"
            )
        for nprobe in (1, 2, 3, 4, 6, 8):
            r, io = eval_index(
                spark, path, new_cents, queries, exact, post_sizes, nprobe
            )
            print(
                f"maintained(nlist={n_post})   | {nprobe} | {r:.3f} | "
                f"{io:.0f} ({100*io/total:.0f}%)"
            )
    spark.stop()


if __name__ == "__main__":
    main()
