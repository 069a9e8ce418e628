"""End-to-end drive of the demo web UI (stdlib fallback server)."""

from __future__ import annotations

import urllib.parse
import urllib.request

from coldata_spark.tables import load


def test_demo_serve_search_roundtrip(spark, sf_dir, tmp_path):
    from coldata_spark import search as S
    from coldata_spark.demo import serve

    docs = load(spark, sf_dir, "documents")
    idx = S.build_index(docs, str(tmp_path / "demo_idx"), nlist=4)

    srv = serve(spark, idx, docs, k=3, nprobe=None, port=0, block=False)
    try:
        port = srv.server_address[1]
        # form page renders without a query
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as resp:
            assert resp.status == 200
            assert b"dataset search" in resp.read()

        # a real query returns ranked docs
        sample = docs.orderBy("doc_id").first()
        q = urllib.parse.quote(" ".join(sample.text.split()[:6]))
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/?q={q}") as resp:
            assert resp.status == 200
            body = resp.read().decode()
        assert "<ol>" in body and "doc " in body
    finally:
        srv.shutdown()
