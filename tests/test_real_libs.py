"""Opt-in tests for the real-library seams (SURVEY §2.8 V1/V2, §2.1 S2).

This container ships neither `transformers` nor `selenium`, so these tests
SKIP here — but any environment that has the libraries exercises the REAL
code paths (HF tokenize/forward/pool/normalize; Selenium driver pool)
through the exact seams production would use.  No network: the transformer
test constructs a tiny randomly-initialized BERT from a config and a
hand-written vocab instead of downloading a checkpoint, and the selenium
test renders a file:// page.
"""

from __future__ import annotations

import numpy as np
import pytest


def test_real_transformer_encoder_path(spark, tmp_path):
    """hf_encode_fn (the same closure _default_encoder_factory wires to
    from_pretrained) over a locally-constructed BERT: deterministic,
    L2-normalized, and usable through embed_documents' mapInPandas."""
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")

    from coldata_spark import embed as E

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "hello", "world", "spark",
             "engine", "data"]
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(vocab))
    tok = transformers.BertTokenizerFast(vocab_file=str(vocab_file))
    cfg = transformers.BertConfig(
        vocab_size=len(vocab), hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=32,
    )
    torch.manual_seed(0)
    model = transformers.BertModel(cfg).eval()

    encode = E.hf_encode_fn(tok, model)
    vecs = encode(["hello world", "spark engine", "hello world"])
    assert vecs.shape == (3, 16)
    norms = np.linalg.norm(vecs, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-5)
    assert np.allclose(vecs[0], vecs[2], atol=1e-6)  # deterministic
    assert not np.allclose(vecs[0], vecs[1], atol=1e-3)

    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "spark engine data")], ["doc_id", "text"]
    )
    out = E.embed_documents(
        docs, dim=16, encoder_factory=lambda: E.hf_encode_fn(tok, model)
    ).collect()
    by_id = {r.doc_id: np.array(r.embedding) for r in out}
    assert np.allclose(by_id[0], vecs[0], atol=1e-5)


def test_real_selenium_driver_pool(tmp_path):
    """selenium_driver_factory -> RenderingFetcherPool over a file:// page.
    Skips when selenium or a Chrome binary is unavailable."""
    pytest.importorskip("selenium")

    from coldata_spark.ingest.render import (
        RenderingFetcherPool,
        selenium_driver_factory,
    )

    page = tmp_path / "page.html"
    page.write_text(
        "<html><body><h1 id='t'>rendered-ok</h1>"
        "<script>document.title = 'js-ran';</script></body></html>"
    )
    try:
        pool = RenderingFetcherPool(selenium_driver_factory, pool_size=1)
    except Exception as exc:  # no Chrome binary / driver on this machine
        pytest.skip(f"selenium present but no usable browser: {exc}")
    try:
        html = pool.fetch(page.as_uri())
        assert "rendered-ok" in html
    finally:
        pool.close()
