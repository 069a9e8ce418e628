"""Readability-style main-content extraction (T3) on realistic fixture HTML.

Reference bar: trafilatura.extract(html, output_format='markdown') at
uci.py:56 / aws.py:55 / pwc.py:87 — main-content extraction with
boilerplate removal, not tag-stripping.
"""

from __future__ import annotations

import pathlib

import pytest

from coldata_spark.functions.html_extract import extract_main_text

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def blog():
    return extract_main_text((FIXTURES / "blog_post.html").read_text())


@pytest.fixture(scope="module")
def docs():
    return extract_main_text((FIXTURES / "docs_page.html").read_text())


def test_blog_keeps_article_content(blog):
    assert "# Why Columnar Formats Win for Analytics" in blog
    assert "## Compression is the quiet hero" in blog
    assert "read only the bytes it needs" in blog
    assert "Late materialization" in blog
    assert "byte you never read" in blog  # blockquote is content


def test_blog_drops_boilerplate(blog):
    for boiler in (
        "Subscribe",            # nav
        "Example Engineering",  # masthead/logo
        "Home",                 # breadcrumb
        "Related posts",        # aside
        "SIMD and vectorized",  # related links
        "Great write-up",       # comments
        "Copyright 2026",       # footer
        "Follow us",            # footer social
        "dataLayer",            # script
        "max-width",            # style
    ):
        assert boiler not in blog, f"boilerplate leaked: {boiler!r}"


def test_blog_markdown_block_structure(blog):
    paras = blog.split("\n\n")
    assert paras[0].startswith("# ")
    assert 4 <= len(paras) <= 8
    assert all(p == " ".join(p.split()) for p in paras)  # normalized


def test_docs_page(docs):
    assert "# connect()" in docs
    assert "## Parameters" in docs
    assert "session handle" in docs
    assert "Coordinator hostname" in docs  # table cells are content
    assert "Installation guide" not in docs  # sidebar nav
    assert "cookies" not in docs  # cookie banner
    assert "Accept all" not in docs


def test_entities_unescaped():
    out = extract_main_text(
        "<p>Tom &amp; Jerry &lt;escaped&gt; and long enough to keep around.</p>"
    )
    assert out == "Tom & Jerry <escaped> and long enough to keep around."


def test_malformed_and_degenerate_inputs():
    assert extract_main_text("") == ""
    assert extract_main_text(None or "") == ""
    assert extract_main_text("plain text with no markup at all but plenty long") != ""
    assert "kept" in extract_main_text(
        "<p>unclosed and broken <b>markup long enough to be kept here"
    )
    # heading with no content after it is pruned
    assert extract_main_text("<nav><a href='/'>x</a></nav><h2>Lonely</h2>") == ""


def test_link_density_cutoff():
    linky = extract_main_text(
        "<div><a href='/a'>all of this block is one giant link text here</a></div>"
    )
    assert linky == ""
    prose = extract_main_text(
        "<p>Mostly prose with <a href='/a'>one link</a> inside a long sentence "
        "that keeps the overall link density comfortably low.</p>"
    )
    assert "Mostly prose" in prose


def test_spark_plan_is_arrow_batched(spark, sf_dir):
    """q45 runs the extractor as ArrowEvalPython (pandas UDF), never
    row-at-a-time BatchEvalPython."""
    from coldata_spark.registry import specs

    df = specs()["q45_html_extract"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
