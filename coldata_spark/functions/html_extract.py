"""Readability-style HTML main-content extraction (T3).

The reference runs ``trafilatura.extract(html, output_format='markdown')``
on every crawled page (reference src/coldata/crawler/uci.py:56, aws.py:55,
pwc.py:87; config src/config.yml:61-62).  That library is not in this
container, so this module implements the same public-knowledge idea from
scratch: segment the page into text blocks, score each block by boilerplate
signals (link density, container tags, class/id hints, length), keep the
content blocks, and emit markdown-ish text (``#`` headings, blank-line
separated blocks).

This is a genuine Pandas-UDF use case — HTML parsing is not expressible in
built-in SQL functions.  The UDF is Arrow-batched (one Python call per
batch, not per row) and the parser is the stdlib ``html.parser`` state
machine: no quadratic regex backtracking, robust to malformed markup.

Scale: pure flatMap shape — no shuffle, no state across rows.  Upstream
callers should ``fan_out`` single-row-group inputs so the CPU-heavy parse
stage uses every core.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Content never lives in these subtrees.
_SKIP_TAGS = {"script", "style", "noscript", "template", "svg", "head", "iframe"}
# Structural boilerplate containers.
_BOILER_TAGS = {"nav", "header", "footer", "aside", "form", "button", "figcaption"}
# Tags that delimit text blocks.
_BLOCK_TAGS = {
    "p", "div", "article", "section", "main", "li", "ul", "ol", "table",
    "tr", "td", "th", "pre", "blockquote", "body", "br", "hr",
    "h1", "h2", "h3", "h4", "h5", "h6",
}
# class/id/role hints marking boilerplate containers (readability-style).
_BOILER_HINT = re.compile(
    r"nav|menu|footer|sidebar|side-bar|comment|banner|breadcrumb|related"
    r"|share|social|cookie|advert|promo|popup|masthead",
    re.I,
)
# Blocks shorter than this (normalized chars) are dropped unless headings.
MIN_BLOCK_CHARS = 25
# Blocks with a higher fraction of link text are treated as navigation.
MAX_LINK_DENSITY = 0.33


@dataclass
class _Block:
    text: str
    chars: int
    link_chars: int
    boiler: bool
    heading: int  # 0 = body text, 1-6 = h1-h6


class _Collector(HTMLParser):
    """Stream the document once, flushing a block at every block-tag edge."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._parts: list[str] = []
        self._link_chars = 0
        self._cur_boiler = False
        self._stack: list[tuple[str, bool, bool]] = []
        self._skip = 0
        self._boiler = 0
        self._link = 0
        self._heading = 0

    def _flush(self) -> None:
        text = " ".join(" ".join(self._parts).split())
        if text:
            self.blocks.append(
                _Block(
                    text=text,
                    chars=len(text),
                    link_chars=min(self._link_chars, len(text)),
                    boiler=self._cur_boiler or self._boiler > 0,
                    heading=self._heading,
                )
            )
        self._parts = []
        self._link_chars = 0
        self._cur_boiler = False

    def handle_starttag(self, tag, attrs):
        skip = tag in _SKIP_TAGS
        boiler = tag in _BOILER_TAGS
        if not boiler and tag in ("div", "section", "ul", "ol", "span"):
            blob = " ".join(
                v for k, v in attrs if k in ("class", "id", "role") and v
            )
            boiler = bool(blob and _BOILER_HINT.search(blob))
        if tag in _BLOCK_TAGS or boiler:
            self._flush()
            if len(tag) == 2 and tag[0] == "h" and tag[1].isdigit():
                self._heading = int(tag[1])
            else:
                # a new non-heading block ends any UNCLOSED heading — a
                # leaked _heading would mark every later block as heading
                # (bypassing the prose-length filter and mis-prefixing '#')
                self._heading = 0
        if tag == "a":
            self._link += 1
        if tag in ("br", "hr"):  # void separators: no stack entry
            return
        self._stack.append((tag, boiler, skip))
        self._skip += skip
        self._boiler += boiler

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _BLOCK_TAGS or tag in _BOILER_TAGS:
            self._flush()
        # pop to the matching open tag (tolerates unclosed children).
        # ALL counters are restored from the popped entries — _link and
        # _heading included: restoring only _boiler/_skip leaked the link
        # counter on any unclosed <a>, after which every later block's
        # link density hit 100% and the whole page extracted as empty
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                for t, b, s in self._stack[i:]:
                    self._boiler -= b
                    self._skip -= s
                    if t == "a" and self._link:
                        self._link -= 1
                    if len(t) == 2 and t[0] == "h" and t[1].isdigit():
                        self._heading = 0
                del self._stack[i:]
                break

    def handle_data(self, data):
        if self._skip or not data:
            return
        self._parts.append(data)
        if self._boiler:
            self._cur_boiler = True
        if self._link:
            self._link_chars += len(" ".join(data.split()))


def extract_main_text(html: str) -> str:
    """Main-content extraction -> markdown-ish text.

    Keeps blocks that are (a) outside boilerplate containers, (b) below the
    link-density cutoff, and (c) long enough to be prose — headings are
    exempt from (c) but pruned when nothing follows them.  Blocks join with
    blank lines; headings carry ``#`` markers like trafilatura's markdown.
    """
    if not html:
        return ""
    c = _Collector()
    try:
        c.feed(html)
        c.close()
    except Exception:
        return ""  # pathological markup: empty, never a crash
    c._flush()

    kept: list[tuple[str, bool]] = []  # (rendered, is_heading)
    for b in c.blocks:
        if b.boiler:
            continue
        if b.chars and b.link_chars / b.chars > MAX_LINK_DENSITY:
            continue
        if b.heading:
            kept.append(("#" * b.heading + " " + b.text, True))
        elif b.chars >= MIN_BLOCK_CHARS:
            kept.append((b.text, False))
    # prune trailing headings with no content after them
    while kept and kept[-1][1]:
        kept.pop()
    return "\n\n".join(t for t, _ in kept)


@pandas_udf(StringType())
def html_to_text(html):  # pragma: no cover — exercised via Spark plans
    """Arrow-batched column form of :func:`extract_main_text`."""
    return html.map(lambda h: extract_main_text(h) if h is not None else None)


def escape_html_text(col: Column) -> Column:
    """JVM-side escaping for embedding raw text into synthesized HTML so a
    parse round-trip returns the original characters."""
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    out = F.replace(out, F.lit(">"), F.lit("&gt;"))
    return out
