"""Per-site discovery parsers feeding the crawl seed path (SURVEY §2.1 S6).

The reference's crawlers each encode real per-site listing logic before the
generic fetch loop takes over.  These are those parsers, ported against
recorded HTML fixtures (tests/fixtures/discovery/) so they are verifiable
without network access, emitting exactly the seed lists ingest/crawl.py's
``seed_dataframe`` consumes:

  * UCI        — one bulk listing page; every <h2>'s first <a href> is a
                 dataset link; dedupe + sort by last path segment
                 (reference src/coldata/crawler/uci.py:31-48).
  * PWC        — modality labels from the 'Filter by Modality' sidebar,
                 then per-label pagination collecting a[href^="/dataset"]
                 (minus the listing root), stopping when a page repeats
                 the previous page's results — the R5 stop rule
                 (pwc.py:22-80).
  * Kaggle     — no HTML at all: the Meta-Kaggle CSV dump is joined
                 relationally to resolve <owner>/<slug> ids
                 (kaggle.py:25-81) — expressed as Spark joins here since
                 the inputs are real tables.
  * OpenDataLab— the last-page number read from the ant-design pagination
                 widget drives a deterministic page loop
                 (opendatalab.py:44-61).
  * HuggingFace— an API listing truncated to the attempt budget
                 (huggingface.py:25-40); the parser is a pure truncation.
  * AWS        — one registry root page; the first <a href> inside every
                 div.dataset card, deduped and sorted by the SECOND path
                 segment (aws.py:40-46).
  * BDSP       — the about/database page; every a[href^="/content/"] with
                 at least two slashes, trailing-slash-stripped, minus the
                 listing root and its ?types=0 variant (bdsp.py:39-52).
  * IEEE DataPort — two stages: topic-tag categories harvested from the
                 /datasets page (ieeedp.py:23-29), then per-category
                 pagination collecting a[href^="/documents/"] with an
                 empty-or-repeat-page stop (ieeedp.py:40-70).

Parsers are stdlib-only (html.parser event callbacks — the container has
no bs4); each mirrors the reference's selector semantics, cited above, not
its implementation.  Discovery stays driver-side by design: pagination is
sequential (each page decides whether a next page exists), and its output
is a few thousand strings — the cluster takes over at seed_dataframe.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from html.parser import HTMLParser


def _attr(attrs: list[tuple[str, str | None]], name: str) -> str | None:
    for k, v in attrs:
        if k == name:
            return v
    return None


def _classes(attrs) -> set[str]:
    return set((_attr(attrs, "class") or "").split())


# -- UCI --------------------------------------------------------------------


class _UciParser(HTMLParser):
    """First <a href> inside every <h2> (uci.py:44-46)."""

    def __init__(self):
        super().__init__()
        self.links: set[str] = set()
        self._h2_depth = 0
        self._taken_in_h2 = False

    def handle_starttag(self, tag, attrs):
        if tag == "h2":
            self._h2_depth += 1
            self._taken_in_h2 = False
        elif tag == "a" and self._h2_depth and not self._taken_in_h2:
            href = _attr(attrs, "href")
            if href:
                self.links.add(href)
            self._taken_in_h2 = True

    def handle_endtag(self, tag):
        if tag == "h2" and self._h2_depth:
            self._h2_depth -= 1


def uci_dataset_links(html: str) -> list[str]:
    """Hrefs of the bulk UCI listing, deduped and sorted by the dataset
    slug (the last path segment) — uci.py:44-48 exactly."""
    p = _UciParser()
    p.feed(html)
    return sorted(p.links, key=lambda x: x.split("/")[-1])


# -- PapersWithCode ---------------------------------------------------------


class _PwcModalityParser(HTMLParser):
    """a.filter-item direct-text labels in the section whose
    div.filter-name says 'Filter by Modality' (pwc.py:34-38)."""

    def __init__(self):
        super().__init__()
        self.labels: list[str] = []
        self._in_filter_name = False
        self._armed = False  # inside the modality section
        self._in_item = False
        self._item_text: list[str] = []

    def handle_starttag(self, tag, attrs):
        cls = _classes(attrs)
        if tag == "div" and "filter-name" in cls:
            self._in_filter_name = True
            self._armed = False  # a new section header closes the previous
        elif tag == "a" and "filter-item" in cls and self._armed:
            self._in_item = True
            self._item_text = []
        elif self._in_item and tag in ("span", "em", "b"):
            # nested elements end the DIRECT text (find(text, recursive=False))
            self._in_item = False
            self._flush()

    def handle_data(self, data):
        if self._in_filter_name and "Filter by Modality" in data:
            self._armed = True
        elif self._in_item:
            self._item_text.append(data)

    def _flush(self):
        label = "".join(self._item_text).strip()
        if label:
            self.labels.append(label.lower().replace(" ", "-"))
        self._item_text = []

    def handle_endtag(self, tag):
        if tag == "div" and self._in_filter_name:
            self._in_filter_name = False
        elif tag == "a" and self._in_item:
            self._in_item = False
            self._flush()


def pwc_modality_labels(html: str) -> list[str]:
    p = _PwcModalityParser()
    p.feed(html)
    return p.labels


class _PwcLinkParser(HTMLParser):
    """All a[href^='/dataset'] whose last segment isn't the listing root
    'datasets' (pwc.py:55-61), in document order with duplicates kept —
    the caller's repeat-page stop rule compares ordered tuples."""

    def __init__(self):
        super().__init__()
        self.links: list[str] = []
        self.raw_count = 0  # matches a[href^='/dataset'] BEFORE the root
        # filter — the reference budget counts both (pwc.py:56,62)

    def handle_starttag(self, tag, attrs):
        if tag != "a":
            return
        href = _attr(attrs, "href")
        if not href or not href.startswith("/dataset"):
            return
        self.raw_count += 1
        if href.split("/")[-1] != "datasets":
            self.links.append(href)


def pwc_dataset_links(html: str) -> list[str]:
    p = _PwcLinkParser()
    p.feed(html)
    return p.links


def pwc_discover(
    fetch: Callable[[str], str],
    root_url: str = "https://paperswithcode.com",
    init_page: int = 1,
    num_attempts: int | None = None,
) -> list[str]:
    """Full PWC discovery loop: modality labels from the listing root, then
    per-label pagination until a page repeats the previous page's link
    tuple (the R5 stop — an out-of-range PWC page serves the same content
    again rather than 404ing), or the attempt budget is spent.  Mirrors
    pwc.py:40-79 including its shared-across-labels last_result compare.
    Returns dataset paths sorted by slug (pwc.py:78)."""
    labels = pwc_modality_labels(fetch(root_url + "/datasets"))
    datasets: list[str] = []
    attempts = 0
    last_result: tuple[str, ...] | None = None
    for label in labels:
        page = init_page
        while True:
            parser = _PwcLinkParser()
            parser.feed(fetch(f"{root_url}/datasets/?mod={label}&page={page}"))
            result = parser.links
            # faithful to pwc.py:56-69 including its quirks: the repeated
            # page's links ARE appended before the stop fires (the fetch
            # loop's pk-exists check dedupes them later), and every link
            # counts against the budget twice — once raw, once filtered
            attempts += parser.raw_count + len(result)
            datasets.extend(result)
            if last_result == tuple(result):
                break
            last_result = tuple(result)
            if num_attempts is not None and attempts >= num_attempts:
                return sorted(datasets, key=lambda x: x.split("/")[-1])
            page += 1
    return sorted(datasets, key=lambda x: x.split("/")[-1])


# -- Kaggle -----------------------------------------------------------------


def kaggle_dataset_slugs(dataset_versions, datasets, users, orgs):
    """Resolve Meta-Kaggle CSV tables to distinct '<owner>/<slug>' dataset
    ids — the reference's five pandas merges (kaggle.py:44-77) as Spark
    joins, because at full Meta-Kaggle scale (millions of rows) these ARE
    relational joins:

      versions(DatasetId, Slug) distinct
        -> left join datasets on Id          (owner ids)
        -> left join users on OwnerUserId    (user name)
        -> left join orgs on OwnerOrganizationId (org slug)
        -> owner = coalesce(user, org); slug = owner || '/' || Slug

    The datasets/users/orgs sides are dimension-shaped -> broadcast; the
    only shuffle is the final distinct on the slug."""
    from pyspark.sql import functions as F

    latest = dataset_versions.select("DatasetId", "Slug").distinct()
    merged = (
        latest.join(
            F.broadcast(
                datasets.select(
                    F.col("Id").alias("_did"),
                    "OwnerUserId",
                    "OwnerOrganizationId",
                )
            ),
            latest.DatasetId == F.col("_did"),
            "left",
        )
        .join(
            F.broadcast(
                users.select(F.col("Id").alias("_uid"), "UserName")
            ),
            F.col("OwnerUserId") == F.col("_uid"),
            "left",
        )
        .join(
            F.broadcast(
                orgs.select(F.col("Id").alias("_oid"), F.col("Slug").alias("OrgSlug"))
            ),
            F.col("OwnerOrganizationId") == F.col("_oid"),
            "left",
        )
        .withColumn("owner", F.coalesce("UserName", "OrgSlug"))
        .filter(F.col("owner").isNotNull())
        .select(F.concat_ws("/", "owner", "Slug").alias("slug"))
        .distinct()
    )
    return merged


# -- OpenDataLab ------------------------------------------------------------


class _AntPaginationParser(HTMLParser):
    """title attributes of li.ant-pagination-item (opendatalab.py:50-53)."""

    def __init__(self):
        super().__init__()
        self.titles: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "li" and "ant-pagination-item" in _classes(attrs):
            t = _attr(attrs, "title")
            if t is not None:
                self.titles.append(t)


def opendatalab_last_page(html: str) -> int:
    """Last page number from the rendered pagination widget — the loop
    bound for the deterministic page sweep (opendatalab.py:53-56)."""
    p = _AntPaginationParser()
    p.feed(html)
    if not p.titles:
        raise ValueError("no ant-pagination-item elements found")
    return int(p.titles[-1])


# -- AWS Open Data registry -------------------------------------------------


class _AwsParser(HTMLParser):
    """First <a href> inside every div.dataset card (aws.py:42-43)."""

    def __init__(self):
        super().__init__()
        self.links: set[str] = set()
        self._card_depth = 0
        self._taken_in_card = False
        self._div_stack: list[bool] = []  # True for div.dataset opens

    def handle_starttag(self, tag, attrs):
        if tag == "div":
            is_card = "dataset" in _classes(attrs)
            self._div_stack.append(is_card)
            if is_card:
                self._card_depth += 1
                self._taken_in_card = False
        elif tag == "a" and self._card_depth and not self._taken_in_card:
            href = _attr(attrs, "href")
            if href:
                self.links.add(href)
            self._taken_in_card = True

    def handle_endtag(self, tag):
        if tag == "div" and self._div_stack:
            if self._div_stack.pop():
                self._card_depth -= 1


def aws_dataset_links(html: str) -> list[str]:
    """Hrefs of the AWS registry root, deduped as a set and sorted by the
    second path segment (the dataset slug) — aws.py:40-45 exactly."""
    p = _AwsParser()
    p.feed(html)
    return sorted(p.links, key=lambda x: x.split("/")[1])


# -- Brain Data Science Platform --------------------------------------------


class _BdspParser(HTMLParser):
    """All a[href^='/content/'] hrefs, in a set (bdsp.py:43-47)."""

    def __init__(self):
        super().__init__()
        self.hrefs: set[str] = set()

    def handle_starttag(self, tag, attrs):
        if tag != "a":
            return
        href = _attr(attrs, "href")
        if href and href.startswith("/content/"):
            self.hrefs.add(href)


def bdsp_content_links(html: str) -> list[str]:
    """Content-page links from the BDSP database listing: at least two
    slashes (so '/content/<slug>' and versioned '/content/<slug>/1.0/'
    qualify), trailing slash stripped, minus the listing root '/content'
    and its '/content/?types=0' filter variant, sorted — bdsp.py:43-50.
    The reference ``set.remove``s those two entries (KeyError if the page
    layout drops them); here ``discard`` tolerates their absence since the
    filter intent, not the crash, is the semantic."""
    p = _BdspParser()
    p.feed(html)
    datasets = {h.rstrip("/") for h in p.hrefs if h.count("/") >= 2}
    datasets.discard("/content")
    datasets.discard("/content/?types=0")
    return sorted(datasets)


# -- IEEE DataPort -----------------------------------------------------------


class _HrefPrefixParser(HTMLParser):
    """All a[href^=prefix] hrefs in document order, duplicates kept."""

    def __init__(self, prefix: str):
        super().__init__()
        self.prefix = prefix
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag != "a":
            return
        href = _attr(attrs, "href")
        if href and href.startswith(self.prefix):
            self.hrefs.append(href)


def ieee_topic_tags(html: str) -> list[str]:
    """Category slugs from the /datasets page: the third path segment of
    every a[href^='/topic-tags/'], sorted unique — ieeedp.py:23-29."""
    p = _HrefPrefixParser("/topic-tags/")
    p.feed(html)
    return sorted({h.split("/")[2] for h in p.hrefs})


def ieee_document_links(html: str) -> list[str]:
    """a[href^='/documents/'] hrefs, first-occurrence order preserved,
    duplicates dropped (the reference's dict.fromkeys, ieeedp.py:51-53)."""
    p = _HrefPrefixParser("/documents/")
    p.feed(html)
    return list(dict.fromkeys(p.hrefs))


def ieee_discover(
    fetch: Callable[[str], str],
    root_url: str = "https://ieee-dataport.org",
    num_attempts: int | None = None,
) -> list[str]:
    """Full IEEE DataPort discovery: harvest topic-tag categories from the
    listing root, then paginate each category from page 0 collecting
    document links, stopping a category when a page is empty or repeats
    the previous page's hrefs (R5 stop, per-category ``last`` — unlike
    PWC's shared-across-labels compare), and stopping everything once the
    attempt budget is spent.  Returns document paths sorted by slug (the
    last path segment) — ieeedp.py:40-70 faithfully, including the budget
    check landing AFTER a page's links are appended."""
    categories = ieee_topic_tags(fetch(f"{root_url}/datasets"))
    datasets: list[str] = []
    attempts = 0
    for cat in categories:
        page = 0
        last: list[str] | None = None
        while True:
            hrefs = ieee_document_links(
                fetch(f"{root_url}/topic-tags/{cat}?page={page}")
            )
            if not hrefs or hrefs == last:
                break
            datasets += hrefs
            last = hrefs
            attempts += len(hrefs)
            if num_attempts is not None and attempts >= num_attempts:
                break
            page += 1
        # `is not None`, not truthiness: a ZERO budget must stop the outer
        # category loop too, not fetch one page per category
        if num_attempts is not None and attempts >= num_attempts:
            break
    return sorted(datasets, key=lambda x: x.split("/")[-1])


# -- HuggingFace ------------------------------------------------------------


def hf_dataset_ids(listing: Iterable, num_attempts: int | None = None) -> list[str]:
    """Hub listing -> dataset ids, truncated to the attempt budget
    (huggingface.py:31-39).  ``listing`` yields objects with ``.id`` (the
    hub client's dataset info) or plain strings."""
    out: list[str] = []
    for ds in listing:
        out.append(ds if isinstance(ds, str) else ds.id)
        if num_attempts is not None and len(out) >= num_attempts:
            break
    return out
