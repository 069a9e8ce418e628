"""Per-site discovery parsers vs recorded fixture pages (SURVEY §2.1 S6,
reference crawler parity: uci.py:31-48, pwc.py:22-80, kaggle.py:25-81,
opendatalab.py:44-61, huggingface.py:25-40)."""

from __future__ import annotations

import hashlib
import os

import pandas as pd

from coldata_spark.ingest import discovery as D

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "discovery")


def _page(name: str) -> str:
    with open(os.path.join(FIX, name)) as f:
        return f.read()


def test_uci_listing_dedupes_and_sorts_by_slug():
    """uci.py:44-48: every <h2>'s first <a href>, as a set, sorted by the
    last path segment.  The fixture plants a duplicate card, a non-dataset
    <h2> without a link, and nav/footer links that must not leak in."""
    links = D.uci_dataset_links(_page("uci_listing.html"))
    assert links == [
        "/dataset/2/adult",
        "/dataset/45/heart+disease",
        "/dataset/53/iris",
        "/dataset/186/wine+quality",
    ]


def test_pwc_modality_labels_from_sidebar():
    """pwc.py:34-38: only the 'Filter by Modality' section's filter-items,
    direct text only (the nested count span is excluded), normalized."""
    labels = D.pwc_modality_labels(_page("pwc_root.html"))
    assert labels == ["images", "texts", "point-cloud"]


def test_pwc_dataset_links_exclude_listing_root():
    links = D.pwc_dataset_links(_page("pwc_images_p1.html"))
    assert links == ["/dataset/imagenet", "/dataset/coco", "/dataset/cifar-10"]


def _pwc_fetch(url: str) -> str:
    """Recorded-page fetcher simulating PWC's out-of-range behavior: pages
    past the end serve the previous content again (the R5 stop signal)."""
    if url.endswith("/datasets"):
        return _page("pwc_root.html")
    mod = url.split("mod=")[1].split("&")[0]
    page = int(url.split("page=")[1])
    fixtures = {
        ("images", 1): "pwc_images_p1.html",
        ("images", 2): "pwc_images_p2.html",
        ("texts", 1): "pwc_texts_p1.html",
    }
    if mod == "point-cloud":
        return "<html><body><main></main></body></html>"
    last = max(p for (m, p) in fixtures if m == mod)
    return _page(fixtures[(mod, min(page, last))])


def test_pwc_discover_repeat_page_stop_matches_reference_loop():
    """The full pagination loop, with the reference's exact quirks: the
    repeated page is appended before the stop fires and output is sorted
    by slug WITHOUT dedup (the crawl loop's pk check dedupes downstream)."""
    got = D.pwc_discover(_pwc_fetch)
    assert got == sorted(
        [
            "/dataset/imagenet", "/dataset/coco", "/dataset/cifar-10",  # p1
            "/dataset/mnist", "/dataset/svhn",                          # p2
            "/dataset/mnist", "/dataset/svhn",                          # p3 == p2, appended then stop
            "/dataset/squad", "/dataset/glue",                          # texts p1
            "/dataset/squad", "/dataset/glue",                          # texts p2 == p1
        ],
        key=lambda x: x.split("/")[-1],
    )


def test_pwc_discover_attempt_budget_stops_early():
    # every link counts twice (raw + filtered, pwc.py:56,62): page 1 of
    # 'images' contributes 6 -> budget 6 stops after the first page
    got = D.pwc_discover(_pwc_fetch, num_attempts=6)
    assert sorted(got) == ["/dataset/cifar-10", "/dataset/coco", "/dataset/imagenet"]


def test_opendatalab_last_page_from_pagination():
    assert D.opendatalab_last_page(_page("opendatalab_p1.html")) == 57


def test_hf_listing_truncates_to_budget():
    class DS:
        def __init__(self, i):
            self.id = i

    listing = (DS(f"org/ds{i}") for i in range(100))
    assert D.hf_dataset_ids(listing, num_attempts=3) == [
        "org/ds0", "org/ds1", "org/ds2"
    ]
    assert D.hf_dataset_ids(["a/b", "c/d"]) == ["a/b", "c/d"]


def test_kaggle_slugs_match_reference_pandas_logic(spark):
    """kaggle.py:44-77 transcribed to pandas as the oracle; the Spark
    broadcast-join version must produce the identical slug set, including
    the user-over-org precedence and null-owner drop."""
    versions = [
        (1, "titanic"), (1, "titanic"), (2, "imagenet"), (3, "orphan"),
        (4, "org-owned"),
    ]
    datasets = [  # (Id, OwnerUserId, OwnerOrganizationId)
        (1, 10, None), (2, 11, 100), (3, None, None), (4, None, 101),
    ]
    users = [(10, "alice"), (11, "bob")]
    orgs = [(100, "acme"), (101, "ml-org")]

    sdf = D.kaggle_dataset_slugs(
        spark.createDataFrame(versions, ["DatasetId", "Slug"]),
        spark.createDataFrame(datasets, "Id LONG, OwnerUserId LONG, OwnerOrganizationId LONG"),
        spark.createDataFrame(users, ["Id", "UserName"]),
        spark.createDataFrame(orgs, ["Id", "Slug"]),
    )
    got = {r.slug for r in sdf.collect()}

    # -- reference logic (kaggle.py:44-77), pandas verbatim ----------------
    pv = pd.DataFrame(versions, columns=["DatasetId", "Slug"])
    pdss = pd.DataFrame(datasets, columns=["Id", "OwnerUserId", "OwnerOrganizationId"])
    pu = pd.DataFrame(users, columns=["Id", "UserName"])
    po = pd.DataFrame(orgs, columns=["Id", "Slug"])
    latest = pv[["DatasetId", "Slug"]].drop_duplicates()
    merged = latest.merge(pdss, left_on="DatasetId", right_on="Id", how="left")
    merged = merged.merge(pu[["Id", "UserName"]], left_on="OwnerUserId",
                          right_on="Id", how="left", suffixes=("", "_User"))
    merged = merged.merge(po[["Id", "Slug"]], left_on="OwnerOrganizationId",
                          right_on="Id", how="left", suffixes=("", "_Org"))
    merged["owner"] = merged.apply(
        lambda r: r["UserName"] if pd.notna(r["UserName"])
        else (r["Slug_Org"] if pd.notna(r["Slug_Org"]) else None), axis=1)
    merged["slug"] = merged["owner"] + "/" + merged["Slug"]
    expect = set(merged["slug"].dropna().drop_duplicates().tolist())

    assert got == expect == {"alice/titanic", "bob/imagenet", "ml-org/org-owned"}


def test_discovery_feeds_crawl_seed_path(spark):
    """End to end: parsed seeds -> seed DataFrame -> crawl() with a
    recorded fetcher; (url, index) match the reference's sha256-of-url pk
    (uci.py:52, crawler.py pk scheme)."""
    from coldata_spark.ingest import crawl as C

    root = "https://archive.ics.uci.edu"
    seeds = {
        "UCI": [root + p for p in D.uci_dataset_links(_page("uci_listing.html"))]
    }
    existing = spark.createDataFrame([], "index STRING")
    docs = C.crawl(
        spark,
        seeds,
        existing,
        lambda: (lambda url: f"recorded page for {url}"),
        C.CrawlConfig(fetch_parallelism=2),
    ).collect()
    got = {(r.url, r["index"]) for r in docs}
    expect = {
        (u, hashlib.sha256(u.encode()).hexdigest()) for u in seeds["UCI"]
    }
    assert got == expect


def test_aws_registry_links_sorted_by_second_segment():
    """aws.py:40-45: first <a href> of every div.dataset card (nested
    wrappers included, nav/footer/tag links excluded), set-deduped, sorted
    by the SECOND path segment — not the first, which is the provider."""
    links = D.aws_dataset_links(_page("aws_root.html"))
    assert links == [
        "/allen/brain-atlas",   # brain-atlas
        "/commoncrawl/corpus",  # corpus
        "/noaa/goes",           # goes — duplicate card collapsed
    ]


def test_bdsp_content_links_filter_roots_and_trailing_slash():
    """bdsp.py:43-50: a[href^='/content/'] with >= 2 slashes, trailing
    slash stripped (so '/x/' and '/x' collapse), minus the listing root
    and its ?types=0 variant, sorted."""
    links = D.bdsp_content_links(_page("bdsp_about.html"))
    assert links == [
        "/content/bdsp-psg",
        "/content/hsp-sleep",
        "/content/icare-eeg/1.0",
    ]


def test_ieee_topic_tags_sorted_unique():
    assert D.ieee_topic_tags(_page("ieee_datasets.html")) == [
        "biomedical", "machine-learning", "signal-processing"
    ]


def _ieee_fetch(url: str) -> str:
    """Recorded fetcher: machine-learning has two pages then an empty one;
    biomedical page 0 repeats forever (the repeat-page stop signal);
    signal-processing is empty from the start."""
    if url.endswith("/datasets"):
        return _page("ieee_datasets.html")
    cat = url.split("/topic-tags/")[1].split("?")[0]
    page = int(url.split("page=")[1])
    if cat == "machine-learning":
        if page == 0:
            return _page("ieee_ml_p0.html")
        if page == 1:
            return _page("ieee_ml_p1.html")
        return "<html><body><main></main></body></html>"
    if cat == "biomedical":
        return (
            '<html><body><a href="/documents/eeg-sleep">EEG Sleep</a>'
            '<a href="/documents/mri-knee">MRI Knee</a></body></html>'
        )
    return "<html><body><main></main></body></html>"


def test_ieee_discover_paginates_with_empty_and_repeat_stops():
    """ieeedp.py:40-70: biomedical stops when page 1 repeats page 0
    (its links appear ONCE — unlike PWC, the repeat page is compared
    before appending); machine-learning stops on the empty page 2;
    signal-processing contributes nothing; output sorted by slug."""
    got = D.ieee_discover(_ieee_fetch)
    assert got == sorted(
        [
            "/documents/uav-imagery", "/documents/ecg-arrhythmia",
            "/documents/traffic-flows",                      # ml p0
            "/documents/solar-irradiance", "/documents/battery-cycles",  # ml p1
            "/documents/eeg-sleep", "/documents/mri-knee",   # biomedical p0
        ],
        key=lambda x: x.split("/")[-1],
    )


def test_ieee_discover_attempt_budget_stops_after_page():
    """The budget check lands AFTER a page is appended (ieeedp.py:59-66):
    budget 2 is consumed by biomedical page 0's 2 links and stops the
    whole sweep before machine-learning is visited."""
    got = D.ieee_discover(_ieee_fetch, num_attempts=2)
    assert sorted(got) == ["/documents/eeg-sleep", "/documents/mri-knee"]
