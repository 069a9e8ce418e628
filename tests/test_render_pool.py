"""S2 rendered-page scan: pooled driver lifecycle with a fake renderer.

Reference bar: opendatalab.py:27-33 (driver pool), 47-49 (implicit wait),
82-97 (retry around driver errors).
"""

from __future__ import annotations

import pytest

from coldata_spark.ingest.render import RenderingFetcherPool, rendering_fetcher_factory


class FakeDriver:
    """Duck-typed Selenium driver that 'renders' deterministic HTML and can
    be scripted to crash on specific URLs (once each)."""

    instances = 0
    quits = 0

    def __init__(self, crash_urls=None):
        FakeDriver.instances += 1
        self.my_id = FakeDriver.instances
        self.crash_urls = crash_urls if crash_urls is not None else set()
        self.page_source = ""
        self.alive = True

    def get(self, url):
        assert self.alive, "get() on a quit driver"
        if url in self.crash_urls:
            self.crash_urls.discard(url)
            self.alive = False
            raise RuntimeError(f"chrome crashed rendering {url}")
        self.page_source = f"<html><body><p>rendered {url} by driver {self.my_id}</p></body></html>"

    def quit(self):
        self.alive = False
        FakeDriver.quits += 1


@pytest.fixture(autouse=True)
def _reset_counters():
    FakeDriver.instances = 0
    FakeDriver.quits = 0
    yield


def test_pool_reuses_drivers_round_robin():
    pool = RenderingFetcherPool(driver_factory=FakeDriver, pool_size=2)
    pages = [pool.fetch(f"https://example.org/page/{i}") for i in range(8)]
    assert FakeDriver.instances == 2  # 8 fetches, still only 2 drivers
    assert all("rendered https://example.org/page/" in p for p in pages)
    by_driver = {p.split("driver ")[1][0] for p in pages}
    assert len(by_driver) == 2  # both pool members served traffic
    pool.close()
    assert FakeDriver.quits == 2


def test_crashed_driver_is_replaced_and_fetch_retried():
    crash = {"https://example.org/flaky"}
    pool = RenderingFetcherPool(
        driver_factory=lambda: FakeDriver(crash_urls=crash),
        pool_size=1,
        max_retries=3,
        base_interval=0.0,
    )
    page = pool.fetch("https://example.org/flaky")  # crashes once, retried
    assert "rendered https://example.org/flaky" in page
    assert pool.replaced == 1
    assert FakeDriver.instances == 2  # original + replacement
    pool.close()


def test_permanent_failure_raises_after_retries():
    class AlwaysCrash(FakeDriver):
        def get(self, url):
            raise RuntimeError("boom")

    pool = RenderingFetcherPool(
        driver_factory=AlwaysCrash, pool_size=1, max_retries=3, base_interval=0.0
    )
    with pytest.raises(RuntimeError, match="failed after 3 attempts"):
        pool.fetch("https://example.org/dead")
    assert pool.replaced == 3  # every attempt burned and replaced a driver
    pool.close()


def test_factory_plugs_into_crawl_pipeline(spark):
    """End-to-end: seeds -> fetch_documents with the rendering factory —
    one pool per task, rendered HTML in the documents' info column."""
    from coldata_spark.ingest.crawl import CrawlConfig, crawl

    class LocalFakeDriver:
        """Defined inside the test so cloudpickle ships it by VALUE to the
        worker processes (the tests/ dir is not on the workers' sys.path)."""

        def __init__(self):
            self.page_source = ""

        def get(self, url):
            self.page_source = f"<html><body><p>rendered {url}</p></body></html>"

        def quit(self):
            pass

    urls = {"OpenDataLab": [f"https://example.org/ds/{i}" for i in range(12)]}
    existing = spark.createDataFrame([], "index string")
    factory = rendering_fetcher_factory(
        driver_factory=LocalFakeDriver, pool_size=2, max_retries=2
    )
    docs = crawl(
        spark, urls, existing, factory,
        CrawlConfig(fetch_parallelism=2, query_interval=0.0),
    ).collect()
    assert len(docs) == 12
    assert all(r["info"].startswith("<html><body><p>rendered ") for r in docs)
    assert all(len(r["index"]) == 64 for r in docs)  # sha256 pk


def test_selenium_default_raises_clearly_when_absent():
    from coldata_spark.ingest.render import selenium_driver_factory

    with pytest.raises(ImportError, match="driver_factory"):
        selenium_driver_factory()
