"""Rendered-page fetching with a pooled headless-browser driver (S2).

The reference crawls JS-rendered listings through a pool of headless Chrome
drivers (reference opendatalab.py:27-33 builds the pool; 47-49 and 82-97
get + implicit-wait + page_source per URL).  Spark-native shape: one
driver POOL per mapInPandas task (created by the ``FetcherFactory`` seam in
ingest/crawl.py), drivers round-robined across that task's URLs, crashed
drivers quit and replaced, everything quit when the task's fetcher is
garbage-collected or explicitly closed.

The driver object is injectable and duck-typed to the Selenium surface the
reference uses — ``get(url)``, ``page_source``, ``quit()`` — so tests run a
fake renderer and a real ``selenium.webdriver`` drops in unchanged.
"""

from __future__ import annotations

import time
from collections.abc import Callable

# Duck-typed Selenium driver surface: get(url) -> None, .page_source, .quit()
DriverFactory = Callable[[], object]


def selenium_driver_factory() -> object:  # pragma: no cover - needs selenium
    """Default real driver: headless Chrome via Selenium (reference
    opendatalab.py:27-33).  Import-try: raises a clear error where selenium
    is absent (this container); tests inject fakes instead."""
    try:
        from selenium import webdriver
        from selenium.webdriver.chrome.options import Options
    except ImportError as exc:
        raise ImportError(
            "selenium is not installed — pass a driver_factory (any object "
            "with get/page_source/quit) to RenderingFetcherPool"
        ) from exc
    opts = Options()
    opts.add_argument("--headless=new")
    opts.add_argument("--no-sandbox")
    opts.add_argument("--disable-dev-shm-usage")
    return webdriver.Chrome(options=opts)


class RenderingFetcherPool:
    """A fixed-size pool of rendering drivers serving one fetch task.

    * ``fetch(url)``: pick the next driver round-robin, ``get`` the page,
      optionally wait ``render_wait`` seconds for JS to settle (the
      reference's implicit wait, opendatalab.py:47-49), return
      ``page_source``.
    * Crash recovery: a driver that raises is quit and REPLACED, and the
      fetch retried on the fresh driver up to ``max_retries`` times with
      exponential backoff — a dead Chrome must not poison the pool
      (opendatalab.py:82-97 retries around driver errors).
    * ``close()`` quits every driver; also runs on ``__del__`` so task
      teardown reclaims the browsers.
    """

    def __init__(
        self,
        driver_factory: DriverFactory = selenium_driver_factory,
        pool_size: int = 2,
        render_wait: float = 0.0,
        max_retries: int = 3,
        backoff: float = 2.0,
        base_interval: float = 0.01,
    ):
        if pool_size < 1:
            raise ValueError("pool_size must be >= 1")
        self._factory = driver_factory
        self._render_wait = render_wait
        self._max_retries = max_retries
        self._backoff = backoff
        self._base_interval = base_interval
        self._drivers = [driver_factory() for _ in range(pool_size)]
        self._next = 0
        self.created = pool_size  # lifecycle accounting (tests / metrics)
        self.replaced = 0

    def _replace(self, idx: int) -> None:
        try:
            self._drivers[idx].quit()
        except Exception:
            pass  # already-dead driver: quit is best-effort
        self._drivers[idx] = self._factory()
        self.created += 1
        self.replaced += 1

    def fetch(self, url: str) -> str:
        idx = self._next
        self._next = (self._next + 1) % len(self._drivers)
        interval = self._base_interval
        last_exc: Exception | None = None
        for attempt in range(self._max_retries):
            driver = self._drivers[idx]
            try:
                driver.get(url)
                if self._render_wait:
                    time.sleep(self._render_wait)
                return driver.page_source
            except Exception as exc:
                last_exc = exc
                self._replace(idx)
                if attempt < self._max_retries - 1:
                    time.sleep(interval)
                    interval *= self._backoff
        raise RuntimeError(f"rendering {url} failed after {self._max_retries} attempts") from last_exc

    def close(self) -> None:
        for d in self._drivers:
            try:
                d.quit()
            except Exception:
                pass
        self._drivers = []

    def __del__(self):  # pragma: no cover - GC timing
        self.close()


def rendering_fetcher_factory(
    driver_factory: DriverFactory = selenium_driver_factory,
    pool_size: int = 2,
    render_wait: float = 0.0,
    max_retries: int = 3,
) -> Callable[[], Callable[[str], str]]:
    """Adapter to ingest/crawl.py's ``FetcherFactory`` seam: each task
    builds one pool and fetches through it, so ``fetch_documents`` /
    ``crawl`` gain rendered-page support with no other change."""

    def factory() -> Callable[[str], str]:
        pool = RenderingFetcherPool(
            driver_factory=driver_factory,
            pool_size=pool_size,
            render_wait=render_wait,
            max_retries=max_retries,
        )

        def fetch(url: str) -> str:
            return pool.fetch(url)

        fetch.pool = pool  # expose for lifecycle assertions / explicit close
        return fetch

    return factory
