"""runner.py — the config-driven main.py-equivalent pass, end to end with
an injected fetcher and the verbatim reference config fixture."""

from __future__ import annotations

from coldata_spark import config as CF
from coldata_spark import runner as R
from tests.test_config import FIXTURE

URLS = {
    "BrainDataSciencePlatform": [
        "https://bdsp.example/a",
        "https://bdsp.example/b",
        "https://bdsp.example/c",
    ],
    # disabled in the shipped config (num_attempts: 0) — must be skipped
    "UCI": ["https://uci.example/x"],
}


def _make_factory():
    # built inside a function (pickled by VALUE via cloudpickle) — a
    # module-level def in a test file would pickle by reference and fail
    # on executors that cannot import the tests package
    def fetcher_factory():
        def fetch(url: str) -> str:
            return f"dataset page for {url} with enough text to chunk " * 8

        return fetch

    return fetcher_factory


def test_run_once_crawls_enabled_sources_only(spark, tmp_path):
    fake_fetcher_factory = _make_factory()
    cfg = CF.load(FIXTURE)
    cfg.sources["BrainDataSciencePlatform"].crawl.query_interval = 0.0
    out = R.run_once(
        spark, cfg, str(tmp_path), URLS, fake_fetcher_factory
    )
    # BDSP is capped at num_attempts=1 (the reference quirk), UCI disabled
    assert out["n_new"] == 1
    docs = spark.read.parquet(out["store"])
    assert {r.website for r in docs.collect()} == {"BrainDataSciencePlatform"}
    assert out["index"]  # vdb.renew is True in the shipped config

    # second pass: the cap selects the SAME first url, the anti-join drops
    # it as existing -> zero new docs (faithful to re-running main.py)
    out2 = R.run_once(spark, cfg, str(tmp_path), URLS, fake_fetcher_factory)
    assert out2["n_existing"] == 1 and out2["n_new"] == 0


def test_run_once_uncapped_and_search(spark, tmp_path):
    fake_fetcher_factory = _make_factory()
    cfg = CF.load(FIXTURE)
    cfg.sources["BrainDataSciencePlatform"].crawl.num_attempts = 100
    cfg.sources["BrainDataSciencePlatform"].crawl.query_interval = 0.0
    out = R.run_once(
        spark,
        cfg,
        str(tmp_path),
        URLS,
        fake_fetcher_factory,
        search_queries=["dataset page"],
    )
    assert out["n_new"] == 3
    res = out["search"]
    rows = res.collect()
    assert 0 < len(rows) <= cfg.vdb.limit  # k from config.yml limit: 4
    assert rows[0].rank == 1
    # ranked-display projection mirrors the reference demo fields
    assert {"q_text", "rank", "score", "preview"} <= set(res.columns)


def test_run_on_schedule_drives_config_cadence(spark, tmp_path):
    """The config's scheduler.period/init_run drive run_once on the
    reference's cadence: init pass immediately, then one pass per day
    boundary under a fake clock."""
    from datetime import datetime, timedelta

    fake_fetcher_factory = _make_factory()
    cfg = CF.load(FIXTURE)
    assert cfg.scheduler.init_run and cfg.scheduler.period == "day"
    cfg.sources["BrainDataSciencePlatform"].crawl.num_attempts = 100
    cfg.sources["BrainDataSciencePlatform"].crawl.query_interval = 0.0

    clock = {"t": datetime(2026, 3, 1, 12, 0)}

    def now():
        return clock["t"]

    def sleep(s):
        clock["t"] = clock["t"] + timedelta(seconds=s)

    n = R.run_on_schedule(
        spark, cfg, str(tmp_path), URLS, fake_fetcher_factory,
        max_runs=3, now=now, sleep=sleep,
    )
    assert n == 3  # init pass + two day-boundary passes
    assert clock["t"] >= datetime(2026, 3, 3)  # slept across 2 midnights
    docs = spark.read.parquet(R.store_path(cfg, str(tmp_path)))
    # idempotent cadence: repeated passes insert nothing new
    assert docs.count() == 3
