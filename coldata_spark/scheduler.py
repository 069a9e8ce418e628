"""Periodic refresh cadence (SURVEY §2.9 R1) — the reference's scheduler
loop (reference src/scheduler.py:21-33: day/week/month at midnight via the
`schedule` package, optional run-at-start src/scheduler.py:42-43)
re-expressed as a pure-function cadence plus a clock-injectable loop.

Spark-side, one "crawl run" is a batch ingest pass (ingest/crawl.crawl_all
_sources -> upsert) or an availableNow streaming refresh
(streaming/events.run_available_now): process everything new, then stop.
The scheduler's only job is WHEN to start the next pass, so it is driver-
side and deliberately free of Spark imports — a real deployment hands
``run_scheduled`` the refresh callable, while cron/Airflow users call
``next_run`` to materialize the same fire times.

Faithful quirk: the reference schedules "month" as every(30).day — a fixed
30-day stride, not a calendar month (scheduler.py:26-28).  Mirrored here
and documented rather than silently "fixed", so a user migrating keeps
their cadence.
"""

from __future__ import annotations

import time as _time
from collections.abc import Callable
from datetime import datetime, timedelta

PERIOD_DAYS = {"day": 1, "week": 7, "month": 30}


def next_run(after: datetime, period: str) -> datetime:
    """First fire time strictly after ``after``: the next midnight, then
    every PERIOD_DAYS[period] days at midnight from there."""
    if period not in PERIOD_DAYS:
        raise ValueError(
            f"Invalid period {period!r}. Choose 'day', 'week', or 'month'."
        )
    midnight = after.replace(hour=0, minute=0, second=0, microsecond=0)
    first = midnight + timedelta(days=1)
    return first


def run_times(start: datetime, period: str, n: int) -> list[datetime]:
    """The first ``n`` fire times after ``start`` — what a cron/Airflow
    migration would materialize."""
    t = next_run(start, period)  # validates the period
    step = timedelta(days=PERIOD_DAYS[period])
    return [t + i * step for i in range(n)]


def run_scheduled(
    run: Callable[[], None],
    period: str = "day",
    init_run: bool = False,
    max_runs: int | None = None,
    now: Callable[[], datetime] = datetime.now,
    sleep: Callable[[float], None] = _time.sleep,
) -> int:
    """The reference's scheduler main loop (scheduler.py:36-52): optional
    immediate pass, then fire ``run`` at each cadence boundary.  A failing
    pass is logged and the cadence continues (scheduler.py:14-16 swallows
    crawl errors).  ``now``/``sleep`` are injectable so tests drive a fake
    clock; ``max_runs`` bounds the loop (None = run forever).  Returns the
    number of completed passes."""
    done = 0

    def attempt() -> None:
        nonlocal done
        try:
            run()
        except Exception as exc:  # a failed pass must not kill the cadence
            print(f"[ERROR] scheduled run failed: {exc}")
        done += 1

    if init_run:
        attempt()
        if max_runs is not None and done >= max_runs:
            return done

    target = next_run(now(), period)
    step = timedelta(days=PERIOD_DAYS[period])
    while max_runs is None or done < max_runs:
        wait = (target - now()).total_seconds()
        if wait > 0:
            sleep(wait)
        attempt()
        target = target + step
    return done
