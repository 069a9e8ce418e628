"""Cadence scheduler (R1, reference src/scheduler.py:21-52)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from coldata_spark import scheduler as S


def test_next_run_is_next_midnight():
    t = datetime(2026, 8, 14, 15, 30, 12)
    assert S.next_run(t, "day") == datetime(2026, 8, 15)
    assert S.next_run(datetime(2026, 8, 14, 0, 0, 0), "day") == datetime(2026, 8, 15)


def test_run_times_stride_mirrors_reference_periods():
    start = datetime(2026, 1, 31, 9, 0)
    assert S.run_times(start, "day", 3) == [
        datetime(2026, 2, 1), datetime(2026, 2, 2), datetime(2026, 2, 3)]
    assert S.run_times(start, "week", 2) == [
        datetime(2026, 2, 1), datetime(2026, 2, 8)]
    # the reference's "month" is a fixed 30-day stride (every(30).day),
    # NOT a calendar month — mirrored deliberately
    assert S.run_times(start, "month", 2) == [
        datetime(2026, 2, 1), datetime(2026, 3, 3)]


def test_invalid_period_raises():
    with pytest.raises(ValueError, match="Invalid period"):
        S.next_run(datetime(2026, 1, 1), "hour")
    with pytest.raises(ValueError):
        S.run_times(datetime(2026, 1, 1), "hour", 1)


def test_run_scheduled_with_fake_clock_and_failures():
    clock = {"t": datetime(2026, 8, 14, 23, 0)}
    waits, runs = [], []

    def now():
        return clock["t"]

    def sleep(s):
        waits.append(s)
        clock["t"] = clock["t"] + timedelta(seconds=s)

    calls = {"n": 0}

    def run():
        calls["n"] += 1
        runs.append(now())
        if calls["n"] == 2:
            raise RuntimeError("boom")  # must not kill the cadence

    done = S.run_scheduled(run, "day", init_run=True, max_runs=3, now=now, sleep=sleep)
    assert done == 3 and calls["n"] == 3
    assert runs[0] == datetime(2026, 8, 14, 23, 0)   # init_run fires immediately
    assert runs[1] == datetime(2026, 8, 15)           # next midnight
    assert runs[2] == datetime(2026, 8, 16)           # +1 day
    assert waits[0] == 3600.0


def test_init_run_respects_max_runs():
    ran = []
    done = S.run_scheduled(lambda: ran.append(1), "day", init_run=True, max_runs=1,
                           now=lambda: datetime(2026, 1, 1), sleep=lambda s: None)
    assert done == 1 and ran == [1]
