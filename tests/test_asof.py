"""asof_join vs pandas.merge_asof (the independent reference)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from coldata_spark.operators.asof import asof_join
from coldata_spark.tables import load

LEFT = pd.DataFrame(
    {
        "k": ["a", "a", "a", "b", "b", "c"],
        "t": [10, 20, 30, 15, 25, 5],
        "lv": [1, 2, 3, 4, 5, 6],
    }
)
RIGHT = pd.DataFrame(
    {
        "k": ["a", "a", "a", "b", "b", "d"],
        "t": [5, 20, 28, 14, 26, 1],
        "rv": [100, 200, 300, 400, 500, 600],
    }
)


def _spark_asof(spark, **kw):
    if "tolerance" in kw:
        kw = {**kw, "tolerance": F.lit(kw["tolerance"])}
    l = spark.createDataFrame(LEFT)
    r = spark.createDataFrame(RIGHT)
    out = asof_join(l, r, on="t", by="k", **kw).toPandas()
    return out.sort_values(["k", "t"]).reset_index(drop=True)


def _pandas_asof(**kw):
    out = pd.merge_asof(
        LEFT.sort_values("t"),
        RIGHT.sort_values("t"),
        on="t",
        by="k",
        suffixes=("", "_right"),
        **kw,
    )
    return out.sort_values(["k", "t"]).reset_index(drop=True)


@pytest.mark.parametrize(
    "spark_kw,pandas_kw",
    [
        ({}, {"direction": "backward"}),
        ({"strict": True}, {"direction": "backward", "allow_exact_matches": False}),
        ({"direction": "forward"}, {"direction": "forward"}),
        (
            {"tolerance": 6},
            {"direction": "backward", "tolerance": 6},
        ),
    ],
)
def test_matches_pandas_merge_asof(spark, spark_kw, pandas_kw):
    got = _spark_asof(spark, **spark_kw)
    want = _pandas_asof(**pandas_kw)
    for col in ("k", "t", "lv"):
        assert got[col].tolist() == want[col].tolist()
    # matched right payload (NaN-safe; pandas consumes right's on-key, so
    # the value column is the comparable payload)
    assert got["rv"].fillna(-1).tolist() == want["rv"].fillna(-1).tolist()


def test_asof_on_events_matches_pandas(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "ts", F.col("event_id").alias("click_id"))
        .dropDuplicates(["user_id", "ts"])
    )
    got = (
        asof_join(purchases, clicks, on="ts", by="user_id")
        .toPandas()
        .sort_values(["user_id", "ts", "purchase_id"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        purchases.toPandas().sort_values("ts"),
        clicks.toPandas().sort_values("ts"),
        on="ts",
        by="user_id",
        suffixes=("", "_right"),
    ).sort_values(["user_id", "ts", "purchase_id"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert got["purchase_id"].tolist() == want["purchase_id"].tolist()
    assert (
        got["click_id"].fillna(-1).tolist() == want["click_id"].fillna(-1).tolist()
    )


def test_asof_null_right_timestamps_never_match(spark):
    """Round-4 review fix: a right row with NULL `on` sorts first under
    the ascending carry-forward window and used to become the match for
    every early left row; pandas merge_asof never matches NaT rows."""
    left = spark.createDataFrame(
        [(1, 100), (1, 200)], "user_id long, ts long"
    )
    right = spark.createDataFrame(
        [(1, None, "ghost"), (1, 150, "real")],
        "user_id long, ts long, tag string",
    )
    from coldata_spark.operators.asof import asof_join

    rows = {r.ts: r.tag for r in asof_join(
        left, right, on="ts", by="user_id"
    ).collect()}
    assert rows[100] is None  # nothing at-or-before 100 (NOT 'ghost')
    assert rows[200] == "real"
