"""Unit tests for the relational operator helpers (A6/W2/W3/W4)."""

from __future__ import annotations

import datetime as dt

import pytest

from kafka_metrics_exporter_spark.operators import (
    latest_per_key,
    rate_per_second,
    top_k_per_group,
)


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def series_df(spark):
    rows = [
        # (series, ts, value) — monotonic counter with one reset in 'b'
        ("a", _ts(0), 10.0, 1),
        ("a", _ts(10), 30.0, 2),
        ("a", _ts(20), 60.0, 3),
        ("b", _ts(0), 100.0, 4),
        ("b", _ts(10), 5.0, 5),  # counter reset
        ("b", _ts(20), 25.0, 6),
    ]
    return spark.createDataFrame(rows, ["series", "ts", "value", "rid"])


def test_latest_per_key(series_df):
    out = {
        r["series"]: r["value"]
        for r in latest_per_key(series_df, ["series"], "ts", ["rid"]).collect()
    }
    assert out == {"a": 60.0, "b": 25.0}


def test_latest_per_key_tiebreak(spark):
    rows = [("a", _ts(0), 1.0, 1), ("a", _ts(0), 2.0, 2)]
    df = spark.createDataFrame(rows, ["series", "ts", "value", "rid"])
    [r] = latest_per_key(df, ["series"], "ts", ["rid"]).collect()
    assert r["value"] == 2.0  # highest tiebreaker wins, deterministically


def test_rate_counter_reset_clamp(series_df):
    out = rate_per_second(series_df, ["series"], "ts", "value").collect()
    by = {(r["series"], r["value"]): r["rate_per_sec"] for r in out}
    assert by[("a", 10.0)] is None  # first sample
    assert by[("a", 30.0)] == pytest.approx(2.0)  # (30-10)/10
    assert by[("b", 5.0)] == pytest.approx(0.5)  # reset: 5/10, not negative
    assert by[("b", 25.0)] == pytest.approx(2.0)


def test_top_k_per_group(spark):
    rows = [(g, i, float(i * (g + 1))) for g in range(2) for i in range(10)]
    df = spark.createDataFrame(rows, ["grp", "member", "metric"])
    out = top_k_per_group(df, ["grp"], "metric", 3, tiebreakers=["member"])
    got = sorted((r["grp"], r["member"]) for r in out.collect())
    assert got == [(0, 7), (0, 8), (0, 9), (1, 7), (1, 8), (1, 9)]
