"""Unit tests for the GAP_FILL operator (SURVEY §2.9 U5)."""

from __future__ import annotations

import datetime

import pytest

from open_data_lakehouse_demo_spark.operators.gapfill import gap_fill


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, minute)


@pytest.fixture(scope="module")
def series(spark):
    # series "a": observations at minutes 0, 15 (gap at 5, 10), value 0→30
    # series "b": single observation (no gaps possible)
    rows = [
        ("a", _ts(0), 0.0),
        ("a", _ts(15), 30.0),
        ("a", _ts(20), 10.0),
        ("b", _ts(5), 7.0),
    ]
    return spark.createDataFrame(rows, "key string, bucket timestamp_ntz, v double")


def _collect(df):
    return {(r.key, r.bucket.minute): r.v for r in df.collect()}


def test_linear_interpolation(spark, series):
    out = gap_fill(series, "bucket", 300, ["key"], {"v": "linear"})
    got = _collect(out)
    assert got[("a", 0)] == 0.0
    assert got[("a", 5)] == pytest.approx(10.0)   # 1/3 of the way 0→30
    assert got[("a", 10)] == pytest.approx(20.0)  # 2/3
    assert got[("a", 15)] == 30.0
    assert got[("a", 20)] == 10.0
    assert got[("b", 5)] == 7.0
    assert len(got) == 6  # a: minutes 0..20 = 5 buckets; b: 1 bucket


def test_locf(spark, series):
    out = gap_fill(series, "bucket", 300, ["key"], {"v": "locf"})
    got = _collect(out)
    assert got[("a", 5)] == 0.0
    assert got[("a", 10)] == 0.0
    assert got[("a", 15)] == 30.0


def test_null_mode_keeps_gaps(spark, series):
    out = gap_fill(series, "bucket", 300, ["key"], {"v": "null"})
    got = _collect(out)
    assert got[("a", 5)] is None and got[("a", 10)] is None
    assert got[("a", 0)] == 0.0


def test_grid_is_dense(spark, series):
    """Invariant from the reference (part3:470-481): no missing buckets
    between each partition's min and max."""
    out = gap_fill(series, "bucket", 300, ["key"], {"v": "linear"})
    a_minutes = sorted(m for (k, m) in _collect(out) if k == "a")
    assert a_minutes == [0, 5, 10, 15, 20]


def test_bad_mode_raises(spark, series):
    with pytest.raises(ValueError):
        gap_fill(series, "bucket", 300, ["key"], {"v": "cubic"})
