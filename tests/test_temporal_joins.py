"""As-of and range join: known-answer unit cases + oracle parity."""

from __future__ import annotations

import datetime

import pytest

from open_data_lakehouse_demo_spark.operators.temporal_joins import asof_join, range_join
from open_data_lakehouse_demo_spark.plans.inventory import QUERIES
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_matches_oracle


def _ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 10:00:30"), 100.0),
            (2, "A", _ts("2024-01-01 10:05:00"), 101.0),  # exactly on a quote
            (3, "A", _ts("2024-01-01 09:59:59"), 99.0),   # before any quote
            (4, "B", _ts("2024-01-01 10:03:00"), 50.0),
        ],
        "trade_id BIGINT, sym STRING, tts TIMESTAMP_NTZ, px DOUBLE",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 10.0),
            ("A", _ts("2024-01-01 10:05:00"), 11.0),
            ("B", _ts("2024-01-01 10:01:00"), 20.0),
        ],
        "sym STRING, qts TIMESTAMP_NTZ, bid DOUBLE",
    )
    return trades, quotes


def test_asof_join_known_answers(trades_quotes):
    trades, quotes = trades_quotes
    out = {
        r["trade_id"]: (r["r_bid"], r["r_qts"])
        for r in asof_join(trades, quotes, ["sym"], "tts", "qts").collect()
    }
    assert out[1] == (10.0, _ts("2024-01-01 10:00:00"))  # latest at-or-before
    assert out[2] == (11.0, _ts("2024-01-01 10:05:00"))  # equal ts matches
    assert out[3] == (None, None)                        # nothing before
    assert out[4] == (20.0, _ts("2024-01-01 10:01:00"))


def test_asof_join_tolerance(trades_quotes):
    trades, quotes = trades_quotes
    out = {
        r["trade_id"]: r["r_bid"]
        for r in asof_join(
            trades, quotes, ["sym"], "tts", "qts", tolerance_seconds=60
        ).collect()
    }
    assert out[1] == 10.0   # 30s back — inside tolerance
    assert out[4] is None   # 120s back — outside tolerance
    assert out[3] is None


def test_range_join_known_answers(spark):
    left = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 10:30:00")),
            (2, "A", _ts("2024-01-01 12:00:00")),  # end-inclusive boundary
            (3, "A", _ts("2024-01-01 13:00:00")),  # no window
            (4, "B", _ts("2024-01-01 10:30:00")),  # wrong key for A's window
        ],
        "id BIGINT, k STRING, ts TIMESTAMP_NTZ",
    )
    right = spark.createDataFrame(
        [("A", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 12:00:00"), "w1")],
        "k STRING, s TIMESTAMP_NTZ, e TIMESTAMP_NTZ, wname STRING",
    )
    out = {
        r["id"]: r["wname"]
        for r in range_join(left, right, ["k"], "ts", "s", "e", bucket_seconds=1800).collect()
    }
    assert out == {1: "w1", 2: "w1"}


def test_range_join_interval_spanning_many_buckets(spark):
    left = spark.createDataFrame(
        [(1, "A", _ts("2024-01-03 00:00:00"))], "id BIGINT, k STRING, ts TIMESTAMP_NTZ"
    )
    right = spark.createDataFrame(
        [("A", _ts("2024-01-01 00:00:00"), _ts("2024-01-05 00:00:00"), "long")],
        "k STRING, s TIMESTAMP_NTZ, e TIMESTAMP_NTZ, wname STRING",
    )
    got = range_join(left, right, ["k"], "ts", "s", "e", bucket_seconds=3600).collect()
    assert len(got) == 1 and got[0]["wname"] == "long"


@pytest.mark.parametrize("name", ["asof_demand_join", "events_in_service_windows"])
def test_temporal_oracle_parity(spark, duck, name):
    q = QUERIES[name]
    assert q.oracle is not None
    assert_matches_oracle(q.spark(spark, SF_DIR), duck, q.oracle, name)
