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


def test_asof_and_range_join_match_bruteforce_random(spark):
    """Seeded randomized cross-check (r10; the pruning-soundness sweep
    pattern — deterministic seeds, bounded case count): random multi-key
    trades/quotes with planted ts TIES and boundary hits must match a
    pure-python brute force for asof_join (with and without tolerance)
    and range_join. Right (key, ts) pairs are kept DISTINCT — the
    documented determinism contract for as-of ties."""
    import random

    rng = random.Random(0xA50F)
    base = datetime.datetime(2024, 1, 1)

    for case in range(6):
        keys = ["A", "B", "C"][: rng.randint(1, 3)]
        # quotes: distinct (key, ts)
        quotes, seen = [], set()
        for _ in range(rng.randint(3, 14)):
            k = rng.choice(keys)
            t = base + datetime.timedelta(seconds=rng.randrange(0, 3600, 30))
            if (k, t) in seen:
                continue
            seen.add((k, t))
            quotes.append((k, t, float(len(seen))))
        trades = []
        for i in range(rng.randint(3, 16)):
            k = rng.choice(keys)
            if quotes and rng.random() < 0.3:  # plant exact-tie timestamps
                t = rng.choice(quotes)[1]
            else:
                t = base + datetime.timedelta(seconds=rng.randrange(-300, 3900, 15))
            trades.append((i, k, t, float(i)))
        tol = rng.choice([None, 60, 600])

        tdf = spark.createDataFrame(
            trades, "trade_id BIGINT, sym STRING, tts TIMESTAMP_NTZ, px DOUBLE"
        )
        qdf = spark.createDataFrame(
            quotes, "sym STRING, qts TIMESTAMP_NTZ, bid DOUBLE"
        )
        got = {
            r["trade_id"]: (r["r_qts"], r["r_bid"])
            for r in asof_join(
                tdf, qdf, ["sym"], "tts", "qts", tolerance_seconds=tol
            ).collect()
        }
        assert len(got) == len(trades), f"case {case}: lost/duplicated left rows"
        for i, k, t, _px in trades:
            cand = [(qt, bid) for (qk, qt, bid) in quotes if qk == k and qt <= t]
            want = max(cand) if cand else None
            if want is not None and tol is not None and (t - want[0]).total_seconds() > tol:
                want = None
            assert got[i] == (want if want else (None, None)), (case, i, tol)

        # range join vs brute force over random windows
        wins = [
            (rng.choice(keys),
             base + datetime.timedelta(seconds=rng.randrange(0, 3000, 60)),
             base + datetime.timedelta(seconds=rng.randrange(3000, 7200, 60)),
             f"w{j}")
            for j in range(rng.randint(1, 5))
        ]
        wdf = spark.createDataFrame(
            wins, "sym STRING, s TIMESTAMP_NTZ, e TIMESTAMP_NTZ, wname STRING"
        )
        rj = {
            (r["trade_id"], r["wname"])
            for r in range_join(
                tdf, wdf, ["sym"], "tts", "s", "e",
                bucket_seconds=rng.choice([600, 1800, 3600]),
            ).collect()
        }
        want_rj = {
            (i, wn)
            for (i, k, t, _px) in trades
            for (wk, s, e, wn) in wins
            if wk == k and s <= t <= e
        }
        assert rj == want_rj, f"case {case}"
