"""Salted-join correctness/spread + streaming window & dedup operators."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from open_data_lakehouse_demo_spark import streaming as st
from open_data_lakehouse_demo_spark.operators.skew import salted_join
from tests.conftest import utc_naive


def test_salted_join_matches_plain_join(spark):
    # one pathologically hot key (90% of rows) + a tail
    left = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.createDataFrame(
        [(i, f"dim_{i}") for i in range(100)], ["k", "label"]
    )
    plain = left.join(right, "k").groupBy("k", "label").agg(
        F.count("*").alias("n"), F.sum("payload").alias("s")
    )
    salted = salted_join(left, right, ["k"]).groupBy("k", "label").agg(
        F.count("*").alias("n"), F.sum("payload").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    left = spark.range(0, 8000).select(F.lit(7).alias("k"), F.col("id").alias("payload"))
    right = spark.createDataFrame([(7, "hot")], ["k", "label"])
    salted_left = left.withColumn(
        "__salt", F.pmod(F.xxhash64("k", F.monotonically_increasing_id()), F.lit(16)).cast("int")
    )
    per_salt = salted_left.groupBy("__salt").count().collect()
    assert len(per_salt) == 16  # the single key occupies all buckets
    counts = [r["count"] for r in per_salt]
    assert max(counts) < 3 * min(counts)  # roughly even spread
    assert salted_join(left, right, ["k"], salt_buckets=16).count() == 8000


def test_left_outer_salted_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "zz")], ["k", "v"])
    right = spark.createDataFrame([(1, "one"), (2, "two")], ["k", "label"])
    rows = {
        r["k"]: r["label"]
        for r in salted_join(left, right, ["k"], how="left", salt_buckets=4).collect()
    }
    assert rows == {1: "one", 2: "two", 99: None}


def _drop(src_dir: str, name: str, lines: list[str]) -> None:
    tmp = os.path.join(src_dir, f".{name}.tmp")
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.rename(tmp, os.path.join(src_dir, name))


def _env(eid, ts, line_id, ride, stop_index, boarding, remaining):
    return json.dumps(
        {
            "id": eid,
            "timestamp": ts,
            "data": {
                "bus_ride_id": ride,
                "bus_line_id": line_id,
                "bus_line": f"line-{line_id}",
                "bus_stop_id": 100 + stop_index,
                "bus_stop_index": stop_index,
                "timestamp_at_stop": ts,
                "passengers_in_stop": boarding + remaining,
                "passengers_boarding": boarding,
                "remaining_at_stop": remaining,
                "total_passengers": boarding,
                "total_capacity": 60,
                "last_stop": False,
            },
        }
    )


def test_windowed_boardings_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _drop(
        src,
        "b1.jsonl",
        [
            _env(1, "2025-01-01 10:01:00", 1, "r1", 0, 10, 2),
            _env(2, "2025-01-01 10:03:00", 1, "r1", 1, 5, 0),
            _env(3, "2025-01-01 10:07:00", 1, "r1", 2, 8, 1),
            _env(4, "2025-01-01 10:02:00", 2, "r2", 0, 3, 0),
            # late-enough event to advance the watermark past both windows
            _env(5, "2025-01-01 10:30:00", 2, "r2", 1, 1, 0),
        ],
    )
    parsed = st.parse_envelope(st.read_json_stream(spark, src))
    out = str(tmp_path / "win_out")
    q = (
        st.windowed_boardings(parsed, "5 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # a second batch pushes the watermark so finalized windows flush
        _drop(src, "b2.jsonl", [_env(6, "2025-01-01 10:45:00", 2, "r2", 2, 1, 0)])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        (utc_naive(r["window_start"]).isoformat(), r["bus_line_id"]): (r["boardings"], r["n_updates"])
        for r in spark.read.parquet(out).collect()
    }
    assert rows[("2025-01-01T10:00:00", 1)] == (15, 2)  # 10:01 + 10:03
    assert rows[("2025-01-01T10:05:00", 1)] == (8, 1)
    assert rows[("2025-01-01T10:00:00", 2)] == (3, 1)


def test_streaming_dedup_drops_producer_retries(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    dup = _env(1, "2025-01-01 10:01:00", 1, "r1", 0, 10, 2)
    _drop(src, "b1.jsonl", [dup, dup, _env(2, "2025-01-01 10:02:00", 1, "r1", 1, 4, 0)])
    parsed = st.parse_envelope(st.read_json_stream(spark, src))
    out = str(tmp_path / "dedup_out")
    q = (
        st.deduped_updates(parsed)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 2  # retry envelope removed
    assert {r["bus_stop_index"] for r in rows} == {0, 1}


def test_funnel_conversion_oracle_parity(spark, duck):
    from open_data_lakehouse_demo_spark.plans.inventory import QUERIES
    from tests.conftest import SF_DIR
    from tests.oracle_utils import assert_matches_oracle

    q = QUERIES["funnel_conversion"]
    assert_matches_oracle(q.spark(spark, SF_DIR), duck, q.oracle, "funnel_conversion")


def test_funnel_is_monotone_and_ordered(spark):
    """Funnel counts can only shrink step-over-step, and average latency
    from signup is non-decreasing across steps (strict-order semantics)."""
    from open_data_lakehouse_demo_spark.plans.inventory import QUERIES
    from tests.conftest import SF_DIR

    rows = sorted(
        QUERIES["funnel_conversion"].spark(spark, SF_DIR).collect(),
        key=lambda r: r["step_idx"],
    )
    users = [r["users"] for r in rows]
    assert users == sorted(users, reverse=True)
    hours = [r["avg_hours_from_signup"] for r in rows]
    assert all(b >= a for a, b in zip(hours, hours[1:]))


def test_daily_ohlc_oracle_parity(spark, duck):
    from open_data_lakehouse_demo_spark.plans.inventory import QUERIES
    from tests.conftest import SF_DIR
    from tests.oracle_utils import assert_matches_oracle

    q = QUERIES["daily_ohlc"]
    assert_matches_oracle(q.spark(spark, SF_DIR), duck, q.oracle, "daily_ohlc")


def test_daily_ohlc_invariants(spark):
    """low <= open/close <= high, and n_events sums to the table size."""
    from open_data_lakehouse_demo_spark.plans.inventory import QUERIES
    from open_data_lakehouse_demo_spark.sources.io import read_parquet
    from tests.conftest import SF_DIR

    rows = QUERIES["daily_ohlc"].spark(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["low_value"] <= r["open_value"] <= r["high_value"]
        assert r["low_value"] <= r["close_value"] <= r["high_value"]
    total = sum(r["n_events"] for r in rows)
    assert total == read_parquet(spark, f"{SF_DIR}/events.parquet").count()


def test_deciles_prefix_sum_matches_window_twin(spark):
    """W4 scale-safe path: the two-phase-prefix-sum deciles (primary) are
    row-identical to the single-window NTILE/PERCENT_RANK/CUME_DIST twin
    — exact rank arithmetic, no approximation."""
    from open_data_lakehouse_demo_spark.plans.inventory import QUERIES
    from open_data_lakehouse_demo_spark.plans.inventory_windows import (
        customer_value_deciles_window,
    )
    from tests.conftest import SF_DIR

    fast = sorted(
        tuple(r) for r in QUERIES["customer_value_deciles"].spark(spark, SF_DIR).collect()
    )
    twin = sorted(tuple(r) for r in customer_value_deciles_window(spark, SF_DIR).collect())
    assert fast == twin


def test_global_row_number_matches_single_window(spark):
    """global_row_number == ROW_NUMBER() OVER (ORDER BY ...) on a total
    order, across several partition counts (cut placement must not
    matter), including desc keys and an empty frame."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from open_data_lakehouse_demo_spark.operators.sharding import global_row_number

    df = spark.range(0, 997).select(
        F.col("id"),
        (F.col("id") * 37 % 101).alias("k"),  # heavy ties -> id tiebreak
    )
    order = [F.col("k").desc(), F.col("id")]
    expected = {
        r["id"]: r["rank"]
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy(*order)).cast("bigint")
        ).collect()
    }
    for n_parts in (1, 3, 16):
        got = {
            r["id"]: r["rank"]
            for r in global_row_number(df, order, n_partitions=n_parts).collect()
        }
        assert got == expected, f"mismatch at n_partitions={n_parts}"
    assert global_row_number(df.filter(F.lit(False)), order).count() == 0


def test_token_shards_upstream_runs_once(spark):
    """r13: assign_token_shards checkpoints its narrow input BEFORE the
    range exchange, so the caller's (typically expensive) lineage runs
    exactly once — the range partitioner's boundary-sampling pass must
    read the materialized blocks, not re-execute the upstream. Pinned
    with an accumulator-counting UDF in the tokens column: the old shape
    evaluated it twice per row (sample pass + shuffle map).

    ASSUMPTION (r13 ADVICE): exact accumulator counts require no task
    retries/speculation — holds for the suite's local-mode session
    (spark.speculation defaults false). Relax to a band on retrying CI."""
    from pyspark.sql import functions as F

    from open_data_lakehouse_demo_spark.operators.sharding import (
        assign_token_shards,
    )

    acc = spark.sparkContext.accumulator(0)

    @F.udf("long")
    def counted_tokens(i):
        acc.add(1)
        return i % 7 + 1

    n = 400
    docs = spark.range(0, n).select(
        F.col("id"), counted_tokens("id").alias("n_tokens")
    )
    out = assign_token_shards(docs, "id", "n_tokens", target_tokens=50)
    out.write.format("noop").mode("overwrite").save()
    assert acc.value == n, (
        f"tokens column evaluated {acc.value}x for {n} rows — upstream "
        "lineage re-executed under the range sampler"
    )
