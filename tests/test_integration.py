"""End-to-end integration: replay producer feeds the streaming pipeline
(T6 → T2/T3/T4/T5), and the E1 batch pipeline lands in a catalog table."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from open_data_lakehouse_demo_spark import streaming as st
from open_data_lakehouse_demo_spark.operators import simulation as sm
from open_data_lakehouse_demo_spark.plans import ddl
from open_data_lakehouse_demo_spark.plans.inventory import QUERIES
from open_data_lakehouse_demo_spark.sources.io import read_parquet
from tests.conftest import SF_DIR, SF_SMALL
from tests.oracle_utils import assert_matches_oracle


def test_replay_feeds_streaming_pipeline(spark, tmp_path):
    """History → envelopes → file stream → both sinks, like the webapp
    replay + pyspark-job pair (ref kafka_service.py:71-104 + pyspark-job)."""
    events = read_parquet(spark, f"{SF_SMALL}/events.parquet").limit(400)
    updates = st.events_as_bus_updates(events, shift_to="2025-06-01 00:00:00")
    src = str(tmp_path / "src")
    os.makedirs(src)
    st.replay_to_json_files(updates, src, n_batches=3)

    alerts_q, state_q = st.run_pipeline(
        spark,
        src,
        str(tmp_path / "ckpt"),
        str(tmp_path / "alerts"),
        str(tmp_path / "state"),
    )
    try:
        alerts_q.processAllAvailable()
        state_q.processAllAvailable()
    finally:
        alerts_q.stop()
        state_q.stop()

    state = spark.read.parquet(str(tmp_path / "state"))
    n_lines_in_feed = updates.select("data.bus_line_id").distinct().count()
    assert 0 < state.count() <= n_lines_in_feed
    # the snapshot is the max_by answer: recompute in batch and compare
    batch = st.latest_state_agg(
        st.parse_envelope(
            spark.read.text(src).withColumnRenamed("value", "raw_value")
        )
    )
    got = {tuple(r) for r in state.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want


def test_e1_pipeline_lands_in_catalog_table(spark):
    """The part2 E1 flow: lines → rides → sim → saveAsTable → spark.table
    (ref part2:242-631 compressed to the testdata domain)."""
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    sim = sm.simulated_rides(
        spark, nation, "2024-06-01 06:00:00", "2024-06-01 07:00:00", seed=42
    )
    ddl.create_namespace(spark, "lakehouse_test")
    try:
        ddl.ctas_from_df(sim, "lakehouse_test.bus_rides")
        back = spark.table("lakehouse_test.bus_rides")
        assert back.count() == sim.count()
        # feature CTAS on top (part3:124-157 shape)
        ddl.ctas(
            spark,
            "lakehouse_test.ride_features",
            """
            SELECT bus_ride_id, bus_line, bus_stop_id,
                   remaining_at_stop - (total_capacity - total_passengers) AS demand_metric,
                   try_divide(total_passengers, total_capacity) AS load_factor
            FROM lakehouse_test.bus_rides
            """,
        )
        feats = spark.table("lakehouse_test.ride_features")
        assert feats.count() == back.count()
        assert feats.filter(F.col("load_factor") > 1.0).count() == 0
    finally:
        ddl.drop_table(spark, "lakehouse_test.ride_features")
        ddl.drop_table(spark, "lakehouse_test.bus_rides")


@pytest.mark.parametrize(
    "name", ["demand_by_month", "demand_by_dayofweek", "line_service_windows"]
)
def test_profile_oracle_parity(spark, duck, name):
    q = QUERIES[name]
    assert q.oracle is not None
    assert_matches_oracle(q.spark(spark, SF_DIR), duck, q.oracle, name)
