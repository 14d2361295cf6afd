"""Query inventory — streaming-semantics queries, batch-checkable slice.

The streaming topology itself (file/kafka sources, dual sinks, state store)
is exercised in tests/test_streaming.py with real StreamingQuery runs; the
driver-checkable entries here are the *batch-equivalent views* of the two
streaming branches — same expressions, same semantics — so the stateful
logic gets a DuckDB oracle too (SURVEY §2.8 T2/T3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_data_lakehouse_demo_spark.plans.inventory import query, t
from open_data_lakehouse_demo_spark.streaming.replay import events_as_bus_updates

# Deterministic events→bus-update projection, mirrored from
# streaming/replay.py (CAST(trunc(...)) because the oracle engine's
# double→int cast rounds while Spark's truncates).
_UPDATES_SQL = """
upd AS (
  SELECT
    'ride_' || CAST(user_id AS VARCHAR) || '_' || CAST(event_id AS VARCHAR) AS bus_ride_id,
    CAST(user_id % 25 AS BIGINT) AS bus_line_id,
    'line-' || CAST(user_id % 25 AS VARCHAR) AS bus_line,
    CAST(event_id % 431 AS BIGINT) AS bus_stop_id,
    ts AS timestamp_at_stop,
    CAST(CAST(trunc(value) AS BIGINT) % 40 + event_id % 15 AS BIGINT) AS passengers_in_stop,
    CAST(CAST(trunc(value) AS BIGINT) % 40 AS BIGINT) AS passengers_boarding,
    CAST(event_id % 15 AS BIGINT) AS remaining_at_stop,
    CAST(CAST(trunc(value) AS BIGINT) % 40 AS BIGINT) AS total_passengers,
    CAST(60 AS BIGINT) AS total_capacity,
    (event_id % 35 = 34) AS last_stop
  FROM events
)
"""

_ALERTS_ORACLE = f"""
WITH {_UPDATES_SQL}
SELECT bus_ride_id, bus_line, bus_stop_id, remaining_at_stop, timestamp_at_stop
FROM upd WHERE remaining_at_stop >= 1
"""

_STATE_ORACLE = f"""
WITH {_UPDATES_SQL},
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY bus_line_id
    ORDER BY timestamp_at_stop DESC, bus_ride_id DESC
  ) AS rn
  FROM upd
)
SELECT bus_line_id, bus_line, remaining_at_stop, total_passengers,
       total_capacity, timestamp_at_stop AS update_timestamp
FROM ranked WHERE rn = 1 AND NOT last_stop
"""


def _updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_as_bus_updates(t(spark, sf_dir, "events")).select("data.*")


@query("capacity_alerts_batch", ("T2", "P3", "F20"), oracle=_ALERTS_ORACLE, tags=("streaming",))
def capacity_alerts_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch view of the alert branch (T2 — ref pyspark-job.py:142-152):
    passengers left behind ⇒ alert payload columns. The streaming variant
    (to_json + append sink) runs in tests/test_streaming.py."""
    return _updates(spark, sf_dir).filter(F.col("remaining_at_stop") >= 1).select(
        "bus_ride_id", "bus_line", "bus_stop_id", "remaining_at_stop", "timestamp_at_stop"
    )


@query("latest_bus_state_batch", ("T3", "U3", "A7"), oracle=_STATE_ORACLE, tags=("streaming",))
def latest_bus_state_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch view of the stateful branch (T3/U3 — ref pyspark-job.py:34-54,
    185-206): latest update per bus line by total (timestamp, ride_id)
    order, lines whose latest update is a last stop dropped. max_by keeps
    it a partial-aggregating single shuffle (no sort, no window) — the
    oracle's ROW_NUMBER view is the same semantics."""
    upd = _updates(spark, sf_dir)
    latest = upd.groupBy("bus_line_id").agg(
        F.max_by(
            F.struct(
                "bus_line",
                "remaining_at_stop",
                "total_passengers",
                "total_capacity",
                F.col("timestamp_at_stop").alias("update_timestamp"),
                "last_stop",
            ),
            F.struct(F.col("timestamp_at_stop").alias("ts"), F.col("bus_ride_id").alias("rid")),
        ).alias("s")
    )
    return latest.filter(~F.col("s.last_stop")).select(
        "bus_line_id",
        "s.bus_line",
        "s.remaining_at_stop",
        "s.total_passengers",
        "s.total_capacity",
        "s.update_timestamp",
    )
