"""Query inventory — seasonal demand profiles + route expansion (part2/part3).

Covers the remaining reference query shapes:
  demand_by_month       A4+F9 EXTRACT(MONTH)        ref part3:313-322
  demand_by_dayofweek   A4+F9 EXTRACT(DAYOFWEEK),   ref part3:357-366, 378-386
                        GoogleSQL 1=Sunday
  line_service_windows  the part2 route-expansion pipeline (explode stops →
                        per-station bounds join → max-of-min/min-of-max →
                        join back to lines)   ref part2:269-300 (A2,A3,J2,J3)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_data_lakehouse_demo_spark.operators.simulation import build_bus_lines
from open_data_lakehouse_demo_spark.plans.inventory import dec, query, t

_BY_MONTH_ORACLE = """
SELECT CAST(EXTRACT(MONTH FROM ts) AS INT) AS month,
  event_type,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS avg_value,
  COUNT(*) AS n
FROM events GROUP BY 1, 2
"""

# DuckDB EXTRACT(DOW) is 0=Sunday; GoogleSQL/Spark DAYOFWEEK is 1=Sunday
_BY_DOW_ORACLE = """
SELECT CAST(EXTRACT(DOW FROM ts) + 1 AS INT) AS dow_sunday1,
  event_type,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS avg_value,
  COUNT(*) AS n
FROM events GROUP BY 1, 2
"""

# station analogue: station_id = user_id % 431 (the testdata's stop-id space)
_SERVICE_WINDOWS_ORACLE = f"""
WITH lines AS (
  SELECT CAST(n_nationkey AS BIGINT) AS bus_line_id, n_name AS bus_line,
         CAST(10 + (n_nationkey % 4) * 5 AS INT) AS frequency_minutes,
         CAST(12 + n_nationkey % 5 AS INT) AS n_stops
  FROM nation
), line_stops AS (
  SELECT bus_line_id, bus_line, frequency_minutes,
         CAST((bus_line_id * 100 + i) % 431 AS BIGINT) AS bus_stop_id
  FROM lines, LATERAL (SELECT unnest(range(0, n_stops)) AS i) u
), station_bounds AS (
  SELECT user_id % 431 AS station_id, MIN(ts) AS min_ts, MAX(ts) AS max_ts
  FROM events GROUP BY 1
), joined AS (
  SELECT ls.bus_line_id, ls.bus_line, ls.frequency_minutes, sb.min_ts, sb.max_ts
  FROM line_stops ls LEFT JOIN station_bounds sb ON ls.bus_stop_id = sb.station_id
)
SELECT bus_line_id, bus_line, frequency_minutes,
  MAX(min_ts) AS service_start, MIN(max_ts) AS service_end
FROM joined GROUP BY 1, 2, 3
"""


@query("demand_by_month", ("A4", "F9"), oracle=_BY_MONTH_ORACLE, tags=("profile",))
def demand_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly demand profile (A4+F9 — ref part3:313-322)."""
    events = t(spark, sf_dir, "events")
    return events.groupBy(F.month("ts").alias("month"), "event_type").agg(
        (F.sum(dec("value")).cast("double") / F.count("value")).alias("avg_value"),
        F.count("*").alias("n"),
    )


@query("demand_by_dayofweek", ("A4", "F9"), oracle=_BY_DOW_ORACLE, tags=("profile",))
def demand_by_dayofweek(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week demand profile with GoogleSQL's 1=Sunday convention
    (A4+F9 — ref part3:357-366, 378-386; Spark dayofweek already matches)."""
    events = t(spark, sf_dir, "events")
    return events.groupBy(F.dayofweek("ts").alias("dow_sunday1"), "event_type").agg(
        (F.sum(dec("value")).cast("double") / F.count("value")).alias("avg_value"),
        F.count("*").alias("n"),
    )


@query(
    "line_service_windows",
    ("A2", "A3", "J2", "J3", "F11"),
    oracle=_SERVICE_WINDOWS_ORACLE,
    tags=("profile",),
)
def line_service_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The part2 route-expansion pipeline (ref part2:269-300): explode each
    line's stop array, left-join per-station activity bounds, then
    max-of-min / min-of-max per line = the window where ALL stops are
    active. Dim side broadcasts; bounds agg partial-aggregates map-side."""
    lines = build_bus_lines(t(spark, sf_dir, "nation"))
    line_stops = lines.select(
        "bus_line_id",
        "bus_line",
        "frequency_minutes",
        F.explode("stops").alias("bus_stop_id"),
    )
    events = t(spark, sf_dir, "events")
    bounds = events.groupBy((F.col("user_id") % 431).alias("station_id")).agg(
        F.min("ts").alias("min_ts"), F.max("ts").alias("max_ts")
    )
    joined = line_stops.join(
        bounds, line_stops.bus_stop_id == bounds.station_id, "left"
    )
    return joined.groupBy("bus_line_id", "bus_line", "frequency_minutes").agg(
        F.max("min_ts").alias("service_start"),
        F.min("max_ts").alias("service_end"),
    )
