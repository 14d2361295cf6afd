"""Query inventory — ride-generation / passenger-simulation (U1/U2).

U1 (pure built-in fan-out) gets a full DuckDB oracle. U2's sequential
randomized recurrence is not SQL-expressible (SURVEY §2.9) → registered
without an oracle (driver rows-only check); its invariants are pytest-
verified in tests/test_simulation.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from open_data_lakehouse_demo_spark.operators import simulation as sm
from open_data_lakehouse_demo_spark.plans.inventory import query, t

_START, _END = "2024-06-01 06:00:00", "2024-06-01 10:00:00"

_SIZES_SQL = "[" + ", ".join(str(s) for s in sm.BUS_SIZES) + "]"

_RIDES_ORACLE = f"""
WITH lines AS (
  SELECT CAST(n_nationkey AS BIGINT) AS bus_line_id, n_name AS bus_line,
         CAST(10 + (n_nationkey % 4) * 5 AS INT) AS frequency_minutes,
         CAST({sm.N_STOPS_BASE} + n_nationkey % 5 AS INT) AS n_stops
  FROM nation
), deps AS (
  SELECT *, unnest(generate_series(TIMESTAMP '{_START}', TIMESTAMP '{_END}',
                                   to_minutes(frequency_minutes))) AS departure_ts
  FROM lines
), rides AS (
  SELECT *, bus_line || '_' || CAST(bus_line_id AS VARCHAR) || '_' ||
            strftime(departure_ts, '%Y-%m-%d-%H-%M') AS bus_ride_id
  FROM deps
), hashed AS (
  SELECT *, CAST(('0x' || substring(md5(bus_ride_id), 1, 8)) AS BIGINT) AS h FROM rides
), stops AS (
  SELECT bus_ride_id, bus_line_id, bus_line, departure_ts, n_stops,
    CAST({_SIZES_SQL}[CAST(h % 3 + 1 AS INT)] AS BIGINT) AS total_capacity,
    CAST(h % 3 + 1 AS INT) AS minutes_per_stop,
    CAST(i AS INT) AS bus_stop_index,
    CAST((bus_line_id * 100 + i) % 431 AS BIGINT) AS bus_stop_id
  FROM hashed, LATERAL (SELECT unnest(range(0, n_stops)) AS i) u
)
SELECT bus_ride_id, bus_line_id, bus_line, departure_ts, total_capacity,
  minutes_per_stop, bus_stop_index, bus_stop_id,
  departure_ts + to_minutes(minutes_per_stop * bus_stop_index) AS timestamp_at_stop,
  bus_stop_index = n_stops - 1 AS last_stop,
  CAST(CAST(('0x' || substring(md5(bus_ride_id || '#' || CAST(bus_stop_id AS VARCHAR)), 1, 8))
            AS BIGINT) % 30 AS BIGINT) AS passengers_in_stop
FROM stops
"""


@query("generated_rides", ("U1", "J8", "F10", "F11"), oracle=_RIDES_ORACLE, tags=("simulation",))
def generated_rides(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 ride fan-out (ref part2:353-413 scalar-UDF+explode) as pure
    built-ins: sequence() departures × posexplode() stops, hash-derived
    capacity/increments — zero Python boundary, zero shuffle
    (operators/simulation.py)."""
    lines = sm.build_bus_lines(t(spark, sf_dir, "nation"))
    rides = sm.generate_rides(lines, _START, _END)
    return sm.with_waiting_passengers(rides)


@query("bus_ride_simulation", ("U2", "A8", "O3"), tags=("simulation",))
def bus_ride_simulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 sequential passenger simulation via seeded applyInPandas
    (ref part2:485-580). Non-SQL-expressible recurrence → rows-only driver
    check; invariants pytest-verified (operators/simulation.py)."""
    return sm.simulated_rides(spark, t(spark, sf_dir, "nation"), _START, _END, seed=42)
