"""Bus-ride simulation operators (SURVEY.md §2.9 U1/U2).

Re-expresses the reference's two simulation UDFs Spark-first:

U1 ride generation (ref lakehouse_part2_spark_processing.py:353-413,
   applied 416-420): the reference expands each bus line's service window
   into per-departure per-stop rows inside a scalar Python UDF returning
   ARRAY<STRUCT> + explode. Here the same fan-out is pure built-ins —
   ``sequence(start, end, interval)`` for departures, ``posexplode`` for
   stops — so it stays in whole-stage codegen (no Python boundary at all)
   and is DuckDB-oracle checkable. The reference's unseeded randomness
   (bus size, per-stop time increment — part2:369, 401) becomes portable
   hash arithmetic on the ride id (SURVEY §5.3 determinism policy).

U2 passenger simulation (ref part2:485-573, applied via
   groupBy("bus_ride_id").applyInPandas at 578-580): a genuinely
   sequential per-ride recurrence (boarding clamped by remaining capacity,
   randomized alighting, last-stop flush) — NOT expressible as a window
   closed form (SURVEY §2.5 note), so it stays a grouped-map pandas UDF.
   Determinism fix over the reference: alighting draws from
   numpy RandomState seeded per ride (crc32(ride_id) XOR global seed), so
   results are identical under any partitioning/scheduling — no
   cross-partition coordination needed (SURVEY §7 risk register).

Scale notes: ride groups are ~35 rows each and group count scales with
data, so the applyInPandas shuffle is balanced by construction (no skew);
Arrow batches keep the Python boundary vectorized. Ride generation's
fan-out is a generator inside the scan stage — zero shuffle.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_data_lakehouse_demo_spark.operators.dedup import token_hash

BUS_SIZES = (40, 60, 80)
N_STOPS_BASE = 12  # stops per line = N_STOPS_BASE + line_id % 5


def build_bus_lines(nation: DataFrame) -> DataFrame:
    """Derive a bus_lines dimension from the 25-row nation table (the
    reference's 25 generated lines — part0:380-389): id, name, frequency,
    and the stop-id array."""
    line_id = F.col("n_nationkey").cast("long")
    n_stops = (F.lit(N_STOPS_BASE) + line_id % 5).cast("int")
    return nation.select(
        line_id.alias("bus_line_id"),
        F.col("n_name").alias("bus_line"),
        (F.lit(10) + (line_id % 4) * 5).cast("int").alias("frequency_minutes"),
        F.transform(
            F.sequence(F.lit(0), n_stops - 1),
            lambda i: (line_id * 100 + i) % 431,
        ).alias("stops"),
    )


def generate_rides(
    lines: DataFrame,
    start_ts: str,
    end_ts: str,
) -> DataFrame:
    """U1: expand lines × service window into per-departure per-stop rows.

    Departures every frequency_minutes in [start_ts, end_ts]; arrival at
    stop k = departure + k·increment where increment ∈ {1,2,3} minutes and
    capacity ∈ BUS_SIZES are hash-derived per ride (portable md5 hash —
    same formula as the DuckDB oracle)."""
    departures = lines.select(
        "bus_line_id",
        "bus_line",
        "stops",
        F.explode(
            F.expr(
                f"sequence(timestamp'{start_ts}', timestamp'{end_ts}', "
                "make_dt_interval(0, 0, frequency_minutes, 0))"
            )
        ).alias("departure_ts"),
    ).withColumn(
        "bus_ride_id",
        F.concat_ws(
            "_",
            F.col("bus_line"),
            F.col("bus_line_id"),
            F.date_format("departure_ts", "yyyy-MM-dd-HH-mm"),
        ),
    )
    h = token_hash(F.col("bus_ride_id"))
    sizes = F.array(*[F.lit(s) for s in BUS_SIZES])
    return departures.select(
        "bus_ride_id",
        "bus_line_id",
        "bus_line",
        "departure_ts",
        F.size("stops").alias("n_stops"),
        F.element_at(sizes, (h % 3 + 1).cast("int")).cast("long").alias("total_capacity"),
        (h % 3 + 1).cast("int").alias("minutes_per_stop"),
        F.posexplode("stops").alias("bus_stop_index", "bus_stop_id"),
    ).withColumn(
        "timestamp_at_stop",
        F.expr("departure_ts + make_dt_interval(0, 0, minutes_per_stop * bus_stop_index, 0)"),
    ).withColumn(
        # known from the stop-array size — no window/shuffle needed
        "last_stop",
        F.col("bus_stop_index") == F.col("n_stops") - 1,
    ).drop("n_stops")


def with_waiting_passengers(rides: DataFrame) -> DataFrame:
    """Deterministic waiting-passenger counts per (ride, stop): the
    reference joins ridership actuals (part2:431-436); the testdata
    analogue hashes (ride_id, stop) — portable, oracle-checkable."""
    hs = token_hash(F.concat_ws("#", F.col("bus_ride_id"), F.col("bus_stop_id")))
    return rides.withColumn("passengers_in_stop", (hs % 30).cast("long"))


_SIM_SCHEMA = (
    "bus_ride_id STRING, bus_line_id BIGINT, bus_line STRING, "
    "bus_stop_id BIGINT, bus_stop_index INT, timestamp_at_stop TIMESTAMP, "
    "total_capacity BIGINT, last_stop BOOLEAN, passengers_in_stop BIGINT, "
    "passengers_alighting BIGINT, passengers_boarding BIGINT, "
    "remaining_capacity BIGINT, remaining_at_stop BIGINT, total_passengers BIGINT"
)


def _simulate_one_ride(pdf: pd.DataFrame, seed: int) -> pd.DataFrame:
    """Sequential per-ride recurrence (ref part2:505-565, seeded)."""
    pdf = pdf.sort_values("bus_stop_index").reset_index(drop=True)
    ride_id = pdf["bus_ride_id"].iloc[0]
    rng = np.random.RandomState((zlib.crc32(ride_id.encode()) ^ seed) & 0x7FFFFFFF)
    capacity = int(pdf["total_capacity"].iloc[0])
    onboard = 0
    alights, boards, rem_caps, rem_stops, totals = [], [], [], [], []
    n = len(pdf)
    for i in range(n):
        waiting = int(pdf["passengers_in_stop"].iloc[i])
        if i == n - 1:  # last-stop flush (ref part2:552-565)
            alight, board = onboard, 0
        else:
            alight = int(np.clip(round(rng.normal(onboard * 0.3, 2.0)), 0, onboard))
            board = min(waiting, capacity - (onboard - alight))
        onboard = onboard - alight + board
        alights.append(alight)
        boards.append(board)
        rem_caps.append(capacity - onboard)
        rem_stops.append(waiting - board)
        totals.append(onboard)
    out = pdf.drop(columns=["departure_ts", "minutes_per_stop"], errors="ignore")
    out["passengers_alighting"] = alights
    out["passengers_boarding"] = boards
    out["remaining_capacity"] = rem_caps
    out["remaining_at_stop"] = rem_stops
    out["total_passengers"] = totals
    return out


def simulate_passengers(rides_with_waiting: DataFrame, seed: int = 42) -> DataFrame:
    """U2: grouped-map passenger simulation, one Arrow batch per ride."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _simulate_one_ride(pdf, seed)

    return rides_with_waiting.groupBy("bus_ride_id").applyInPandas(fn, _SIM_SCHEMA)


def simulated_rides(
    spark: SparkSession,
    nation: DataFrame,
    start_ts: str = "2024-06-01 06:00:00",
    end_ts: str = "2024-06-01 10:00:00",
    seed: int = 42,
) -> DataFrame:
    """Full U1→U2 pipeline: lines → rides → waiting → simulation."""
    rides = generate_rides(build_bus_lines(nation), start_ts, end_ts)
    return simulate_passengers(with_waiting_passengers(rides), seed)
