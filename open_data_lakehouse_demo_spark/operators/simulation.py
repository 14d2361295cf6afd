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
                # TIMESTAMP_NTZ literals: plain timestamp'...' parses as session-tz
                # LTZ and would shift wall times under non-UTC driver sessions
                f"sequence(timestamp_ntz'{start_ts}', timestamp_ntz'{end_ts}', "
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
    "bus_stop_id BIGINT, bus_stop_index INT, timestamp_at_stop TIMESTAMP_NTZ, "
    "total_capacity BIGINT, last_stop BOOLEAN, passengers_in_stop BIGINT, "
    "passengers_alighting BIGINT, passengers_boarding BIGINT, "
    "remaining_capacity BIGINT, remaining_at_stop BIGINT, total_passengers BIGINT"
)


def _sim_ride_arrays(
    ride_id: str, waiting: np.ndarray, capacity: int, seed: int
) -> tuple[list, list, list, list, list]:
    """Sequential per-ride recurrence (ref part2:505-565), seeded per ride
    (crc32(ride_id) ^ seed) so results are independent of partitioning.
    ``waiting`` arrives sorted by bus_stop_index."""
    rng = np.random.RandomState((zlib.crc32(ride_id.encode()) ^ seed) & 0x7FFFFFFF)
    onboard = 0
    alights, boards, rem_caps, rem_stops, totals = [], [], [], [], []
    n = len(waiting)
    for i in range(n):
        w = int(waiting[i])
        if i == n - 1:  # last-stop flush (ref part2:552-565)
            alight, board = onboard, 0
        else:
            alight = int(np.clip(round(rng.normal(onboard * 0.3, 2.0)), 0, onboard))
            board = min(w, capacity - (onboard - alight))
        onboard = onboard - alight + board
        alights.append(alight)
        boards.append(board)
        rem_caps.append(capacity - onboard)
        rem_stops.append(w - board)
        totals.append(onboard)
    return alights, boards, rem_caps, rem_stops, totals


_SIM_IN_COLS = [
    "bus_ride_id",
    "bus_line_id",
    "bus_line",
    "bus_stop_id",
    "bus_stop_index",
    "timestamp_at_stop",
    "total_capacity",
    "last_stop",
    "passengers_in_stop",
]


def _simulate_batch(pdf: pd.DataFrame, seed: int) -> pd.DataFrame:
    """Run the recurrence for every (contiguous, stop-sorted) ride group in
    one pandas batch — one Arrow round-trip amortizes over all of them."""
    ids = pdf["bus_ride_id"].to_numpy()
    waiting = pdf["passengers_in_stop"].to_numpy()
    caps = pdf["total_capacity"].to_numpy()
    # contiguous group boundaries (input sorted by ride, stop_index)
    starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
    bounds = np.r_[starts, len(ids)]
    cols: list[list] = [[], [], [], [], []]
    for s, e in zip(bounds[:-1], bounds[1:]):
        parts = _sim_ride_arrays(ids[s], waiting[s:e], int(caps[s]), seed)
        for acc, part in zip(cols, parts):
            acc += part
    out = pdf[_SIM_IN_COLS].copy()
    out["passengers_alighting"] = cols[0]
    out["passengers_boarding"] = cols[1]
    out["remaining_capacity"] = cols[2]
    out["remaining_at_stop"] = cols[3]
    out["total_passengers"] = cols[4]
    return out


def simulate_passengers(rides_with_waiting: DataFrame, seed: int = 42) -> DataFrame:
    """U2: passenger simulation over ride groups.

    The reference shape is ``groupBy(ride).applyInPandas`` (part2:578-580),
    but ride groups are TINY (~14 rows) and grouped-map pays one Python
    call + Arrow conversion PER GROUP — at 100 TB that per-group overhead,
    not the recurrence, is the bottleneck (measured 3.5s → 0.6s at sf0.1
    with ~400 groups). Scale shape used here: hash-repartition by ride,
    sort within partitions by (ride, stop), and run ONE mapInPandas over
    each partition, iterating contiguous ride groups inside the batch.
    Arrow may still split a partition into multiple batches mid-ride, so a
    carry buffer moves the trailing (possibly incomplete) ride group into
    the next batch. Per-ride seeding keeps the output bit-identical to the
    grouped-map form under any partitioning.
    """

    def fn(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            ids = pdf["bus_ride_id"].to_numpy()
            # hold back the trailing ride group — it may continue in the
            # next Arrow batch of this partition
            cut = np.flatnonzero(ids != ids[-1])
            split = (cut[-1] + 1) if len(cut) else 0
            carry = pdf.iloc[split:]
            if split:
                yield _simulate_batch(pdf.iloc[:split], seed)
        if carry is not None and len(carry):
            yield _simulate_batch(carry, seed)

    prepared = (
        rides_with_waiting.select(*_SIM_IN_COLS)
        .repartition("bus_ride_id")
        .sortWithinPartitions("bus_ride_id", "bus_stop_index")
    )
    return prepared.mapInPandas(fn, _SIM_SCHEMA)


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
