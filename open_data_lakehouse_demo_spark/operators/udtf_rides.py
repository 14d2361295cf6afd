"""Python UDTF surface (SURVEY §2.9 U1 note: "or Spark 3.5 Python UDTF").

The reference's ride generator is a scalar UDF returning ARRAY<STRUCT>
exploded afterwards (lakehouse_part2_spark_processing.py:353-420). The
engine's PRIMARY implementation is pure built-ins (operators/simulation.py
generate_rides — no Python at all); this module provides the same expansion
as a registered Python UDTF for workloads that need imperative per-row
fan-out logic beyond what sequence()/posexplode() can express (e.g.
data-dependent recursion). Arrow-optimized when
``spark.sql.execution.pythonUDTF.arrow.enabled`` is on.

The UDTF is deliberately limited to the *expansion* (departures × stops);
the hash-derived attributes (capacity, per-stop increment, waiting counts)
stay JVM-side Column expressions on the UDTF output, so only the row
fan-out pays the Python boundary.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType=(
    "bus_line_id bigint, bus_line string, departure_ts timestamp_ntz, "
    "bus_stop_index int, bus_stop_id bigint, n_stops int"
))
class ExpandRides:
    """lateral UDTF: one input line row → (departures × stops) rows."""

    def eval(  # noqa: D102 - UDTF contract
        self,
        bus_line_id: int,
        bus_line: str,
        frequency_minutes: int,
        stops: list,
        start_ts: datetime.datetime,
        end_ts: datetime.datetime,
    ):
        step = datetime.timedelta(minutes=frequency_minutes)
        dep = start_ts
        n = len(stops)
        while dep <= end_ts:
            for idx, stop_id in enumerate(stops):
                yield (bus_line_id, bus_line, dep, idx, stop_id, n)
            dep = dep + step


def generate_rides_udtf(
    spark: SparkSession,
    lines: DataFrame,
    start_ts: str,
    end_ts: str,
) -> DataFrame:
    """U1 via the UDTF path; output schema matches simulation.generate_rides
    (tests assert row-level equality between the two implementations)."""
    from open_data_lakehouse_demo_spark.operators.dedup import token_hash
    from open_data_lakehouse_demo_spark.operators.simulation import BUS_SIZES

    spark.udtf.register("expand_rides", ExpandRides)
    lines.createOrReplaceTempView("__udtf_lines")
    expanded = spark.sql(
        f"""
        SELECT t.* FROM __udtf_lines l,
        LATERAL expand_rides(
            l.bus_line_id, l.bus_line, l.frequency_minutes, l.stops,
            TIMESTAMP_NTZ '{start_ts}', TIMESTAMP_NTZ '{end_ts}'
        ) t
        """
    )
    with_id = expanded.withColumn(
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
    return with_id.select(
        "bus_ride_id",
        "bus_line_id",
        "bus_line",
        "departure_ts",
        F.element_at(sizes, (h % 3 + 1).cast("int")).cast("long").alias("total_capacity"),
        (h % 3 + 1).cast("int").alias("minutes_per_stop"),
        "bus_stop_index",
        "bus_stop_id",
        F.expr(
            "departure_ts + make_dt_interval(0, 0, minutes_per_stop * bus_stop_index, 0)"
        ).alias("timestamp_at_stop"),
        (F.col("bus_stop_index") == F.col("n_stops") - 1).alias("last_stop"),
    )
