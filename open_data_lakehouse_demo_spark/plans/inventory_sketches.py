"""Query inventory — mergeable-sketch scale paths (rows-only checks).

The oracle set pins EXACT variants (exact_quantiles, COUNT(DISTINCT)); at
100 TB the production path is the mergeable sketch: one pass, bounded
memory, partial-aggregates map-side, no global sort. These entries run the
sketch versions so the driver smoke-checks them; their accuracy vs the
exact variants is pytest-asserted (tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_data_lakehouse_demo_spark.functions.compat import approx_quantiles
from open_data_lakehouse_demo_spark.plans.inventory import query, t


@query("value_quantiles_sketch", ("A5",), tags=("sketch",))
def value_quantiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPROX_QUANTILES via the Greenwald-Khanna sketch (the ref's actual
    function — part3:272-289; the exact twin `value_quantiles` is the
    oracle-checked variant)."""
    events = t(spark, sf_dir, "events")
    qs = approx_quantiles("value", [0.0, 0.25, 0.5, 0.75, 1.0])
    agg = events.groupBy("event_type").agg(qs.alias("qs"))
    return agg.select(
        "event_type",
        *[F.element_at("qs", i + 1).alias(f"q{p}") for i, p in enumerate((0, 25, 50, 75, 100))],
    )


@query("distinct_users_hll", ("A10",), tags=("sketch",))
def distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event type — the mergeable
    scale path for the exact COUNT(DISTINCT) in revenue_rollup (A10)."""
    events = t(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count("*").alias("n_events"),
    )
