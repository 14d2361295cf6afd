"""Skew-mitigation join helpers for 100 TB-scale keys.

SURVEY §4 flags the ride×ridership join key (station, minute) as skewable
on hub stations. AQE's skew-join split handles sort-merge cases
automatically (enabled in session.py); this module provides the *explicit*
salting pattern for the cases AQE can't fix:

  - broadcast-ineligible dimension joins where one fact key dominates
    (AQE splits partitions, but a single giant KEY still lands in one
    task's hash bucket on the build side);
  - deterministic plans where runtime re-optimization is disabled
    (streaming joins, speculative-execution-off clusters).

``salted_join`` spreads each hot left-side key over ``salt_buckets``
pseudo-partitions and replicates the right side once per bucket — turning
one straggler task into ``salt_buckets`` even tasks at the cost of a
``salt_buckets``× blow-up of the (small) right side. Correctness is
join-key-exact: the salt only refines the partitioning, never the match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
    salt_col: str = "__salt",
) -> DataFrame:
    """Equi-join with explicit key salting (left = big/skewed side).

    left gets a uniform pseudo-random salt in [0, salt_buckets); right is
    replicated across all salts via a generator (explode of a literal
    range — no shuffle for the replication itself). The join key becomes
    (on..., salt), so rows of a hot key spread over ``salt_buckets``
    reducers. Output columns = normal join output (salt dropped).

    The left salt is derived from a hash of the whole row's join key plus
    a per-row nonce (monotonically_increasing_id), keeping the spread
    uniform even when all rows share one key. Deterministic given a fixed
    partitioning; for bit-reproducible results under ANY partitioning,
    pass a deterministic id column via pre-salting instead.
    """
    salted_left = left.withColumn(
        salt_col,
        F.pmod(
            F.xxhash64(*on, F.monotonically_increasing_id()), F.lit(salt_buckets)
        ).cast("int"),
    )
    salted_right = right.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_left.join(salted_right, [*on, salt_col], how).drop(salt_col)
