"""Query inventory — window-analytics breadth (lag/lead, frames, sessions).

SURVEY §2.5 notes the reference uses exactly one OVER clause (W1
ROW_NUMBER); a complete engine needs the rest of the window repertoire.
All three queries here are classic time-series analytics shapes with
exact integer/decimal arithmetic (oracle-hashable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_data_lakehouse_demo_spark.functions.compat import (
    ntz_epoch_micros,
    ntz_epoch_seconds,
)
from open_data_lakehouse_demo_spark.operators.sharding import global_row_number
from open_data_lakehouse_demo_spark.plans.inventory import dec, query, t

_MOMENTUM_ORACLE = """
WITH daily AS (
  SELECT o_custkey, o_orderdate,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(20,2)) AS spend
  FROM orders GROUP BY 1, 2
)
SELECT o_custkey, o_orderdate,
  CAST(spend AS DOUBLE) AS spend,
  CAST(lag(spend) OVER w AS DOUBLE) AS prev_spend,
  CAST(lead(spend) OVER w AS DOUBLE) AS next_spend,
  CAST(spend - COALESCE(lag(spend) OVER w, spend) AS DOUBLE) AS delta,
  CAST(SUM(spend) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling3,
  CAST(SUM(spend) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cumulative
FROM daily
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate)
"""

_SESSIONS_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts, event_id,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL 30 MINUTE
         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM ordered
)
SELECT user_id, session_id,
  MIN(ts) AS session_start, MAX(ts) AS session_end,
  COUNT(*) AS n_events,
  CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_s
FROM numbered GROUP BY 1, 2
"""


@query("customer_spend_momentum", ("W2",), oracle=_MOMENTUM_ORACLE, tags=("window",))
def customer_spend_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead + bounded & running frames over per-customer daily spend
    (the window repertoire SURVEY §2.5 notes the reference never uses).
    Decimal sums keep every frame aggregate exact."""
    orders = t(spark, sf_dir, "orders")
    daily = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.sum(dec("o_totalprice")).cast("decimal(20,2)").alias("spend")
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    w3 = w.rowsBetween(-2, 0)
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "o_custkey",
        "o_orderdate",
        F.col("spend").cast("double").alias("spend"),
        F.lag("spend").over(w).cast("double").alias("prev_spend"),
        F.lead("spend").over(w).cast("double").alias("next_spend"),
        (F.col("spend") - F.coalesce(F.lag("spend").over(w), F.col("spend")))
        .cast("double")
        .alias("delta"),
        F.sum("spend").over(w3).cast("double").alias("rolling3"),
        F.sum("spend").over(wrun).cast("double").alias("cumulative"),
    )


@query("user_sessions", ("W3",), oracle=_SESSIONS_ORACLE, tags=("window",))
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): the classic
    flag-then-running-sum window pattern — one sort per user partition,
    then an ordinary session aggregate. Batch twin of streaming
    session_window()."""
    events = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    # Full-precision gap test: NTZ - NTZ is a day-time interval carrying
    # microseconds, matching the oracle's `ts - lag(ts) > INTERVAL 30
    # MINUTE` exactly (a floored-epoch-seconds diff misclassifies gaps
    # like 1800.4s whose floor is 1800).
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            prev_ts.isNull()
            | ((F.col("ts") - prev_ts) > F.expr("INTERVAL '30' MINUTE")),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        (ntz_epoch_seconds(F.max("ts")) - ntz_epoch_seconds(F.min("ts"))).alias(
            "duration_s"
        ),
    )


_DECILES_ORACLE = """
WITH spend AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
         COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, total_spend, n_orders,
  NTILE(10) OVER w AS decile,
  PERCENT_RANK() OVER w AS pct_rank,
  CUME_DIST() OVER w AS cume
FROM spend
WINDOW w AS (ORDER BY total_spend DESC, o_custkey)
"""


def _customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_spend"),
        F.count("*").alias("n_orders"),
    )


def customer_value_deciles_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-window NTILE/PERCENT_RANK/CUME_DIST formulation — the
    readable oracle twin of ``customer_value_deciles``, kept for the
    differential test (tests/test_skew_and_windows.py). An un-partitioned
    ranking window funnels every row through ONE task; never run this on
    a fact-sized relation."""
    w = Window.orderBy(F.col("total_spend").desc(), F.col("o_custkey"))
    return _customer_spend(spark, sf_dir).select(
        "o_custkey",
        "total_spend",
        "n_orders",
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query("customer_value_deciles", ("W4",), oracle=_DECILES_ORACLE, tags=("window",))
def customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranking (NTILE / PERCENT_RANK / CUME_DIST semantics)
    over per-customer spend — the segmentation pass of a value analysis —
    WITHOUT a global ranking window: the global rank comes from the
    two-phase distributed prefix sum (operators/sharding.py
    global_row_number — range-repartition + per-partition counts +
    in-partition row_number), and each ranking function is then closed-
    form arithmetic over (rank, n):

      NTILE(k):     first n%k buckets get ⌈n/k⌉ rows, the rest ⌊n/k⌋ —
                    the standard SQL bucket formula, applied to the rank;
      PERCENT_RANK: (rank-1)/(n-1)   (rank == RANK: the order is total);
      CUME_DIST:    rank/n           (no ties under the total tiebreak).

    Bit-identical to the single-window oracle (total order: spend desc,
    custkey) but every stage is partition-parallel — this survives a
    10⁹-row customer relation where the NTILE window funnels one task.
    The window formulation is kept as ``customer_value_deciles_window``
    and differentially tested."""
    spend = _customer_spend(spark, sf_dir)
    ranked = global_row_number(
        spend,
        [F.col("total_spend").desc(), F.col("o_custkey")],
        rank_col="_r",
    )
    # n is a 1-row aggregate over the (already materialized) ranked
    # relation — broadcast back; never a driver collect
    n1 = ranked.groupBy().agg(F.count("*").alias("_n"))
    r, n, k = F.col("_r"), F.col("_n"), F.lit(10)
    q = F.floor(n / k)          # base bucket size
    rem = n % k                 # first `rem` buckets take one extra row
    cut = rem * (q + 1)         # ranks <= cut land in the big buckets
    decile = (
        F.when(r <= cut, F.floor((r - 1) / (q + 1)) + 1)
        .otherwise(rem + F.floor((r - cut - 1) / F.greatest(q, F.lit(1))) + 1)
        .cast("int")
    )
    return ranked.crossJoin(F.broadcast(n1)).select(
        "o_custkey",
        "total_spend",
        "n_orders",
        decile.alias("decile"),
        F.when(n > 1, (r - 1).cast("double") / (n - 1).cast("double"))
        .otherwise(F.lit(0.0))
        .alias("pct_rank"),
        (r.cast("double") / n.cast("double")).alias("cume"),
    )


_PIVOT_ORACLE = """
SELECT CAST(EXTRACT(MONTH FROM ts) AS INT) AS month,
  CAST(SUM(CASE WHEN event_type = 'click'    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click_value,
  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value,
  CAST(SUM(CASE WHEN event_type = 'view'     THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view_value
FROM events GROUP BY 1
"""


@query("monthly_type_pivot", ("A11",), oracle=_PIVOT_ORACLE, tags=("agg",))
def monthly_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (wide aggregation): month × event_type sum matrix via
    df.groupBy().pivot() with EXPLICIT pivot values — the explicit list
    skips Spark's extra distinct-values job and keeps the plan a single
    aggregate (one shuffle), exactly a CASE-WHEN fan-out under the hood."""
    events = t(spark, sf_dir, "events")
    pivoted = (
        events.groupBy(F.month("ts").alias("month"))
        .pivot("event_type", ["click", "purchase", "view"])
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"))
    )
    return pivoted.select(
        "month",
        F.col("click").alias("click_value"),
        F.col("purchase").alias("purchase_value"),
        F.col("view").alias("view_value"),
    )


# ---------------------------------------------------------------------------
# W5 — ordered-funnel conversion (signup → view → click → purchase)
# ---------------------------------------------------------------------------
#
# Strict sequential funnel: a user reaches step k only via the EARLIEST
# event of step k's type that is strictly after their step-(k-1) time.
# Hash-parity policy for the time math: per-user step latencies are exact
# BIGINT microsecond diffs (unix_micros vs date_diff('microsecond')), the
# cross-user aggregate is an exact integer SUM, and the single
# double-division chain (sum → /n → /3.6e9) is identical in both engines,
# so the emitted doubles are bit-identical regardless of partitioning.

_FUNNEL_STEPS = ("signup", "view", "click", "purchase")

_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY 1
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY 1
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s2.t2 GROUP BY 1
), s4 AS (
  SELECT e.user_id, MIN(e.ts) AS t4 FROM events e JOIN s3 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s3.t3 GROUP BY 1
), u AS (
  SELECT s1.user_id, t1, t2, t3, t4
  FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
          LEFT JOIN s4 USING (user_id)
), agg AS (
  SELECT
    COUNT(t1) AS u1, COUNT(t2) AS u2, COUNT(t3) AS u3, COUNT(t4) AS u4,
    SUM(date_diff('microsecond', t1, t2)) AS us2,
    SUM(date_diff('microsecond', t1, t3)) AS us3,
    SUM(date_diff('microsecond', t1, t4)) AS us4
  FROM u
)
SELECT * FROM (
  SELECT 1 AS step_idx, 'signup' AS step, CAST(u1 AS BIGINT) AS users,
         CAST(0.0 AS DOUBLE) AS avg_hours_from_signup FROM agg
  UNION ALL
  SELECT 2, 'view', CAST(u2 AS BIGINT),
         CAST(us2 AS DOUBLE) / u2 / 3600000000.0 FROM agg
  UNION ALL
  SELECT 3, 'click', CAST(u3 AS BIGINT),
         CAST(us3 AS DOUBLE) / u3 / 3600000000.0 FROM agg
  UNION ALL
  SELECT 4, 'purchase', CAST(u4 AS BIGINT),
         CAST(us4 AS DOUBLE) / u4 / 3600000000.0 FROM agg
)
"""


@query("funnel_conversion", ("W5", "A1", "J7"), oracle=_FUNNEL_ORACLE, tags=("window",))
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel analysis over the event stream: how many users
    progress signup → view → click → purchase in strict timestamp order,
    and the average latency from signup to each step.

    Scale shape (windowFunnel-style single pass): ONE user-keyed shuffle.
    The aggregate keeps min(signup ts) as a scalar plus one timestamp
    ARRAY per later step type (collect_list of a type-gated ts — nulls
    are skipped, so each array holds only that user's view/click/purchase
    times); the strict-order mins then resolve per user with pure array
    expressions — array_min(filter(arr, ts > t_prev)) — no joins, no
    window sort, no re-scan. This beats the classic 4-level join chain
    (4 co-keyed shuffles + 4 sequential barrier jobs; the oracle keeps
    that formulation) at the cost of bounded per-user state: the arrays
    hold one user's per-type event times, the same state bound as any
    sessionization — for pathological hot users, cap with a dated
    pre-filter or fall back to the join chain. The final funnel aggregate
    reduces to ONE row and fans out to 4 step rows with a no-shuffle
    unpivot (stack)."""
    events = t(spark, sf_dir, "events")
    typed = events.filter(
        F.col("event_type").isin(*_FUNNEL_STEPS)
    ).select("user_id", "event_type", "ts")
    gate = lambda et: F.when(F.col("event_type") == et, F.col("ts"))  # noqa: E731
    per_user = typed.groupBy("user_id").agg(
        F.min(gate("signup")).alias("t1"),
        F.collect_list(gate("view")).alias("vs"),
        F.collect_list(gate("click")).alias("cs"),
        F.collect_list(gate("purchase")).alias("ps"),
    )
    after = lambda arr, prev: F.array_min(  # noqa: E731
        F.filter(F.col(arr), lambda x: x > F.col(prev))
    )
    u = (
        per_user.withColumn("t2", after("vs", "t1"))
        .withColumn("t3", after("cs", "t2"))
        .withColumn("t4", after("ps", "t3"))
    )
    us = lambda c: ntz_epoch_micros(F.col(c))  # noqa: E731
    agg = u.agg(
        F.count("t1").alias("u1"),
        F.count("t2").alias("u2"),
        F.count("t3").alias("u3"),
        F.count("t4").alias("u4"),
        F.sum(us("t2") - us("t1")).alias("us2"),
        F.sum(us("t3") - us("t1")).alias("us3"),
        F.sum(us("t4") - us("t1")).alias("us4"),
    )
    return agg.select(
        F.expr(
            "stack(4, "
            "1, 'signup',   u1, CAST(0.0 AS DOUBLE), "
            "2, 'view',     u2, CAST(us2 AS DOUBLE) / u2 / 3600000000.0D, "
            "3, 'click',    u3, CAST(us3 AS DOUBLE) / u3 / 3600000000.0D, "
            "4, 'purchase', u4, CAST(us4 AS DOUBLE) / u4 / 3600000000.0D) "
            "AS (step_idx, step, users, avg_hours_from_signup)"
        )
    ).select(
        F.col("step_idx").cast("int").alias("step_idx"),
        "step",
        F.col("users").cast("bigint").alias("users"),
        "avg_hours_from_signup",
    )


# ---------------------------------------------------------------------------
# TS1 — OHLC time-series downsample (hypertable-rollup shape)
# ---------------------------------------------------------------------------
#
# The classic continuous-aggregate: per (event_type, day), the first/last
# value by timestamp plus min/max — open/high/low/close. Determinism
# contract: first/last resolve via min/max over struct(ts, event_id,
# value) — the event_id tiebreak makes equal-timestamp rows order-stable
# in both engines, and the struct min is ONE hash aggregate (no window
# sort over the fact table).

_OHLC_ORACLE = """
WITH ranked AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, value,
         ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('day', ts)
                            ORDER BY ts, event_id) AS rn_open,
         ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('day', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_close
  FROM events
)
SELECT event_type, day,
  MAX(CASE WHEN rn_open = 1 THEN value END) AS open_value,
  MAX(value) AS high_value,
  MIN(value) AS low_value,
  MAX(CASE WHEN rn_close = 1 THEN value END) AS close_value,
  COUNT(*) AS n_events
FROM ranked GROUP BY 1, 2
"""


@query("daily_ohlc", ("TS1", "A2"), oracle=_OHLC_ORACLE, tags=("window",))
def daily_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC downsample of the event value stream per type — the
    continuous-aggregate/hypertable-rollup shape.

    Scale shape: ONE aggregate over (type, day): open/close are min/max
    over struct(ts, event_id, value) (deterministic under equal
    timestamps via the id tiebreak; the oracle's window formulation is
    the same total order), high/low/count are plain aggregates. Struct
    min/max buffers aren't hash-aggregatable, so Spark plans a
    SortAggregate — still a map-side PARTIAL aggregate (the per-partition
    sort is on the tiny (type, day) group key, not a global sort), and
    the single shuffle carries only group rows. No window over the fact
    table — the oracle's two ROW_NUMBER windows exist for SQL clarity
    only. This is the rollup you'd maintain incrementally under streaming
    ingestion (streaming/job.py's windowed aggregates share the shape)."""
    events = t(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
    agg = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.min(key).alias("o"),
        F.max("value").alias("high_value"),
        F.min("value").alias("low_value"),
        F.max(key).alias("c"),
        F.count("*").alias("n_events"),
    )
    return agg.select(
        "event_type",
        "day",
        F.col("o.value").alias("open_value"),
        "high_value",
        "low_value",
        F.col("c.value").alias("close_value"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# W6 — SCD2 dimension build (gaps-and-islands → validity intervals)
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH seq AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
    CASE WHEN LAG(o_orderpriority) OVER w IS NULL
           OR o_orderpriority <> LAG(o_orderpriority) OVER w THEN 1 ELSE 0 END AS chg
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
), runs AS (
  SELECT o_custkey, o_orderdate, o_orderpriority,
    SUM(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING) AS ver
  FROM seq
), grouped AS (
  SELECT o_custkey, ver, MIN(o_orderpriority) AS o_orderpriority,
         MIN(o_orderdate) AS valid_from, COUNT(*) AS n_orders
  FROM runs GROUP BY 1, 2
)
SELECT o_custkey, CAST(ver AS INT) AS version, o_orderpriority, valid_from,
       LEAD(valid_from) OVER wv AS valid_to,
       n_orders,
       (LEAD(valid_from) OVER wv IS NULL) AS is_current
FROM grouped
WINDOW wv AS (PARTITION BY o_custkey ORDER BY ver)
"""


@query("scd2_priority_history", ("W6", "W2", "A2"), oracle=_SCD2_ORACLE, tags=("window",))
def scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build: collapse each customer's
    order-priority sequence into versioned validity intervals
    [valid_from, valid_to) with an is_current flag — the standard
    lakehouse dimension-table materialization (the batch twin of the
    foreachBatch MERGE upsert in streaming/job.py).

    Gaps-and-islands: change-flag via lag, running-sum version numbers,
    then one aggregate per (customer, version) and a lead() over the
    collapsed runs for the closing bound. Scale shape: every window and
    the aggregate share ONE partitioning (o_custkey) — a single shuffle
    of the fact table, sorts reused across the two window specs; the
    post-agg lead() runs over the runs relation (version-count-sized,
    ≪ input). Total tiebreak (o_orderdate, o_orderkey) makes runs
    deterministic under equal dates."""
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderpriority").over(w)
    chg = F.when(
        prev.isNull() | (F.col("o_orderpriority") != prev), 1
    ).otherwise(0)
    runs = orders.select(
        "o_custkey",
        "o_orderdate",
        "o_orderpriority",
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("ver"),
    )
    grouped = runs.groupBy("o_custkey", "ver").agg(
        F.min("o_orderpriority").alias("o_orderpriority"),
        F.min("o_orderdate").alias("valid_from"),
        F.count("*").alias("n_orders"),
    )
    wv = Window.partitionBy("o_custkey").orderBy("ver")
    valid_to = F.lead("valid_from").over(wv)
    return grouped.select(
        "o_custkey",
        F.col("ver").cast("int").alias("version"),
        "o_orderpriority",
        "valid_from",
        valid_to.alias("valid_to"),
        "n_orders",
        valid_to.isNull().alias("is_current"),
    )
