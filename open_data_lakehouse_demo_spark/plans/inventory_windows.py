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


@query("customer_value_deciles", ("W4",), oracle=_DECILES_ORACLE, tags=("window",))
def customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-ranking windows: NTILE / PERCENT_RANK / CUME_DIST over
    per-customer spend — the segmentation pass of a value analysis.
    Total tiebreak (spend desc, custkey) makes every rank deterministic.

    Scale note: an un-partitioned ranking window moves all rows to ONE
    window partition — fine here because the input is the post-aggregate
    customer table (|customers| ≪ |orders|); for fact-sized ranking use
    approx quantile cuts instead."""
    orders = t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_spend"),
        F.count("*").alias("n_orders"),
    )
    w = Window.orderBy(F.col("total_spend").desc(), F.col("o_custkey"))
    return spend.select(
        "o_custkey",
        "total_spend",
        "n_orders",
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
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

    Scale shape: each step is a user-keyed MIN aggregate joined to the
    previous step's user-level table — all four shuffles hash on the SAME
    key (user_id), so AQE/co-partitioning reuses the exchange and the
    join per step is 1:N on an already-reduced (one-row-per-user) build
    side. The final funnel aggregate reduces to ONE row and fans out to 4
    step rows with a no-shuffle unpivot (stack). No window sort anywhere:
    conditional MIN beats sorting each user's history at 100 TB."""
    events = t(spark, sf_dir, "events")

    def step(prev: DataFrame, etype: str, tprev: str, tcur: str) -> DataFrame:
        nxt = (
            events.filter(F.col("event_type") == etype)
            .join(prev.select("user_id", tprev), "user_id")
            .filter(F.col("ts") > F.col(tprev))
            .groupBy("user_id")
            .agg(F.min("ts").alias(tcur))
        )
        return nxt

    s1 = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = step(s1, "view", "t1", "t2")
    s3 = step(s2, "click", "t2", "t3")
    s4 = step(s3, "purchase", "t3", "t4")
    u = (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .join(s4, "user_id", "left")
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
