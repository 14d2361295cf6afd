"""Query inventory — window-analytics breadth (lag/lead, frames, sessions).

SURVEY §2.5 notes the reference uses exactly one OVER clause (W1
ROW_NUMBER); a complete engine needs the rest of the window repertoire.
All three queries here are classic time-series analytics shapes with
exact integer/decimal arithmetic (oracle-hashable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_data_lakehouse_demo_spark.functions.compat import ntz_epoch_seconds
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
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
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
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            prev_ts.isNull()
            | (ntz_epoch_seconds(F.col("ts")) - ntz_epoch_seconds(prev_ts) > 1800),
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
