"""Query inventory — as-of and range joins (custom temporal operators).

The oracle engine has a NATIVE ASOF JOIN, so the as-of oracle is the real
thing — the strongest possible differential check for our union-window
formulation. The range-join oracle is a plain BETWEEN theta join (exact
semantics; our bucketized prefilter must change nothing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_data_lakehouse_demo_spark.functions.compat import timestamp_bucket
from open_data_lakehouse_demo_spark.operators.temporal_joins import asof_join, range_join
from open_data_lakehouse_demo_spark.plans.inventory import dec, query, t

# 5-min demand series per event_type — the "quotes" side of the as-of join
_AGG_SQL = """
agg AS (
  SELECT event_type, time_bucket(INTERVAL 5 MINUTE, ts) AS bucket,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS demand
  FROM events GROUP BY 1, 2
)
"""

_ASOF_ORACLE = f"""
WITH {_AGG_SQL},
-- probe set: sampled events (deterministic), shifted +90s so probes fall
-- strictly between buckets (exercises the at-or-before semantics)
probes AS (
  SELECT event_id, event_type, ts + INTERVAL 90 SECOND AS pts, value
  FROM events WHERE event_id % 20 = 0
)
SELECT p.event_id, p.event_type, p.pts, p.value,
       a.bucket AS r_bucket, a.demand AS r_demand
FROM probes p ASOF LEFT JOIN agg a
  ON p.event_type = a.event_type AND p.pts >= a.bucket
"""

_RANGE_ORACLE = """
WITH windows AS (
  SELECT DISTINCT event_type,
         CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 6 HOUR AS win_start,
         CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 18 HOUR AS win_end
  FROM events
)
SELECT e.event_id, e.event_type, e.ts, w.win_start, w.win_end
FROM events e JOIN windows w
  ON e.event_type = w.event_type AND e.ts >= w.win_start AND e.ts <= w.win_end
"""


@query("asof_demand_join", ("TJ1",), oracle=_ASOF_ORACLE, tags=("temporal",))
def asof_demand_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/temporal_joins.py): each probe event picks up
    the latest 5-min demand bucket at-or-before its timestamp — checked
    against the oracle engine's NATIVE ASOF JOIN. Union-window plan: one
    shuffle + one per-key sort, never quadratic."""
    events = t(spark, sf_dir, "events")
    agg = events.groupBy(
        "event_type", timestamp_bucket("ts", 300).alias("bucket")
    ).agg(F.sum(dec("value")).cast("double").alias("demand"))
    probes = events.filter(F.col("event_id") % 20 == 0).select(
        "event_id",
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 90 SECOND")).alias("pts"),
        "value",
    )
    return asof_join(
        probes, agg, on=["event_type"], left_ts="pts", right_ts="bucket"
    )


@query("events_in_service_windows", ("TJ2",), oracle=_RANGE_ORACLE, tags=("temporal",))
def events_in_service_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (operators/temporal_joins.py): events falling inside
    per-type daily 06:00-18:00 service windows. Bucketized equi-join
    prefilter + exact BETWEEN — the oracle is the plain theta join."""
    events = t(spark, sf_dir, "events")
    windows = events.select(
        "event_type",
        (F.date_trunc("day", F.col("ts")).cast("timestamp_ntz") + F.expr("INTERVAL 6 HOURS")).alias("win_start"),
        (F.date_trunc("day", F.col("ts")).cast("timestamp_ntz") + F.expr("INTERVAL 18 HOURS")).alias("win_end"),
    ).distinct()
    return range_join(
        events.select("event_id", "event_type", "ts"),
        windows,
        on=["event_type"],
        left_ts="ts",
        range_start="win_start",
        range_end="win_end",
        bucket_seconds=6 * 3600,
    ).select("event_id", "event_type", "ts", "win_start", "win_end")


_RESOLUTION_ORACLE = """
WITH err AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
), pur AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT e.event_id, e.user_id, e.ts,
  MIN(p.ts) AS resolved_ts,
  CASE WHEN MIN(p.ts) IS NULL THEN NULL
       ELSE date_diff('second', e.ts, MIN(p.ts)) END AS wait_s
FROM err e LEFT JOIN pur p
  ON p.user_id = e.user_id
 AND (p.ts > e.ts OR (p.ts = e.ts AND p.event_id > e.event_id))
 AND p.ts <= e.ts + INTERVAL 1 HOUR
GROUP BY e.event_id, e.user_id, e.ts
"""


@query("error_time_to_resolution", ("TJ3", "W2"), oracle=_RESOLUTION_ORACLE, tags=("temporal",))
def error_time_to_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch counterpart of the stream-stream interval join (streaming
    relief_join): for each 'error' event, the FIRST 'purchase' by the same
    user within 1 hour; unresolved errors keep null (left-outer shape).

    Spark-first plan: NOT the O(|err|·|pur|) interval join the oracle
    runs — one window pass over the per-user event sequence. "Next
    purchase after t" is a running last_value(ignorenulls) over a
    DESCENDING (ts, event_id) sort with a (UNBOUNDED PRECEDING → 1
    PRECEDING) frame: running frames evaluate incrementally (O(n) per
    partition) where the FOLLOWING-frame formulation re-scans per row
    (O(n²) — the gap-fill lesson, operators/gapfill.py). The 1h bound is
    applied after: the closest purchase either qualifies or none does.
    One shuffle on user_id, no join at all."""
    from open_data_lakehouse_demo_spark.functions.compat import ntz_epoch_seconds
    from pyspark.sql import Window

    events = t(spark, sf_dir, "events")
    relevant = events.filter(F.col("event_type").isin("error", "purchase")).select(
        "event_id", "user_id", "ts", "event_type"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_next = relevant.withColumn(
        "resolved_ts",
        F.last(
            F.when(F.col("event_type") == "purchase", F.col("ts")),
            ignorenulls=True,
        ).over(w),
    )
    errs = with_next.filter(F.col("event_type") == "error")
    wait = ntz_epoch_seconds(F.col("resolved_ts")) - ntz_epoch_seconds(F.col("ts"))
    # bound on the FULL-PRECISION timestamps: ts carries microseconds, and
    # a truncated-seconds comparison would admit purchases up to ~1s past
    # the hour that the oracle's interval bound excludes
    in_bound = F.col("resolved_ts").isNotNull() & (
        F.col("resolved_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")
    )
    return errs.select(
        "event_id",
        "user_id",
        "ts",
        F.when(in_bound, F.col("resolved_ts")).alias("resolved_ts"),
        F.when(in_bound, wait).alias("wait_s"),
    )


# ---------------------------------------------------------------------------
# TJ4 — multi-touch attribution (range join → first/last/linear credit)
# ---------------------------------------------------------------------------

_ATTR_HOURS = 24
_CREDIT_SCALE = 1_000_000  # linear credit in ppm — integer-exact division

_ATTR_ORACLE = f"""
WITH purchases AS (
  SELECT event_id AS purchase_id, user_id, ts AS pts
  FROM events WHERE event_type = 'purchase'
), touches AS (
  SELECT event_id AS touch_id, user_id, event_type AS touch_type, ts AS tts
  FROM events WHERE event_type IN ('click', 'view')
), pairs AS (
  SELECT p.purchase_id, t.touch_type, t.tts, t.touch_id
  FROM purchases p JOIN touches t ON p.user_id = t.user_id
   AND t.tts BETWEEN p.pts - INTERVAL {_ATTR_HOURS} HOUR AND p.pts
), ppt AS (
  SELECT purchase_id, touch_type, COUNT(*) AS c_t FROM pairs GROUP BY 1, 2
), pp AS (
  SELECT purchase_id, SUM(c_t) AS n FROM ppt GROUP BY 1
), firsts AS (
  SELECT purchase_id, touch_type AS ft FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY purchase_id ORDER BY tts, touch_id) AS rn
    FROM pairs
  ) WHERE rn = 1
), lasts AS (
  SELECT purchase_id, touch_type AS lt FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY purchase_id ORDER BY tts DESC, touch_id DESC) AS rn
    FROM pairs
  ) WHERE rn = 1
)
SELECT ppt.touch_type,
  CAST(SUM(ppt.c_t) AS BIGINT) AS n_touches,
  CAST(SUM(CASE WHEN f.ft = ppt.touch_type THEN 1 ELSE 0 END) AS BIGINT) AS first_touch,
  CAST(SUM(CASE WHEN l.lt = ppt.touch_type THEN 1 ELSE 0 END) AS BIGINT) AS last_touch,
  CAST(SUM(ppt.c_t * ({_CREDIT_SCALE} // pp.n)) AS BIGINT) AS linear_credit_ppm
FROM ppt
JOIN pp USING (purchase_id)
JOIN firsts f USING (purchase_id)
JOIN lasts l USING (purchase_id)
GROUP BY 1 ORDER BY 1
"""


@query("touch_attribution", ("TJ4", "TJ2", "A1"), oracle=_ATTR_ORACLE, tags=("temporal",))
def touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch marketing attribution: every purchase event claims the
    click/view touches of the same user in the preceding 24 h (range
    join, bucketized prefilter — operators/temporal_joins.range_join),
    then first-touch / last-touch / linear-credit models aggregate per
    touch channel.

    Determinism: first/last per purchase are struct-min/max over
    (tts, touch_id) — a total order, matching the oracle's tie-broken
    ROW_NUMBER. Linear credit avoids float division entirely: each touch
    earns 1_000_000 DIV n ppm (integer-exact in both engines), so the
    report hashes bit-identically.

    Scale shape: the range join shuffles on user_id with the 25-bucket
    window explode on the (smaller) purchase side; everything after
    operates on purchase-count-sized relations — two hash aggregates and
    purchase-keyed joins AQE can broadcast. No window over the fact
    table."""
    from open_data_lakehouse_demo_spark.operators.temporal_joins import range_join

    events = t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("pts"),
        (F.col("ts") - F.expr(f"INTERVAL '{_ATTR_HOURS}' HOUR")).alias("win_start"),
    )
    touches = events.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("touch_id"),
        "user_id",
        F.col("event_type").alias("touch_type"),
        F.col("ts").alias("tts"),
    )
    pairs = range_join(
        touches, purchases, on=["user_id"], left_ts="tts",
        range_start="win_start", range_end="pts",
    ).select("purchase_id", "touch_type", "tts", "touch_id")

    # ONE pass over the join output: per-(purchase, channel) counts carry
    # their own struct-min/max, so the purchase-level first/last derive
    # from the tiny ppt relation instead of re-running the range join
    # (the naive ppt/pp/ends formulation planned the join subtree 3×)
    from open_data_lakehouse_demo_spark.sources.io import materialize

    ppt = materialize(
        pairs.groupBy("purchase_id", "touch_type").agg(
            F.count("*").alias("c_t"),
            F.min(F.struct("tts", "touch_id", "touch_type")).alias("mn"),
            F.max(F.struct("tts", "touch_id", "touch_type")).alias("mx"),
        )
    )
    pp = ppt.groupBy("purchase_id").agg(
        F.sum("c_t").alias("n"),
        F.min("mn").alias("f"),
        F.max("mx").alias("l"),
    )
    joined = ppt.join(pp, "purchase_id")
    return (
        joined.groupBy("touch_type")
        .agg(
            F.sum("c_t").cast("bigint").alias("n_touches"),
            F.sum(
                F.when(F.col("f.touch_type") == F.col("touch_type"), 1).otherwise(0)
            ).cast("bigint").alias("first_touch"),
            F.sum(
                F.when(F.col("l.touch_type") == F.col("touch_type"), 1).otherwise(0)
            ).cast("bigint").alias("last_touch"),
            F.sum(F.col("c_t") * F.expr(f"{_CREDIT_SCALE} div n"))
            .cast("bigint")
            .alias("linear_credit_ppm"),
        )
        .orderBy("touch_type")
    )
