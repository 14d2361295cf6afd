"""GoogleSQL → Spark SQL translation layer (functions/compat.py).

The reference issues GoogleSQL text to BigQuery (SURVEY §3 E2); these tests
run reference-shaped GoogleSQL through translate_googlesql → spark.sql and
check results — the "same SQL, one engine" contract.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from open_data_lakehouse_demo_spark.functions.compat import translate_googlesql
from open_data_lakehouse_demo_spark.sources.io import register_views
from tests.conftest import SF_DIR, utc_naive


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    register_views(spark, SF_DIR, ("events", "orders"))


def test_timestamp_functions_translate(spark):
    # shaped like the reference's demand query (part3:178-191)
    gsql = """
    SELECT event_type,
           TIMESTAMP_TRUNC(ts, hour) AS hr,
           COUNT(*) AS n
    FROM events
    WHERE ts > TIMESTAMP_SUB((SELECT MAX(ts) FROM events), INTERVAL 7 DAY)
    GROUP BY event_type, TIMESTAMP_TRUNC(ts, hour)
    """
    df = spark.sql(translate_googlesql(gsql))
    # the NTZ-result contract (r10): events.ts is TIMESTAMP_NTZ, so the
    # truncated column must stay NTZ — Spark's bare date_trunc returns
    # the INSTANT type, whose collected values render through the
    # PYTHON local zone and broke this assertion under TZ=America/New_York
    assert dict(df.dtypes)["hr"] == "timestamp_ntz"
    rows = df.collect()
    assert len(rows) > 0
    max_ts = spark.sql("SELECT MAX(ts) m FROM events").first()["m"]
    cutoff = max_ts - datetime.timedelta(days=7)
    assert all(r["hr"] > cutoff - datetime.timedelta(hours=1) for r in rows)


def test_safe_divide_and_types_translate(spark):
    gsql = """
    SELECT CAST(o_orderkey AS INT64) AS k,
           SAFE_DIVIDE(o_totalprice, CAST(0 AS FLOAT64)) AS div0
    FROM orders LIMIT 5
    """
    rows = spark.sql(translate_googlesql(gsql)).collect()
    assert len(rows) == 5
    assert all(r["div0"] is None for r in rows)  # SAFE_DIVIDE → NULL on /0


def test_generate_array_unnest_translate(spark):
    # the part0:324-325 lateral fan-out shape; UNNEST table-ref becomes
    # explode via the sequence rewrite + LATERAL VIEW-compatible syntax
    gsql = "SELECT x FROM (SELECT GENERATE_ARRAY(0, 59) AS arr) LATERAL VIEW explode(arr) t AS x"
    rows = spark.sql(translate_googlesql(gsql)).collect()
    assert [r["x"] for r in rows] == list(range(60))


def test_timestamp_add_and_bucket_translate(spark):
    gsql = """
    SELECT TIMESTAMP_ADD(TIMESTAMP '2024-01-01 00:00:00', INTERVAL 90 MINUTE) AS t1,
           TIMESTAMP_BUCKET(TIMESTAMP '2024-01-01 00:07:21', INTERVAL 5 MINUTE) AS t2
    """
    r = spark.sql(translate_googlesql(gsql)).first()
    assert utc_naive(r["t1"]) == datetime.datetime(2024, 1, 1, 1, 30)
    # BUCKET returns TIMESTAMP_NTZ (zone-free field arithmetic, r10) —
    # collected verbatim, no local rendering to invert
    assert r["t2"] == datetime.datetime(2024, 1, 1, 0, 5)


def test_parse_timestamp_and_offset_translate(spark):
    gsql = """
    SELECT PARSE_TIMESTAMP('%m/%d/%Y %I:%M:%S %p', '3/14/2024 2:30:00 PM') AS ts,
           arr[OFFSET(2)] AS third
    FROM (SELECT array(10, 20, 30) AS arr)
    """
    r = spark.sql(translate_googlesql(gsql)).first()
    # PARSE_TIMESTAMP returns TIMESTAMP_NTZ (r10) — verbatim wall time
    assert r["ts"] == datetime.datetime(2024, 3, 14, 14, 30)
    assert r["third"] == 30


def test_replace_and_cast_station_id_shape(spark):
    # part0:257/294: CAST(REPLACE(station_complex_id, 'TRAM', '98765') AS INT64)
    gsql = "SELECT CAST(REPLACE('TRAM', 'TRAM', '98765') AS INT64) AS sid"
    assert spark.sql(translate_googlesql(gsql)).first()["sid"] == 98765
