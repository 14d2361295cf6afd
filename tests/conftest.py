from __future__ import annotations

import duckdb
import pytest

from open_data_lakehouse_demo_spark.session import get_spark
from open_data_lakehouse_demo_spark.sources.io import TESTDATA_TABLES

SF_DIR = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"


def utc_naive(dt):
    """Collected Spark timestamps are naive datetimes rendered in the
    PYTHON process's local zone (PySpark converts the UTC micros via the
    local clock), so comparing them against wall-time literals breaks
    under any TZ other than the session's pinned UTC — found under
    TZ=Pacific/Chatham (+12:45/+13:45). .timestamp() inverts the local
    rendering back to the true epoch in any zone; re-render as the UTC
    wall time the session (spark.sql.session.timeZone=UTC) parsed the
    literals in."""
    import datetime as _dt

    return _dt.datetime.fromtimestamp(
        dt.timestamp(), _dt.timezone.utc
    ).replace(tzinfo=None)


def utc_str(dt) -> str:
    return utc_naive(dt).strftime("%Y-%m-%d %H:%M:%S")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", cpus=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()
