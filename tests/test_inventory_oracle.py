"""Differential test: every inventory query vs its DuckDB oracle (SURVEY §5.1)."""

from __future__ import annotations

import pytest

from open_data_lakehouse_demo_spark.plans.inventory import QUERIES
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_matches_oracle

WITH_ORACLE = [name for name, q in QUERIES.items() if q.oracle is not None]
ROWS_ONLY = [name for name, q in QUERIES.items() if q.oracle is None]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    q = QUERIES[name]
    sdf = q.spark(spark, SF_DIR)
    assert_matches_oracle(sdf, duck, q.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    q = QUERIES[name]
    sdf = q.spark(spark, SF_DIR)
    assert sdf.count() >= 0


def test_conservation_invariant_is_empty(spark):
    """The ported part0:334-358 invariant: fan-out conserves hourly totals."""
    assert QUERIES["hourly_conservation_check"].spark(spark, SF_DIR).count() == 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) == len(QUERIES)
