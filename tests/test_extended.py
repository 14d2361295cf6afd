"""Extended Spark-native operators: oracle parity + bucketed co-located join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_data_lakehouse_demo_spark.plans import ddl
from open_data_lakehouse_demo_spark.plans.inventory import QUERIES
from open_data_lakehouse_demo_spark.sources.io import read_parquet
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_matches_oracle


@pytest.mark.parametrize(
    "name",
    ["customer_order_status", "buyer_cohort_setops", "revenue_rollup_region_nation"],
)
def test_extended_oracle_parity(spark, duck, name):
    q = QUERIES[name]
    assert q.oracle is not None
    assert_matches_oracle(q.spark(spark, SF_DIR), duck, q.oracle, name)


def test_bucketed_tables_join_without_shuffle(spark):
    """S15 scale story: bucketing both join sides on the key removes the
    shuffle — the joined plan must contain no Exchange over the scans."""
    ddl.create_namespace(spark, "lakehouse_test")
    orders = read_parquet(spark, f"{SF_DIR}/orders.parquet")
    lineitem = read_parquet(spark, f"{SF_DIR}/lineitem.parquet")
    try:
        (
            orders.write.format("parquet")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable("lakehouse_test.orders_b")
        )
        (
            lineitem.write.format("parquet")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable("lakehouse_test.lineitem_b")
        )
        o = spark.table("lakehouse_test.orders_b")
        li = spark.table("lakehouse_test.lineitem_b")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
                "l_orderkey", "l_extendedprice", "o_totalprice"
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert joined.count() == lineitem.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    finally:
        ddl.drop_table(spark, "lakehouse_test.orders_b")
        ddl.drop_table(spark, "lakehouse_test.lineitem_b")


def test_skewed_join_salted_oracle_parity(spark, duck):
    from tests.oracle_utils import assert_matches_oracle

    q = QUERIES["skewed_join_salted"]
    assert_matches_oracle(q.spark(spark, SF_DIR), duck, q.oracle, "skewed_join_salted")
