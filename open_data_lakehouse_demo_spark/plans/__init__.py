from open_data_lakehouse_demo_spark.plans.inventory import QUERIES, Query  # noqa: F401
