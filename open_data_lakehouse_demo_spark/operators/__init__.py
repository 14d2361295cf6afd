from open_data_lakehouse_demo_spark.operators.gapfill import gap_fill  # noqa: F401
