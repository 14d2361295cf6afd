from open_data_lakehouse_demo_spark.sources.io import (  # noqa: F401
    TESTDATA_TABLES,
    load_tables,
    read_csv,
    read_jsonl,
    read_parquet,
    register_views,
    write_parquet,
)
from open_data_lakehouse_demo_spark.sources import table_log  # noqa: F401
