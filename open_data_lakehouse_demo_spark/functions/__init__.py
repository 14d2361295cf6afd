from open_data_lakehouse_demo_spark.functions.compat import (  # noqa: F401
    approx_quantiles,
    dayofweek_sunday1,
    exact_quantiles,
    generate_array,
    parse_timestamp_us,
    register_sql_functions,
    safe_divide,
    timestamp_bucket,
    translate_googlesql,
)
