"""Scalar expression library (all JVM-side ``pyspark.sql.functions``
compositions — no row-at-a-time Python in any hot path)."""

from nyc_opendata_etl_spark.functions.hashing import (
    surrogate_key,
    surrogate_key_oracle_sql,
    md5_long,
    md5_long_oracle_sql,
)
from nyc_opendata_etl_spark.functions.normalize import (
    normalize_string,
    normalize_strings,
    normalize_headers,
    numeric_coerce,
    bool_map,
    ensure_columns,
    project_target,
)
from nyc_opendata_etl_spark.functions.datetime_fns import (
    date_key,
    time_key,
    fiscal_year,
    parse_ampm_time,
)

__all__ = [
    "surrogate_key",
    "surrogate_key_oracle_sql",
    "md5_long",
    "md5_long_oracle_sql",
    "normalize_string",
    "normalize_strings",
    "normalize_headers",
    "numeric_coerce",
    "bool_map",
    "ensure_columns",
    "project_target",
    "date_key",
    "time_key",
    "fiscal_year",
    "parse_ampm_time",
]
