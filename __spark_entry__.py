"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`nyc_opendata_etl_spark.queries` — the registry
pairing each implemented operator (SURVEY.md §2) with its DuckDB oracle
SQL. ``entry`` runs the flagship star-schema query on sf0.001.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from nyc_opendata_etl_spark import queries as _q  # noqa: E402
from nyc_opendata_etl_spark.operators.star import star_revenue  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return star_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
