"""Shared DuckDB-SQL snippet builders for the oracle side.

Each mirrors a Spark expression in ``nyc_opendata_etl_spark.functions``
exactly (verified by the unit tests and the driver's differential run).
"""

from __future__ import annotations

from nyc_opendata_etl_spark.functions.hashing import (
    surrogate_key_oracle_sql,
)

__all__ = ["norm", "surrogate", "money_sum"]


def norm(expr: str) -> str:
    """Oracle twin of functions.normalize.normalize_string."""
    return (
        "lower(regexp_replace(COALESCE(CAST(" + expr + " AS VARCHAR), ''),"
        " '^\\s+|\\s+$', '', 'g'))"
    )


def surrogate(*exprs: str) -> str:
    """Oracle twin of functions.hashing.surrogate_key."""
    return surrogate_key_oracle_sql(*exprs)


def money_sum(expr: str) -> str:
    """Decimal-exact sum of a 2-dp money column, emitted as DOUBLE.

    Summing doubles directly is order-dependent; routing through
    DECIMAL(18,2) makes the aggregate exact and engine-independent, and
    the final DOUBLE conversion is correctly rounded in both engines →
    bit-identical.
    """
    return f"CAST(round(sum(CAST({expr} AS DECIMAL(18,2))), 2) AS DOUBLE)"
