"""Shared DuckDB-SQL snippet builders for the oracle side.

Each mirrors a Spark expression in ``nyc_opendata_etl_spark.functions``
exactly (verified by the unit tests and the driver's differential run).
"""

from __future__ import annotations

from nyc_opendata_etl_spark.functions.hashing import (
    surrogate_key_oracle_sql,
)

__all__ = ["norm", "surrogate", "money_sum", "PY_WS_RE2"]

# Python str.strip()'s whitespace set in RE2 (DuckDB regexp) syntax —
# the twin of functions.normalize.PY_WS_JAVA. RE2's \s is ASCII-only,
# so the explicit class keeps both engines on pandas semantics.
PY_WS_RE2 = (
    "\\t-\\r\\x{1c}-\\x{1f} \\x{85}\\x{a0}\\x{1680}\\x{2000}-\\x{200a}"
    "\\x{2028}\\x{2029}\\x{202f}\\x{205f}\\x{3000}"
)


def norm(expr: str) -> str:
    """Oracle twin of functions.normalize.normalize_string."""
    return (
        "lower(regexp_replace(COALESCE(CAST(" + expr + " AS VARCHAR), ''),"
        f" '^[{PY_WS_RE2}]+|[{PY_WS_RE2}]+$', '', 'g'))"
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
