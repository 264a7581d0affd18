"""String / schema normalization expressions.

Re-expresses the reference's cleaning idioms (SURVEY §2 N1-N4, P2, P5,
§1.3 schema reconciliation) as native Catalyst expressions. All of these
run inside whole-stage codegen; none shuffle.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# The EXACT character set Python's str.strip() (and hence pandas
# .str.strip()) treats as whitespace: ASCII \t-\r, the \x1c-\x1f file/
# group separators, space, NEL, NBSP, and the Unicode space blocks.
# Java's \s is ASCII-only and (?U)\s is the Unicode White_Space property
# (which EXCLUDES \x1c-\x1f), so neither matches Python — an explicit
# class is the only faithful choice (SURVEY §7 item 5). The oracle SQL
# uses the same class in RE2 syntax (queries/_sql.py).
PY_WS_JAVA = (
    "\\t-\\r\\x1c-\\x1f \\x85\\xa0\\u1680\\u2000-\\u200a"
    "\\u2028\\u2029\\u202f\\u205f\\u3000"
)
_STRIP_RE = f"^[{PY_WS_JAVA}]+|[{PY_WS_JAVA}]+$"


def normalize_string(col: Column | str) -> Column:
    """null→"", cast to string, strip *all* leading/trailing whitespace,
    lowercase.

    Mirrors ``etl/core/utils.py:10-16`` (``fillna("") .astype(str)
    .str.strip() .str.lower()``). pandas ``str.strip`` removes every
    Python whitespace character while Spark ``trim`` removes only spaces
    and ``\\s`` only ASCII — the explicit :data:`PY_WS_JAVA` class gives
    exact parity (property-tested against ``str.strip`` in
    tests/test_properties.py).
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.coalesce(c.cast("string"), F.lit(""))
    return F.lower(F.regexp_replace(s, _STRIP_RE, ""))


def normalize_strings(df: DataFrame, cols: list[str]) -> DataFrame:
    """Apply :func:`normalize_string` to each named column (skip absent
    ones — the reference guards on presence, e.g. ``main.py:84-92``)."""
    present = [c for c in cols if c in df.columns]
    return df.withColumns({c: normalize_string(c) for c in present})


_HEADER_RE = re.compile(r"\s+")


def normalize_headers(df: DataFrame) -> DataFrame:
    """Lowercase, strip, and ``\\s+``→``_`` on column *names*.

    Mirrors ``etl/fact_loaders/load_parking.py:57-63`` (fiscal-year
    datasets ship ``Issue Date``-style headers).
    """
    return df.toDF(*[_HEADER_RE.sub("_", c.strip().lower()) for c in df.columns])


def numeric_coerce(col: Column | str, target: str = "long") -> Column:
    """String → number, unparsable → NULL, like ``pd.to_numeric(...,
    errors="coerce").astype("Int64")`` (``main.py:93-96``).

    Route through double first so ``"12.0"`` → 12 like pandas, then cast
    to the target integral type. With ANSI off both casts yield NULL on
    failure (and ``try_cast`` guards if ANSI is ever re-enabled).
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string").try_cast("double").cast(target)


def bool_map(col: Column | str, true_val: str = "Yes", false_val: str = "No") -> Column:
    """{"Yes": True, "No": False}, anything else NULL
    (``etl/dim_loaders/vehicle_loader.py:29``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == true_val, F.lit(True)).when(c == false_val, F.lit(False))


def ensure_columns(df: DataFrame, cols: dict[str, str]) -> DataFrame:
    """Add each missing column as a typed NULL.

    The reference re-adds columns Socrata silently dropped (all-null
    columns vanish from the JSON): ``violation_loader.py:12-13``,
    ``main.py:114-116``. ``cols`` maps name → Spark type string.
    """
    missing = {
        name: F.lit(None).cast(t) for name, t in cols.items() if name not in df.columns
    }
    return df.withColumns(missing) if missing else df


def project_target(df: DataFrame, target_cols: list[str]) -> DataFrame:
    """Project to target ∩ present, preserving target order
    (``load_311.py:109-110``, ``main.py:145,178-180``)."""
    return df.select(*[c for c in target_cols if c in df.columns])
