"""Date/time key derivation expressions (SURVEY §2 D2-D8).

The reference derives integer dimension keys from timestamps with
row-at-a-time ``strftime`` appliers; here each is a single native
expression (codegen, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from nyc_opendata_etl_spark.functions.normalize import PY_WS_JAVA


def date_key(col: Column | str) -> Column:
    """timestamp/date → int yyyyMMdd (``load_311.py:50-52``,
    ``load_parking.py:84``); NULL in → NULL out."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyyMMdd").cast("int")


def time_key(col: Column | str) -> Column:
    """timestamp → int HHMM00, minute grain with seconds zeroed
    (``load_311.py:53-55``, ``time_loader.py:17``)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.hour(c) * 10000 + F.minute(c) * 100).cast("int")


def fiscal_year(col: Column | str) -> Column:
    """NYC fiscal year: month < 7 → calendar year, else year+1
    (``load_parking.py:40-41``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.month(c) < 7, F.year(c)).otherwise(F.year(c) + 1)


def parse_ampm_time_key(col: Column | str) -> Column:
    """Parse ``"0853P"`` / ``"8:53A"`` style violation times → int HHMM00.

    Exact port of ``load_parking.py:87-113`` branch structure:
      * strip + uppercase; empty or last char ∉ {A, P} → NULL
        (note: the reference *rejects* ``"12:05PM"`` — trailing "M" is not
        a valid marker in its code, despite its docstring);
      * core = all but the marker; if no ":" and len(core) ∈ {3, 4},
        split as hours=core[:-2] (zero-filled to 2), mins=core[-2:];
      * parse ``core + ("AM"|"PM")`` as clock-hour ``h:mma``; failures →
        NULL (strict CORRECTED-policy parser ≙ pandas errors="coerce").

    Returns the HHMM00 int key directly (the reference immediately keys
    the parsed time at minute grain, ``load_parking.py:114-118``; Spark
    has no TimeType — SURVEY §1.2).
    """
    c = F.col(col) if isinstance(col, str) else col
    raw = F.upper(
        F.regexp_replace(
            c.cast("string"), f"^[{PY_WS_JAVA}]+|[{PY_WS_JAVA}]+$", ""
        )
    )
    marker = F.substring(raw, -1, 1)
    core = raw.substr(F.lit(1), F.length(raw) - 1)
    needs_colon = (~core.contains(":")) & F.length(core).isin(3, 4)
    hours = F.lpad(core.substr(F.lit(1), F.length(core) - 2), 2, "0")
    mins = F.substring(core, -2, 2)
    fixed_core = F.when(needs_colon, F.concat(hours, F.lit(":"), mins)).otherwise(core)
    ts_str = F.concat(fixed_core, marker, F.lit("M"))
    parsed = F.try_to_timestamp(ts_str, F.lit("h:mma"))
    return (
        F.when(raw.isNull() | (raw == "") | ~marker.isin("A", "P"), F.lit(None))
        .otherwise(time_key(parsed))
        .cast("int")
    )


# Kept name used elsewhere in the package
parse_ampm_time = parse_ampm_time_key
