"""Unit tests for the scalar expression library, targeting the semantic
traps in SURVEY §7 (pandas-strip vs trim, coerce semantics, AM/PM parser
edge cases, bool map).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_opendata_etl_spark.functions.datetime_fns import (
    date_key,
    fiscal_year,
    parse_ampm_time_key,
    time_key,
)
from nyc_opendata_etl_spark.functions.normalize import (
    bool_map,
    ensure_columns,
    normalize_string,
    normalize_headers,
    numeric_coerce,
    project_target,
)


def _one_col(spark, values, fn, dtype="string"):
    df = spark.createDataFrame([(v,) for v in values], schema=f"v {dtype}")
    return [r["out"] for r in df.select(fn(F.col("v")).alias("out")).collect()]


def test_normalize_string_matches_pandas_strip(spark):
    # pandas: fillna("") -> astype(str) -> str.strip() (all whitespace) -> lower
    vals = ["  HeLLo  ", "\tTAB\t", "\nnl\n", None, "", "MiXed Case", " \t\n x \n\t "]
    got = _one_col(spark, vals, normalize_string)
    assert got == ["hello", "tab", "nl", "", "", "mixed case", "x"]


def test_normalize_headers(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["Issue  Date", " Plate ID", "ok_col"])
    assert normalize_headers(df).columns == ["issue_date", "plate_id", "ok_col"]


def test_numeric_coerce(spark):
    vals = ["12", "12.0", " 7", "garbage", None, "", "3.9"]
    got = _one_col(spark, vals, lambda c: numeric_coerce(c, "long"))
    # pandas to_numeric coerce: '12'->12, '12.0'->12, ' 7'->7, else NULL;
    # 3.9 -> Int64 cast in pandas would error, but reference only coerces
    # integral strings; Spark truncates toward zero.
    assert got == [12, 12, 7, None, None, None, 3]


def test_bool_map(spark):
    vals = ["Yes", "No", "yes", "maybe", None, ""]
    got = _one_col(spark, vals, bool_map)
    assert got == [True, False, None, None, None, None]


def test_ensure_and_project(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "name"])
    out = ensure_columns(df, {"missing_str": "string", "id": "long"})
    assert out.columns == ["id", "name", "missing_str"]
    assert out.collect()[0]["missing_str"] is None
    # present column not clobbered
    assert out.collect()[0]["id"] == 1
    proj = project_target(out, ["name", "nope", "id"])
    assert proj.columns == ["name", "id"]


def test_date_time_fiscal_keys(spark):
    df = spark.createDataFrame(
        [("2024-07-01 08:53:21",), ("2024-06-30 23:59:59",), (None,)], ["s"]
    ).select(F.col("s").cast("timestamp").alias("ts"))
    rows = df.select(
        date_key("ts").alias("dk"),
        time_key("ts").alias("tk"),
        fiscal_year("ts").alias("fy"),
    ).collect()
    assert [r["dk"] for r in rows] == [20240701, 20240630, None]
    assert [r["tk"] for r in rows] == [85300, 235900, None]
    assert [r["fy"] for r in rows] == [2025, 2024, None]


def test_ampm_parser_edge_cases(spark):
    # exact branch behavior of load_parking.py:87-113
    cases = {
        "0853P": 205300,       # 4-digit core, PM
        "0853A": 85300,        # AM
        "8:53A": 85300,        # already has colon
        "853P": 205300,        # 3-digit core -> zfill
        "12:05A": 500,         # 12 AM -> 00:05
        "12:05P": 120500,      # 12 PM stays 12
        "12:05AM": None,       # trailing M -> rejected (marker not A/P)
        "1275P": None,         # minute 75 -> strict parse fails
        "13:00P": None,        # hour 13 invalid for 12-hour clock
        "garbage": None,
        "": None,
        None: None,
        "  0901a  ": 90100,    # strip + uppercase first
        "P": None,             # empty core
        "53P": None,           # 2-digit core -> '53PM' unparsable
    }
    vals = list(cases.keys())
    got = _one_col(spark, vals, parse_ampm_time_key)
    assert got == list(cases.values()), dict(zip(vals, got))
