"""Hash-key parity: the Spark expression, the DuckDB oracle SQL, and the
reference's pure-Python formula must agree bit-for-bit (SURVEY §7 item 1).
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from nyc_opendata_etl_spark.functions.hashing import (
    MOD,
    md5_long,
    md5_long_oracle_sql,
    surrogate_key,
    surrogate_key_oracle_sql,
)


def ref_hash(*values) -> int:
    """The reference's utils.py:5-8 formula (str() of each value)."""
    s = "|".join(str(v) for v in values)
    return int(hashlib.md5(s.encode()).hexdigest(), 16) % MOD


CASES = ["hello", "", "a|b", "  padded  ", "ünïcode", "nan", "0", "x" * 500]


def test_md5_long_matches_python(spark):
    df = spark.createDataFrame([(c,) for c in CASES], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", md5_long("s").alias("h")).collect()}
    for c in CASES:
        exp = int(hashlib.md5(c.encode()).hexdigest(), 16) % MOD
        assert got[c] == exp, c


def test_md5_long_oracle_matches_python():
    con = duckdb.connect()
    for c in CASES:
        if "|" in c:
            continue
        sql = md5_long_oracle_sql(f"'{c}'")
        assert con.execute(f"SELECT {sql}").fetchone()[0] == (
            int(hashlib.md5(c.encode()).hexdigest(), 16) % MOD
        ), c


def test_surrogate_key_multi_column_and_nulls(spark):
    rows = [("Brooklyn", 11201), ("queens", None), (None, None), ("", 0)]
    df = spark.createDataFrame(rows, ["boro", "zip"])
    got = [
        r["k"]
        for r in df.select(surrogate_key("boro", "zip").alias("k")).collect()
    ]
    # pandas str() renders None/NaN as "nan" in the reference's join keys;
    # surrogate_key uses null_token="nan"
    exp = [
        ref_hash("Brooklyn", 11201),
        ref_hash("queens", "nan"),
        ref_hash("nan", "nan"),
        ref_hash("", 0),
    ]
    assert got == exp


def test_surrogate_key_oracle_sql_agrees(spark):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES ('Brooklyn', 11201),"
        " ('queens', NULL), (NULL, NULL), ('', 0)) v(boro, zip)"
    )
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT {surrogate_key_oracle_sql('boro', 'zip')} FROM t"
        ).fetchall()
    ]
    df = spark.createDataFrame(
        [("Brooklyn", 11201), ("queens", None), (None, None), ("", 0)],
        ["boro", "zip"],
    )
    got = [
        r["k"] for r in df.select(surrogate_key("boro", "zip").alias("k")).collect()
    ]
    assert got == duck


@pytest.mark.parametrize("value", [0, 1, -5, 123456789, 2**31])
def test_surrogate_key_int_rendering(spark, value):
    """int columns stringify identically in Spark ('5') and python str()."""
    df = spark.createDataFrame([(value,)], ["v"])
    got = df.select(surrogate_key("v").alias("k")).collect()[0]["k"]
    assert got == ref_hash(value)
