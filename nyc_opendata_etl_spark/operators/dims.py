"""Dimension builders (SURVEY §2 A1/A2 + H1 + N1, O2 protocol; S6/S7).

The reference's ``BaseDimLoader`` protocol (``etl/core/dim_loader.py:8-21``)
is extract (project + distinct) → transform (normalize + hash key) → load.
Here a dimension build is one declarative expression:

    distinct natural-key projection  →  hash aggregate (map-side partial
    combine, then one shuffle on the natural key — the minimum possible)
    →  surrogate key as a codegen expression (no second pass, no UDF).

At 100 TB the distinct is the only shuffle and its output is tiny (dims
are low-cardinality); Catalyst prunes the scan to exactly the natural-key
columns.
"""

from __future__ import annotations

import datetime as dt
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_opendata_etl_spark.functions.hashing import surrogate_key
from nyc_opendata_etl_spark.functions.normalize import normalize_strings


def build_dim(
    df: DataFrame,
    natural_key: list[str],
    key_name: str,
    normalize_cols: list[str] | None = None,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Generic dimension build: normalize → project → distinct → hash key.

    Mirrors e.g. ``etl/dim_loaders/agency_loader.py:10-17`` (project two
    cols, drop_duplicates, row-apply hash_key) but the hash is a native
    expression and the distinct is a hash aggregate.
    """
    cols = list(natural_key) + [c for c in (extra_cols or []) if c not in natural_key]
    out = normalize_strings(df, normalize_cols if normalize_cols is not None else cols)
    out = out.select(*cols).distinct()
    return out.select(surrogate_key(*natural_key).alias(key_name), *cols)


def build_dim_first_per_group(
    df: DataFrame,
    subset_key: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Subset-dedup keeping ONE deterministic row per key.

    The reference's ``drop_duplicates(subset=["violation_code"])``
    (``etl/dim_loaders/violation_loader.py:17``) keeps the *first seen*
    row — order-dependent and nondeterministic across engines (SURVEY §7
    item 3). We define the deterministic tie-break MIN over the value
    columns, expressible identically in the oracle.
    """
    aggs = [F.min(c).alias(c) for c in value_cols]
    return df.groupBy(*subset_key).agg(*aggs)


def date_dim(
    spark: SparkSession,
    start: dt.date = dt.date(2010, 1, 1),
    end: dt.date = dt.date(2026, 12, 31),
) -> DataFrame:
    """Generated calendar dimension (``etl/dim_loaders/date_loader.py:10-20``).

    One row per day in [start, end]: date_key int yyyyMMdd, full_date,
    day, month, year, weekday name. Built with ``sequence`` + ``explode``
    — a generated source, no input scan.
    """
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit(start).cast("date"),
                    F.lit(end).cast("date"),
                    F.expr("interval 1 day"),
                )
            ).alias("full_date")
        )
        .select(
            F.date_format("full_date", "yyyyMMdd").cast("int").alias("date_key"),
            F.col("full_date"),
            F.dayofmonth("full_date").alias("day"),
            F.month("full_date").alias("month"),
            F.year("full_date").alias("year"),
            F.date_format("full_date", "EEEE").alias("weekday"),
        )
    )


def time_dim(spark: SparkSession) -> DataFrame:
    """Generated minute-grain time dimension, 1440 rows
    (``etl/dim_loaders/time_loader.py:8-21``): time_key HHMM00 + hour +
    minute."""
    return spark.range(0, 1440).select(
        ((F.col("id") / 60).cast("int") * 10000 + (F.col("id") % 60) * 100)
        .cast("int")
        .alias("time_key"),
        (F.col("id") / 60).cast("int").alias("hour"),
        (F.col("id") % 60).cast("int").alias("minute"),
    )


def infer_dim_members(
    dim: DataFrame,
    facts: DataFrame,
    nat_keys: list[str],
    key_col: str,
    placeholder: str = "UNKNOWN",
) -> DataFrame:
    """Late-arriving dimension handling: facts can reference natural
    keys the dimension hasn't loaded yet; dropping them loses fact rows
    and stamping nulls breaks FK joins. The warehouse answer is
    INFERRED MEMBERS — placeholder dim rows for every fact key missing
    from the dimension, carrying the same content-hash surrogate the
    real load will produce (so the eventual SCD1 overwrite updates
    attributes in place without re-keying any fact).

    String attributes get ``placeholder``, all others NULL, and every
    row carries ``is_inferred`` so reports can expose or filter the
    stubs. Shape: one distinct on the fact keys (map-side combined),
    one broadcast-able anti join against the dim, one union — the fact
    table is scanned once and never shuffled wider than its key
    column."""
    # NULL-keyed fact rows are excluded: an inferred member with a NULL
    # natural key would carry surrogate_key(NULL) — a stub no real
    # dimension load ever overwrites, and the NULL-keyed facts still
    # would not equi-join to it. NULL keys are a data-quality signal
    # (audit_constraints territory), not a late-arriving member.
    key_present = [F.col(k).isNotNull() for k in nat_keys]
    missing = (
        facts.filter(reduce(lambda a, b: a & b, key_present))
        .select(*nat_keys)
        .distinct()
        .join(dim, nat_keys, "left_anti")
    )
    types = dict(dim.dtypes)
    attrs = [c for c in dim.columns if c not in set(nat_keys) | {key_col}]
    inferred = missing.select(
        *nat_keys,
        surrogate_key(*nat_keys).alias(key_col),
        *[
            (
                F.lit(placeholder) if types[a] == "string" else F.lit(None)
            ).cast(types[a]).alias(a)
            for a in attrs
        ],
        F.lit(True).alias("is_inferred"),
    )
    return dim.withColumn("is_inferred", F.lit(False)).unionByName(
        inferred.select(*dim.columns, "is_inferred")
    )
