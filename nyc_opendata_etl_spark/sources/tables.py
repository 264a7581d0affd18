"""Benchmark-table registry over the driver-provided parquet directories.

``load_table(spark, sf_dir, name)`` is the engine's scan operator for the
test/bench harness (SURVEY §2 S1-S5 map to parquet scans here; the live
Socrata DSv2 connector lives in ``sources/socrata.py``).

Scale notes: a plain ``spark.read.parquet`` keeps the full Catalyst
goodness — vectorized columnar reads, predicate pushdown, column pruning,
partition pruning when the layout is partitioned. At 100 TB the same call
reads a partitioned lake path; nothing here assumes single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition a narrow scan up to cluster parallelism.

    For CPU-heavy per-row operators (shingling, hashing, vector math) a
    small input that parquet splits into fewer partitions than cores
    serializes the whole pipeline. At real scale (100 TB) the scan
    already yields thousands of splits and this is a no-op — the
    repartition only fires when the source under-splits.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_table(
    spark: SparkSession, sf_dir: str, name: str, *, spread_input: bool = False
) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if spread_input:
        df = spread(df)
    # events.ts is parquet TIMESTAMP(NANOS), which Spark reads only as a
    # raw long (spark.sql.legacy.parquet.nanosAsLong, set in session.py).
    # Convert to a microsecond TimestampType — integer division keeps
    # full precision (ns values ~1.7e18 exceed double's 2^53 mantissa),
    # and truncation matches how DuckDB/Arrow narrow NANOS to micros.
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)
