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


def _parse_bytes(v: str) -> int:
    """Parse a Spark size conf value ("134217728", "134217728b", "128m")."""
    s = v.strip().lower()
    mult = 1
    for suffix, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                      ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("b", 1)):
        if s.endswith(suffix):
            s, mult = s[: -len(suffix)], m
            break
    return int(s) * mult


def _estimate_splits(spark: SparkSession, path: str) -> int:
    """Estimate how many input splits a parquet path will yield.

    Pure filesystem metadata (``os.stat``), so query *construction* stays
    lazy — no RDD materialization just to count partitions. Mirrors
    Spark's own file-split math (total bytes / maxPartitionBytes, ignoring
    openCost, which only under-estimates — the safe direction here).
    """
    try:
        max_bytes = _parse_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
        )
    except Exception:
        max_bytes = 128 << 20
    total = 0
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if not f.startswith(("_", "."))
            )
    elif os.path.exists(path):
        total = os.path.getsize(path)
    return max(1, -(-total // max_bytes))


def spread(df: DataFrame, *, est_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a narrow scan up to cluster parallelism.

    For CPU-heavy per-row operators (shingling, hashing, vector math) a
    small input that parquet splits into fewer partitions than cores
    serializes the whole pipeline. At real scale (100 TB) the scan
    already yields thousands of splits and this is a no-op — the
    repartition only fires when the source under-splits.

    ``est_partitions`` lets the caller supply a metadata-only estimate
    (file sizes); without it we fall back to ``df.rdd.getNumPartitions()``,
    which materializes the read plan and should be avoided on hot paths.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    n = est_partitions if est_partitions is not None else df.rdd.getNumPartitions()
    if n < target:
        return df.repartition(target)
    return df


# events.ts is written as parquet TIMESTAMP(NANOS,false), which Spark 4
# refuses to read unless this legacy conf maps it to a raw long. It is a
# runtime SQL conf, so setting it here makes the read work under ANY
# session — including a vanilla ``SparkSession.builder.getOrCreate()``
# like the correctness driver's — not just our own session.py factory.
_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def load_table(
    spark: SparkSession, sf_dir: str, name: str, *, spread_input: bool = False
) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        try:
            spark.conf.set(_NANOS_CONF, "true")
        except Exception:
            pass  # conf removed in a future Spark → rely on native NANOS read
    df = spark.read.parquet(path)
    if spread_input:
        df = spread(df, est_partitions=_estimate_splits(spark, path))
    # With nanosAsLong the ts column arrives as a raw long of nanoseconds.
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
