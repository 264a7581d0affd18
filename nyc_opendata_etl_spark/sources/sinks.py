"""Warehouse sinks (SURVEY §2 K1-K4).

The reference appends every table to BigQuery (``dim_loader.py:23-30``,
``load_311.py:113-126``, ``load_parking.py:142-153``,
``load_integrated_fact.py:6-24``). Here the sink is an interface with
two implementations:

* :func:`append_parquet` — the test/bench path and the generic lake
  path: append-mode parquet, optionally hive-partitioned. Partitioning
  the parking fact by ``fiscal_year`` turns the reference's manual
  per-FY dataset map into real partition pruning (Catalyst prunes
  ``WHERE fiscal_year = X`` scans to one directory).
* :func:`append_bigquery` — the production path, delegating to the
  spark-bigquery connector when its jar is on the classpath (not in
  this container; guarded, like every network dependency in this repo).

Both keep the reference's empty-input no-op guard (``dim_loader.py:24-26``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def append_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> int:
    """Append to a parquet table; returns -1 when data was written and
    0 on the empty-input no-op (rows are NOT counted — counting would
    cost a second job; callers needing counts should count upstream)."""
    if df.isEmpty():
        return 0
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return -1  # rows not counted — avoid a second job; callers may count


def append_bigquery(df: DataFrame, table_id: str) -> None:
    """``project.dataset.table`` append via the spark-bigquery connector
    (WRITE_APPEND disposition like the reference's load jobs)."""
    if df.isEmpty():
        return
    try:
        (
            df.write.format("bigquery")
            .mode("append")
            .option("table", table_id)
            .option("writeMethod", "direct")
            .save()
        )
    except Exception as exc:  # pragma: no cover - connector not installed here
        raise NotImplementedError(
            "spark-bigquery connector jar not available in this environment; "
            "use append_parquet for the lake path"
        ) from exc


def append_bigquery_table(df: DataFrame, settings, logical_table: str) -> None:
    """Settings-driven append: logical table key → configured
    ``project.dataset.table`` id, exactly like the reference's loaders
    composing ``table_id`` from config (``dim_loader.py:15-21``,
    ``load_311.py:113-126``)."""
    append_bigquery(df, settings.bq_table_id(logical_table))


def write_warehouse(
    tables: dict[str, DataFrame], base_path: str, partition_overrides: dict[str, list[str]] | None = None
) -> None:
    """Write every star-schema output under ``base_path/<table>/``."""
    overrides = partition_overrides or {}
    for name, df in tables.items():
        append_parquet(df, f"{base_path}/{name}", overrides.get(name))


def append_parquet_sized(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    target_file_bytes: int = 128 << 20,
) -> int:
    """:func:`append_parquet` with write-time small-file prevention: an
    AQE REBALANCE hint makes the final stage re-split its output to
    ~``target_file_bytes`` partitions — merging trickles AND splitting
    skewed partitions — so one file lands per ~target regardless of the
    upstream partitioning. This is the write-time complement to the
    after-the-fact ``operators/backfill.compact_partitions``; at 100 TB
    sinks that skip it bury the table in per-task files and every later
    scan pays the open-cost tax.

    When ``partition_by`` is given the rebalance keys on those columns,
    so each hive partition's rows co-locate before the write (one file
    per partition value per ~target, not one per task per value).

    Returns the number of rows written, measured by an ``Observation``
    riding the write job itself — no extra count pass, no upstream
    re-execution (an empty input returns 0 after a trivially empty
    write).
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", None)
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", str(target_file_bytes)
    )
    obs = Observation()
    try:
        balanced = df.observe(obs, F.count(F.lit(1)).alias("n_rows")).hint(
            "rebalance", *(partition_by or [])
        )
        writer = balanced.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        else:
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", prev
            )
    return int(obs.get["n_rows"])


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str,
) -> None:
    """Write as a BUCKETED (hash-clustered) parquet table: rows are
    hash-partitioned on ``bucket_cols`` into exactly ``n_buckets``
    files per write, sorted within each bucket, and registered in the
    session catalog (external table at ``path``).

    Bucketing is the write-time answer to the single most expensive
    operation at 100 TB — the repeated shuffle of a big fact table on
    the same join/aggregation key. Two tables bucketed on the same key
    with the same bucket count join with NO Exchange on either side
    (pinned in tests/test_plans.py): the shuffle was paid once at write
    time and amortizes over every subsequent join, aggregation, or
    window on that key. The empty-input guard mirrors the other sinks."""
    if df.isEmpty():
        return
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table_name)
    )
