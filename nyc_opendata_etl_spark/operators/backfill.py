"""Windowed incremental loads and the monthly backfill driver.

The reference's unit of work is a ``[start, end)`` batch window, with a
history backfill that shells out one subprocess per month from 2013-07
(``load_history.py:4-17``). Spark-native equivalents:

* :func:`month_windows` — the same month iteration, as data.
* :func:`run_month_by_month` — the literal driver loop (one batch job
  per window; embarrassingly parallel across months except for shared
  dim appends, SURVEY §3 E2).
* :func:`backfill_partitioned` — the better-than-literal form: process
  the whole range in ONE job, partition the sink by month, and rely on
  dynamic partition overwrite so re-running any window replaces exactly
  that window's partitions — idempotent backfills without truncate/
  reload, and no per-month job overhead. At 100 TB this is the shape
  you want: partition pruning on read, per-partition overwrite on
  write, month-level parallelism inside one DAG.
"""

from __future__ import annotations

import datetime
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def month_windows(
    start: datetime.date, end: datetime.date
) -> Iterator[tuple[datetime.date, datetime.date]]:
    """[month_start, next_month_start) windows covering [start, end),
    mirroring the reference's rollover arithmetic (load_history.py:9-13)."""
    cur = start.replace(day=1)
    while cur < end:
        nxt = (
            cur.replace(year=cur.year + 1, month=1)
            if cur.month == 12
            else cur.replace(month=cur.month + 1)
        )
        yield cur, min(nxt, end)
        cur = nxt


def run_month_by_month(
    job: Callable[[datetime.date, datetime.date], None],
    start: datetime.date,
    end: datetime.date,
) -> int:
    """The reference's driver loop, minus the subprocesses: run ``job``
    once per month window; returns windows run."""
    n = 0
    for w_start, w_end in month_windows(start, end):
        job(w_start, w_end)
        n += 1
    return n


def backfill_partitioned(
    df: DataFrame,
    ts_col: str,
    sink_path: str,
    start: datetime.date | None = None,
    end: datetime.date | None = None,
    partition_col: str = "month",
) -> None:
    """One-job backfill into a month-partitioned parquet sink.

    Dynamic partition overwrite is pinned at the WRITER level (not
    session conf), so overwrite replaces ONLY the months present in the
    input window on any session — re-running a window is idempotent and
    touches nothing else.
    """
    out = df
    if start is not None:
        out = out.filter(F.col(ts_col) >= F.lit(str(start)).cast("timestamp"))
    if end is not None:
        out = out.filter(F.col(ts_col) < F.lit(str(end)).cast("timestamp"))
    out = out.withColumn(partition_col, F.date_format(ts_col, "yyyy-MM"))
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(sink_path)
    )


def compact_partitions(
    spark, sink_path: str, partition_col: str = "month"
) -> int:
    """Compact a partitioned parquet sink: rewrite each partition's
    many small files (the residue of incremental micro-batch appends)
    into one file per partition.

    Small files are the classic lake-maintenance problem — at 100 TB a
    month of 5-minute micro-batches leaves ~8k files/partition and scan
    planning degrades. One shuffle clustered by the partition column
    re-writes each partition from a single task.

    Crash tolerance: the compacted copy is written to a temp sibling
    path first, so a failure during the (expensive) rewrite leaves the
    original sink untouched. The final two-rename swap is NOT atomic —
    a crash between them leaves the sink path absent with the original
    preserved under ``<sink>__compact_old`` (recovery: rename it back).
    The swap uses local-FS ``os.rename``, so this helper requires a
    local path and rejects remote URIs up front (on HDFS/object stores
    the same protocol must go through the Hadoop FileSystem API
    instead). Returns the row count (sanity handle for the caller).
    """
    import os
    import re
    import shutil

    if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", sink_path) and not sink_path.startswith(
        "file://"
    ):
        raise ValueError(
            f"compact_partitions swaps via local-FS rename; got remote URI {sink_path!r}"
        )

    from pyspark.sql import functions as F

    df = spark.read.parquet(sink_path)
    n = df.count()
    tmp = sink_path.rstrip("/") + "__compact_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        df.repartition(F.col(partition_col))
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(tmp)
    )
    old = sink_path.rstrip("/") + "__compact_old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(sink_path, old)
    os.rename(tmp, sink_path)
    shutil.rmtree(old)
    return n
