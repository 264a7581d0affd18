"""Bucketed (pre-shuffled) tables for co-located, exchange-free joins.

At 100 TB the dominant join cost is the shuffle. Writing both sides of
a recurring join bucketed by the join key (``bucketBy(n, key)`` +
``saveAsTable``) persists the hash partitioning in the table layout, so
every later equi-join on that key plans WITHOUT a shuffle exchange on
either side — the classic "pay the shuffle once at write time"
amortization for fact-to-fact joins too big to broadcast.

Verified by tests/test_bucketing.py: the bucketed join plan has zero
shuffle exchanges, the unbucketed equivalent has two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a managed bucketed table. ``sort_by`` addition-
    ally sorts within buckets (enables exchange-AND-sort-free merge
    joins)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_by is not None:
        writer = writer.sortBy(sort_by)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
