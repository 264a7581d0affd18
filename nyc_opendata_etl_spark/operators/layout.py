"""Multi-dimensional clustered (Z-order) table layout for data skipping.

A single-column sort gives parquet files tight min/max footer stats on
ONE column; range predicates on any other column prune nothing. Writing
in Morton (Z-order) of several columns gives every file a small
bounding BOX over all of them, so 2-D (and higher) range scans skip
most files — the layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER
BY``, here as plain Spark: a bit-interleave expression + range
repartition + sorted write. At 100 TB the write costs one range
shuffle; every selective read after it prunes at the file/row-group
level before a single byte of data is fetched (the scan's
PushedFilters meet footer stats — no compute at all for pruned files).

The interleave is a pure JVM expression tree (shifts/masks/ORs inside
whole-stage codegen, no UDF), and deterministic — so a DuckDB oracle
can replay z-values bit-for-bit (``zvalue_sql`` emits the same formula
in portable SQL).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zvalue", "zvalue_sql", "write_zordered"]


def zvalue(cols: list[Column], bits: int = 11) -> Column:
    """Morton code interleaving the low ``bits`` bits of each column
    (non-negative integers; values must fit in ``bits`` bits — the
    caller scales/buckets wider domains first). With ``d`` columns, bit
    ``i`` of column ``k`` lands at output bit ``i*d + k``."""
    d = len(cols)
    parts = [
        F.shiftleft(F.shiftright(c.cast("long"), i).bitwiseAND(1), i * d + k)
        for k, c in enumerate(cols)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zvalue_sql(cols: list[str], bits: int = 11) -> str:
    """The exact same Morton code as :func:`zvalue`, as a portable SQL
    expression string (DuckDB and Spark SQL both accept it)."""
    d = len(cols)
    parts = [
        f"((({c} >> {i}) & 1) << {i * d + k})"
        for k, c in enumerate(cols)
        for i in range(bits)
    ]
    return " | ".join(parts)


def write_zordered(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 8,
    bits: int = 11,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``:
    range-repartition on the z-value (contiguous z-ranges per file, AQE
    handles skew via sampled range bounds) then sort within partitions
    so row groups inside each file are tight too. The z column itself
    is dropped — the layout, not the data, carries the clustering."""
    z = zvalue([F.col(c) for c in cols], bits).alias("__z__")
    (
        df.withColumn("__z__", z)
        .repartitionByRange(n_files, "__z__")
        .sortWithinPartitions("__z__")
        .drop("__z__")
        .write.mode("overwrite")
        .parquet(path)
    )
