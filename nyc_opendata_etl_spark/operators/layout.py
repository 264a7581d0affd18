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

Two layers:

- :func:`zvalue` / :func:`zvalue_sql` — the raw interleave of columns
  that already fit the per-column bit budget (pure JVM expression tree
  inside whole-stage codegen; the SQL twin lets a DuckDB oracle replay
  z-values bit-for-bit).
- :func:`write_zordered` — the writer for arbitrary numeric/temporal
  domains: each column is first bucketized into ``2**bits`` equal-width
  bins between its observed min/max (one stats-only aggregate — no
  silent truncation of wide domains), the bucket ids are interleaved,
  and rows are range-partitioned + sorted on the z-key.

Shape at scale: one map-reduce stats aggregate, then exactly one range
exchange. ``repartitionByRange`` assigns splits by *sampled quantiles
of the z-key*, so output files stay balanced even when the equal-width
bucketing is skewed; the within-partition sort spills. Nothing ever
collects to the driver but the 2·k stat row.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zvalue", "zvalue_sql", "write_zordered"]

_NUMERIC_KINDS = (
    "integer", "long", "short", "byte", "float", "double", "decimal",
    "date", "timestamp", "timestamp_ntz",
)


def zvalue(cols: list[Column], bits: int = 11) -> Column:
    """Morton code interleaving the low ``bits`` bits of each column
    (non-negative integers; values MUST fit in ``bits`` bits — higher
    bits are silently masked, aliasing distinct values onto one z-value.
    Scale/bucket wider domains first, or use :func:`write_zordered`
    which bucketizes for you). With ``d`` columns, bit ``i`` of column
    ``k`` lands at output bit ``i*d + k``."""
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
    bits: int = 11,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the z-order curve of ``cols``.

    Each column is bucketized into ``2**bits`` equal-width bins between
    its observed min/max (one stats-only aggregate), the bucket ids are
    bit-interleaved into a single z-key, and rows are range-partitioned
    + sorted by that key into ``num_files`` splits. Parquet footer
    min/max stats per file then bound EVERY z-ordered column to a narrow
    range, so a point/range predicate on any of them skips most files.
    The z column itself is dropped — the layout, not the data, carries
    the clustering.

    Numeric/date/timestamp columns only: z-ordering needs a
    total-order → fixed-width-integer embedding, which free-form strings
    don't have (hashing one would keep point-lookup locality but destroy
    range pruning — if that's the need, cluster on a hash column
    explicitly).
    """
    for c in cols:
        kind = df.schema[c].dataType.typeName()
        if kind not in _NUMERIC_KINDS:
            raise ValueError(
                f"z-order column {c!r} has non-orderable-numeric type {kind}"
            )
    n_buckets = 1 << bits
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in cols],
    ).first()

    bucket_ids = []
    for c in cols:
        lo, hi = stats[f"lo_{c}"], stats[f"hi_{c}"]
        if lo is None or hi is None or lo == hi:
            bucket_ids.append(F.lit(0).cast("long"))
            continue
        # width_bucket: 1..n inside [lo, hi], 0/n+1 outside → clamp to 0..n-1
        b = F.width_bucket(F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit(n_buckets))
        bucket_ids.append(
            F.greatest(F.least(b - 1, F.lit(n_buckets - 1)), F.lit(0)).cast("long")
        )

    zkey = zvalue(bucket_ids, bits)
    (
        df.withColumn("__zkey__", zkey)
        .repartitionByRange(num_files, "__zkey__")
        .sortWithinPartitions("__zkey__")
        .drop("__zkey__")
        .write.mode(mode)
        .parquet(path)
    )
