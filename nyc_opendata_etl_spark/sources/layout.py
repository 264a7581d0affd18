"""Data-layout maintenance: multi-dimensional (z-order) clustering for
parquet sinks.

Sorting a table by one column gives perfect file-level min/max pruning
on that column and none on any other. Interleaving the bits of several
columns' bucket ids (a Morton / z-order curve) trades a little pruning
power on each column for *simultaneous* locality on all of them — the
same layout optimization Delta Lake's ``OPTIMIZE ZORDER BY`` and
Iceberg's sort orders perform, expressed here with plain DataFrame
expressions and a range repartition.

Shape at scale: one ``agg`` action for per-column min/max (a map-reduce
over stats, no shuffle of data rows), then exactly one range exchange on
the z-key. ``repartitionByRange`` assigns file splits by *sampled
quantiles of the z-key*, so output files stay balanced even when the
equal-width bucketing is skewed; the within-partition sort is Spark-side
and spills. Nothing ever collects to the driver but the 2·k stat row.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "write_zordered"]

_NUMERIC_KINDS = (
    "integer", "long", "short", "byte", "float", "double", "decimal",
    "date", "timestamp", "timestamp_ntz",
)


def zorder_key(bucket_ids: list[Column], bits: int) -> Column:
    """Interleave ``bits`` low bits of each bucket-id column into one
    Morton key: output bit ``i·k + j`` is bit ``i`` of column ``j``.
    Pure codegen expression (shift/and/or), no UDF."""
    k = len(bucket_ids)
    parts = [
        F.shiftleft(
            F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j
        )
        for i in range(bits)
        for j, c in enumerate(bucket_ids)
    ]
    return reduce(Column.bitwiseOR, parts)


def write_zordered(
    df: DataFrame,
    cols: list[str],
    path: str,
    bits: int = 12,
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the z-order curve of ``cols``.

    Each column is bucketized into ``2**bits`` equal-width bins between
    its observed min/max (one stats-only aggregate), the bucket ids are
    bit-interleaved into a single z-key, and rows are range-partitioned
    + sorted by that key into ``num_files`` splits. Parquet footer
    min/max stats per file then bound EVERY z-ordered column to a narrow
    range, so a point/range predicate on any of them skips most files.

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

    zkey = zorder_key(bucket_ids, bits)
    (
        df.withColumn("__zkey__", zkey)
        .repartitionByRange(num_files, "__zkey__")
        .sortWithinPartitions("__zkey__")
        .drop("__zkey__")
        .write.mode(mode)
        .parquet(path)
    )
