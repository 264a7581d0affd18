"""Z-order layout: file-level min/max stats must bound EVERY clustered
column, not just a lead sort column.

Assertions are aggregate (mean per-file extent of each column) rather
than point counts for one predicate band: repartitionByRange samples its
boundaries, so individual file spans wobble run-to-run, but the layout
property — every file covers a small rectangle of the (x, y) domain —
is stable in aggregate.
"""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from nyc_opendata_etl_spark.operators.layout import write_zordered


def _file_extents(path: str, col: str):
    """Per-file (min, max) for col from parquet footer stats."""
    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        ci = names.index(col)
        fmin = min(md.row_group(rg).column(ci).statistics.min
                   for rg in range(md.num_row_groups))
        fmax = max(md.row_group(rg).column(ci).statistics.max
                   for rg in range(md.num_row_groups))
        out.append((fmin, fmax))
    return out


def _mean_extent(extents, domain):
    return sum(hi - lo for lo, hi in extents) / len(extents) / domain


def test_zorder_bounds_both_columns(spark, tmp_path):
    n, domain = 200_000, 20_000  # x, y ~ uniform on (-10000, 10000)
    df = spark.range(n).select(
        (F.hash(F.col("id")) % 10_000).alias("x"),
        (F.hash(F.col("id") + 1_000_000_007) % 10_000).alias("y"),
    )
    plain = str(tmp_path / "xsorted")
    zpath = str(tmp_path / "zordered")
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite").parquet(plain)
    )
    write_zordered(df, ["x", "y"], zpath, bits=10, num_files=16)

    # x-sorted layout: tight on x, but every file spans ~the full y domain
    assert _mean_extent(_file_extents(plain, "x"), domain) <= 0.15
    assert _mean_extent(_file_extents(plain, "y"), domain) >= 0.95

    # z-order: BOTH columns bounded well below the full domain per file
    # (16 files ≈ 2 interleaved prefix bits per dimension → quarter-to-
    # half spans; 0.7 leaves room for boundary-sampling wobble)
    ez_x = _mean_extent(_file_extents(zpath, "x"), domain)
    ez_y = _mean_extent(_file_extents(zpath, "y"), domain)
    assert ez_x <= 0.7, ez_x
    assert ez_y <= 0.7, ez_y


def test_zorder_rejects_strings(spark, tmp_path):
    df = spark.range(10).select(F.col("id"), F.lit("s").alias("s"))
    with pytest.raises(ValueError, match="non-orderable-numeric"):
        write_zordered(df, ["s"], str(tmp_path / "x"))


def test_zorder_roundtrip_content(spark, tmp_path):
    """Layout must never change table content."""
    df = spark.range(5_000).select(
        F.col("id"), (F.col("id") * 7 % 97).alias("a"), (F.col("id") % 13).alias("b")
    )
    p = str(tmp_path / "z")
    write_zordered(df, ["a", "b"], p, bits=6, num_files=4)
    back = spark.read.parquet(p)
    assert back.count() == 5_000
    assert back.agg(F.sum("id")).first()[0] == df.agg(F.sum("id")).first()[0]
