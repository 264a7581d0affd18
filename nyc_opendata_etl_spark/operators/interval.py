"""Large×large interval joins via bucket expansion.

A point-in-interval (or overlap) join has no equality key, so Spark's
only direct plans are broadcast-nested-loop (fine when one side is tiny
— see the ``join_range`` query) or a cartesian shuffle (non-starter when
both sides are large). The scale-correct shape maps both sides onto a
shared integer bucket grid: each interval EXPLODES to the buckets it
covers, each point maps to exactly one bucket, and the join becomes an
ordinary hash equi-join on the bucket id with the exact predicate
re-checked after — the same strategy behind Databricks' range-join
optimization and bioinformatics interval libraries.

Cost model: expansion factor = interval_length / bucket_size + 1 rows
per interval, and a point matches each interval through exactly one
bucket (its own), so no dedup pass is needed for point joins. Pick
``bucket_size`` near the typical interval length: too small explodes the
interval side, too large degrades each bucket to a mini cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bucketed_point_in_interval_join"]


def bucketed_point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_size: int,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point < end`` (half-open), all columns from both sides.

    ``point_col``/``start_col``/``end_col`` must be integral (cast
    dates/timestamps to day/epoch numbers first). One shuffle per side
    on the bucket id; never a nested loop.
    """
    b = F.lit(int(bucket_size))
    ib = intervals.withColumn(
        "__bucket__",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / b),
                # end is exclusive: the last covered bucket is (end-1)/b
                F.floor((F.col(end_col) - 1) / b),
            )
        ),
    )
    pb = points.withColumn("__bucket__", F.floor(F.col(point_col) / b))
    return (
        pb.join(ib, "__bucket__")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("__bucket__")
    )
