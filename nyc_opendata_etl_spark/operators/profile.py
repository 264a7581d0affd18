"""Column profiling and cross-snapshot drift detection.

``profile`` computes per-column health stats (rows/nulls/distinct/
min/max) in ONE scan regardless of column count: a single multi-agg
(Spark rewrites the multi-column count-distinct into grouping-set
Expand form) followed by a struct-array explode into long format —
never one scan per column. ``profile_drift`` joins two profiles (old
snapshot vs new drop) into the delta report a pipeline gates on before
trusting new data. The joined profiles are |cols|-row relations —
driver-trivial at any data scale; the data cost is the two scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile", "profile_drift"]


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-format per-column stats: (col, n_rows, n_nulls, n_distinct,
    min_val, max_val) — numeric columns only (min/max cast to double)."""
    agged = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            e
            for c in cols
            for e in (
                F.count(c).alias(f"cnt_{c}"),
                F.countDistinct(c).alias(f"nd_{c}"),
                F.min(F.col(c).cast("double")).alias(f"min_{c}"),
                F.max(F.col(c).cast("double")).alias(f"max_{c}"),
            )
        ],
    )
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col("n_rows").alias("n_rows"),
                (F.col("n_rows") - F.col(f"cnt_{c}")).alias("n_nulls"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.col(f"min_{c}").alias("min_val"),
                F.col(f"max_{c}").alias("max_val"),
            )
            for c in cols
        ]
    )
    return agged.select(F.explode(per_col).alias("p")).select("p.*")


def profile_drift(
    old: DataFrame, new: DataFrame, cols: list[str]
) -> DataFrame:
    """Drift report between two snapshots of the same schema: per
    column, both row/distinct counts, the null-rate delta, and the
    min/max range shifts (new minus old). Exact arithmetic on counts;
    rates rounded to 6 dp."""
    pa = profile(old, cols)
    pb = profile(new, cols)
    a = pa.select(*[F.col(c).alias(f"{c}_old") for c in pa.columns])
    b = pb.select(*[F.col(c).alias(f"{c}_new") for c in pb.columns])
    j = a.join(F.broadcast(b), a["col_old"] == b["col_new"])
    return j.select(
        F.col("col_old").alias("col"),
        F.col("n_rows_old"),
        F.col("n_rows_new"),
        F.col("n_distinct_old"),
        F.col("n_distinct_new"),
        F.round(
            F.col("n_nulls_new") / F.col("n_rows_new")
            - F.col("n_nulls_old") / F.col("n_rows_old"),
            6,
        ).alias("null_rate_delta"),
        F.round(F.col("min_val_new") - F.col("min_val_old"), 6).alias("min_shift"),
        F.round(F.col("max_val_new") - F.col("max_val_old"), 6).alias("max_shift"),
    )
