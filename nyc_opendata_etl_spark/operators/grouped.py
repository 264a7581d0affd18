"""Grouped per-key computations that relational windows genuinely
cannot express, run as vectorized Pandas kernels.

Everything window-expressible (ranks, lags, moving sums) stays native —
see queries/relational.py. The Python path is reserved for true
recurrences, and is shaped as key-partitioned ``mapInPandas`` (one
kernel call per *partition*, vectorized across its groups) rather than
per-group ``applyInPandas`` dispatch — with many small groups the
per-group Python/pandas call overhead dominates the actual fold by
orders of magnitude. At scale the shuffle is one hash partitioning by
key (same exchange a groupBy costs) and the sort is Spark-side, so it
spills instead of OOMing the Python worker.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame


def ewma_last_per_key(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Final exponentially-weighted moving average per key.

    EWMA is a recurrence (state_t = α·x_t + (1-α)·state_{t-1}) — not
    expressible with SQL window frames, so it runs as a vectorized
    Python kernel. Shape: ONE hash shuffle on the key (same exchange a
    groupBy would cost), a Spark-side (spillable) sort within
    partitions, then a single ``mapInPandas`` pass per partition whose
    pandas *grouped* ``ewm(adjust=False)`` kernel evaluates every
    group's fold in one Cython sweep — no per-group Python dispatch,
    which dominates wall time when keys are many and groups small.

    ``ewm(adjust=False)`` computes ``(1-α)·state + α·x`` per step with
    ``state₀ = x₀`` — the identical IEEE operation sequence as an
    explicit left fold, so the DuckDB oracle's ``list_reduce`` over the
    identically-ordered series matches bit-for-bit (pinned by
    tests/test_operators.py and the driver's differential gate)."""
    key_type = df.schema[key_col].dataType.simpleString()

    def kernel(batches) -> "pd.DataFrame":
        frames = list(batches)
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        if pdf.empty:
            return
        ew = (
            pdf.groupby(key_col, sort=False)[value_col]
            .ewm(alpha=alpha, adjust=False)
            .mean()
            .droplevel(0)
            .sort_index()
        )
        last_of_group = (pdf[key_col] != pdf[key_col].shift(-1)).values
        yield pd.DataFrame(
            {
                key_col: pdf.loc[last_of_group, key_col].values,
                "ewma": ew[last_of_group].values,
            }
        )

    out_schema = f"{key_col} {key_type}, ewma double"
    return (
        df.select(key_col, order_col, value_col)
        .repartition(key_col)
        .sortWithinPartitions(key_col, order_col, value_col)
        .mapInPandas(kernel, out_schema)
    )
