"""Grouped-map operators (applyInPandas) for per-key computations that
relational windows genuinely cannot express.

Everything window-expressible (ranks, lags, moving sums) stays native —
see queries/relational.py. applyInPandas is reserved for true
recurrences: each group's rows stream to one Arrow batch, a vectorized
pandas/numpy kernel runs, and results come back columnar. At scale the
shuffle is one hash partitioning by key (same as any groupBy) and the
kernel cost is C-speed per group.
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
    expressible with SQL window frames, the textbook applyInPandas case.
    The recurrence is evaluated with an explicit float64 loop (NOT
    pandas ``ewm``, whose default adjusted weights are a different
    formula) so the DuckDB oracle's ``list_reduce`` fold matches
    bit-for-bit: both are the same left fold in timestamp order with a
    deterministic ``(order_col, value)`` sort."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([order_col, value_col])
        state = None
        for x in pdf[value_col].astype("float64"):
            state = x if state is None else alpha * x + (1.0 - alpha) * state
        return pd.DataFrame({key_col: [pdf[key_col].iloc[0]], "ewma": [state]})

    out_schema = f"{key_col} long, ewma double"
    return (
        df.select(key_col, order_col, value_col)
        .groupBy(key_col)
        .applyInPandas(kernel, out_schema)
    )
