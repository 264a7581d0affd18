"""Incremental rollup maintenance: merge a new batch into persisted
partial-aggregate state without re-scanning history.

The reference recomputes facts per time window and appends
(`etl/fact_loaders/load_311.py:113-126`); any aggregate over the whole
history re-reads everything. The standard warehouse answer is to persist
*re-aggregatable* partial state — sum / count / min / max (and any
sketch with a merge, e.g. HLL) — keyed by the rollup grain, and fold
each new batch in: ``state ⊕ agg(batch)`` is one tiny union + one
hash aggregate whose input is |state keys| + |batch keys| rows, not the
full history. Non-reaggregatable forms (avg, stddev) are derived at
read time from the stored moments.

Shape at scale: the batch aggregates map-side first (partial combine),
so the merge shuffle carries one row per touched key — the same shape
Structured Streaming's stateful aggregation maintains internally, here
as an explicit batch operator over an ordinary parquet-backed state
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "aggregate_batch",
    "merge_rollup",
    "hll_batch",
    "hll_merge",
    "hll_estimates",
]

_MERGE_FN = {"sum": F.sum, "min": F.min, "max": F.max}

Measures = "dict[str, tuple[str, ...]]"  # column -> subset of sum|min|max


def _state_cols(measures) -> list[tuple[str, str, str]]:
    """(state_col, source_col, how) triples in deterministic order."""
    return [
        (f"{how}_{c}", c, how)
        for c, hows in measures.items()
        for how in hows
    ]


def aggregate_batch(df: DataFrame, keys: list[str], measures) -> DataFrame:
    """Collapse raw rows to rollup-state grain: one row per key carrying
    the partial measures plus the row count ``n``. ``measures`` maps an
    input column to the subset of ``("sum","min","max")`` to maintain."""
    aggs = [
        _MERGE_FN[how](src).alias(name)
        for name, src, how in _state_cols(measures)
    ]
    return df.groupBy(*keys).agg(*aggs, F.count(F.lit(1)).alias("n"))


def merge_rollup(
    state: DataFrame, batch_state: DataFrame, keys: list[str], measures
) -> DataFrame:
    """Fold batch partial-state into persisted state (both at state
    grain, i.e. outputs of :func:`aggregate_batch`). Sums and counts
    re-add, min/max re-min/max — the merge is associative and
    commutative, so any batching order yields identical state."""
    re_aggs = [
        (F.sum if how == "sum" else _MERGE_FN[how])(name).alias(name)
        for name, _src, how in _state_cols(measures)
    ]
    re_aggs.append(F.sum("n").alias("n"))
    return state.unionByName(batch_state).groupBy(*keys).agg(*re_aggs)


def hll_batch(
    df: DataFrame, keys: list[str], cols: list[str], lg_k: int = 12
) -> DataFrame:
    """COUNT DISTINCT as re-aggregatable state: one Datasketches HLL
    sketch per key per column (``hll_<col>``, binary). Unlike an exact
    distinct count, the sketch merges — so incremental maintenance and
    coarser-grain re-rollups never re-scan history. Register updates
    are max-folds, so the state is independent of row order and
    partitioning (verified by tests)."""
    aggs = [F.hll_sketch_agg(c, lg_k).alias(f"hll_{c}") for c in cols]
    return df.groupBy(*keys).agg(*aggs, F.count(F.lit(1)).alias("n"))


def hll_merge(
    state: DataFrame, batch_state: DataFrame, keys: list[str], cols: list[str]
) -> DataFrame:
    """Fold HLL batch state into persisted state (both from
    :func:`hll_batch`); the union of sketches over any batching of the
    input yields the identical register state as one pass over all of
    it."""
    aggs = [F.hll_union_agg(f"hll_{c}").alias(f"hll_{c}") for c in cols]
    aggs.append(F.sum("n").alias("n"))
    return state.unionByName(batch_state).groupBy(*keys).agg(*aggs)


def hll_estimates(df: DataFrame, keys: list[str], cols: list[str]) -> DataFrame:
    """Read-time view of HLL state: distinct-count estimates (long) per
    key, derived from the stored sketches."""
    ests = [
        F.hll_sketch_estimate(f"hll_{c}").alias(f"approx_n_{c}") for c in cols
    ]
    return df.select(*keys, *ests, "n")
