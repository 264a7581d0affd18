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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "aggregate_batch",
    "merge_rollup",
    "weighted_quantiles",
    "hll_batch",
    "hll_merge",
    "hll_estimates",
    "theta_batch",
    "theta_merge",
    "theta_estimates",
    "kll_batch",
    "kll_merge",
    "bitmap_batch",
    "bitmap_merge",
    "bitmap_counts",
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


def theta_batch(
    df: DataFrame, keys: list[str], cols: list[str], lg_k: int = 12
) -> DataFrame:
    """COUNT DISTINCT state with full SET ALGEBRA: one Datasketches
    Theta sketch per key per column (``theta_<col>``, binary). Theta
    trades a little space vs HLL for operations HLL cannot do —
    besides union it supports INTERSECTION and DIFFERENCE at read time
    (``F.theta_intersection`` / ``F.theta_difference``), so audience
    overlap / churn / retention questions answer from stored state
    without re-scanning raw data. Below ~2^lg_k distinct values the
    sketch is in exact mode; above, estimates carry ~1/sqrt(2^lg_k)
    relative standard error scaled by the UNION of the operands."""
    aggs = [F.theta_sketch_agg(c, lg_k).alias(f"theta_{c}") for c in cols]
    return df.groupBy(*keys).agg(*aggs, F.count(F.lit(1)).alias("n"))


def theta_merge(
    state: DataFrame,
    batch_state: DataFrame,
    keys: list[str],
    cols: list[str],
    lg_k: int = 12,
) -> DataFrame:
    """Fold Theta batch state into persisted state (both from
    :func:`theta_batch`): sketch union is associative and commutative,
    so any batching of the input yields state whose estimates equal a
    single pass (pinned by tests)."""
    aggs = [
        F.theta_union_agg(f"theta_{c}", lg_k).alias(f"theta_{c}") for c in cols
    ]
    aggs.append(F.sum("n").alias("n"))
    return state.unionByName(batch_state).groupBy(*keys).agg(*aggs)


def theta_estimates(df: DataFrame, keys: list[str], cols: list[str]) -> DataFrame:
    """Read-time view of Theta state: distinct-count estimates (long)
    per key."""
    ests = [
        F.theta_sketch_estimate(f"theta_{c}").alias(f"approx_n_{c}")
        for c in cols
    ]
    return df.select(*keys, *ests, "n")


def kll_batch(
    df: DataFrame, keys: list[str], cols: list[str], k: int = 400
) -> DataFrame:
    """QUANTILES as re-aggregatable state: one Datasketches KLL double
    sketch per key per column (``kll_<col>``, binary). Unlike
    ``approx_percentile`` (a per-query GK sketch that exists only for
    the duration of one aggregate), KLL state persists and MERGES — so
    incremental maintenance and coarser-grain re-rollups of p50/p90/p99
    never re-scan history, which is the only viable percentile shape at
    100 TB. k=400 keeps one-sided normalized rank error well under 2%."""
    aggs = [
        F.kll_sketch_agg_double(F.col(c).cast("double"), k).alias(f"kll_{c}")
        for c in cols
    ]
    return df.groupBy(*keys).agg(*aggs, F.count(F.lit(1)).alias("n"))


def kll_merge(
    state: DataFrame, batch_state: DataFrame, keys: list[str], cols: list[str]
) -> DataFrame:
    """Fold KLL batch state into persisted state (both from
    :func:`kll_batch`). ``kll_sketch_merge_double`` is a scalar
    two-sketch function (Spark ships no KLL merge AGGREGATE), so the
    keyed merge is a full-outer join with null-side passthrough —
    exactly one shuffle on the rollup keys, and keys present in only
    one side keep their sketch unchanged."""
    b = batch_state.select(
        *keys,
        *[F.col(f"kll_{c}").alias(f"_b_kll_{c}") for c in cols],
        F.col("n").alias("_b_n"),
    )
    joined = state.join(b, keys, "full_outer")
    sel: list[F.Column] = [F.col(k) for k in keys]
    for c in cols:
        left, right = F.col(f"kll_{c}"), F.col(f"_b_kll_{c}")
        sel.append(
            F.when(left.isNull(), right)
            .when(right.isNull(), left)
            .otherwise(F.kll_sketch_merge_double(left, right))
            .alias(f"kll_{c}")
        )
    sel.append(
        (
            F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("_b_n"), F.lit(0))
        ).alias("n")
    )
    return joined.select(*sel)


def bitmap_batch(df: DataFrame, keys: list[str], col: str) -> DataFrame:
    """COUNT DISTINCT as EXACT re-aggregatable state: a 32768-bit bitmap
    per (key, id-bucket) where ``bucket = (id-1) div 32768 + 1`` (Spark's
    ``bitmap_bucket_number``). Unlike HLL/Theta this is not an estimate —
    ``bitmap_count`` summed over buckets IS ``count(DISTINCT col)`` — and
    unlike an exact distinct aggregate the state still MERGES
    (``bitmap_or_agg`` is idempotent/associative/commutative), so
    incremental maintenance never re-scans history. The trade is state
    size: 4 KB per touched bucket, which is only viable for dense
    bounded integer ID domains (surrogate keys, enum codes) — for
    unbounded or sparse domains use :func:`hll_batch`/:func:`theta_batch`.
    Requires ``col`` to be a positive integer."""
    bkt = F.expr(f"bitmap_bucket_number({col})").alias(f"bmb_{col}")
    return df.groupBy(*keys, bkt).agg(
        F.expr(f"bitmap_construct_agg(bitmap_bit_position({col}))").alias(
            f"bm_{col}"
        ),
        F.count(F.lit(1)).alias("n"),
    )


def bitmap_merge(
    state: DataFrame, batch_state: DataFrame, keys: list[str], col: str
) -> DataFrame:
    """Fold bitmap batch state into persisted state (both from
    :func:`bitmap_batch`): bitwise OR per (key, bucket). Because OR is
    idempotent, re-delivering a batch leaves the distinct state
    unchanged — the merge is tolerant of at-least-once pipelines in a
    way additive sketch counters are not (``n`` does re-add)."""
    return state.unionByName(batch_state).groupBy(*keys, f"bmb_{col}").agg(
        F.expr(f"bitmap_or_agg(bm_{col})").alias(f"bm_{col}"),
        F.sum("n").alias("n"),
    )


def bitmap_counts(df: DataFrame, keys: list[str], col: str) -> DataFrame:
    """Read-time view of bitmap state: EXACT distinct counts per key
    (sum of per-bucket popcounts — buckets partition the ID domain, so
    the sum is exact), plus the total observed row count."""
    return df.groupBy(*keys).agg(
        F.sum(F.expr(f"bitmap_count(bm_{col})"))
        .cast("long")
        .alias(f"n_distinct_{col}"),
        F.sum("n").cast("long").alias("n"),
    )


# ──────────────────────────────────────────────────────────────────────
# Count-min frequency sketch — the FREQUENCY member of the mergeable-
# state matrix (HLL/Theta: distinct; KLL: quantiles; bitmap: exact
# distinct; count-min: per-item counts). d×w integer counters answer
# "how often does item x occur?" for ANY x with est ≥ true and
# est ≤ true + εN guarantees — heavy-hitter queries from constant-size
# state instead of a full-cardinality group-by. The hash family is the
# engine's md5-affine convention (functions/hashing.md5_long), so a
# DuckDB oracle replays bucket assignment — and therefore every
# estimate — bit-for-bit.
# ──────────────────────────────────────────────────────────────────────


def countmin_batch(
    df: DataFrame, col: str, d: int = 4, w: int = 256
) -> DataFrame:
    """Count-min state for one batch: each value lands in one bucket
    per hash row (``bucket_i(v) = md5_long(i + '#' + v) mod w``), and
    the state is the (cm_row, cm_bucket, cnt) counter relation —
    at most d·w rows regardless of input size. Shape: a d-way
    scan-stage-local explode, then ONE map-side-combined aggregate;
    the only shuffle carries ≤ d·w groups."""
    from nyc_opendata_etl_spark.functions.hashing import md5_long

    rows = F.explode(
        F.array(*[F.lit(i) for i in range(d)])
    ).alias("cm_row")
    t = df.select(F.col(col).alias("v")).filter(
        F.col("v").isNotNull()
    ).select("v", rows)
    bucket = (
        md5_long(F.concat_ws("#", F.col("cm_row"), F.col("v"))) % w
    ).alias("cm_bucket")
    return (
        t.select("cm_row", bucket)
        .groupBy("cm_row", "cm_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def countmin_merge(state: DataFrame, batch_state: DataFrame) -> DataFrame:
    """Fold a batch's count-min state into persisted state: counters
    add coordinate-wise, so any batching of the input yields the
    identical counter relation as one pass (pinned by tests) — the
    incremental-maintenance contract shared by the whole sketch
    family."""
    return (
        state.unionByName(batch_state)
        .groupBy("cm_row", "cm_bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def countmin_estimate(
    state: DataFrame, probes: DataFrame, d: int = 4, w: int = 256
) -> DataFrame:
    """Frequency estimates for a probe relation (column ``term``):
    ``est(v) = min_i cnt[i, bucket_i(v)]`` — never an undercount, and
    over by at most εN (ε ≈ e/w) with high probability. The state side
    is ≤ d·w rows by construction and broadcasts (the probe relation is
    the preserved side of the left join); absent buckets count 0."""
    from nyc_opendata_etl_spark.functions.hashing import md5_long

    rows = F.explode(
        F.array(*[F.lit(i) for i in range(d)])
    ).alias("cm_row")
    p = probes.select(F.col("term"), rows).withColumn(
        "cm_bucket",
        md5_long(F.concat_ws("#", F.col("cm_row"), F.col("term"))) % w,
    )
    return (
        p.join(F.broadcast(state), ["cm_row", "cm_bucket"], "left")
        .groupBy("term")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("est_freq")
        )
    )


def weighted_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight: "F.Column",
    probs: dict[str, tuple[int, int]],
    total_name: str = "total_weight",
) -> DataFrame:
    """Exact lower weighted quantiles per group, collapse-first.

    For each named probability q = num/den in ``probs``, returns the
    smallest value ``v`` whose cumulative weight (values ascending)
    reaches q of the group total: min{v : cumw(v)·den ≥ totw·num}.
    The comparison is all-integer (weights are summed as BIGINT and the
    rationals stay as (num, den) pairs), so Spark and any ANSI engine
    agree bit-for-bit — no float CDF, no interpolation.

    Shape at scale: (1) collapse — ``groupBy (group, value)`` with a
    map-side-combined integer sum, the only shuffle that sees raw rows;
    (2) per-group cumulative sum — a window over the COLLAPSED rows,
    i.e. |distinct values| per group, bounded by the value DOMAIN, not
    the row count. For discrete/bounded domains (lengths, counts,
    scores) this is the exact 100 TB shape: a group with 10¹⁰ rows but
    20 000 distinct lengths sorts 20 000 rows. For continuous unbounded
    domains, quantize values to a fixed grid first (the
    ``stats_weighted_quantiles_approx`` registration) so the window
    input stays bounded unconditionally; the answer is then exact for
    the quantized distribution with error ≤ one grid cell.

    Null values are dropped before collapsing (Spark sorts NULL first,
    ANSI engines last — excluding them pins the order portably).

    No reference analogue (`etl/` has no quantile surface); the
    unweighted sketch path is ``kll_batch``/``sketch_kll_quantiles``.
    """
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(group_col)
    collapsed = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(group_col, F.col(value_col).alias("v"))
        .agg(F.sum(weight).cast("long").alias("w"))
    )
    cum = collapsed.select(
        group_col,
        "v",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_tot).alias("tw"),
    )
    aggs = [
        F.min(
            F.when(
                F.col("cw") * F.lit(den) >= F.col("tw") * F.lit(num), F.col("v")
            )
        ).alias(name)
        for name, (num, den) in probs.items()
    ]
    return cum.groupBy(group_col).agg(*aggs, F.max("tw").alias(total_name))
