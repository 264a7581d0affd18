"""MERGE-based as-of join (r14) — the linear-cost form of the
backward/forward as-of lookup.

The r13-era formulation (equi-join on the key, inequality filter,
``max_by``/``min_by`` per left row) is correct and memory-bounded (the
partial aggregate streams), but its CPU cost is Σ_key |L_k|·|R_k| — a
hot key with a million left rows and ten thousand right rows performs
10¹⁰ comparisons before the aggregate collapses them. The classical
engine-native as-of join is a sorted MERGE: linear in |L_k| + |R_k|.
This module expresses that merge declaratively, Spark-first:

1. UNION the two sides into one relation tagged by side (the right
   side carries only key, time, and the picked value; the left side's
   payload columns ride along, null on right rows).
2. One window per key ordered by (time, side-tag, value): for
   ``backward``, right rows sort BEFORE left rows at equal time (the
   ``<=`` bound includes equality) and the answer is
   ``last(value, ignorenulls) OVER (... ROWS UNBOUNDED PRECEDING →
   CURRENT ROW)`` — last-observation-carried-forward; for
   ``forward``, left rows sort first and the answer is
   ``first(value, ignorenulls)`` over the following frame.
3. Filter back to left rows.

Tie semantics match the aggregate formulation exactly: right rows with
equal time sort by value ascending, so LOCF's "last preceding row"
IS ``max_by(value, struct(time, value))`` and the forward "first
following row" IS ``min_by(value, struct(time, value))``.

Cost: one shuffle of |L| + |R| rows on the key, one per-partition
sort — no join, no per-key cross product, no inequality predicate.
The window state is a single scalar (the running picked value), so
skewed keys cost a sort, never memory. This is the plan an engine
with a native ASOF JOIN (DuckDB, QuestDB, kdb) would produce, built
from Spark primitives.

Reference parity: the reference engine has no as-of join; this is
part of the extension surface (SURVEY.md §2 Part B join matrix).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Internal column names — prefixed to avoid colliding with payload
#: columns; asserted absent from the left side's schema.
_T, _SIDE, _VAL = "_asof_t", "_asof_side", "_asof_val"


def _check_clash(left: DataFrame, *out_cols: str) -> None:
    """Reject reserved-name collisions AND output-column collisions:
    an ``out_col`` already present on the left would be silently
    replaced by ``withColumn`` and then selected twice (ambiguous
    duplicate output); two identical out_cols would shadow each other
    the same way (ADVICE r14)."""
    clash = ({_T, _SIDE, _VAL} | set(out_cols)) & set(left.columns)
    if clash:
        raise ValueError(
            f"left side uses reserved/output column names: {sorted(clash)}"
        )
    if len(set(out_cols)) != len(out_cols):
        raise ValueError(f"output column names must be distinct: {out_cols}")


def asof_join_merge(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_value: str,
    out_col: str,
    direction: str = "backward",
    time_type: str = "timestamp_ntz",
) -> DataFrame:
    """Left as-of join: for every ``left`` row, the ``right_value`` of
    the latest ``right`` row with ``right_time <= left_time``
    (``direction="backward"``) or the earliest with ``right_time >=
    left_time`` (``"forward"``), matching on ``key``; ties on time pick
    the max (backward) / min (forward) ``right_value``. Left rows with
    no qualifying right row get NULL (left-join semantics). Output:
    every ``left`` column plus ``out_col``, one row per left row.

    Both time columns are cast to ``time_type`` so the union's merged
    column has one type regardless of NTZ/LTZ parquet provenance.

    NULL-time semantics (pinned): right rows with NULL time never
    match (a NULL time satisfies neither inequality — they are dropped
    before the union, where the sort would otherwise place them
    "before everything" and LOCF could pick one); left rows with NULL
    time get a NULL result (same reason, other side: the forward frame
    from a nulls-first position would see the global minimum).

    NULL-key semantics (pinned, matches the equi-join formulation this
    merge replaces): a NULL key never matches. Right rows with NULL
    key are dropped before the union — ``Window.partitionBy`` would
    otherwise group them WITH NULL-key left rows and LOCF could pick
    one, a match the old join never produced. NULL-key left rows then
    land in a partition holding no right values, so their picked value
    is NULL without further handling."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    _check_clash(left, out_col)
    # backward: right rows first at equal time (<= includes equality);
    # forward: left rows first (>= includes equality).
    right_tag = 0 if direction == "backward" else 1
    r = right.filter(
        F.col(right_time).isNotNull() & F.col(key).isNotNull()
    ).select(
        F.col(key),
        F.col(right_time).cast(time_type).alias(_T),
        F.lit(right_tag).alias(_SIDE),
        F.col(right_value).alias(_VAL),
    )
    l = left.select(
        "*",
        F.col(left_time).cast(time_type).alias(_T),
        F.lit(1 - right_tag).alias(_SIDE),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = Window.partitionBy(key).orderBy(_T, _SIDE, _VAL)
    picked: Column
    if direction == "backward":
        picked = F.last(_VAL, ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        picked = F.first(_VAL, ignorenulls=True).over(
            w.rowsBetween(0, Window.unboundedFollowing)
        )
    return (
        u.withColumn(
            out_col,
            F.when(F.col(_T).isNotNull(), picked),  # NULL left time → NULL
        )
        .filter(F.col(_SIDE) == (1 - right_tag))
        .select(*left.columns, out_col)
    )


def asof_candidates_merge(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_value: str,
    backward_col: str,
    forward_strict_col: str,
    time_type: str = "timestamp_ntz",
) -> DataFrame:
    """BOTH as-of candidates from ONE merge pass: per left row, the
    backward candidate (latest right row with time <= left time; ties
    pick max value) and the STRICTLY-forward candidate (earliest right
    row with time > left time; ties pick min value), as two columns.

    One union, one exchange on the key, ONE sort — the two window
    frames (ROWS UNBOUNDED PRECEDING → CURRENT and CURRENT+1 →
    UNBOUNDED FOLLOWING) share the same (time, side, value) ordering,
    so Spark stacks two Window nodes on a single Exchange+Sort (the
    events_sessionize plan shape). This is what a nearest-direction
    as-of needs: the at-or-after-with-equality case is subsumed by the
    backward candidate (an equal-time right row IS the backward pick
    at distance zero, and every nearest tie-break prefers the earlier
    date), so the forward side can be strict and the ordering never
    has to flip.

    Right rows sort (time, side=0, value): at equal time they precede
    left rows — in-frame for the backward LOCF, excluded from the
    strictly-after frame — and the frame boundaries do the direction
    split without a second union or sort."""
    _check_clash(left, backward_col, forward_strict_col)
    # NULL-time/NULL-key rows: same contract as asof_join_merge (null
    # right times/keys never match; null left times yield NULL
    # candidates, null left keys see no right values)
    r = right.filter(
        F.col(right_time).isNotNull() & F.col(key).isNotNull()
    ).select(
        F.col(key),
        F.col(right_time).cast(time_type).alias(_T),
        F.lit(0).alias(_SIDE),
        F.col(right_value).alias(_VAL),
    )
    l = left.select(
        "*",
        F.col(left_time).cast(time_type).alias(_T),
        F.lit(1).alias(_SIDE),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = Window.partitionBy(key).orderBy(_T, _SIDE, _VAL)
    back = F.last(_VAL, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = F.first(_VAL, ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing)
    )
    return (
        u.withColumn(
            backward_col, F.when(F.col(_T).isNotNull(), back)
        )
        .withColumn(
            forward_strict_col, F.when(F.col(_T).isNotNull(), fwd)
        )
        .filter(F.col(_SIDE) == 1)
        .select(*left.columns, backward_col, forward_strict_col)
    )
