"""Slowly-changing-dimension (Type 2) merge.

The reference maintains Kimball dimensions but only ever *appends*
(`etl/core/dim_loader.py:23-30` — WRITE_APPEND, no update path), so a
changed natural key silently mints a second surrogate row with no
history semantics. A warehouse user's next ask is the real thing:
SCD Type 2 — close the out-of-date version (``effective_to``,
``is_current = false``) and open a new one, keeping full history.

Shape at scale: one shuffle. The current slice of the dimension and the
update batch full-outer-merge on the natural key (the same plan Delta
Lake's MERGE lowers to when the source side can't prune files); each
joined row then *explodes* into its 0/1/2 output versions via an inline
struct array, so there is no second pass over the dimension and no
union-of-three-joins recompute. History rows never enter the join at
all — the ``is_current`` filter is pushed to the scan and they pass
through untouched.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["scd1_merge", "scd2_merge"]


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    natural_key: list[str],
    tracked: list[str],
    eff_date_col: str = "eff_date",
) -> DataFrame:
    """Merge an update batch into an SCD2 dimension table.

    ``dim`` carries ``natural_key + tracked + effective_from,
    effective_to, is_current``; ``updates`` carries ``natural_key +
    tracked + eff_date_col``. Per natural key:

    - attributes changed  → old version closed at the update's effective
      date, new version opened (2 output rows);
    - no-op update / no update → row passes through unchanged;
    - key absent from ``dim`` → fresh insert, open-ended.

    Comparison is null-safe (``IS DISTINCT FROM`` semantics) so a NULL
    attribute value participates in change detection like any other.
    """
    out_cols = [*natural_key, *tracked, "effective_from", "effective_to", "is_current"]
    cur = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current")).select(*out_cols)

    u = updates.select(
        *[F.col(c).alias(f"u_{c}") for c in (*natural_key, *tracked)],
        F.col(eff_date_col).alias("u_eff"),
    )
    on = reduce(
        Column.__and__, [cur[k] == u[f"u_{k}"] for k in natural_key]
    )
    j = cur.join(u, on, "full_outer")

    has_dim = F.col(natural_key[0]).isNotNull()
    has_upd = F.col(f"u_{natural_key[0]}").isNotNull()
    changed = reduce(
        Column.__or__,
        [~F.col(t).eqNullSafe(F.col(f"u_{t}")) for t in tracked],
    )

    def ver(keys: list[Column], attrs: list[Column], eff_from: Column,
            eff_to: Column, is_cur: Column) -> Column:
        fields = (
            [k.alias(n) for k, n in zip(keys, natural_key)]
            + [a.alias(n) for a, n in zip(attrs, tracked)]
            + [
                eff_from.alias("effective_from"),
                eff_to.alias("effective_to"),
                is_cur.alias("is_current"),
            ]
        )
        return F.struct(*fields)

    dim_keys = [F.col(k) for k in natural_key]
    upd_keys = [F.col(f"u_{k}") for k in natural_key]
    as_is = ver(
        dim_keys,
        [F.col(t) for t in tracked],
        F.col("effective_from"),
        F.col("effective_to"),
        F.col("is_current"),
    )
    closed = ver(
        dim_keys,
        [F.col(t) for t in tracked],
        F.col("effective_from"),
        F.col("u_eff"),
        F.lit(False),
    )
    opened = ver(
        upd_keys,
        [F.col(f"u_{t}") for t in tracked],
        F.col("u_eff"),
        F.lit(None).cast("date"),
        F.lit(True),
    )

    versions = (
        F.when(has_dim & has_upd & changed, F.array(closed, opened))
        .when(has_dim, F.array(as_is))  # no update, or a no-op update
        .otherwise(F.array(opened))  # fresh insert
    )
    merged = j.select(F.explode(versions).alias("v")).select("v.*")
    return merged.unionByName(hist)


def scd1_merge(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    *,
    null_updates: str = "keep_base",
) -> DataFrame:
    """SCD Type 1 merge (upsert, no history): rows from ``updates`` win
    over matching ``base`` rows by natural key, unmatched update rows
    insert, unmatched base rows carry through — one full-outer merge
    instead of a mutable-table write (the Spark form when the sink is
    plain parquet rather than a transactional table format).

    NULL handling on matched rows is an explicit contract because the
    two common Type 1 flavors genuinely differ:

    - ``null_updates="keep_base"`` (default): a NULL update attribute
      means "not stated" and the base value carries forward
      (per-column coalesce — the patch-style merge most CDC feeds
      expect).
    - ``null_updates="overwrite"``: the update row replaces the base
      row verbatim, NULLs included (ANSI MERGE WHEN MATCHED THEN
      UPDATE semantics), via a match-indicator column rather than
      coalesce.

    If ``updates`` carries several rows per key the caller must
    pre-dedupe (e.g. operators/event-log last-writer-wins) — a MERGE
    with ambiguous sources is an error in every engine, and silently
    exploding the base row here would hide that.

    Scale: one shuffle on the key for each side (or a broadcast when
    updates are a small delta — the common case — which Catalyst/AQE
    picks automatically); no window, no sort.
    """
    if null_updates not in ("keep_base", "overwrite"):
        raise ValueError(
            f"null_updates must be 'keep_base' or 'overwrite', got {null_updates!r}"
        )
    attrs = [c for c in base.columns if c not in key_cols]
    u = updates.select(
        *key_cols,
        F.lit(True).alias("__upd_matched"),
        *[F.col(c).alias(f"__u_{c}") for c in attrs],
    )
    j = base.join(u, on=key_cols, how="full_outer")
    if null_updates == "keep_base":
        vals = [F.coalesce(F.col(f"__u_{c}"), F.col(c)).alias(c) for c in attrs]
    else:
        vals = [
            F.when(F.col("__upd_matched").isNotNull(), F.col(f"__u_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in attrs
        ]
    return j.select(*key_cols, *vals)
