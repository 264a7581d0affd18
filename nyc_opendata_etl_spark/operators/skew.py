"""Skew-mitigation operator patterns for 100 TB-scale shuffles.

Two techniques a large-scale pipeline reaches for when AQE's automatic
skew-join splitting isn't available or isn't enough:

* **salted join** — a shuffle join where one side's key distribution is
  pathological (a handful of hot keys own most rows). The fact side gets
  a deterministic salt in [0, buckets); the (small) build side is
  replicated once per salt value; the join key becomes (key, salt), so a
  hot key's rows spread over ``buckets`` reducers instead of one.
* **two-phase distinct aggregation** — COUNT(DISTINCT x) per group
  shuffles all values of a hot group to one reducer. Re-grouping by
  (group, x) first dedupes with map-side partial aggregation, then a
  second cheap aggregate counts — both shuffles are skew-free.

Both are pure plan rewrites with identical semantics to the naive form,
so they carry full DuckDB oracles in the query registry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    buckets: int = 16,
    salt_source: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to a small ``dim`` on ``key`` with salt spreading.

    ``salt_source`` must be a fact-side expression with good entropy
    (defaults to xxhash64 of the whole fact row is NOT possible
    generically, so pass one — e.g. a line-number or id column). The dim
    side is exploded ``buckets``× — acceptable because the dim is small;
    at scale you'd broadcast a dim this small anyway, so the technique
    matters when BOTH sides are too big to broadcast and one is skewed:
    then the salt column is added to the repartitioning of both sides.
    """
    if salt_source is None:
        raise ValueError("pass a fact-side salt_source column")
    if how not in ("inner", "left", "left_outer", "leftouter"):
        # right/full joins would emit `buckets` copies of every unmatched
        # dim row (the dim is replicated per salt before the join)
        raise ValueError(f"salted_join preserves semantics only for inner/left, not {how!r}")
    f = fact.withColumn("__salt__", F.pmod(F.xxhash64(salt_source), F.lit(buckets)))
    d = dim.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("__salt__", F.col("__salt__").cast("long"))
    return f.join(d, [key, "__salt__"], how).drop("__salt__")


def two_phase_count_distinct(
    df: DataFrame, group_cols: list[str], distinct_col: str, out_col: str
) -> DataFrame:
    """COUNT(DISTINCT distinct_col) GROUP BY group_cols, skew-safely:
    dedupe on (group, value) first (map-side combine collapses hot
    groups before the wire), then count per group."""
    return (
        df.select(*group_cols, distinct_col)
        .distinct()
        .groupBy(*group_cols)
        .agg(F.count(distinct_col).alias(out_col))
    )


def key_skew_profile(df: DataFrame, key_col: str, top: int = 10) -> DataFrame:
    """Heavy-hitter profile of a prospective join/aggregation key: the
    ``top`` most frequent key values with their row count, share of the
    table, and skew ratio (count ÷ mean count per key).

    This is the diagnostic run before choosing a skew mitigation — a
    skew_ratio near 1 says hash partitioning balances; a large one says
    the hot keys need salting (salted_join) or AQE skew-join splitting,
    and the listed keys are exactly the ones to salt.

    Scale shape: one map-side-combined count aggregate on the key, a
    1-row global stats relation broadcast back, and a top-k that plans
    as TakeOrderedAndProject — per-partition heaps, only ``top`` rows
    cross the final exchange. Nothing here materializes the full key
    distribution on one node.
    """
    per_key = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count("*").alias("cnt")
    )
    stats = per_key.agg(
        F.sum("cnt").alias("__total__"), F.count("*").alias("__nkeys__")
    )
    return (
        per_key.orderBy(F.desc("cnt"), "key")
        .limit(top)
        .crossJoin(F.broadcast(stats))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("__total__"), 6).alias("frac"),
            F.round(
                F.col("cnt") * F.col("__nkeys__") / F.col("__total__"), 6
            ).alias("skew_ratio"),
        )
        .orderBy(F.desc("cnt"), "key")
    )
