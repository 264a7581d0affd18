"""Data-quality validation: declarative expectations evaluated in one
aggregate pass.

A light-weight expectations layer (the pipeline-gate pattern): each rule
is a boolean expression per row; one aggregate computes rows checked /
rows failed per rule. One job, one shuffle-free map + global aggregate
regardless of how many rules — at 100 TB this is the difference between
one scan and N scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate named row-level expectations; returns one row per rule:
    (rule, n_rows, n_failed, pass_ratio). A NULL rule result counts as
    a failure (unknown ≠ valid)."""
    aggs = []
    for name, cond in rules.items():
        failed = F.sum(
            F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
        ).alias(f"__f_{name}")
        aggs.append(failed)
    row = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col("__n").alias("n_rows"),
                F.col(f"__f_{name}").alias("n_failed"),
            )
            for name in rules
        ]
    )
    exploded = row.select(F.explode(pairs).alias("r")).select("r.*")
    return exploded.withColumn(
        "pass_ratio",
        F.round(1.0 - F.col("n_failed") / F.greatest(F.col("n_rows"), F.lit(1)), 6),
    )


def observed(
    df: DataFrame, rules: dict[str, Column], name: str = "quality"
):
    """Attach the expectation aggregates as a query OBSERVATION: the
    metrics are computed inside whatever action consumes ``df`` (the
    fact write, typically) — zero extra scans, unlike :func:`validate`,
    which is its own job. This is the Spark-native form of the
    reference's per-load row-count logging
    (``/root/reference/etl/core/dim_loader.py:24-30``): counts ride the
    write itself.

    Returns ``(df_observed, observation)``; read
    ``observation.get`` after an action has run — a dict with
    ``n_rows`` and one ``n_failed_<rule>`` per expectation (NULL rule
    results count as failures, matching ``validate``).
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for nm, cond in rules.items():
        aggs.append(
            F.sum(
                F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
            ).alias(f"n_failed_{nm}")
        )
    return df.observe(obs, *aggs), obs


def audit_constraints(
    pk_checks: dict[str, tuple[DataFrame, list[str]]],
    fk_checks: dict[str, tuple[DataFrame, list[str], DataFrame, list[str]]],
) -> DataFrame:
    """Declarative warehouse constraint audit in one result relation:
    ``(constraint, n_violations)``.

    * ``pk_checks``: name → (table, key cols); violations = rows beyond
      the first per key (``count(*) - count(DISTINCT key)`` via one
      aggregate — no join).
    * ``fk_checks``: name → (child, child cols, parent, parent cols);
      violations = orphaned child rows (LEFT ANTI join; the parent side
      projects to its key columns only, so a dimension parent
      broadcasts and the fact side never shuffles).

    Scale shape: each check is an independent aggregate/anti-join —
    at 100 TB they run as parallel jobs over single scans; the union of
    1-row results is driver-trivial.
    """
    parts: list[DataFrame] = []
    for name, (df, keys) in pk_checks.items():
        parts.append(
            df.select(*keys).agg(
                (F.count(F.lit(1)) - F.count_distinct(*[F.col(k) for k in keys]))
                .cast("long")
                .alias("n_violations")
            ).select(F.lit(name).alias("constraint"), "n_violations")
        )
    for name, (child, ckeys, parent, pkeys) in fk_checks.items():
        cond = [child[c] == parent[p] for c, p in zip(ckeys, pkeys)]
        orphans = child.select(*ckeys).na.drop(subset=ckeys).join(
            parent.select(*pkeys), cond, "left_anti"
        )
        parts.append(
            orphans.agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            .select(F.lit(name).alias("constraint"), "n_violations")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
