"""Fellegi–Sunter probabilistic record linkage.

Extends the entity-resolution surface (``fuzzy_name_match``'s blocked
edit-distance pairs, ``dedup.sorted_neighborhood_pairs``) with the
classical probabilistic decision model (Fellegi & Sunter, JASA 1969):
each candidate pair is compared field-by-field, and every field
contributes a log₂ likelihood-ratio weight — ``log2(m/u)`` when the
field AGREES (m = P(agree | same entity), u = P(agree | different
entities)) and ``log2((1-m)/(1-u))`` when it disagrees. The summed
score classifies pairs as match / possible / non-match against an
upper/lower threshold pair.

Scale shape (the reason FS is THE industrial linkage model at 100 TB):

- candidate pairs come from **blocking** (same trick as
  ``fuzzy_name_match``): work is Σ per-block |b|², never n², with a
  skew-free multi-column shuffle key;
- the per-pair score is pure expression arithmetic over constant
  weights — whole-stage codegen, no UDFs;
- the **agreement-pattern table** (2^k rows for k fields) emitted by
  :func:`fs_pattern_table` is exactly the sufficient statistic the EM
  parameter-estimation loop consumes: re-estimating m/u iterates over
  ≤2^k counted patterns, NOT over the pairs, so tuning the model after
  the one pairs pass is O(2^k) per iteration regardless of corpus size.

Weights are computed driver-side with ``math.log2`` and inlined as
double literals, so a SQL oracle replays the arithmetic bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fs_field_weights(m: float, u: float) -> tuple[float, float]:
    """(agreement, disagreement) log₂ likelihood-ratio weights for one
    field with conditional agreement probabilities m and u."""
    if not (0.0 < u < m < 1.0):
        raise ValueError(f"need 0 < u < m < 1, got m={m} u={u}")
    return (math.log2(m / u), math.log2((1.0 - m) / (1.0 - u)))


def fs_score(fields: dict[str, tuple[float, float]]) -> Column:
    """Summed FS score over integer 0/1 agreement columns.

    ``fields`` maps agreement-column name -> (m, u). The expression is
    ``Σ col·w_agree + (1-col)·w_disagree`` with the weights inlined as
    literals, summed in dict order — fix the field order to keep the
    float fold identical between engines.
    """
    total: Column | None = None
    for name, (m, u) in fields.items():
        wa, wd = fs_field_weights(m, u)
        c = F.col(name).cast("double")
        term = c * F.lit(wa) + (F.lit(1.0) - c) * F.lit(wd)
        total = term if total is None else total + term
    if total is None:
        raise ValueError("fields must be non-empty")
    return total


def fs_score_sql(fields: dict[str, tuple[float, float]]) -> str:
    """The ANSI-SQL twin of :func:`fs_score` (same literals, same fold
    order) for differential oracles."""
    terms = []
    for name, (m, u) in fields.items():
        wa, wd = fs_field_weights(m, u)
        terms.append(
            f"(CAST({name} AS DOUBLE) * {wa!r} "
            f"+ (1.0 - CAST({name} AS DOUBLE)) * {wd!r})"
        )
    return " + ".join(terms)


def fs_pattern_table(
    pairs: DataFrame,
    fields: dict[str, tuple[float, float]],
    upper: float = 6.0,
    lower: float = 0.0,
    score_digits: int = 4,
) -> DataFrame:
    """Collapse scored candidate pairs to the agreement-pattern table:
    one row per observed agreement vector with its pair count, FS score
    and threshold decision. ≤2^k rows — constant-size output however
    large the pair set, and the EM sufficient statistic (see module
    docstring)."""
    score = F.round(fs_score(fields), score_digits)
    decision = (
        F.when(score >= upper, F.lit("match"))
        .when(score >= lower, F.lit("possible"))
        .otherwise(F.lit("nonmatch"))
    )
    return (
        pairs.groupBy(*fields.keys())
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            *fields.keys(),
            "n_pairs",
            score.alias("fs_score"),
            decision.alias("decision"),
        )
    )


def fs_pattern_table_weighted(
    pairs: DataFrame,
    fields: dict[str, tuple[float, float]],
    weight_col: str = "n_pairs",
    upper: float = 6.0,
    lower: float = 0.0,
    score_digits: int = 4,
) -> DataFrame:
    """:func:`fs_pattern_table` for COLLAPSED candidate pairs, where each
    row already represents ``weight_col`` identical-record pairs (the
    exact-collapse-first rewrite: byte-identical records on every
    compared field reduce to one representative with a count; a
    cross-representative pair stands for cnt_a·cnt_b record pairs and a
    within-representative row for C(cnt, 2)). Agreement functions are
    symmetric and depend only on the compared fields, so summing the
    weights reproduces the full-pair pattern counts exactly — the same
    collapse+expand equivalence the dedup family uses, applied to
    linkage, which turns duplicate-skewed Σ|block|² pair work into
    Σ|distinct-block|² + one collapse aggregate."""
    score = F.round(fs_score(fields), score_digits)
    decision = (
        F.when(score >= upper, F.lit("match"))
        .when(score >= lower, F.lit("possible"))
        .otherwise(F.lit("nonmatch"))
    )
    return (
        pairs.groupBy(*fields.keys())
        .agg(F.sum(weight_col).cast("long").alias("n_pairs"))
        .select(
            *fields.keys(),
            "n_pairs",
            score.alias("fs_score"),
            decision.alias("decision"),
        )
    )
