"""Similarity search over embedding columns (ArrayType(FloatType)).

Brute-force cosine top-k is the exact baseline; the LSH-bucketed variant
is the 100 TB scale path (candidate generation via random-hyperplane
sign buckets → per-bucket exact re-rank, avoiding the full cross
product).

All math is double-precision sequential left-folds (F.aggregate /
zip_with) so the oracle (DuckDB list_* functions, same fold order)
matches bit-for-bit before rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm2(a) * norm2(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k neighbors of one stored vector by cosine similarity.

    The 1-row query side is broadcast; the big side is scanned once with
    the similarity computed in-stage (no shuffle except the final top-k,
    which plans as TakeOrderedAndProject).
    """
    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("__q_vec__")
    )
    scored = (
        embeddings.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("__q_vec__")), round_digits).alias(
                "cosine_sim"
            ),
        )
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col)).limit(k)


def lsh_bucket(vec: Column, hyperplanes: list[list[float]]) -> Column:
    """Random-hyperplane (SimHash-style) LSH bucket id: sign bit per
    hyperplane, packed into a long. Deterministic given the plane list."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(float(w)) for w in plane]),
                    lambda x, w: x.cast("double") * w,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit(1 << i),
        ).otherwise(F.lit(0))
        for i, plane in enumerate(hyperplanes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    hyperplanes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate NN: bucket both sides by hyperplane signs, re-rank
    exactly only within the query's bucket. At scale this prunes the
    candidate set by ~2^n_planes; recall is traded via n_planes."""
    bucketed = embeddings.withColumn("__bucket__", lsh_bucket(F.col(vec_col), hyperplanes))
    q = bucketed.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("__q_vec__"), F.col("__bucket__").alias("__q_bucket__")
    )
    candidates = bucketed.join(
        F.broadcast(q), F.col("__bucket__") == F.col("__q_bucket__")
    ).filter(F.col(id_col) != query_vec_id)
    scored = candidates.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("__q_vec__")), 6).alias("cosine_sim"),
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col)).limit(k)
