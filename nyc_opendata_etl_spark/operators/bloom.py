"""Deterministic, engine-portable Bloom-filter semi-join reduction.

Spark already injects *runtime* bloom filters on selective shuffle joins
(``spark.sql.optimizer.runtime.bloomFilter.*`` — pinned by
``tests/test_plans.py``), but that filter's hash family is engine-private,
so its row-level decisions can't be replayed by another engine. This
module builds the same reduction from the repo's portable md5-affine
family (``functions/hashing.py``): every bit position is a pure function
of the key value, so DuckDB can reproduce the *exact* candidate set —
including the false positives — and the differential gate can verify the
bloom math itself, not just the final join result.

Shape at 100 TB: the build side is one tiny distinct+explode aggregate
over the dim (k positions per key, map-side combined), the bitmap crosses
the cluster once as a broadcast array, and the probe is a scan-local
``forall`` — no shuffle touches the fact until after the prefilter has
discarded the (1 - selectivity) complement. The exact semi-join that
removes false positives then shuffles only the candidate sliver.

Reference parity: the reference engine has no bloom operator (its joins
are single-process pandas merges, ``etl/core/key_mapper.py``); this is
Part-B engine surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nyc_opendata_etl_spark.functions.hashing import (
    surrogate_key,
    surrogate_key_oracle_sql,
)


def bloom_position(seed: int, key: Column | str, m: int) -> Column:
    """Bit position of `key` under hash-family member `seed`: one of the
    k positions a key sets/probes. Pure expression, portable to DuckDB
    via :func:`bloom_position_sql`."""
    c = F.col(key) if isinstance(key, str) else key
    return surrogate_key(F.lit(seed), c) % m


def bloom_position_sql(seed: int, key_expr: str, m: int) -> str:
    """DuckDB twin of :func:`bloom_position` (bit-identical)."""
    return f"({surrogate_key_oracle_sql(str(seed), key_expr)} % {m})"


def build_bloom_bitmap(build: DataFrame, key: str, *, m: int, k: int) -> DataFrame:
    """1-row DataFrame ``(bits: array<bigint> sorted, n_keys, n_bits_set)``.

    The bitmap is represented as the sorted array of set positions (not a
    packed bitset) so the broadcast literal stays engine-portable; at
    production m (millions of bits) a packed representation or Spark's
    native runtime bloom is the right physical choice — the *logic* under
    test here is identical.
    """
    keys = build.select(F.col(key).alias("__bk__")).where(F.col(key).isNotNull()).distinct()
    pos = keys.select(
        F.explode(F.array(*[bloom_position(i, "__bk__", m) for i in range(k)])).alias("pos")
    )
    return (
        pos.agg(F.collect_set("pos").alias("_ps"))
        .select(F.sort_array("_ps").alias("bits"), F.size("_ps").cast("long").alias("n_bits_set"))
        .crossJoin(keys.agg(F.count("*").alias("n_keys")))
    )


def bloom_prefilter(probe: DataFrame, key: str, bitmap: DataFrame, *, m: int, k: int) -> DataFrame:
    """Rows of `probe` whose key passes ALL k bloom probes (candidates:
    every true match plus deterministic false positives)."""
    probes = F.array(*[bloom_position(i, key, m) for i in range(k)])
    return (
        probe.crossJoin(F.broadcast(bitmap.select("bits")))
        .where(F.forall(probes, lambda p: F.array_contains(F.col("bits"), p)))
        .drop("bits")
    )
