"""Deterministic, engine-portable Bloom-filter semi-join reduction.

Spark already injects *runtime* bloom filters on selective shuffle joins
(``spark.sql.optimizer.runtime.bloomFilter.*`` — pinned by
``tests/test_plans.py``), but that filter's hash family is engine-private,
so its row-level decisions can't be replayed by another engine. This
module builds the same reduction from the repo's portable hash family
(``functions/hashing.py``): every bit position is a pure function of the
key value, so DuckDB can reproduce the *exact* candidate set — including
the false positives — and the differential gate can verify the bloom
math itself, not just the final join result.

Hash family (round 9): ONE ``md5_long`` fold of the key, then k affine
maps over it mod the Mersenne prime 2³¹−1 — the identical 2-universal
construction the portable MinHash family uses (``operators/dedup.py``,
``MINHASH_P``/``_affine``). The previous family paid k FULL md5 digests
per probed fact row (``surrogate_key(lit(i), key)`` per member); the
shared fold pays one md5 + k multiply-add-mods. At 100 TB the probe is
scan-local either way, but it runs on every fact row — per-row constant
factors are the whole bill there. int64-safe: A < P < 2.2e9 and the md5
fold < 1e9, so A·h + B < 2.4e18 < 2⁶³.

FPP caveat of the shared fold: because all k positions derive from ONE
30-bit fold (mod 10⁹), two distinct keys that collide on the fold
(~n/1e9 per probe key) collide on ALL k positions at once — a
correlated false-positive floor of ≈ n_build/1e9 that is independent of
m and k, which the old k-independent-digest family did not have. The
floor is negligible at practical build sizes (n ≤ 10⁶ ⇒ ≤ 0.1%) and
correctness is unaffected either way (the exact semi-join removes every
false positive, and the oracle replays the family bit-for-bit), but m/k
tuning must NOT assume k independent hash functions below that floor.

Shape at 100 TB: the build side is one tiny distinct+explode aggregate
over the dim (k positions per key, map-side combined), the bitmap crosses
the cluster once as a broadcast array, and the probe is a scan-local
``forall`` — no shuffle touches the fact until after the prefilter has
discarded the (1 - selectivity) complement. The exact semi-join that
removes false positives then shuffles only the candidate sliver. The
shared md5 fold is materialized as a projected column (``__bh__``) before
the probe so exactly one digest per row is guaranteed by plan structure,
not by codegen subexpression elimination.

Null semantics: a NULL probe key folds to NULL positions and never
becomes a candidate — correct for the semi-join use (NULL equals no
build key). Build keys are NULL-filtered explicitly.

Reference parity: the reference engine has no bloom operator (its joins
are single-process pandas merges, ``etl/core/key_mapper.py``); this is
Part-B engine surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nyc_opendata_etl_spark.functions.hashing import (
    md5_long,
    md5_long_oracle_sql,
)

#: Mersenne prime 2³¹−1 — same modulus as the portable MinHash family.
BLOOM_P = 2_147_483_647


def _affine(i: int) -> tuple[int, int]:
    """(A_i, B_i) of hash-family member i — identical constants to the
    MinHash family (operators/dedup.py:74-75) so the two portable
    families stay one audited construction."""
    return (1_000_003 * (i + 1)) % BLOOM_P, (7_919 * (i + 1)) % BLOOM_P


def bloom_position(
    seed: int, key: Column | str, m: int, *, prehashed: bool = False
) -> Column:
    """Bit position of `key` under hash-family member `seed`: one of the
    k positions a key sets/probes. Pure expression, portable to DuckDB
    via :func:`bloom_position_sql`.

    ``prehashed=True`` means `key` already holds the shared
    ``md5_long`` fold (callers project it once per row); otherwise the
    fold is computed inline.
    """
    c = F.col(key) if isinstance(key, str) else key
    h = c if prehashed else md5_long(c)
    a, b = _affine(seed)
    return ((F.lit(a) * h + F.lit(b)) % BLOOM_P) % m


def bloom_position_sql(
    seed: int, key_expr: str, m: int, *, prehashed: bool = False
) -> str:
    """DuckDB twin of :func:`bloom_position` (bit-identical)."""
    h = key_expr if prehashed else md5_long_oracle_sql(key_expr)
    a, b = _affine(seed)
    return f"((({a} * {h} + {b}) % {BLOOM_P}) % {m})"


def _with_base_hash(df: DataFrame, key: str, out: str) -> DataFrame:
    """Project the shared md5 fold ONCE per row — the k probe/set
    positions are then k multiply-add-mods over this column."""
    return df.withColumn(out, md5_long(F.col(key)))


def build_bloom_bitmap(build: DataFrame, key: str, *, m: int, k: int) -> DataFrame:
    """1-row DataFrame ``(bits: array<bigint> sorted, n_keys, n_bits_set)``.

    The bitmap is represented as the sorted array of set positions (not a
    packed bitset) so the broadcast literal stays engine-portable; at
    production m (millions of bits) a packed representation or Spark's
    native runtime bloom is the right physical choice — the *logic* under
    test here is identical.
    """
    keys = build.select(F.col(key).alias("__bk__")).where(F.col(key).isNotNull()).distinct()
    hashed = _with_base_hash(keys, "__bk__", "__bh__")
    pos = hashed.select(
        F.explode(
            F.array(*[bloom_position(i, "__bh__", m, prehashed=True) for i in range(k)])
        ).alias("pos")
    )
    return (
        pos.agg(F.collect_set("pos").alias("_ps"))
        .select(F.sort_array("_ps").alias("bits"), F.size("_ps").cast("long").alias("n_bits_set"))
        .crossJoin(keys.agg(F.count("*").alias("n_keys")))
    )


def bloom_prefilter(probe: DataFrame, key: str, bitmap: DataFrame, *, m: int, k: int) -> DataFrame:
    """Rows of `probe` whose key passes ALL k bloom probes (candidates:
    every true match plus deterministic false positives)."""
    pr = _with_base_hash(probe, key, "__bh__")
    probes = F.array(*[bloom_position(i, "__bh__", m, prehashed=True) for i in range(k)])
    return (
        pr.crossJoin(F.broadcast(bitmap.select("bits")))
        .where(F.forall(probes, lambda p: F.array_contains(F.col("bits"), p)))
        .drop("bits", "__bh__")
    )


def build_bloom_bitset(build: DataFrame, key: str, *, m: int, k: int) -> DataFrame:
    """The PRODUCTION physical form of :func:`build_bloom_bitmap`: a
    packed long-array bitset — 1 row of ``(bitset: array<bigint> of
    ⌈m/64⌉ words, LSB-first within a word, n_keys, n_bits_set)``.

    Same portable positions as the sorted-array form, so a SQL oracle
    still replays the exact candidate set (including false positives)
    from position membership; only the representation changes. At
    production m the packed array is m/8 bytes broadcast once (1 MiB
    for m=2²³) versus 8 bytes PER SET BIT for the sorted array, and the
    probe is two arithmetic ops + one word load instead of a binary
    search. Build: positions fold into sparse (word, bits) pairs via a
    map-side-combinable bit_or aggregate — constant state per word —
    then one row assembles the dense array. An EMPTY build side yields
    an all-zero bitset with ``n_bits_set = 0`` (coalesced — a bare SUM
    over zero rows is NULL, which the sorted-array twin and the SQL
    oracle both report as 0).
    """
    nwords = (m + 63) // 64
    keys = build.select(F.col(key).alias("__bk__")).where(F.col(key).isNotNull()).distinct()
    hashed = _with_base_hash(keys, "__bk__", "__bh__")
    pos = hashed.select(
        F.explode(
            F.array(*[bloom_position(i, "__bh__", m, prehashed=True) for i in range(k)])
        ).alias("pos")
    )
    sparse = pos.select(
        F.floor(F.col("pos") / 64).cast("int").alias("w"),
        F.call_function("shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")).alias("mask"),
    ).groupBy("w").agg(F.bit_or("mask").alias("word"))
    packed = sparse.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("_wm"),
        F.coalesce(F.sum(F.bit_count("word")), F.lit(0)).cast("long").alias("n_bits_set"),
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(nwords - 1)),
            lambda i: F.coalesce(F.try_element_at(F.col("_wm"), i), F.lit(0).cast("long")),
        ).alias("bitset"),
        "n_bits_set",
    )
    return packed.crossJoin(keys.agg(F.count("*").alias("n_keys")))


def bloom_prefilter_packed(
    probe: DataFrame, key: str, bitset: DataFrame, *, m: int, k: int
) -> DataFrame:
    """Rows of `probe` passing all k probes against the packed bitset:
    per probe, one word index (pos ≫ 6), one shift, one AND — stays
    scan-local whole-stage codegen over the broadcast word array. The
    shared md5 fold rides a Project directly over the scan (no
    Exchange), so the per-row cost is 1 digest + k·(mul,add,mod,shift)."""
    pr = _with_base_hash(probe, key, "__bh__")
    probes = F.array(*[bloom_position(i, "__bh__", m, prehashed=True) for i in range(k)])
    return (
        pr.crossJoin(F.broadcast(bitset.select("bitset")))
        .where(
            F.forall(
                probes,
                lambda p: (
                    F.get(F.col("bitset"), F.floor(p / 64).cast("int"))
                    .bitwiseAND(F.call_function("shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")))
                    != 0
                ),
            )
        )
        .drop("bitset", "__bh__")
    )
