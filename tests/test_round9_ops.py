"""Round-9 pins: adaptive sorted-neighborhood blocking laws.

The verdict's round-8 gap: dedup_snm_adaptive had no unit coverage and
a single extension level (a block hot at the doubled prefix still
serialized its window sort). These tests pin the recursion + salt
bound and the collapse-first/cold-block equivalence laws of
operators/dedup.adaptive_block_keys / sorted_neighborhood_pairs_adaptive.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_opendata_etl_spark.operators import dedup
from nyc_opendata_etl_spark.operators.text import canon_text

CAP = 20


def _reps(spark, rows):
    """Collapse-first representative frame (id, canon, sh) — the exact
    input shape sorted_neighborhood_pairs_adaptive feeds to
    adaptive_block_keys."""
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return (
        docs.select(F.col("doc_id").alias("raw_id"), canon_text("text").alias("canon"))
        .groupBy("canon")
        .agg(F.min("raw_id").alias("id"))
        .select(
            "id",
            "canon",
            F.array_sort(
                F.array_distinct(dedup.word_shingles(F.col("canon"), 3))
            ).alias("sh"),
        )
        .filter(F.size("sh") > 0)
    )


def test_adaptive_cold_blocks_bit_match_fixed_snm(spark):
    """On a corpus with no hot base block, the adaptive variant must
    emit EXACTLY the fixed variant's pairs (same keys, same jaccards):
    the measurement machinery is a no-op when nothing exceeds the cap."""
    rows = []
    for i in range(12):
        # 4 distinct 3-char base prefixes (p0x..p3x), 6 docs each — all
        # well under the cap, so no block extends
        rows.append((i, f"p{i % 4}x shared middle words tail {i}"))
        rows.append((100 + i, f"p{i % 4}x shared middle words tail {i} extra"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fixed = sorted(
        tuple(r)
        for r in dedup.sorted_neighborhood_pairs(docs, threshold=0.3).collect()
    )
    adaptive = sorted(
        tuple(r)
        for r in dedup.sorted_neighborhood_pairs_adaptive(
            docs, threshold=0.3, block_cap=CAP
        ).collect()
    )
    assert fixed and adaptive == fixed


def test_hot_base_block_reblocks_at_doubled_prefix(spark):
    """>cap reps sharing the 3-char base prefix but diverging by char 6
    must re-key at the 6-char prefix — the single-task window sort of
    the hot block splits into per-subprefix tasks — while an unrelated
    cold block keeps its base-length key."""
    rows = [(i, f"aaa{i:02d} common tail words here {i}") for i in range(30)]
    rows += [(500 + i, f"zzz cold block tail {i}") for i in range(3)]
    keyed = dedup.adaptive_block_keys(_reps(spark, rows), block_cap=CAP).collect()
    hot = [r for r in keyed if r["canon"].startswith("aaa")]
    cold = [r for r in keyed if r["canon"].startswith("zzz")]
    assert len(hot) == 30 and all(len(r["blk"]) == 6 for r in hot)
    assert len({r["blk"] for r in hot}) == 30  # each aaaNN diverges by char 6
    assert cold and all(r["blk"] == "zzz" for r in cold)


def test_deep_hot_block_salts_and_bound_is_unconditional(spark):
    """A block still hot at the deepest (24-char) prefix must split by
    the deterministic md5 salt into ceil(n/cap) buckets — the round-9
    law: NO final block key may hold more than ~cap reps; a block hot
    at every prefix level can no longer serialize one task."""
    prefix = "deepsharedprefix24chars!"  # 24 chars, identical across docs
    assert len(prefix) == 24
    rows = [(i, f"{prefix} divergent tail {i} words {i}") for i in range(50)]
    keyed = dedup.adaptive_block_keys(_reps(spark, rows), block_cap=CAP)
    per_blk = {
        r["blk"]: r["n"]
        for r in keyed.groupBy("blk").agg(F.count("*").alias("n")).collect()
    }
    assert sum(per_blk.values()) == 50
    assert all(dedup.SNM_SALT_SEP in blk for blk in per_blk)
    salts = {int(blk.split(dedup.SNM_SALT_SEP)[1]) for blk in per_blk}
    assert salts <= {0, 1, 2} and len(salts) >= 2  # ceil(50/20) = 3 buckets
    # deterministic md5 spread: no bucket re-concentrates the block
    assert max(per_blk.values()) <= 2 * CAP
    # the whole keying is a pure function of the corpus
    again = {
        r["blk"]: r["n"]
        for r in dedup.adaptive_block_keys(_reps(spark, rows), block_cap=CAP)
        .groupBy("blk")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert again == per_blk


def test_every_final_block_fits_cap_or_is_salted(spark):
    """Global bound over a mixed corpus (cold + hot-at-6 + hot-at-24):
    every final block key either holds <= cap reps or carries the salt
    separator (the deepest-level split)."""
    rows = [(i, f"aaa{i:02d} common tail words here {i}") for i in range(30)]
    prefix = "deepsharedprefix24chars!"
    rows += [(1000 + i, f"{prefix} divergent tail {i} words {i}") for i in range(50)]
    rows += [(2000 + i, f"zzz cold block tail {i}") for i in range(3)]
    counts = (
        dedup.adaptive_block_keys(_reps(spark, rows), block_cap=CAP)
        .groupBy("blk")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert all(r["n"] <= CAP or dedup.SNM_SALT_SEP in r["blk"] for r in counts)


def test_collapse_first_identical_docs_never_pair(spark):
    """The collapse-first law: byte-identical canonical texts reduce to
    one min-id representative BEFORE blocking, so no output pair joins
    two ids of the same canon (that's exact_dedup_groups' territory) —
    and the representative still pairs with a genuine near-dup."""
    base = "the quick brown fox jumps over the lazy dog"
    rows = [(100 + i, base) for i in range(25)]  # 25 identical copies
    rows.append((200, "the quick brown fox jumps over the lazy cat"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = sorted(
        (r["id_a"], r["id_b"])
        for r in dedup.sorted_neighborhood_pairs_adaptive(
            docs, threshold=0.5, block_cap=CAP
        ).collect()
    )
    assert pairs == [(100, 200)]  # min-id rep only; copies 101..124 absent


def test_bloom_empty_build_side_yields_zero_not_null(spark):
    """ADVICE r8: an empty/fully-filtered build side must report
    n_bits_set = 0 (not NULL) from BOTH bitmap representations, and the
    prefilter against the empty filter must pass no rows."""
    from nyc_opendata_etl_spark.operators.bloom import (
        bloom_prefilter,
        bloom_prefilter_packed,
        build_bloom_bitmap,
        build_bloom_bitset,
    )

    empty = spark.createDataFrame([], "k long")
    probe = spark.createDataFrame([(i,) for i in range(10)], "k long")
    bm = build_bloom_bitmap(empty, "k", m=64, k=3).collect()[0]
    assert bm["n_bits_set"] == 0 and bm["n_keys"] == 0 and bm["bits"] == []
    bs = build_bloom_bitset(empty, "k", m=64, k=3).collect()[0]
    assert bs["n_bits_set"] == 0 and bs["n_keys"] == 0
    assert bs["bitset"] == [0]  # 64 bits -> one all-zero word
    bitmap = build_bloom_bitmap(empty, "k", m=64, k=3)
    bitset = build_bloom_bitset(empty, "k", m=64, k=3)
    assert bloom_prefilter(probe, "k", bitmap, m=64, k=3).count() == 0
    assert bloom_prefilter_packed(probe, "k", bitset, m=64, k=3).count() == 0


def test_bloom_packed_and_sorted_array_agree(spark):
    """Representation independence: the packed bitset and the sorted
    position array must admit the IDENTICAL candidate set (same hash
    family, same positions — only the physical form differs)."""
    from nyc_opendata_etl_spark.operators.bloom import (
        bloom_prefilter,
        bloom_prefilter_packed,
        build_bloom_bitmap,
        build_bloom_bitset,
    )

    build = spark.createDataFrame([(i * 7,) for i in range(20)], "k long")
    probe = spark.createDataFrame([(i,) for i in range(200)], "k long")
    m, k = 128, 3
    via_array = sorted(
        r["k"]
        for r in bloom_prefilter(
            probe, "k", build_bloom_bitmap(build, "k", m=m, k=k), m=m, k=k
        ).collect()
    )
    via_packed = sorted(
        r["k"]
        for r in bloom_prefilter_packed(
            probe, "k", build_bloom_bitset(build, "k", m=m, k=k), m=m, k=k
        ).collect()
    )
    assert via_packed == via_array
    assert set(i * 7 for i in range(20)) <= set(via_array)  # no false negatives
