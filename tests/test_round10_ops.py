"""Round-10 pins: collapse-first laws for the FIXED sorted-neighborhood
variant.

The round-9 output-scale audit flagged dedup_sorted_neighborhood's
pre-collapse formulation: a g-copy duplicate group occupied g window
slots, emitting Θ(g·window) identical-copy jaccard-1.0 pairs (1.47M
rows at the 100× replica — output growing with duplicate multiplicity)
while pushing distinct-text neighbors beyond the window horizon. Round
10 moves the fixed variant onto the shared one-pass collapse kernel
(the minhash/jaccard/containment/adaptive-SNM pattern); these tests pin
the same three laws test_round9_ops pins for MinHash.
"""

from __future__ import annotations

from nyc_opendata_etl_spark.operators import dedup

# Distinct canonical texts sharing 3-char block prefixes; (1,2) and
# (10,11) are near-dups adjacent in block sort order.
_SNM_BASE = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa mu"),
    (3, "alp xx yy zz ww vv uu tt ss rr"),
    (10, "zulu yankee xray whiskey victor uniform tango sierra"),
    (11, "zulu yankee xray whiskey victor uniform tango sierra extra"),
]


def _snm_pairs(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return sorted(
        tuple(r)
        for r in dedup.sorted_neighborhood_pairs(df, threshold=0.5, **kw).collect()
    )


def test_snm_pairs_invariant_under_duplication(spark):
    """The collapse-first law: adding byte-identical copies (fresh ids,
    whitespace/case variants included) leaves the pair set unchanged —
    the pre-collapse window emitted Θ(g·window) identical-copy pairs
    per group AND could bury a true near-dup beyond the window."""
    copies = _SNM_BASE + [
        (101, _SNM_BASE[0][1].upper()),
        (102, "  " + _SNM_BASE[0][1] + "  "),
        (103, _SNM_BASE[3][1]),
        (104, _SNM_BASE[3][1].replace(" ", "   ")),
    ]
    base = _snm_pairs(spark, _SNM_BASE)
    assert any((a, b) == (1, 2) for a, b, _ in base)
    assert any((a, b) == (10, 11) for a, b, _ in base)
    assert _snm_pairs(spark, copies) == base


def test_snm_never_pairs_identical_canons(spark):
    """Identical-copy pairs belong to exact dedup, never to SNM output:
    ids of non-representative copies cannot appear, and no emitted pair
    joins two byte-identical canonical texts (even under distinct rep
    ids — the regression a truncated collapse key would introduce)."""
    import re

    copies = _SNM_BASE + [(101, _SNM_BASE[0][1].upper())]
    pairs = _snm_pairs(spark, copies)
    ids = {i for a, b, _ in pairs for i in (a, b)}
    assert 101 not in ids

    def canon(t: str) -> str:
        return re.sub(r"\s+", " ", t.lower().strip())

    texts = {i: t for i, t in copies}
    for a, b, j in pairs:
        assert canon(texts[a]) != canon(texts[b]), (a, b)


def test_pack_bins_decreasing_matches_reference_packing(spark):
    """Per shard, pack ids must equal the documented cumsum-window
    chunking (floor(exclusive cumsum / budget) over (cost DESC, id) —
    this recomputes the SAME formula, pinning determinism and the
    shard/window wiring, not independently verifying the discipline;
    test_pack_bins_vs_capacity_checked_nfd below does that), and
    pack_fill / pack_docs must be exact per-pack sums/counts."""
    from nyc_opendata_etl_spark.operators import curation

    rows = [(i, "word " * (5 + (i * 7) % 40) + f"tail{i}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = curation.pack_bins_decreasing(
        df, token_budget=64, n_shards=4
    ).collect()

    got = {r.doc_id: r for r in out}
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, members in by_shard.items():
        members.sort(key=lambda r: (-r.cost, r.doc_id))
        cum = 0
        for r in members:
            expect_local = cum // 64
            assert r.pack_id == shard * (1 << 40) + expect_local, r
            cum += r.cost
    # pack stats are exact aggregates of the membership
    packs: dict[int, list] = {}
    for r in out:
        packs.setdefault(r.pack_id, []).append(r)
    for pid, members in packs.items():
        fill = sum(r.cost for r in members)
        for r in members:
            assert r.pack_fill == fill and r.pack_docs == len(members)
    # the documented window laws: fill < budget + max member cost
    # (straddlers stay in their starting window), and per-shard fills
    # sum exactly to the shard's total cost (window phase, never lost
    # capacity)
    for shard, members in by_shard.items():
        shard_packs = sorted({r.pack_id for r in members})
        for pid in shard_packs:
            ms = packs[pid]
            assert ms[0].pack_fill < 64 + max(r.cost for r in ms)
        assert sum(packs[pid][0].pack_fill for pid in shard_packs) == sum(
            r.cost for r in members
        )
    # big docs claim earlier packs than small docs within their shard
    for shard, members in by_shard.items():
        local = [(r.cost, r.pack_id) for r in members]
        costs_desc = sorted({c for c, _ in local}, reverse=True)
        first_pack_of_max = min(p for c, p in local if c == costs_desc[0])
        assert first_pack_of_max == shard * (1 << 40)
    assert len(got) == 60


def test_pack_bins_vs_capacity_checked_nfd(spark):
    """Independent reference: a SEQUENTIAL capacity-checked next-fit
    simulator (opens a new bin when a doc overflows the current one —
    the recurrence the declarative plan can't express). The documented
    divergence bounds between it and the shipped cumsum-window
    discipline, per shard over the same (cost DESC, id) order:

    - per doc, window id <= NFD bin id (windows never waste capacity;
      each closed NFD bin holds <= budget, so the cumsum prefix before
      any doc is < (bin+1)*budget);
    - distinct windows used <= NFD bins opened (windows may skip ids
      but their max is bounded by the max bin id);
    - both disciplines conserve cost exactly (fills sum to the shard
      total).
    """
    from pyspark.sql import functions as F

    from nyc_opendata_etl_spark.operators import curation

    BUDGET = 64
    rows = [(i, "word " * (5 + (i * 7) % 40) + f"tail{i}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = curation.pack_bins_decreasing(
        df, token_budget=BUDGET, n_shards=4
    ).collect()

    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert by_shard  # the fixture populates every checked law

    for shard, members in by_shard.items():
        members.sort(key=lambda r: (-r.cost, r.doc_id))
        # sequential capacity-checked next-fit over the same order
        nfd_bin, nfd_fill, nfd_fills = 0, 0, []
        for r in members:
            if nfd_fill and nfd_fill + r.cost > BUDGET:
                nfd_fills.append(nfd_fill)
                nfd_bin += 1
                nfd_fill = 0
            win = r.pack_id - shard * (1 << 40)
            assert win <= nfd_bin, (shard, r.doc_id, win, nfd_bin)
            nfd_fill += r.cost
        nfd_fills.append(nfd_fill)

        used_windows = {r.pack_id for r in members}
        assert len(used_windows) <= len(nfd_fills)
        # both disciplines conserve the shard's total cost
        total = sum(r.cost for r in members)
        assert sum(nfd_fills) == total
        window_fills = {r.pack_id: r.pack_fill for r in members}
        assert sum(window_fills.values()) == total


def test_rerank_interaction_feature_laws(spark):
    """Coverage dominates: a doc containing all query terms outranks a
    doc spamming one term; absent-term docs get zero proximity and
    earliness; tf counts mirror the posting tokenization."""
    import math

    from pyspark.sql import functions as F

    from nyc_opendata_etl_spark.operators import text as T

    docs = spark.createDataFrame(
        [
            (1, "hash join vector engine notes"),  # all 3, tight, early
            (2, "hash hash hash hash hash hash hash hash"),  # 1 term spam
            (3, "intro text then hash later join and at the end vector"),
            (4, "nothing relevant at all here"),
        ],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3), (4, 4)], "doc_id long, rank int"
    )
    out = {
        r.doc_id: r
        for r in T.rerank_interaction(
            cand, docs, ["hash", "join", "vector"], topk=4
        ).collect()
    }
    assert out[1].rerank == 1  # full coverage + adjacency wins
    assert out[4].proximity == 0.0 and out[4].earliness == 0.0
    assert out[4].tf_score == 0.0 and out[4].coverage == 0.0
    # doc 2: tf=8 for one term -> tf_score = ln(9) alone, coverage 1/3
    assert abs(out[2].tf_score - round(math.log(9.0), 9)) < 1e-9
    assert abs(out[2].coverage - round(1 / 3, 9)) < 1e-9
    # doc 1: terms at positions 1..3 -> span 2, first 1
    assert abs(out[1].proximity - round(1.0 / 3.0, 9)) < 1e-9
    assert abs(out[1].earliness - 0.5) < 1e-9
    # coverage dominates the spam doc
    assert out[1].rerank_score > out[2].rerank_score
    # 1-indexed dense ranks, all four emitted
    assert sorted(r.rerank for r in out.values()) == [1, 2, 3, 4]


def test_snm_duplicates_cannot_bury_a_near_dup(spark):
    """Recall strictly improves: with window=1 and 3 identical copies
    planted BETWEEN a near-dup pair in sort order, the pre-collapse
    window compared doc 1 only against copies of itself; collapse-first
    still finds (1, 2)."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        # copies of doc 1's text with ids sorting after 1 — pre-collapse
        # these filled the window slot between 1 and 2
        (5, "alpha beta gamma delta epsilon zeta eta theta"),
        (6, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta extra"),
    ]
    pairs = _snm_pairs(spark, rows, window=1)
    assert any((a, b) == (1, 2) for a, b, _ in pairs)


def test_curriculum_order_round_robin_arithmetic(spark):
    """Positions are distinct, domain-interleaved round-robin, and
    easy-first within each domain — with NO global sort anywhere (the
    position is pure arithmetic over the per-domain rank)."""
    from nyc_opendata_etl_spark.operators import curation

    rows = []
    for d, dom in enumerate(["web", "code", "wiki"]):
        for i in range(4 if dom != "wiki" else 2):  # unequal sizes
            rows.append((d * 100 + i, dom, "tok " * (i + 1) + dom))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = curation.curriculum_order(df).collect()
    assert len(out) == len(rows)
    positions = [r.position for r in out]
    assert len(set(positions)) == len(positions)  # distinct by construction
    # round r occupies [r*n, (r+1)*n): domain index recoverable mod n
    for r in out:
        assert r.position == (r.rk - 1) * 3 + {"code": 0, "web": 1, "wiki": 2}[r.domain]
    # easy-first within domain: rk ascends with difficulty
    by_dom = {}
    for r in out:
        by_dom.setdefault(r.domain, []).append(r)
    for dom, members in by_dom.items():
        members.sort(key=lambda r: r.rk)
        diffs = [r.difficulty for r in members]
        assert diffs == sorted(diffs)
    # first full round holds one doc of each domain, in dom_idx order
    first_round = sorted(out, key=lambda r: r.position)[:3]
    assert [r.domain for r in first_round] == ["code", "web", "wiki"]
