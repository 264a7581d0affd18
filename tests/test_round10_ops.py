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
    ids of non-representative copies cannot appear, and no jaccard-1.0
    pair of byte-identical canons is emitted."""
    copies = _SNM_BASE + [(101, _SNM_BASE[0][1].upper())]
    pairs = _snm_pairs(spark, copies)
    ids = {i for a, b, _ in pairs for i in (a, b)}
    assert 101 not in ids


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
