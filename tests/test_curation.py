"""Unit tests for corpus-curation operators (operators/curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_opendata_etl_spark.operators import curation


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_decontaminate_flags_shared_shingles(spark):
    train = _docs(
        spark,
        [
            (1, "the quick brown fox jumps", "en"),   # shares 3-grams with eval 100
            (2, "totally unrelated content here", "en"),
            (3, "short", "en"),                        # < 3 tokens -> no shingles
        ],
    )
    eval_set = _docs(spark, [(100, "the quick brown fox runs", "en")])
    out = {r.doc_id: r for r in curation.decontaminate(train, eval_set).collect()}
    assert set(out) == {1}
    # shared: "the quick brown", "quick brown fox" (not "brown fox jumps")
    assert out[1].n_shared_shingles == 2
    assert out[1].n_eval_docs_hit == 1


def test_pack_sequences_respects_budget_boundaries(spark):
    # one shard so the greedy order is fully determined
    docs = _docs(
        spark, [(i, " ".join(["w"] * 100), "en") for i in range(10)]
    )
    out = curation.pack_sequences(docs, token_budget=256, n_shards=1).collect()
    by_id = {r.doc_id: r for r in out}
    assert all(r.n_tokens == 100 for r in out)
    assert all(r.shard == 0 for r in out)
    # exclusive cumsum: docs 0,1,2 (cum 0,100,200) -> pack 0; 3,4,5 (300..500)
    # -> pack 1; 6,7 (600,700) -> pack 2 ... floor(cum/256)
    expect = {i: (i * 100) // 256 for i in range(10)}
    assert {i: by_id[i].pack_id for i in range(10)} == expect


def test_pack_sequences_sharding_is_deterministic_partition(spark):
    docs = _docs(spark, [(i, "a b c", "en") for i in range(50)])
    out = curation.pack_sequences(docs, n_shards=4)
    shards = {r.shard for r in out.select("shard").distinct().collect()}
    assert shards <= set(range(4)) and len(shards) > 1
    # pack ids never collide across shards (disjoint 2^40 ranges — 2^32
    # collided shard ranges at ~2e12 tokens/shard, round-10 review)
    rows = out.collect()
    assert all((r.pack_id >> 40) == r.shard for r in rows)


def test_stratified_sample_exact_k_and_deterministic(spark):
    docs = _docs(
        spark,
        [(i, f"text {i}", "en" if i % 2 == 0 else "fr") for i in range(100)],
    )
    a = sorted(map(tuple, curation.stratified_sample(docs, "lang", k=5).collect()))
    b = sorted(map(tuple, curation.stratified_sample(docs, "lang", k=5).collect()))
    assert a == b  # seedless determinism
    per = {}
    for lang, _id, rk in a:
        per.setdefault(lang, []).append(rk)
    assert {k: sorted(v) for k, v in per.items()} == {
        "en": [1, 2, 3, 4, 5], "fr": [1, 2, 3, 4, 5]
    }


def test_ngram_topk_counts_occurrences_not_distinct(spark):
    docs = _docs(spark, [(1, "a b a b", "en"), (2, "a b x", "en")])
    out = curation.ngram_topk(docs, n=2, k=2).collect()
    # "a b" occurs 2x in doc1 ("a b","b a","a b") + 1x in doc2 = 3
    assert out[0].ngram == "a b" and out[0].n_occurrences == 3


def test_domain_mix_fractions_sum_to_one(spark):
    docs = spark.createDataFrame(
        [(1, "a b", "en", "s1"), (2, "c", "en", "s2"), (3, "d e f", "fr", "s1")],
        "doc_id long, text string, lang string, source string",
    )
    out = curation.domain_mix(docs).collect()
    # fractions are rounded to 6 dp, so the sum is 1 only within
    # n_cells * 5e-7
    assert abs(sum(r.frac_docs for r in out) - 1.0) < len(out) * 5e-7 + 1e-9
    assert abs(sum(r.frac_tokens for r in out) - 1.0) < len(out) * 5e-7 + 1e-9
    cell = {(r.lang, r.source): r for r in out}
    assert cell[("fr", "s1")].n_tokens == 3
    assert cell[("en", "s1")].frac_docs == round(1 / 3, 6)


def test_chunk_documents_window_math(spark):
    # chunk=4, overlap=1 -> stride 3; 10 tokens -> chunks at 0,3,6 cover
    # [0,4) [3,7) [6,10): ceil((10-4)/3)+1 = 3 chunks, last ends exactly at n.
    docs = _docs(spark, [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9", "en")])
    out = (
        curation.chunk_documents(docs, chunk_tokens=4, overlap=1)
        .orderBy("chunk_id")
        .collect()
    )
    assert [(r.chunk_id, r.n_chunk_tokens, r.chunk_text) for r in out] == [
        (0, 4, "t0 t1 t2 t3"),
        (1, 4, "t3 t4 t5 t6"),
        (2, 4, "t6 t7 t8 t9"),
    ]


def test_chunk_documents_short_tail_and_empty(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c", "en"),        # n < chunk -> single short chunk
            (2, "a b c d e", "en"),    # n=5, chunk=4, stride 3 -> 2nd chunk is 2 tokens
            (3, "   \t ", "en"),       # whitespace only -> no chunks
            (4, "", "en"),             # empty -> no chunks
        ],
    )
    out = curation.chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.n_chunk_tokens, r.chunk_text))
    for v in by_doc.values():
        v.sort()
    assert by_doc == {
        1: [(0, 3, "a b c")],
        2: [(0, 4, "a b c d"), (1, 2, "d e")],
    }
    # every token index is covered by at least one chunk (no gaps at tails)
    import pytest

    with pytest.raises(ValueError):
        curation.chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_chunk_documents_reconstruct_original_tokens(spark):
    """Lossless-coverage invariant on randomized inputs: dropping the
    first `overlap` tokens of every chunk after the first and
    concatenating must reproduce the document's token sequence exactly
    (consecutive chunks overlap by exactly `overlap` tokens, including
    the short last chunk)."""
    import random

    rng = random.Random(20260813)
    rows = []
    for i in range(200):
        n = rng.randint(0, 40)
        rows.append((i, " ".join(f"w{rng.randint(0, 9)}" for _ in range(n)), "en"))
    docs = _docs(spark, rows)
    C, V = 7, 3
    out = curation.chunk_documents(docs, chunk_tokens=C, overlap=V).collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk_text.split(" ")
    for doc_id, text, _lang in rows:
        expect = [t for t in text.split(" ") if t]
        chunks = got.get(doc_id, {})
        if not expect:
            assert chunks == {}, doc_id
            continue
        rebuilt = []
        for cid in sorted(chunks):
            toks = chunks[cid]
            rebuilt.extend(toks if cid == 0 else toks[V:])
        assert rebuilt == expect, doc_id
