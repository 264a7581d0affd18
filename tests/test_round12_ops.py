"""Round-12 pins: the advisor fixes — split/filter/rejoin URL param
normalization (the stray-'&' defect class), the self-describing LSH
bucket index (params record + probe validation), and NULL-best-sim
(zero-norm vector) exclusion from IVF assignment.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_opendata_etl_spark.operators import dedup, similarity


def _norm(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.n for r in df.select(dedup.normalize_url("url").alias("n")).collect()]


# ── normalize_url split/filter/rejoin (advisor r11, low) ────────────


def test_normalize_url_utm_first_no_stray_amp(spark):
    # the defect case: utm param FIRST, real param after — the old
    # regex form produced 'https://a.com/x&page=2' (stray '&'), which
    # under-merged vs the '?page=2' form AND could collide with a raw
    # URL whose PATH literally ends in 'x&page=2'
    out = _norm(
        spark,
        [
            "https://a.com/x?utm_s=1&page=2",
            "https://a.com/x?page=2",
            "https://a.com/x?page=2&utm_s=1",
            "https://a.com/x?utm_a=1&page=2&utm_b=2",
        ],
    )
    assert set(out) == {"https://a.com/x?page=2"}


def test_normalize_url_no_path_collision_with_literal_amp(spark):
    # a genuinely different raw URL whose path contains 'x&page=2'
    # must NOT merge with the utm-stripped query form
    out = _norm(
        spark,
        [
            "https://a.com/x&page=2",  # '&' literally in the path
            "https://a.com/x?utm_s=1&page=2",
        ],
    )
    assert out[0] == "https://a.com/x&page=2"
    assert out[1] == "https://a.com/x?page=2"
    assert out[0] != out[1]


def test_normalize_url_param_edge_runs(spark):
    # '&&' runs collapse, bare '?' drops, trailing '&' drops
    assert _norm(
        spark,
        [
            "https://a.com/x?a=1&&b=2",
            "https://a.com/x?",
            "https://a.com/x?a=1&",
            "https://a.com/x?&a=1",
        ],
    ) == [
        "https://a.com/x?a=1&b=2",
        "https://a.com/x",
        "https://a.com/x?a=1",
        "https://a.com/x?a=1",
    ]


def test_normalize_url_slash_variant_with_live_params_merges(spark):
    # path trim now runs BEFORE the surviving query re-attaches
    assert set(
        _norm(spark, ["https://a.com/x/?page=2", "https://a.com/x?page=2"])
    ) == {"https://a.com/x?page=2"}


def test_normalize_url_second_question_mark_stays_in_query(spark):
    # split is at the FIRST '?' only; later '?' belong to the query
    assert _norm(spark, ["https://a.com/x?q=a?b"]) == ["https://a.com/x?q=a?b"]


def test_normalize_url_still_idempotent(spark):
    urls = [
        "https://a.com/x?utm_s=1&page=2",
        "https://a.com/x?a=1&&b=2&",
        "https://WWW.a.com/x/?utm_a=1&p=2#frag",
        "https://a.com/x&page=2",
    ]
    once = _norm(spark, urls)
    assert _norm(spark, once) == once


def test_normalize_url_spark_matches_duckdb_twin(spark):
    import duckdb

    urls = [
        "https://a.com/x?utm_s=1&page=2",
        "https://a.com/x?page=2",
        "https://a.com/x&page=2",
        "https://a.com/x?a=1&&b=2&",
        "https://a.com/x?",
        "HTTPS://WWW.A.com/x/?utm_a=1&p=2#frag",
        "https://www.www.a.com/p/",
        "https://a.com/r?to=https://www.b.com/x",
        "https://a.com/x?q=a?b",
        "not a url",
    ]
    got_spark = _norm(spark, urls)
    expr = dedup.NORMALIZE_URL_ORACLE.format(u="url")
    con = duckdb.connect()
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {expr} FROM (SELECT unnest(?) AS url)", [urls]
        ).fetchall()
    ]
    assert got_spark == got_duck


# ── self-describing LSH bucket index (advisor r11, medium) ──────────


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again!"),
        (2, "completely different text about spark physical planning xyz"),
        (3, "the quick brown fox jumps over the lazy dog again and again"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_index_params_roundtrip(spark, tmp_path):
    path = str(tmp_path / "lsh_idx")
    docs = _docs(spark)
    dedup.build_lsh_bucket_index(
        docs.filter(F.col("doc_id") % 2 == 0), path, num_hashes=16, bands=4
    )
    p = spark.read.parquet(f"{path}/params").first()
    assert (p["num_hashes"], p["bands"]) == (16, 4)
    # matching probe runs; batch doc 3 is byte-identical to corpus
    # doc 0 (same canon → same signature → certain collision)
    out = dedup.incremental_near_dups(
        docs.filter(F.col("doc_id") % 2 == 1), path, num_hashes=16, bands=4
    ).collect()
    matches = {r["doc_id"]: r["corpus_match"] for r in out}
    assert matches[3] == 0
    assert set(matches) <= {1, 3}


def test_lsh_index_param_mismatch_raises(spark, tmp_path):
    path = str(tmp_path / "lsh_idx2")
    dedup.build_lsh_bucket_index(_docs(spark), path, num_hashes=16, bands=4)
    with pytest.raises(ValueError, match="num_hashes=8"):
        dedup.incremental_near_dups(
            _docs(spark), path, num_hashes=8, bands=4
        )
    with pytest.raises(ValueError, match="bands=2"):
        dedup.incremental_near_dups(
            _docs(spark), path, num_hashes=16, bands=2
        )


# ── zero-norm vectors excluded from IVF assignment (advisor r11) ────


def test_ivf_assign_drops_zero_norm_vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),  # near centroid 0
        (3, [0.0, 0.0, 0.0, 0.0]),  # zero-norm garbage
        (4, [0.1, 0.9, 0.0, 0.0]),  # near centroid 1
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity._ivf_assign(emb, 2, "vec_id", "embedding").collect()
    got = {r["id"]: r["cid"] for r in out}
    # the zero-norm vector is EXCLUDED, not piled onto cid 0
    assert 3 not in got
    assert got == {0: 0, 1: 1, 2: 0, 4: 1}


def test_ivf_assign_zero_norm_centroid_never_wins(spark):
    rows = [
        (0, [0.0, 0.0]),  # zero-norm seed centroid
        (1, [0.0, 1.0]),
        (2, [0.1, 0.9]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity._ivf_assign(emb, 2, "vec_id", "embedding").collect()
    got = {r["id"]: r["cid"] for r in out}
    # vectors with a real-sim centroid available pick it; the zero-norm
    # centroid 0 captures nothing, and vector 0 itself (zero-norm) drops
    assert got == {1: 1, 2: 1}


# ── incremental IVF-PQ index maintenance (VERDICT r11 item 2) ───────


def test_update_ivfpq_index_equals_oneshot_against_build_quantizers(
    spark, tmp_path
):
    """build(evens) + update(odds) must serve the SAME codes relation
    as one-shot routing/encoding of the full corpus against the
    build-half quantizers — the add()-without-retraining contract."""
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    inc_path = str(tmp_path / "inc")
    similarity.build_ivfpq_index(emb.filter(F.col("vec_id") % 2 == 0), inc_path)
    similarity.update_ivfpq_index(emb.filter(F.col("vec_id") % 2 == 1), inc_path)

    # one-shot: route + encode ALL vectors against the build-half
    # quantizers (read back from the staged index)
    cents = spark.read.parquet(f"{inc_path}/centroids")
    cb = spark.read.parquet(f"{inc_path}/codebook")
    assigned = similarity._ivf_assign(emb, 16, "vec_id", "embedding", cents=cents)
    subs = similarity._sub_rows(
        emb, 8, 8, "embedding", F.col("vec_id"), "id", "sub"
    )
    expect = {
        (r["id"], r["m"]): (r["code"], r["cid"])
        for r in similarity._pq_encode_against(subs, cb)
        .join(assigned, "id")
        .collect()
    }
    got = {
        (r["id"], r["m"]): (r["code"], r["cid"])
        for r in spark.read.parquet(f"{inc_path}/codes").collect()
    }
    assert got == expect
    assert len(got) == 40 * 8  # every vector, every subspace, exactly once


def test_update_ivfpq_index_appends_not_overwrites(spark, tmp_path):
    rows = [(i, [float(i + 1)] * 8 + [0.0] * 56) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "idx")
    similarity.build_ivfpq_index(emb.filter(F.col("vec_id") < 16), path)
    before = spark.read.parquet(f"{path}/codes").count()
    similarity.update_ivfpq_index(emb.filter(F.col("vec_id") >= 16), path)
    after = spark.read.parquet(f"{path}/codes").count()
    assert before == 16 * 8
    assert after == 20 * 8  # build rows intact, update rows appended
