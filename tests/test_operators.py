"""Operator-level tests: assign_keys join semantics (null natural keys
MATCH, missing-field fallback), dim builds, dedup, similarity.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nyc_opendata_etl_spark.operators import dedup, similarity
from nyc_opendata_etl_spark.operators.dims import (
    build_dim,
    build_dim_first_per_group,
    date_dim,
    time_dim,
)
from nyc_opendata_etl_spark.operators.keys import assign_keys
from tests.test_hashing import ref_hash


def test_assign_keys_basic_and_null_matching(spark):
    dim = spark.createDataFrame(
        [("brooklyn", "11201"), ("queens", None)], ["boro", "zip"]
    )
    fact = spark.createDataFrame(
        [(1, "brooklyn", "11201"), (2, "queens", None), (3, "bronx", "10451")],
        ["id", "boro", "zip"],
    )
    out = assign_keys(fact, dim, ["boro", "zip"], "loc_key")
    rows = {r["id"]: r["loc_key"] for r in out.collect()}
    # row 1: plain match
    assert rows[1] == ref_hash("brooklyn", "11201")
    # row 2: NULL zip matches NULL zip (pandas 'nan'-string semantics)
    assert rows[2] == ref_hash("queens", "nan")
    # row 3: no dim row -> NULL key
    assert rows[3] is None
    # natural-key cols dropped like the reference
    assert set(out.columns) == {"id", "loc_key"}


def test_assign_keys_missing_field_fallback(spark):
    dim = spark.createDataFrame([("x",)], ["a"])
    fact = spark.createDataFrame([(1, "x")], ["id", "a"])
    # dim lacks field 'b' -> typed NULL key, fact unchanged
    out = assign_keys(fact, dim, ["a", "b"], "k")
    assert out.columns == ["id", "a", "k"]
    assert out.collect()[0]["k"] is None
    # empty dim -> same fallback
    out2 = assign_keys(fact, dim.filter(F.lit(False)), ["a"], "k")
    assert out2.collect()[0]["k"] is None


def test_assign_keys_idempotent(spark):
    """Property from SURVEY §5: assign_keys twice == once (the join is a
    pure function of content)."""
    dim = spark.createDataFrame([("a",), ("b",)], ["g"])
    fact = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "g"])
    once = {(r["id"], r["k"]) for r in assign_keys(fact, dim, ["g"], "k").collect()}
    again = {(r["id"], r["k"]) for r in assign_keys(fact, dim, ["g"], "k").collect()}
    assert once == again
    assert once == {(1, ref_hash("a")), (2, ref_hash("b")), (3, None)}


def test_build_dim_normalizes_and_dedupes(spark):
    raw = spark.createDataFrame(
        [("  NYPD ", "Police"), ("nypd", "POLICE "), ("DOT", "Transport")],
        ["agency", "agency_name"],
    )
    dim = build_dim(raw, ["agency", "agency_name"], "agency_key")
    rows = sorted(
        (r["agency"], r["agency_name"], r["agency_key"]) for r in dim.collect()
    )
    assert rows == [
        ("dot", "transport", ref_hash("dot", "transport")),
        ("nypd", "police", ref_hash("nypd", "police")),
    ]


def test_build_dim_first_per_group_deterministic(spark):
    df = spark.createDataFrame(
        [(21, "No parking"), (21, "Alt description"), (14, "Hydrant")],
        ["violation_code", "violation_description"],
    )
    out = build_dim_first_per_group(
        df, ["violation_code"], ["violation_description"]
    )
    rows = {r["violation_code"]: r["violation_description"] for r in out.collect()}
    assert rows == {21: "Alt description", 14: "Hydrant"}


def test_generated_dims(spark):
    import datetime as dt

    dd = date_dim(spark, dt.date(2024, 1, 1), dt.date(2024, 1, 3)).collect()
    assert [r["date_key"] for r in dd] == [20240101, 20240102, 20240103]
    assert dd[0]["weekday"] == "Monday"
    td = time_dim(spark)
    assert td.count() == 1440
    keys = [r["time_key"] for r in td.collect()]
    assert keys[0] == 0 and keys[-1] == 235900 and keys[61] == 10100


def test_exact_dedup_and_fingerprint(spark):
    docs = spark.createDataFrame(
        [
            (1, "Hello  World"),
            (2, "hello world"),   # same canonical form
            (3, "different doc"),
        ],
        ["doc_id", "text"],
    )
    groups = dedup.exact_dedup_groups(docs).collect()
    by_keep = {r["keep_id"]: r["n_copies"] for r in groups}
    assert by_keep == {1: 2, 3: 1}


def test_word_shingles_and_minhash(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "x y"), (4, "totally different text here")],
        ["doc_id", "text"],
    )
    sh = docs.select(dedup.word_shingles("text").alias("s")).collect()
    assert sh[0]["s"] == ["a b c", "b c d"]
    assert sh[2]["s"] == []  # shorter than n -> empty

    pairs = dedup.minhash_lsh_pairs(docs).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


def test_simhash_identical_and_different(spark):
    docs = spark.createDataFrame(
        [(1, "spark is fast"), (2, "Spark  IS  fast"), (3, "ducks quack loudly")],
        ["doc_id", "text"],
    )
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]


def test_ngram_jaccard_pairs(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely unrelated content goes here now"),
        ],
        ["doc_id", "text"],
    )
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    # 9 tokens -> 7 shingles each; only the last shingle differs:
    # |A∩B| = 6, |A∪B| = 8 -> 0.75
    assert math.isclose(pairs[0]["jaccard"], 0.75, abs_tol=1e-6)


def test_cosine_topk(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0]),    # identical -> sim 1.0
        (2, [0.0, 1.0, 0.0]),    # orthogonal -> 0.0
        (3, [-1.0, 0.0, 0.0]),   # opposite -> -1.0
        (4, [1.0, 1.0, 0.0]),    # cos = 1/sqrt(2)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = similarity.cosine_topk(df, query_vec_id=0, k=4).collect()
    got = [(r["vec_id"], r["cosine_sim"]) for r in out]
    assert got[0] == (1, 1.0)
    assert got[1][0] == 4 and math.isclose(got[1][1], 0.707107, abs_tol=1e-6)
    assert got[2] == (2, 0.0)
    assert got[3] == (3, -1.0)


def test_cosine_neardup_pairs(spark):
    import math as _m

    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0]),      # orthogonal
        (3, [0.7, 0.7, 0.0]),      # ~0.707 to both 0 and 2
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in similarity.cosine_neardup_pairs(df, threshold=0.9).collect()
    }
    assert set(out) == {(0, 1)}
    expect = 0.999 / _m.sqrt(0.999**2 + 0.01**2)
    assert abs(out[(0, 1)] - expect) < 1e-6
    # lower threshold pulls in the diagonal vector, ordered pairs only
    out2 = similarity.cosine_neardup_pairs(df, threshold=0.7).collect()
    assert {(r.id_a, r.id_b) for r in out2} == {(0, 1), (0, 3), (1, 3), (2, 3)}
    assert all(r.id_a < r.id_b for r in out2)


def test_ann_ivf_topk_finds_in_probed_cells(spark):
    # 2 obvious clusters; centroids seeded from ids 0/1; query = 0
    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.99, 0.1]),
        (3, [0.98, 0.2]),
        (4, [0.1, 0.99]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = similarity.ann_ivf_topk(df, query_vec_id=0, n_centroids=2, n_probe=1, k=2)
    got = [r.vec_id for r in out.collect()]
    # probing only the query's own cell finds its cluster-mates, ranked
    assert got == [2, 3]


def test_rolling_hash_order_sensitive(spark):
    from nyc_opendata_etl_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta alpha"), (3, "alpha beta"), (4, "")],
        ["doc_id", "text"],
    )
    rows = {
        r.doc_id: r.h
        for r in df.select(
            "doc_id", text_ops.rolling_hash("text").alias("h")
        ).collect()
    }
    assert rows[1] == rows[3]          # deterministic
    assert rows[1] != rows[2]          # order-sensitive
    assert rows[4] == 0                # empty -> seed
    # matches the reference fold in pure Python
    expect = 0
    for tok in ["alpha", "beta"]:
        expect = (expect * 31 + ref_hash(tok)) % 1_000_000_000
    assert rows[1] == expect


def test_tfidf_top_terms(spark):
    from nyc_opendata_etl_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [
            (1, "apple apple banana common"),
            (2, "banana cherry common"),
            (3, "cherry date common"),
        ],
        ["doc_id", "text"],
    )
    out = text_ops.tfidf_top_terms(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rk, r.term, r.tfidf))
    # 'common' appears in every doc -> idf = ln(1) = 0, never a top term
    assert all(t != "common" for terms in by_doc.values() for _, t, _ in terms)
    # doc 1: apple (tf=2, df=1) dominates
    assert sorted(by_doc[1])[0][1] == "apple"
    assert all(len(v) == 2 for v in by_doc.values())


def test_duplicate_clusters(spark):
    # two components: {1,2,3} via chain 1-2, 2-3; {7,9}; pair order mixed
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (9, 7)], "id_a long, id_b long"
    )
    out = {r.doc_id: r.cluster_id for r in dedup.duplicate_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_duplicate_clusters_raises_on_non_convergence(spark):
    # a 10-hop chain cannot converge in 2 rounds of propagation; the op
    # must refuse rather than silently return split clusters
    import pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.duplicate_clusters(chain, max_iter=2)
    # ...and with enough rounds the same chain is one cluster
    out = {r.doc_id: r.cluster_id for r in dedup.duplicate_clusters(chain).collect()}
    assert set(out.values()) == {0}


def test_salted_join_matches_plain(spark):
    from nyc_opendata_etl_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(i % 3, i, float(i)) for i in range(100)], "k long, rid long, v double"
    )
    dim = spark.createDataFrame([(0, "x"), (1, "y"), (2, "z")], "k long, name string")
    salted = salted_join(fact, dim, "k", buckets=8, salt_source=F.col("rid"))
    plain = fact.join(dim, "k")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_two_phase_count_distinct(spark):
    from nyc_opendata_etl_spark.operators.skew import two_phase_count_distinct

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 5)], "g string, x long"
    )
    out = {r.g: r.n for r in two_phase_count_distinct(df, ["g"], "x", "n").collect()}
    assert out == {"a": 2, "b": 1}


def test_ewma_last_per_key(spark):
    from nyc_opendata_etl_spark.operators.grouped import ewma_last_per_key

    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0), (2, 1, 5.0)],
        "user_id long, ts long, value double",
    )
    out = {r.user_id: r.ewma for r in
           ewma_last_per_key(df, "user_id", "ts", "value", alpha=0.5).collect()}
    # fold: 10 -> 0.5*20+0.5*10=15 -> 0.5*30+0.5*15=22.5
    assert out[1] == 22.5
    assert out[2] == 5.0  # single value: state = x


def test_validate_expectations(spark):
    from nyc_opendata_etl_spark.operators.quality import validate

    df = spark.createDataFrame(
        [(1, 10.0), (2, -3.0), (3, None)], "id long, v double"
    )
    out = {r.rule: (r.n_rows, r.n_failed, r.pass_ratio) for r in validate(
        df, {"v_positive": F.col("v") > 0, "v_present": F.col("v").isNotNull()}
    ).collect()}
    # NULL comparison counts as failure, not unknown-pass
    assert out["v_positive"] == (3, 2, round(1 / 3, 6))
    assert out["v_present"] == (3, 1, round(2 / 3, 6))


def test_scd2_merge_paths(spark):
    """All four merge paths plus null-safe change detection."""
    import datetime as dt
    from nyc_opendata_etl_spark.operators.scd import scd2_merge

    d0, d1, eff = dt.date(2023, 1, 1), dt.date(2024, 1, 1), dt.date(2025, 6, 1)
    dim = spark.createDataFrame(
        [
            (1, "a", d1, None, True),     # changed by update
            (2, "b", d1, None, True),     # no-op update
            (3, "c", d1, None, True),     # no update at all
            (4, None, d1, None, True),    # NULL -> value change (null-safe)
            (1, "a0", d0, d1, False),     # history row: must pass through
        ],
        "k long, attr string, effective_from date, effective_to date, is_current boolean",
    )
    updates = spark.createDataFrame(
        [(1, "a2", eff), (2, "b", eff), (4, "d", eff), (9, "z", eff)],
        "k long, attr string, eff_date date",
    )
    out = scd2_merge(dim, updates, ["k"], ["attr"])
    rows = {(r.k, r.attr, r.effective_from, r.effective_to, r.is_current)
            for r in out.collect()}
    assert rows == {
        (1, "a", d1, eff, False),      # closed
        (1, "a2", eff, None, True),    # opened
        (2, "b", d1, None, True),      # no-op passes through
        (3, "c", d1, None, True),      # untouched
        (4, None, d1, eff, False),     # null attr closed (IS DISTINCT FROM)
        (4, "d", eff, None, True),
        (9, "z", eff, None, True),     # fresh insert
        (1, "a0", d0, d1, False),      # history untouched
    }


def test_rollup_merge_batching_invariant(spark):
    """state ⊕ (b1 ⊕ b2) == (state ⊕ b1) ⊕ b2 == full recompute."""
    from nyc_opendata_etl_spark.operators.rollup import (
        aggregate_batch,
        merge_rollup,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 5.0), ("b", 2.0), ("a", -3.0), ("b", 7.0)],
        "g string, v double",
    )
    keys, measures = ["g"], {"v": ("sum", "min", "max")}
    full = {tuple(r) for r in aggregate_batch(df, keys, measures).collect()}

    b1 = aggregate_batch(df.limit(2), keys, measures)
    b2 = aggregate_batch(df.subtract(df.limit(2)), keys, measures)
    merged = merge_rollup(b1, b2, keys, measures)
    assert {tuple(r) for r in merged.collect()} == full


def test_pagerank_int_matches_pure_python_recurrence(spark):
    """pagerank_int's fixed-point recurrence vs an independent pure-
    Python replica on a small asymmetric weighted graph — and the
    result must be partitioning-independent (exact integer math)."""
    from pyspark.sql import functions as F

    from nyc_opendata_etl_spark.operators.graph import (
        DAMP_DEN,
        DAMP_NUM,
        SCALE,
        pagerank_int,
    )

    node_ids = [0, 1, 2, 3]
    edge_rows = [(0, 1, 3), (0, 2, 1), (1, 2, 2), (2, 0, 5), (3, 0, 1)]
    nodes = spark.createDataFrame([(i,) for i in node_ids], "node_id long")
    edges = spark.createDataFrame(edge_rows, "src long, dst long, weight long")

    k = 3
    got = {
        r.node_id: r.rank_scaled
        for r in pagerank_int(nodes, edges.repartition(7), iterations=k).collect()
    }

    init = SCALE // len(node_ids)
    base = init * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    w_out = {}
    for s, _d, w in edge_rows:
        w_out[s] = w_out.get(s, 0) + w
    r = {i: init for i in node_ids}
    for _ in range(k):
        s_in = {i: 0 for i in node_ids}
        for s, d, w in edge_rows:
            s_in[d] += r[s] * w // w_out[s]
        r = {i: base + DAMP_NUM * s_in[i] // DAMP_DEN for i in node_ids}
    assert got == r
    # node 3 has no in-edges -> pure teleport base
    assert got[3] == base


def test_audit_constraints_detects_violations(spark):
    from nyc_opendata_etl_spark.operators.quality import audit_constraints

    parent = spark.createDataFrame([(1,), (2,)], "pid long")
    child = spark.createDataFrame(
        [(10, 1), (11, 1), (11, 2), (12, 99), (13, None)],
        "cid long, fk long",
    )
    out = {
        r.constraint: r.n_violations
        for r in audit_constraints(
            pk_checks={"pk_child": (child, ["cid"])},
            fk_checks={"fk_child_parent": (child, ["fk"], parent, ["pid"])},
        ).collect()
    }
    assert out == {
        "pk_child": 1,          # cid=11 appears twice
        "fk_child_parent": 1,   # fk=99 orphaned; NULL fk is not an orphan
    }


def test_scd1_merge_upsert_semantics(spark):
    from nyc_opendata_etl_spark.operators.scd import scd1_merge

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double",
    )
    updates = spark.createDataFrame(
        [(2, "B", 22.0), (4, "d", 40.0)], "k long, name string, v double"
    )
    got = {r.k: (r.name, r.v) for r in scd1_merge(base, updates, ["k"]).collect()}
    assert got == {
        1: ("a", 10.0),   # untouched base row carries through
        2: ("B", 22.0),   # matched row overwritten
        3: ("c", 30.0),
        4: ("d", 40.0),   # unmatched update inserts
    }


def test_scd1_merge_preserves_null_updates_vs_missing(spark):
    """A matched update with a NULL attribute keeps the base value
    (coalesce semantics — Type 1 merges carry forward what the update
    doesn't state)."""
    from pyspark.sql import functions as F

    from nyc_opendata_etl_spark.operators.scd import scd1_merge

    base = spark.createDataFrame([(1, "a", 10.0)], "k long, name string, v double")
    updates = spark.createDataFrame(
        [(1, None, 11.0)], "k long, name string, v double"
    )
    row = scd1_merge(base, updates, ["k"]).collect()[0]
    assert (row.name, row.v) == ("a", 11.0)


def test_scd1_merge_overwrite_writes_null_updates(spark):
    """null_updates='overwrite' is ANSI MERGE WHEN MATCHED THEN UPDATE:
    the update row replaces the base row verbatim, NULLs included."""
    from nyc_opendata_etl_spark.operators.scd import scd1_merge

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k long, name string, v double"
    )
    updates = spark.createDataFrame(
        [(1, None, 11.0)], "k long, name string, v double"
    )
    got = {
        r.k: (r.name, r.v)
        for r in scd1_merge(
            base, updates, ["k"], null_updates="overwrite"
        ).collect()
    }
    assert got == {1: (None, 11.0), 2: ("b", 20.0)}

    import pytest

    with pytest.raises(ValueError):
        scd1_merge(base, updates, ["k"], null_updates="bogus")
