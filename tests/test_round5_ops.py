"""Semantic invariants of the round-5 operators, beyond the value
oracles: partition/cardinality laws that must hold at any scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_opendata_etl_spark.operators.similarity import kmeans_iterations
from nyc_opendata_etl_spark.queries import queries
from nyc_opendata_etl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_kmeans_partitions_all_vectors(spark):
    """Every vector lands in exactly one cluster: per-dim member counts
    are identical across dims and sum to N over the k clusters."""
    emb = load_table(spark, SF, "embeddings")
    n = emb.count()
    out = kmeans_iterations(emb, k=8, iterations=2)
    per_dim = (
        out.groupBy("dim").agg(F.sum("n_members").alias("total")).collect()
    )
    assert per_dim and all(r.total == n for r in per_dim)
    assert out.select("cent_id").distinct().count() == 8


def test_kmeans_one_iteration_matches_update_step(spark):
    """kmeans_iterations(1) must equal the registered single update
    step — same assignment, same means."""
    emb = load_table(spark, SF, "embeddings")
    a = kmeans_iterations(emb, k=8, iterations=1)
    b = queries()["embedding_kmeans_update"](spark, SF)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_attribution_credit_is_within_window_and_causal(spark):
    rows = queries()["events_attribution"](spark, SF).collect()
    assert rows
    attributed = [r for r in rows if r.attributed_click_id is not None]
    assert attributed, "no purchase got credit at test scale"
    for r in attributed:
        assert 0 <= r.seconds_since_click <= 3600
    # unattributed rows carry no dangling seconds
    for r in rows:
        if r.attributed_click_id is None:
            assert r.seconds_since_click is None


def test_cdc_apply_keeps_only_latest_surviving_version(spark):
    events = load_table(spark, SF, "events")
    out = queries()["cdc_apply_changelog"](spark, SF)
    # one row per surviving key, never more
    assert out.groupBy("user_id").count().filter("count > 1").count() == 0
    # a key whose last event is a tombstone must be absent
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    last = (
        events.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "event_type")
    )
    deleted = {r.user_id for r in last.filter("event_type = 'error'").collect()}
    emitted = {r.user_id for r in out.collect()}
    assert not (deleted & emitted)
    # and together they cover every user
    all_users = {r.user_id for r in events.select("user_id").distinct().collect()}
    assert deleted | emitted == all_users


def test_weighted_sample_rate_tracks_length(spark):
    """Longer documents must be kept at a higher rate than shorter ones
    (the point of length-proportional sampling), and the keep decision
    must be a pure function of doc_id (re-run = same set)."""
    docs = load_table(spark, SF, "documents")
    kept = queries()["corpus_sample_weighted"](spark, SF)
    kept2 = queries()["corpus_sample_weighted"](spark, SF)
    assert kept.exceptAll(kept2).count() == 0
    med = docs.agg(F.percentile("n_chars", F.lit(0.5))).first()[0]
    short_total = docs.filter(F.col("n_chars") < med).count()
    long_total = docs.filter(F.col("n_chars") >= med).count()
    short_kept = kept.filter(F.col("n_chars") < med).count()
    long_kept = kept.filter(F.col("n_chars") >= med).count()
    assert long_kept / long_total > short_kept / short_total


def test_boilerplate_counts_docs_not_occurrences(spark):
    """A 3-gram repeated many times inside one document counts once:
    doc_freq can never exceed the number of documents."""
    out = queries()["text_boilerplate_ngrams"](spark, SF).collect()
    n_docs = load_table(spark, SF, "documents").count()
    assert out
    assert all(1 <= r.doc_freq <= n_docs for r in out)
