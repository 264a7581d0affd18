"""Approximation-quality regression tests for the rows-only operators.

The approximate operators are deterministic (fixed hashes, planes, seed
centroids), so their quality against the exact ground truth is a stable
number per dataset — these tests pin it at sf0.01 and fail on any change
that silently degrades recall or error. Bounds are the measured round-1
values with honest slack, and double as documentation of each trade.
"""

from __future__ import annotations

import duckdb
import pytest

from nyc_opendata_etl_spark.queries import queries

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def qs():
    return queries()


def test_minhash_lsh_candidate_recall(spark, qs):
    """MinHash(16)/4-band candidates must cover (nearly) all true
    Jaccard>=0.8 pairs — measured 100% recall at sf0.01; theory for
    s=0.8 is 1-(1-s^4)^4 ~ 0.88, so >=0.9 pins the measured value
    without forbidding legitimate hash tweaks."""
    exact = {(r.id_a, r.id_b) for r in qs["dedup_ngram_jaccard"](spark, SF).collect()}
    cand = {(r.id_a, r.id_b) for r in qs["dedup_minhash_lsh"](spark, SF).collect()}
    assert exact, "ground truth unexpectedly empty"
    assert len(exact & cand) / len(exact) >= 0.9


def test_ann_quality_vs_exact_topk(spark, qs):
    """IVF with 2-probe covers the exact top-10 fully (measured 10/10);
    single-bucket LSH trades most recall for a 1/16 candidate set
    (measured 2/10) — the documented cost/recall trade, pinned so a
    regression to 0 (broken bucketing) still fails."""
    exact = [r.vec_id for r in qs["similarity_cosine_topk"](spark, SF).collect()]
    ivf = [r.vec_id for r in qs["similarity_ann_ivf"](spark, SF).collect()]
    lsh = [r.vec_id for r in qs["similarity_ann_lsh"](spark, SF).collect()]
    assert len(set(exact) & set(ivf)) >= 8
    assert len(set(exact) & set(lsh)) >= 1


def test_hll_error_within_declared_rsd(spark, qs):
    """approx_count_distinct was asked for rsd=0.01; measured max group
    error 0.85% at sf0.01 — pinned at 2% by the query's own in-query
    band (the column the driver oracle asserts true). The exact counts
    are re-checked against DuckDB here so the band's baseline is
    independently right."""
    rows = qs["agg_approx_distinct"](spark, SF).collect()
    exact = dict(
        duckdb.sql(
            f"SELECT o_orderpriority, count(DISTINCT o_custkey) "
            f"FROM '{SF}/orders.parquet' GROUP BY 1"
        ).fetchall()
    )
    assert {r.o_orderpriority: r.n_customers for r in rows} == exact
    for r in rows:
        assert r.approx_within_2pct, r


def test_minhash_estimates_jaccard(spark, qs):
    """MinHash(16) signature-agreement fraction must estimate the true
    Jaccard of the ground-truth pairs: measured MAE 0.039 / max error
    0.164 at sf0.01 (theory: stderr ~ sqrt(s(1-s)/16) ~ 0.1 at s=0.8);
    pinned at MAE <= 0.08, max <= 0.25."""
    from pyspark.sql import functions as F

    from nyc_opendata_etl_spark.operators.dedup import minhash_signatures
    from nyc_opendata_etl_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in qs["dedup_ngram_jaccard"](spark, SF).collect()
    }
    sig = {r.id: r for r in minhash_signatures(docs).collect()}
    errs = []
    for (ia, ib), jac in exact.items():
        agree = sum(1 for i in range(16) if sig[ia][f"m{i}"] == sig[ib][f"m{i}"]) / 16
        errs.append(abs(jac - agree))
    assert errs
    assert sum(errs) / len(errs) <= 0.08
    assert max(errs) <= 0.25


def test_hll_rollup_merge_is_lossless_and_order_free(spark):
    """Merging per-batch / per-key HLL sketches must reproduce the exact
    register state of a single pass: estimate(union of parts) ==
    estimate(whole), for any batching — the property that makes the
    rollup state safely incremental."""
    from pyspark.sql import functions as F

    from nyc_opendata_etl_spark.operators.rollup import (
        hll_batch,
        hll_estimates,
        hll_merge,
    )

    df = spark.range(50_000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 4967).alias("u")
    )
    a = hll_batch(df.filter(F.col("id") % 2 == 0), ["g"], ["u"])
    b = hll_batch(df.filter(F.col("id") % 2 == 1), ["g"], ["u"])
    merged = hll_estimates(hll_merge(a, b, ["g"], ["u"]), ["g"], ["u"])
    direct = hll_estimates(hll_batch(df, ["g"], ["u"]), ["g"], ["u"])
    m = {r.g: (r.approx_n_u, r.n) for r in merged.collect()}
    d = {r.g: (r.approx_n_u, r.n) for r in direct.collect()}
    assert m == d
    for g, (est, n) in m.items():
        assert abs(est - 4967) / 4967 <= 0.05, (g, est)


def test_theta_rollup_merge_and_set_algebra(spark):
    """Theta state must (a) merge losslessly — estimate(union of batch
    sketches) == estimate(single pass) — and (b) answer set-algebra
    questions with known ground truth: A = {0..5999}, B = {4000..9999}
    gives |A∩B| = 2000 and |A\\B| = 4000. At 6000 > 4096 nominal
    entries the lg_k=12 sketches are genuinely ESTIMATING (measured:
    ea=6006, i=1984, d=4022), so this pins the estimating regime under
    the same 5%-of-union band the registered query asserts (theory:
    rsd ≈ 1.6% of the union scale)."""
    from pyspark.sql import functions as F

    from nyc_opendata_etl_spark.operators.rollup import (
        theta_batch,
        theta_estimates,
        theta_merge,
    )

    df = spark.range(10_000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 4967).alias("u")
    )
    a = theta_batch(df.filter(F.col("id") % 2 == 0), ["g"], ["u"])
    b = theta_batch(df.filter(F.col("id") % 2 == 1), ["g"], ["u"])
    merged = theta_estimates(theta_merge(a, b, ["g"], ["u"]), ["g"], ["u"])
    direct = theta_estimates(theta_batch(df, ["g"], ["u"]), ["g"], ["u"])
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in direct.collect()
    }

    sets = spark.range(10_000).select(
        F.when(F.col("id") < 6000, F.col("id")).alias("a"),
        F.when(F.col("id") >= 4000, F.col("id")).alias("b"),
    )
    row = (
        sets.agg(
            F.theta_sketch_agg("a", 12).alias("sa"),
            F.theta_sketch_agg("b", 12).alias("sb"),
        )
        .select(
            F.theta_sketch_estimate(F.theta_union("sa", "sb")).alias("u"),
            F.theta_sketch_estimate(F.theta_intersection("sa", "sb")).alias("i"),
            F.theta_sketch_estimate(F.theta_difference("sa", "sb")).alias("d"),
        )
        .collect()[0]
    )
    band = 0.05 * 10_000
    assert abs(row.u - 10_000) <= band, row
    assert abs(row.i - 2_000) <= band, row
    assert abs(row.d - 4_000) <= band, row


def test_kll_merge_full_outer_and_rank_accuracy(spark):
    """kll_merge is a full-outer keyed merge: a key present in only one
    batch keeps that batch's sketch (no dropped groups), counts add,
    and the merged sketch's quantile must sit within the declared 2.5%
    rank band of the true quantile of the combined stream."""
    from pyspark.sql import functions as F

    from nyc_opendata_etl_spark.operators.rollup import kll_batch, kll_merge

    # g=0 only in batch a; g=1 in both; values are id (uniform).
    df = spark.range(20_000).select(
        F.when(F.col("id") < 5_000, 0).otherwise(1).alias("g"),
        F.col("id").cast("double").alias("v"),
        F.col("id").alias("id"),
    )
    a = kll_batch(df.filter((F.col("g") == 0) | (F.col("id") % 2 == 0)), ["g"], ["v"])
    b = kll_batch(df.filter((F.col("g") == 1) & (F.col("id") % 2 == 1)), ["g"], ["v"])
    merged = kll_merge(a, b, ["g"], ["v"])
    rows = {
        r.g: r
        for r in merged.select(
            "g",
            "n",
            F.kll_sketch_get_quantile_double("kll_v", F.lit(0.5)).alias("q50"),
        ).collect()
    }
    assert set(rows) == {0, 1}
    assert rows[0].n == 5_000 and rows[1].n == 15_000
    # true medians: g=0 → ~2500, g=1 → ~12500 (uniform ids)
    assert abs(rows[0].q50 - 2_500) <= 0.025 * 5_000
    assert abs(rows[1].q50 - 12_500) <= 0.025 * 15_000


def test_sketch_state_survives_parquet_round_trip(spark, tmp_path):
    """The 'persisted re-aggregatable state' claim requires the binary
    sketch columns to actually survive storage: write HLL, Theta, KLL,
    and bitmap state to parquet, read it back, merge with a second
    batch, and get the identical estimates/counts a never-stored merge
    produces."""
    from pyspark.sql import functions as F

    from nyc_opendata_etl_spark.operators import rollup
    from nyc_opendata_etl_spark.sources.tables import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    keys = ["o_orderpriority"]
    h1 = orders.filter(F.col("o_orderkey") % 2 == 0)
    h2 = orders.filter(F.col("o_orderkey") % 2 == 1)

    cases = {
        "hll": (rollup.hll_batch, rollup.hll_merge, rollup.hll_estimates),
        "theta": (
            rollup.theta_batch,
            rollup.theta_merge,
            rollup.theta_estimates,
        ),
    }
    for name, (batch, merge,est_fn) in cases.items():
        state = batch(h1, keys, ["o_custkey"])
        path = str(tmp_path / name)
        state.write.mode("overwrite").parquet(path)
        stored = spark.read.parquet(path)
        direct = est_fn(
            merge(state, batch(h2, keys, ["o_custkey"]), keys, ["o_custkey"]),
            keys,
            ["o_custkey"],
        ).collect()
        via_disk = est_fn(
            merge(stored, batch(h2, keys, ["o_custkey"]), keys, ["o_custkey"]),
            keys,
            ["o_custkey"],
        ).collect()
        as_map = lambda rows: {  # noqa: E731
            r["o_orderpriority"]: (r["approx_n_o_custkey"], r["n"]) for r in rows
        }
        assert as_map(via_disk) == as_map(direct), name

    # bitmap: exact counts must survive storage too
    bstate = rollup.bitmap_batch(h1, keys, "o_custkey")
    bpath = str(tmp_path / "bitmap")
    bstate.write.mode("overwrite").parquet(bpath)
    bstored = spark.read.parquet(bpath)
    bm = lambda st: {  # noqa: E731
        r["o_orderpriority"]: (r["n_distinct_o_custkey"], r["n"])
        for r in rollup.bitmap_counts(
            rollup.bitmap_merge(
                st, rollup.bitmap_batch(h2, keys, "o_custkey"), keys, "o_custkey"
            ),
            keys,
            "o_custkey",
        ).collect()
    }
    assert bm(bstored) == bm(bstate)

    # KLL: stored + merged quantiles equal the in-memory path
    kstate = rollup.kll_batch(h1, keys, ["o_totalprice"])
    kpath = str(tmp_path / "kll")
    kstate.write.mode("overwrite").parquet(kpath)
    kstored = spark.read.parquet(kpath)

    def k_quantiles(st):
        merged = rollup.kll_merge(
            st, rollup.kll_batch(h2, keys, ["o_totalprice"]), keys, ["o_totalprice"]
        )
        return {
            r["o_orderpriority"]: r["p50"]
            for r in merged.select(
                "o_orderpriority",
                F.expr(
                    "kll_sketch_get_quantile_double(kll_o_totalprice, 0.5)"
                ).alias("p50"),
            ).collect()
        }

    assert k_quantiles(kstored) == k_quantiles(kstate)
