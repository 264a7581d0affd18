"""Late-round-7 additions: chunked pair-verify kernel, Fellegi–Sunter
record-linkage weights, and weighted KLL quantiles."""

from __future__ import annotations

import random

import numpy as np

from nyc_opendata_etl_spark.operators import similarity


def _ref_pairs(ids, mat, threshold, digits):
    """One-shot full-matrix reference for the chunked kernel."""
    norms = np.sqrt((mat * mat).sum(axis=1))
    sims = np.round((mat @ mat.T) / np.outer(norms, norms), digits)
    keep = (sims >= threshold) & (ids[:, None] < ids[None, :])
    ai, bj = np.nonzero(keep)
    return sorted(zip(ids[ai], ids[bj], sims[ai, bj]))


def test_chunked_sim_pairs_matches_full_matmul():
    """Forcing a tiny chunk budget (64-row chunks over 300 rows) must
    emit exactly the one-shot matmul's pair set — the belt-and-braces
    contract for huge non-identical buckets."""
    rng = random.Random(11)
    n, d = 300, 16
    ids = np.arange(1000, 1000 + n, dtype=np.int64)
    mat = np.array(
        [[rng.uniform(-1, 1) for _ in range(d)] for _ in range(n)],
        dtype=np.float64,
    )
    for thr in (0.2, 0.6):
        a, b, s = similarity._chunked_sim_pairs(
            ids, mat, thr, 6, chunk_target_bytes=1
        )
        assert sorted(zip(a, b, s)) == _ref_pairs(ids, mat, thr, 6)
    # empty result path: impossible threshold
    a, b, s = similarity._chunked_sim_pairs(ids, mat, 2.0, 6, chunk_target_bytes=1)
    assert len(a) == len(b) == len(s) == 0


def test_fs_field_weights_math():
    """Agreement/disagreement weights are the classical log2 likelihood
    ratios; invalid priors are rejected."""
    import math

    import pytest

    from nyc_opendata_etl_spark.operators import linkage

    wa, wd = linkage.fs_field_weights(0.9, 0.1)
    # NB: compare with the exact same IEEE expressions (0.9/0.1 != 9.0,
    # 1-0.9 != 0.1)
    assert wa == math.log2(0.9 / 0.1)
    assert wd == math.log2((1 - 0.9) / (1 - 0.1))
    assert wa > 0 > wd
    for m, u in ((0.1, 0.9), (0.5, 0.5), (1.0, 0.1), (0.9, 0.0)):
        with pytest.raises(ValueError):
            linkage.fs_field_weights(m, u)


def test_fs_pattern_table_tiny(spark):
    """Hand-checked pattern table: 2 fields, 4 pairs covering 3 of the
    4 patterns; scores and decisions match the closed-form weights."""
    import math

    from nyc_opendata_etl_spark.operators import linkage

    fields = {"agree_x": (0.9, 0.1), "agree_y": (0.8, 0.2)}
    pairs = spark.createDataFrame(
        [(1, 1), (1, 1), (1, 0), (0, 0)], "agree_x int, agree_y int"
    )
    out = {
        (r.agree_x, r.agree_y): r
        for r in linkage.fs_pattern_table(pairs, fields, upper=5.0, lower=0.0).collect()
    }
    wx_a, wx_d = math.log2(0.9 / 0.1), math.log2((1 - 0.9) / (1 - 0.1))
    wy_a, wy_d = math.log2(0.8 / 0.2), math.log2((1 - 0.8) / (1 - 0.2))
    assert out[(1, 1)].n_pairs == 2
    assert out[(1, 1)].fs_score == round(wx_a + wy_a, 4)
    assert out[(1, 1)].decision == "match"
    assert out[(1, 0)].fs_score == round(wx_a + wy_d, 4)
    assert out[(1, 0)].decision == "possible"
    assert out[(0, 0)].decision == "nonmatch"
    assert (0, 1) not in out  # unobserved pattern is absent, not zero


def test_fs_score_sql_twin_matches_column(spark):
    """fs_score_sql must replay fs_score bit-for-bit (same literals,
    same fold order) — the differential-oracle contract."""
    from nyc_opendata_etl_spark.operators import linkage

    fields = {"agree_x": (0.95, 0.25), "agree_y": (0.85, 0.01)}
    pairs = spark.createDataFrame(
        [(1, 1), (1, 0), (0, 1), (0, 0)], "agree_x int, agree_y int"
    )
    via_col = pairs.select(linkage.fs_score(fields).alias("s")).collect()
    via_sql = pairs.selectExpr(linkage.fs_score_sql(fields) + " AS s").collect()
    assert [r.s for r in via_col] == [r.s for r in via_sql]


def test_chunked_kernel_default_budget_single_chunk():
    """With the default 512 MiB budget a small bucket runs as ONE chunk
    (no behavior change for ordinary buckets)."""
    ids = np.arange(10, dtype=np.int64)
    mat = np.eye(10, dtype=np.float64)
    a, b, s = similarity._chunked_sim_pairs(ids, mat, 0.5, 6)
    assert len(a) == 0  # orthonormal rows: no near-dups
