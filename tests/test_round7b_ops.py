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


def test_chunked_kernel_default_budget_single_chunk():
    """With the default 512 MiB budget a small bucket runs as ONE chunk
    (no behavior change for ordinary buckets)."""
    ids = np.arange(10, dtype=np.int64)
    mat = np.eye(10, dtype=np.float64)
    a, b, s = similarity._chunked_sim_pairs(ids, mat, 0.5, 6)
    assert len(a) == 0  # orthonormal rows: no near-dups
