"""Round-14 pins: ADVICE r13 fixes (exact passage-key arithmetic,
enforced chunk budget, pid-aware run-dir reaping) and this round's
operator work."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_passage_key_decode_is_exact_beyond_double_precision(spark):
    """ADVICE r13: floor(key / 2^20) uses double division, exact only
    below 2^53, so doc_id >= 2^33 could mis-decode. The decode now
    uses integer `div`; pin a doc_id far beyond the double-exact range
    round-tripping bit-exactly."""
    from nyc_opendata_etl_spark.queries.llm_ops import (
        _passage_key,
        _split_passage_key,
    )

    rows = [(1 << 34, 5), ((1 << 40) + 12345, (1 << 20) - 1), (7, 0)]
    df = spark.createDataFrame(rows, "doc_id long, chunk_id long")
    keyed = df.select(
        _passage_key().alias("doc_id"),
        F.lit(1.0).alias("bm25"),
        F.lit(1).alias("n_hit_terms"),
    )
    got = sorted(
        (r.doc_id, r.chunk_id) for r in _split_passage_key(keyed).collect()
    )
    assert got == sorted(rows)


def test_passage_key_budget_violation_fails_loudly(spark):
    """ADVICE r13: a doc exceeding the 2^20 chunks-per-doc budget used
    to silently collide its chunk keys into the next doc's key space.
    The key expression now raises inside the row pipeline."""
    from nyc_opendata_etl_spark.queries.llm_ops import (
        _CHUNK_KEY_BASE,
        _passage_key,
    )

    bad = spark.createDataFrame(
        [(3, _CHUNK_KEY_BASE)], "doc_id long, chunk_id long"
    )
    with pytest.raises(Exception, match="chunks-per-doc"):
        bad.select(_passage_key().alias("k")).collect()


def test_fresh_run_dir_reaps_dead_owners_only(tmp_path, monkeypatch):
    """ADVICE r13: the 1-hour mtime cutoff could delete a LIVE long
    run's sink/checkpoint mid-run. Reaping is now pid-liveness-based:
    a dir tagged with a dead pid is reaped immediately; a dir tagged
    with a live pid survives regardless of age; untagged legacy dirs
    survive below the 24 h fallback cutoff."""
    import tempfile

    from nyc_opendata_etl_spark.queries.pending_r13 import _fresh_run_dir

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    prefix = "graft_r14_reap_test_"

    # dead owner: max pid space on Linux is bounded well below 2^31;
    # a pid this large can never be live.
    dead = tmp_path / f"{prefix}p2000000123_x"
    dead.mkdir()
    # live owner (this process), backdated far past any age cutoff
    live = tmp_path / f"{prefix}p{os.getpid()}_y"
    live.mkdir()
    os.utime(live, (1, 1))
    # legacy untagged dir, recent → below the 24 h fallback
    legacy = tmp_path / f"{prefix}legacy"
    legacy.mkdir()

    run = _fresh_run_dir(prefix)
    assert not dead.exists(), "dead-owner dir must be reaped"
    assert live.exists(), "live-owner dir must survive any age"
    assert legacy.exists(), "recent legacy dir must survive"
    assert f"p{os.getpid()}_" in os.path.basename(run)
