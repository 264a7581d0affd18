"""Round-16 pins for the ADVICE r15 hardening of the incremental
cluster-map artifact: out-of-order batch ids fail loudly (item 1),
compaction lands pointer + snapshot atomically in one rename (item 2),
and a stale re-stage always starts from an empty artifact (item 3)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.test_round15_ops import _corpus, _docs


def test_update_rejects_out_of_order_batch_ids(spark, tmp_path):
    """ADVICE r15 item 1: a batch id BELOW an already-applied batch
    would dynamic-overwrite that batch's log partitions with different
    content and move _CURRENT backwards to a stale snapshot — it must
    raise. Equality with the max applied batch is a legal REPLAY
    (streaming epoch re-delivery) and must leave the artifact
    byte-identical."""
    from nyc_opendata_etl_spark.operators import cluster_index as ci

    docs = _docs(spark, _corpus())
    path = str(tmp_path / "ci")
    ci.build_dup_cluster_index(docs.filter(F.col("doc_id") % 3 == 0), path)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    b2 = docs.filter(F.col("doc_id") % 3 == 2)
    ci.update_dup_cluster_index(spark, b1, path, batch_id=0)
    ci.update_dup_cluster_index(spark, b2, path, batch_id=1)

    def snap():
        out = {
            rel: sorted(
                map(tuple, spark.read.parquet(f"{path}/{rel}").collect())
            )
            for rel in ("reps", "prefix", "members")
        }
        out["clusters"] = sorted(
            map(tuple, ci.read_dup_clusters(spark, path).collect())
        )
        return out

    before = snap()
    # out-of-order: below the max applied batch → loud failure, no writes
    with pytest.raises(ValueError, match="non-decreasing"):
        ci.update_dup_cluster_index(spark, b1, path, batch_id=0)
    assert snap() == before
    # equality: legal replay of the latest batch → byte-identical rewrite
    ci.update_dup_cluster_index(spark, b2, path, batch_id=1)
    assert snap() == before


def test_compact_lands_pointer_atomically_with_snapshot_swap(
    spark, tmp_path, monkeypatch
):
    """ADVICE r15 item 2: _CURRENT lives inside clusters/, so the
    compaction swap removes it — the pointer must be written INTO the
    tmp dir so it lands in the same rename as the snapshot (no window
    where read_dup_clusters raises FileNotFoundError). Pin: when the
    clusters swap renames tmp into place, tmp already contains
    _CURRENT."""
    from nyc_opendata_etl_spark.operators import cluster_index as ci
    from nyc_opendata_etl_spark.operators import index_maintenance as im

    docs = _docs(spark, _corpus())
    path = str(tmp_path / "ci")
    ci.build_dup_cluster_index(docs.filter(F.col("doc_id") % 2 == 0), path)
    ci.update_dup_cluster_index(
        spark, docs.filter(F.col("doc_id") % 2 == 1), path, batch_id=0
    )

    real_swap = im._swap_dir
    seen = []

    def checking_swap(live, rebuild):
        def checked_rebuild(tmp):
            rebuild(tmp)
            if live.rstrip("/").endswith("clusters"):
                seen.append(os.path.exists(os.path.join(tmp, "_CURRENT")))

        real_swap(live, checked_rebuild)

    monkeypatch.setattr(im, "_swap_dir", checking_swap)
    pre = sorted(map(tuple, ci.read_dup_clusters(spark, path).collect()))
    ci.compact_dup_cluster_index(spark, path)
    assert seen == [True]  # pointer was inside tmp BEFORE the rename
    assert os.path.exists(os.path.join(path, "clusters", "_CURRENT"))
    post = sorted(map(tuple, ci.read_dup_clusters(spark, path).collect()))
    assert post == pre


def test_stale_cluster_stream_restage_starts_empty(spark):
    """ADVICE r15 item 3: build_dup_cluster_index only overwrites
    b=-1/v=-1 partitions, so a stale re-stage (corpus change or crashed
    drain) must rmtree first — otherwise prior b>=0 log partitions and
    v>=0 snapshots survive and poison later higher-batch updates. Pin:
    poison the staged artifact with a fake high-batch partition, drop
    the done-marker, re-stage, and require the poison gone and the
    clusters identical to the pre-poison map."""
    from nyc_opendata_etl_spark.operators import cluster_index as ci
    from nyc_opendata_etl_spark.queries.pending_r16 import (
        _stage_cluster_stream,
    )

    sf = "/root/testdata/sf0.001"
    path = _stage_cluster_stream(spark, sf)
    want = sorted(map(tuple, ci.read_dup_clusters(spark, path).collect()))

    poison = os.path.join(path, "reps", "b=99")
    os.makedirs(poison, exist_ok=True)
    with open(os.path.join(poison, "junk"), "w") as fh:
        fh.write("poison")
    os.remove(os.path.join(path, "_STREAM_DONE"))  # simulate crashed drain

    path2 = _stage_cluster_stream(spark, sf)
    assert path2 == path
    assert not os.path.exists(poison)
    assert os.path.exists(os.path.join(path, "_STREAM_DONE"))
    got = sorted(map(tuple, ci.read_dup_clusters(spark, path).collect()))
    assert got == want


def test_ivfpq_build_write_parallelizes_past_one_task_per_cell(
    spark, tmp_path
):
    """r16 (VERDICT r15 item 5 / r14 NOTES item 16): the pre-write
    exchange of the cell-partitioned codes layout must not serialize
    onto n_centroids tasks. The salted repartition spreads each cell's
    rows over a deterministic id-derived bucket, so (a) the planned
    exchange keys exceed the centroid count at this parallelism and
    (b) at least one cell directory lands >1 data file — while the
    probe math (oracle-checked elsewhere) and the pruned directory
    layout are unchanged."""
    import os

    from nyc_opendata_etl_spark.operators import similarity
    from nyc_opendata_etl_spark.sources.tables import load_table

    par = spark.sparkContext.defaultParallelism
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    n_cells = 16
    assert par > n_cells, "test needs parallelism above the cell count"

    # the adversarial shape the hash salt exists for: cells assigned by
    # id arithmetic, which a modulo salt would collapse into (a modulo
    # salt here is constant per cell — exactly one key per cell again)
    cells = emb.selectExpr("vec_id as id", "cast(vec_id % 16 as int) as cid")
    n_salt = -(-2 * par // n_cells)
    keys = cells.select(
        "cid", F.pmod(F.xxhash64("id"), F.lit(n_salt)).alias("s")
    ).distinct()
    assert keys.count() > n_cells  # exchange no longer one-key-per-cell

    # AQE rightly coalesces the KB-sized test shuffle back to one task
    # (at real scale the partitions stay separate); switch coalescing
    # off here to observe the physical spread the salt buys.
    idx = str(tmp_path / "ivfpq_index")
    coalesce_conf = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_conf, "true")
    spark.conf.set(coalesce_conf, "false")
    try:
        similarity.build_ivfpq_index(emb, idx)
    finally:
        spark.conf.set(coalesce_conf, prev)
    per_cell = []
    codes = os.path.join(idx, "codes")
    for d in os.listdir(codes):
        if d.startswith("cid="):
            per_cell.append(
                sum(
                    1
                    for f in os.listdir(os.path.join(codes, d))
                    if f.startswith("part-")
                )
            )
    assert max(per_cell) > 1  # some cell's rows came from several tasks
