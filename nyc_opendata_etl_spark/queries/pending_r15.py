"""Round-15 registrations — LIVE as of round 15 (flipped per VERDICT
r14 item 1): the INCREMENTAL near-dup cluster map and the exactly-once
STREAMING IVF-PQ index maintenance, both built late in round 14 after
the r14 verdict window was already slot-exact at 50 (registering then
would have evicted r9-cohort greens past what that round promised).

Staged r14 → flipped r15: the pair ran under the SAME differential
compare the driver uses (tests/test_round14_ops.py, Spark vs DuckDB at
sf0.01) for a full round before registration, so the flip is a rename,
not a leap. ``PENDING`` stays as this module's registration manifest —
the in-suite differential test still iterates it as a pre-driver gate.

Window-slot cost: 2 of round 15's 50 (new registrations are
never-checked → group 0 of the verdict-age sort automatically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_opendata_etl_spark.queries import REGISTRY, register
from nyc_opendata_etl_spark.queries import llm_ops  # noqa: F401
from nyc_opendata_etl_spark.sources.tables import load_table

PENDING: dict[str, tuple] = {}


def _pending(name: str, oracle: str):
    """r14 staging decorator, now ALSO the live registration (the r15
    flip): records the (fn, oracle) pair for the in-suite differential
    test and registers it with the query registry."""

    def deco(fn):
        PENDING[name] = (fn, oracle)
        return register(name, oracle)(fn)

    return deco


def _stage_dup_cluster_index_incr(spark: SparkSession, sf_dir: str) -> str:
    """Stage the incremental cluster-map artifact once per corpus
    version: base build from the even half, one maintenance batch
    (batch 0 — the build seeds batch −1) folding in the odd half
    (operators/cluster_index.py). _INCR_DONE is written last, proving
    both phases completed. The staging kind carries a ``2`` suffix:
    the ADVICE-r14 crash-idempotence rework changed the artifact
    LAYOUT (batch-partitioned logs + versioned cluster snapshots), so
    pre-rework staged dirs must never satisfy the staleness check."""
    import os

    from nyc_opendata_etl_spark.operators import cluster_index as ci
    from nyc_opendata_etl_spark.sources.staging import is_stale, stage_dir

    path = stage_dir(sf_dir, "dup_cluster_index_incr2")
    if is_stale(path, sf_dir, "documents", marker="_INCR_DONE"):
        # ADVICE r15: a stale rebuild must start from an EMPTY artifact.
        # build_dup_cluster_index only overwrites b=-1/v=-1 partitions,
        # so a prior run's b>=0 logs / v>=0 snapshots would survive a
        # corpus change or crashed drain and poison later updates.
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        docs = load_table(spark, sf_dir, "documents")
        ci.build_dup_cluster_index(docs.filter(F.col("doc_id") % 2 == 0), path)
        ci.update_dup_cluster_index(
            spark, docs.filter(F.col("doc_id") % 2 == 1), path, batch_id=0
        )
        with open(os.path.join(path, "_INCR_DONE"), "w") as fh:
            fh.write("")
    return path


def _stage_emb_idordered(spark: SparkSession, sf_dir: str) -> str:
    """Stage embeddings as 8 vec_id-range-ordered parquet files with
    ascending ≥1 s-apart mtimes — the _stage_docs_idordered protocol
    (FileStreamSource replays by ms-precision mtime; stamps go
    backwards from now), applied to the embeddings table so the ANN
    ingest stream drains in deterministic id-ordered micro-batches."""
    import os
    import time

    from nyc_opendata_etl_spark.sources.staging import is_stale, stage_dir

    path = stage_dir(sf_dir, "emb_idordered")
    if is_stale(path, sf_dir, "embeddings"):
        (
            load_table(spark, sf_dir, "embeddings")
            .select("vec_id", "embedding")
            .repartitionByRange(8, "vec_id")
            .sortWithinPartitions("vec_id")
            .write.mode("overwrite")
            .parquet(path)
        )
        parts = sorted(f for f in os.listdir(path) if f.startswith("part-"))
        base = time.time()
        for i, p in enumerate(parts):
            t = base - (len(parts) - i) * 1.0
            os.utime(os.path.join(path, p), (t, t))
    return path


def _stage_ivfpq_stream(spark: SparkSession, sf_dir: str) -> str:
    """Stage the STREAMING-built IVF-PQ index once per corpus version:
    quantizers (centroids/codebook/params) come from a build over the
    even-vec_id half — the similarity_ivfpq_incremental geometry, so
    that query's oracle transfers verbatim — but the build's codes are
    DISCARDED and the FULL corpus arrives through the exactly-once
    streaming sink (4 AvailableNow micro-batches over 8 id-ordered
    files), each batch dynamic-overwriting its own (batch, cid)
    partitions. _STREAM_DONE is written last, proving build + discard
    + drain all completed."""
    import os
    import shutil
    import uuid

    from nyc_opendata_etl_spark.operators import similarity
    from nyc_opendata_etl_spark.queries.pending_r13 import _fresh_run_dir
    from nyc_opendata_etl_spark.sources.staging import is_stale, stage_dir
    from nyc_opendata_etl_spark.streaming.ann_ingest import stream_ivfpq_ingest

    path = stage_dir(sf_dir, "ivfpq_index_stream")
    if is_stale(path, sf_dir, "embeddings", marker="_STREAM_DONE"):
        emb = load_table(spark, sf_dir, "embeddings")
        similarity.build_ivfpq_index(emb.filter(F.col("vec_id") % 2 == 0), path)
        # codes arrive via the stream under the (batch, cid) layout —
        # the build's cid-only codes would break partition discovery
        shutil.rmtree(os.path.join(path, "codes"), ignore_errors=True)
        src = _stage_emb_idordered(spark, sf_dir)
        run = _fresh_run_dir("spark_graft_annidx_run_")
        stream = (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", "2")
            .parquet(src)
        )
        stream_ivfpq_ingest(
            stream,
            path,
            query_name=f"annidx_{uuid.uuid4().hex[:8]}",
            checkpoint_location=f"{run}/ckpt",
        )
        with open(os.path.join(path, "_STREAM_DONE"), "w") as fh:
            fh.write("")
    return path


@_pending(
    # Proof by identity: the streaming-built index must reproduce the
    # batch-incremental index's EXACT probe result (both are the full
    # corpus routed/encoded against the even-half quantizers), so its
    # oracle is similarity_ivfpq_incremental's oracle VERBATIM (shared
    # by reference — a quantizer or ADC tweak can never desynchronize
    # the two).
    "stream_ivfpq_ingest",
    oracle=REGISTRY["similarity_ivfpq_incremental"].oracle,
)
def q_stream_ivfpq_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once STREAMING ANN index maintenance
    (streaming/ann_ingest.py) run as a bounded AvailableNow drain: the
    embedding corpus arrives in 4 micro-batches and each batch
    dynamic-overwrites only its own (batch, cid) code partitions — a
    replayed batch rewrites identical content instead of appending
    duplicate code rows (which would silently DOUBLE a candidate's
    ADC distance in the probe's groupBy(id) sum; the defect
    update_ivfpq_index's append mode would have under replay).
    Quantizers are frozen from the even-half build (the FAISS add()
    contract), so the streamed index state equals
    similarity_ivfpq_incremental's and the unchanged probe
    (ivfpq_topk_indexed — cid partition pruning works under every
    batch= directory) scores bit-identically; that query's oracle
    verifies batching, idempotent writes, AND the probe end to end."""
    from nyc_opendata_etl_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings", spread_input=True)
    index = _stage_ivfpq_stream(spark, sf_dir)
    return similarity.ivfpq_topk_indexed(spark, emb, index, query_vec_id=43)


@_pending(
    # Proof by identity: the incrementally maintained cluster map must
    # reproduce dedup_clusters' EXACT output over the same corpus, so
    # its oracle is dedup_clusters' recursive-CTE oracle VERBATIM
    # (shared by reference — a threshold or shingle tweak can never
    # desynchronize the two).
    "dedup_clusters_incremental",
    oracle=REGISTRY["dedup_clusters"].oracle,
)
def q_dedup_clusters_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters from the INCREMENTALLY maintained staged
    cluster map (operators/cluster_index.py): the even half of the
    corpus is clustered from scratch, the odd half folded in as a
    maintenance batch — new docs probe the staged AllPairs prefix
    index (lossless across batches: the canonical shingle-hash order
    is global), identical texts join their group by content hash
    without any pair work, and connected components run on the DELTA
    graph with old clusters contracted to their label nodes. A green
    row proves append + contract-merge + relabel reconstructs exactly
    the from-scratch clustering — the hourly-ingest-vs-nightly-
    re-cluster contract a 100 TB dedup service depends on (the
    search_bm25_incremental proof, clustering edition). Completes the
    incremental-index family: posting list, LSH buckets,
    fingerprint/rc, IVF-PQ, and now the cluster map itself."""
    from nyc_opendata_etl_spark.operators import cluster_index as ci

    path = _stage_dup_cluster_index_incr(spark, sf_dir)
    return ci.read_dup_clusters(spark, path)
