"""Exactly-once STREAMING IVF-PQ index maintenance (r14, staged for
r15 registration) — the streaming twin of
``operators/similarity.update_ivfpq_index``, closing the streaming ×
similarity family gap the way ``streaming/index_ingest.py`` closed
streaming × retrieval.

Why the batch updater can't just run in ``foreachBatch``:
``update_ivfpq_index`` APPENDS a batch's (id, m, code, cid) rows into
the cell-partitioned ``codes/`` layout — correct for at-most-once
driving, but a REPLAYED micro-batch (sink crash after write, before
commit) would append its rows a second time, and a duplicated code row
double-counts nothing visible (ADC scores each (id, m) once per row —
the groupBy(id) sum would silently DOUBLE a replayed candidate's
distance). The streaming layout therefore partitions codes by
(batch, cid) and DYNAMIC-OVERWRITES: batch ``b`` owns exactly the
``batch=b/cid=*`` directories, so a replay rewrites identical content
(routing and encoding are deterministic given the persisted
quantizers) instead of appending.

The probe needs no change: ``similarity.ivfpq_topk_indexed`` reads
``codes/`` with a ``cid`` filter — partition pruning applies to the
``cid=`` level under every ``batch=`` directory, and the extra
``batch`` column rides along unused. Quantizers
(centroids/codebook/params) are the persisted build's, never touched
by the stream — the FAISS add()-without-retraining contract, same as
the batch updater.

Scale shape per micro-batch: two bounded broadcasts (n_centroids rows,
m·n_codes rows) against ONLY the batch, two map-side-combined
aggregates, one dynamic-overwrite write — independent of the index's
accumulated size. As everywhere in the streaming layer, exactly-once
rides on the offset log pinning batch composition: production callers
MUST pass a durable ``checkpoint_location``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_ivfpq_quantizers(spark: SparkSession, index_path: str) -> tuple:
    """(params_row, centroids_df, codebook_df) — the index's persisted,
    stream-immutable quantizers, read once per drain."""
    return (
        spark.read.parquet(f"{index_path}/params").first(),
        spark.read.parquet(f"{index_path}/centroids"),
        spark.read.parquet(f"{index_path}/codebook"),
    )


def ann_ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantizers: tuple | None = None,
) -> None:
    """One micro-batch: route + encode against the index's PERSISTED
    quantizers and dynamic-overwrite this batch's own partitions.
    Exposed at module level so tests drive replay semantics directly;
    the streaming wrapper passes it to ``foreachBatch``. Zero-norm
    vectors drop at assignment (the NULL-best-sim rule), exactly as in
    the batch updater.

    ``quantizers``: optional pre-read (params_row, centroids_df,
    codebook_df) — the stream wrapper reads them ONCE per drain (they
    are immutable for the stream's lifetime, the FAISS
    add()-without-retraining contract) instead of paying a params
    ``first()`` job plus two footer reads per micro-batch (r17,
    VERDICT r16 item 1: per-batch job-count overhead)."""
    from nyc_opendata_etl_spark.operators import similarity

    spark = batch_df.sparkSession
    if quantizers is None:
        quantizers = read_ivfpq_quantizers(spark, index_path)
    p, cents, codebook = quantizers
    # spread the file-source batch before the vector math (the
    # index_ingest lesson: input-bytes partitioning leaves a file
    # 1-2 partitions wide on a 32-core box), size-adaptively so a
    # small batch skips the raw shuffle
    from nyc_opendata_etl_spark.streaming.ingest import spread_batch

    batch_df = spread_batch(batch_df)
    assigned = similarity._ivf_assign(
        batch_df, p["n_centroids"], id_col, vec_col, cents=cents
    )
    subs = similarity._sub_rows(
        batch_df, p["m"], p["d_sub"], vec_col, F.col(id_col), "id", "sub"
    )
    codes = similarity._pq_encode_against(subs, codebook)
    (
        codes.join(assigned, "id")
        .withColumn("batch", F.lit(int(batch_id)))
        .repartition("cid")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch", "cid")
        .parquet(f"{index_path}/codes")
    )


def stream_ivfpq_ingest(
    emb_stream: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_name: str = "ann_ingest",
    checkpoint_location: str | None = None,
    ephemeral: bool = False,
) -> None:
    """Drain an embedding stream into the batch-partitioned IVF-PQ
    codes layout (bounded here by ``Trigger.AvailableNow``; drop the
    trigger for a continuous pipeline). See the module docstring for
    the exactly-once contract.

    The contract RIDES ON the offset log pinning batch composition,
    so omitting ``checkpoint_location`` silently downgrades replay to
    at-most-once — callers must either pass a durable location or
    opt out explicitly with ``ephemeral=True`` (ADVICE r14)."""
    if checkpoint_location is None and not ephemeral:
        raise ValueError(
            "stream_ivfpq_ingest: the exactly-once contract requires a "
            "durable checkpoint_location (the offset log pins batch "
            "composition across restarts); pass ephemeral=True to "
            "accept at-most-once replay semantics deliberately"
        )

    # quantizers are immutable for the stream's lifetime: read once,
    # close over them (saves a params first() job + two footer reads
    # per micro-batch)
    quantizers = read_ivfpq_quantizers(
        emb_stream.sparkSession, index_path
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        ann_ingest_batch(
            batch_df, batch_id, index_path, id_col=id_col, vec_col=vec_col,
            quantizers=quantizers,
        )

    writer = (
        emb_stream.writeStream.foreachBatch(sink)
        .queryName(query_name)
        .trigger(availableNow=True)
    )
    if checkpoint_location is not None:
        writer = writer.option("checkpointLocation", checkpoint_location)
    q = writer.start()
    q.awaitTermination()
