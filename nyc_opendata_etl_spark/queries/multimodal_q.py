"""Multimodal queries: synthesize a media table from ``documents``,
drive the Arrow/mapInPandas feature pipeline, and oracle-check the
deterministic feature math in DuckDB (payload = utf-8 prefix bytes, so
byte features are SQL-expressible)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_opendata_etl_spark.operators import multimodal
from nyc_opendata_etl_spark.queries import register
from nyc_opendata_etl_spark.sources.tables import load_table


@register(
    "multimodal_features",
    oracle="""
    WITH m AS (
        SELECT doc_id AS media_id, encode(substring(text, 1, 64)) AS payload
        FROM documents
    )
    SELECT m.media_id,
           CAST(octet_length(m.payload) AS BIGINT) AS n_bytes,
           CAST(ascii(substring(d.text, 1, 1)) AS INT) AS first_byte
    FROM m JOIN documents d ON d.doc_id = m.media_id
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload features through the real mapInPandas path; the oracle
    recomputes n_bytes and first_byte from the same synthetic payloads
    (last_byte/byte_sum need byte iteration DuckDB lacks — covered by
    unit tests instead)."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.synthesize_media(docs)
    return multimodal.extract_features(media).select(
        "media_id", "n_bytes", "first_byte"
    )


@register(
    "multimodal_metadata_agg",
    oracle="""
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS kind,
           count(*) AS n,
           CAST(sum(length(text) % 640 + 1) AS BIGINT) AS total_width,
           CAST(max(length(text) % 30 + 1) AS INT) AS max_frames
    FROM documents
    GROUP BY 1
    """,
)
def q_multimodal_metadata_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregation: stays fully columnar, payload column
    pruned from the scan entirely (the split-payload design's payoff)."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.synthesize_media(docs)
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum("width").cast("long").alias("total_width"),
        F.max("n_frames").alias("max_frames"),
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH videos AS (
        SELECT doc_id AS media_id,
               CAST(length(text) % 30 + 1 AS INT) AS n_frames,
               substr(text, 1, 64) AS prefix
        FROM documents WHERE doc_id % 3 = 2
    ),
    fan AS (
        SELECT media_id, prefix,
               unnest(range(0, greatest(n_frames - 1, 0) + 1, 5)) AS frame_idx
        FROM videos
    )
    SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
           hex(encode(substr(prefix, CAST(frame_idx AS INT) + 1, 8)))
               AS frame_hex
    FROM fan
    """,
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling over the synthesized media table (every 5th
    frame index, stub byte slice per frame). The fan-out, the sampled
    indices, and the sliced bytes are all deterministic functions of
    content, so the DuckDB oracle replays them exactly — the slice is
    emitted as hex so both engines hash identical values (upgraded from
    the earlier rows-only check). DuckDB substring is VARCHAR-only, so
    the oracle slices the text prefix before utf-8 encoding; the
    documents corpus is ASCII (verified: length == octet_length for
    every row), making that byte-identical to Spark's payload slice."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.synthesize_media(docs)
    frames = multimodal.sample_frames(media)
    return frames.select(
        "media_id",
        "frame_idx",
        F.hex("frame_payload").alias("frame_hex"),
    )
