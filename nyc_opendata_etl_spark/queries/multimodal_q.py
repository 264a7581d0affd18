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


@register("multimodal_frame_sample")  # structural fan-out → rows-only
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.synthesize_media(docs)
    return multimodal.sample_frames(media)
