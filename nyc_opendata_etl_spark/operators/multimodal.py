"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing is real and tested — schemas, batch iteration,
partition behavior, output typing. The *codec* step is a deterministic
stub (this container has no image/audio libraries): ``decode_image``
documents exactly where PIL/libvips/ffmpeg would plug in, and
``_fake_decode`` stands in with a reproducible transform so the
pipeline shape can be verified end-to-end (the brief's instruction:
stub the decode, make the plumbing real).

Scale notes: mapInPandas streams Arrow record batches — payload bytes
never materialize on the driver, and each task transforms its batches
independently (embarrassingly parallel, no shuffle). Metadata-only
operations (filtering by width, grouping by codec) stay native-columnar
and never touch the blobs, which is the point of splitting payload from
typed metadata.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("codec", StringType()),      # e.g. jpeg / pcm16 / h264
        StructField("width", IntegerType()),     # images/video
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),  # video/audio samples
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("last_byte", IntegerType()),
        StructField("byte_sum_mod", LongType()),
    ]
)


def synthesize_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media table from a text table: payload =
    utf-8 bytes of the text prefix; metadata derived from content."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.when(F.col(id_col) % 3 == 0, "jpeg")
        .when(F.col(id_col) % 3 == 1, "pcm16")
        .otherwise("h264")
        .alias("codec"),
        (F.length(text_col) % 640 + 1).cast("int").alias("width"),
        (F.length(text_col) % 480 + 1).cast("int").alias("height"),
        (F.length(text_col) % 30 + 1).cast("int").alias("n_frames"),
        F.encode(F.substring(F.col(text_col), 1, 64), "UTF-8").alias("payload"),
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real codec. A real implementation
    would be e.g. ``PIL.Image.open(io.BytesIO(payload))`` — unavailable
    in this container, so features derive from raw bytes."""
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else None,
        "last_byte": payload[-1] if payload else None,
        "byte_sum_mod": sum(payload) % 997,
    }


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(lambda b: _fake_decode(bytes(b)))
            out = pd.DataFrame(list(feats))
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=FEATURE_SCHEMA
    )


def resize_images(media: DataFrame, max_dim: int = 224) -> DataFrame:
    """'Resize' pass: real implementations decode + resample; the stub
    truncates payloads proportionally and rewrites metadata. Only image
    rows are touched; others pass through (payload untouched) — the
    filter happens BEFORE the Python boundary, so non-image blobs never
    cross into Arrow."""
    images = media.filter(F.col("kind") == "image")
    others = media.filter(F.col("kind") != "image")

    schema = media.schema

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            scale = (max_dim / pdf[["width", "height"]].max(axis=1)).clip(upper=1.0)
            pdf = pdf.copy()
            pdf["width"] = (pdf["width"] * scale).astype("int32").clip(lower=1)
            pdf["height"] = (pdf["height"] * scale).astype("int32").clip(lower=1)
            # stub for decode→resample→re-encode:
            pdf["payload"] = [
                bytes(b)[: max(1, int(len(bytes(b)) * s))]
                for b, s in zip(pdf["payload"], scale)
            ]
            yield pdf

    return images.mapInPandas(batches, schema=schema).unionByName(others)


def sample_frames(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame sampling for video rows: emit one row per sampled frame
    index (metadata fan-out stays columnar; the stub slices bytes)."""
    videos = media.filter(F.col("kind") == "video")
    return videos.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
        F.col("payload"),
    ).withColumn(
        "frame_payload",
        F.expr("substring(payload, frame_idx + 1, 8)"),  # stub frame slice
    ).drop("payload")
