"""Generic file-format ingestion beyond parquet: CSV and JSON-lines.

The reference ingests schemaless JSON from Socrata and compensates for
drift defensively (SURVEY §1.3). These readers generalize that posture
to file drops — the common way raw data actually arrives next to a
lake — with the same reconciliation idioms: explicit target schema,
header normalization, permissive parsing (corrupt rows → null columns,
never job failure).

Scale notes: CSV/JSON are line-splittable, so both readers parallelize
across the cluster like parquet scans (minus columnar pruning —
ingestion should land parquet immediately, which `to_parquet` does;
at 100 TB you read CSV exactly once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from nyc_opendata_etl_spark.functions.normalize import normalize_headers


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV scan. With an explicit schema, malformed cells become NULLs
    (PERMISSIVE mode ≙ pandas errors="coerce"); without one, a single
    inference pass is paid and everything arrives as inferred types.
    Headers are normalized (lowercase, whitespace→underscore) like the
    reference's parking loader (load_parking.py:57-63)."""
    reader = spark.read.option("header", str(header).lower()).option(
        "mode", "PERMISSIVE"
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return normalize_headers(reader.csv(path))


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """JSON-lines scan (one object per line — the Socrata-record shape,
    SURVEY §2 S5). Explicit schema skips the inference pass; missing
    fields arrive as NULL, extra fields are dropped — the reference's
    drift behavior, for free."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return normalize_headers(reader.json(path))


def write_csv(df: DataFrame, path: str, mode: str = "append") -> None:
    df.write.option("header", "true").mode(mode).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "append") -> None:
    df.write.mode(mode).json(path)


def to_parquet(df: DataFrame, path: str, mode: str = "append") -> None:
    """Land ingested data as parquet immediately — the one-time format
    conversion that buys columnar pruning for every later query."""
    df.write.mode(mode).parquet(path)


def write_orc(df: DataFrame, path: str, mode: str = "append") -> None:
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — the other columnar lake format Spark reads natively
    (vectorized reader, predicate pushdown and column pruning like
    parquet). Schema travels in the file footer, so no inference pass
    and no drift reconciliation is needed; headers still normalize for
    consistency with the CSV/JSONL paths."""
    return normalize_headers(spark.read.orc(path))
