"""nyc_opendata_etl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference ETL
(radiation/nyc-opendata-etl: pandas star-schema builder, surveyed in
/root/repo/SURVEY.md) as an idiomatic Spark DataFrame engine, extended
with the general query surface (aggregation, windows, joins, set ops)
and LLM-data-pipeline operators (dedup, similarity search, text
analysis, streaming) designed for 100 TB scale.

Layout:
    session     — tuned SparkSession factory
    functions/  — scalar expression library (hashing, normalize, datetime)
    operators/  — relational + pipeline operators (keys, dims, facts,
                  dedup, similarity, text)
    sources/    — table registry / schema reconciliation / connectors
    streaming/  — Structured Streaming jobs over the events table
    plans/      — plan inspection helpers (explain audits)
"""

__version__ = "0.1.0"
