"""Query registry: every engine operator exposed as a named query.

Each entry pairs a PySpark implementation ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) a DuckDB oracle SQL string over the same
parquet tables — the driver's differential-correctness contract
(``/root/repo/__spark_entry__.py``). Column names/types are aligned on
both sides because the driver hashes values after sorting columns by
name.

Modules self-register on import via :func:`register`.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QueryDef(fn, oracle)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import all query modules (self-registering)."""
    global _LOADED
    if _LOADED:
        return
    from nyc_opendata_etl_spark.queries import (  # noqa: F401
        parity,
        relational,
        llm_ops,
        event_windows,
        pipeline,
        multimodal_q,
    )

    _LOADED = True
