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


# The correctness driver verifies only the first ~50 registry entries per
# round, so registry ORDER decides which queries get a hard driver
# verdict. Queries WITHOUT a green driver row yet come first: the
# long-deferred `_DEFER_R2` set, then anything newly registered this
# round, then the already-green remainder (union of CORRECTNESS_r01-r04).
_DRIVER_GREEN_R1_R4 = (
    "time_keys",
    "ampm_parse_time",
    "bool_flag",
    "join_asof",
    "json_extract",
    "json_agg_by_key",
    "map_props_agg",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "unpivot_measures",
    "profile_columns",
    "array_hof_pipeline",
    "join_interval_bucketed",
    "text_token_stats",
    "text_quality",
    "text_lang_id",
    "dedup_embedding_cosine",
    "similarity_ann_ivf",
    "text_tfidf_top",
    "dedup_clusters",
    "join_skew_salted",
    "corpus_curation",
    "corpus_split",
    "dedup_incremental",
    "text_pii_scan",
    "dedup_embedding_lsh",
    "text_unigram_logprob",
    "corpus_decontaminate",
    "corpus_pack_sequences",
    "corpus_chunk_docs",
    "corpus_sample_stratified",
    "window_tumbling",
    "window_session",
    "stream_tumbling_backfill",
    "stream_stateful_dedup",
    "stream_watermark_dedup",
    "stream_interval_join",
    "events_funnel",
    "events_cohort_retention",
    "events_ewma",
    "quality_validation",
    "events_sessionize",
    "rollup_incremental",
    "rollup_hll_distinct",
    "pipeline_311_fact",
    "pipeline_parking_fact",
    "scd2_merge",
    "multimodal_features",
    "multimodal_metadata_agg",
    "multimodal_frame_sample",
)
_ROUND1_GREEN = (
    "star_revenue",
    "dim_surrogate",
    "dim_first_per_group",
    "assign_keys_left",
    "generated_date_dim",
    "generated_time_dim",
    "date_keys",
    "normalize_clean",
    "numeric_coercion",
    "union_by_name",
    "filter_window",
    "project_defensive",
    "q1_pricing_summary",
    "agg_rollup",
    "agg_cube",
    "agg_count_distinct",
    "agg_approx_distinct",
    "topk_orders",
    "window_rank",
    "window_lag_lead",
    "window_moving_sum",
    "join_inner_agg",
    "join_semi",
    "join_anti",
    "join_full_outer",
    "join_range",
    "set_intersect",
    "set_except",
    "explode_tokens",
    "agg_grouping_sets",
    "agg_percentile",
    "pivot_orderstatus",
    "window_range_frame",
    "window_distribution",
    "agg_stats",
    "fuzzy_name_match",
    "dedup_exact",
    "dedup_fingerprint",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_cosine_topk",
    "similarity_ann_lsh",
)


# Queries deferred out of earlier rounds' driver prefixes (their
# operator families carried green rows; all remain locally
# oracle-verified). As of round 5 these are the only pre-round-5 queries
# with no driver verdict, so they lead the registry now.
_DEFER_R2 = (
    "text_length_histogram",   # text-analysis family: 6 siblings in prefix
    "text_ngram_topk",         # n-gram explode+count: tfidf/jaccard in prefix
    "text_rolling_hash",       # fingerprint family: dedup_fingerprint green r1
    "text_repetition",         # same expression family as text_quality
    "corpus_domain_mix",       # plain agg+ratio: agg family green r1
    "events_transitions",      # lag-window family: window_lag_lead green r1
    "events_user_sequences",   # collect_list family; capped variant tested
    "window_sliding",          # window family: tumbling+session in prefix
    "agg_distinct_twophase",   # distinct family: agg_count_distinct green r1
    "graph_pagerank_trade",    # new this round; locally oracle-verified
    "set_except_all",          # set-op family green r1
    "set_intersect_all",       # set-op family green r1
    "q18_large_volume_customer",  # star family: q3/q5 lead this round
    "events_gapfill_locf",     # events family well-represented in prefix
    "agg_listagg_ordered",     # agg family green r1
    "audit_constraints",       # quality family: quality_validation in prefix
    "profile_drift",           # profiling family: profile_columns in prefix
    "scd2_point_in_time",      # warehouse family: scd2_merge in prefix
    "dedup_keep_best",         # dedup family: clusters/jaccard in prefix
)


# Driver-green in earlier rounds but materially changed in round 5
# (rows-only checks upgraded to full value oracles) — re-verify under
# the new oracles, right behind the never-verified block.
_RECHECK_R5 = (
    "dedup_minhash_lsh",
    "dedup_simhash",
    "multimodal_frame_sample",
)


def _ordered() -> dict[str, QueryDef]:
    _load_all()
    green = set(_DRIVER_GREEN_R1_R4) | set(_ROUND1_GREEN)
    # Unverified queries lead so they land inside the driver's checked
    # prefix: long-deferred ones first (oldest debt), then anything new
    # this round, then queries whose oracle changed this round, then the
    # already-driver-green remainder in a stable rotation (most recently
    # verified last).
    names = [n for n in _DEFER_R2 if n in REGISTRY]
    names += [n for n in REGISTRY if n not in green and n not in set(_DEFER_R2)]
    names += [n for n in _RECHECK_R5 if n in REGISTRY]
    names += [
        n for n in _DRIVER_GREEN_R1_R4 if n in REGISTRY and n not in set(_RECHECK_R5)
    ]
    names += [n for n in _ROUND1_GREEN if n in REGISTRY]
    return {n: REGISTRY[n] for n in names}


def queries() -> dict[str, QueryFn]:
    return {name: qd.fn for name, qd in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in _ordered().items() if qd.oracle is not None}


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
        tpch,
    )

    _LOADED = True
