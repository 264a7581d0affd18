"""Round-15 registration, staged (the pending_r13/r14 playbook): the
INCREMENTAL near-dup cluster map built late in round 14 after the r14
verdict window was already slot-exact at 50 (registering would evict
r9-cohort greens past what the round promised).

NOT imported by ``queries._load_all``: nothing here reaches
``queries()`` until round 15 flips it on (add ``pending_r15`` to the
import list and make ``_pending`` call ``register`` — the same
one-line flip r13 and r14 each executed). Until then the pair runs
under the exact driver compare via
tests/test_round14_ops.py::test_pending_r15_pair_passes_the_driver_compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_opendata_etl_spark.queries import REGISTRY, llm_ops  # noqa: F401
from nyc_opendata_etl_spark.sources.tables import load_table

PENDING: dict[str, tuple] = {}


def _pending(name: str, oracle: str):
    def deco(fn):
        PENDING[name] = (fn, oracle)
        return fn

    return deco


def _stage_dup_cluster_index_incr(spark: SparkSession, sf_dir: str) -> str:
    """Stage the incremental cluster-map artifact once per corpus
    version: base build from the even half, one maintenance batch
    folding in the odd half (operators/cluster_index.py). _INCR_DONE
    is written last, proving both phases completed."""
    import os

    from nyc_opendata_etl_spark.operators import cluster_index as ci
    from nyc_opendata_etl_spark.sources.staging import is_stale, stage_dir

    path = stage_dir(sf_dir, "dup_cluster_index_incr")
    if is_stale(path, sf_dir, "documents", marker="_INCR_DONE"):
        docs = load_table(spark, sf_dir, "documents")
        ci.build_dup_cluster_index(docs.filter(F.col("doc_id") % 2 == 0), path)
        ci.update_dup_cluster_index(
            spark, docs.filter(F.col("doc_id") % 2 == 1), path
        )
        with open(os.path.join(path, "_INCR_DONE"), "w") as fh:
            fh.write("")
    return path


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
