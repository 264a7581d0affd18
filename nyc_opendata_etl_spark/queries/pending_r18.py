"""Round-18 registrations, staged (the pending_r13..r17 playbook):
ops built in round 16 AFTER pending_r17 already held the four flips
round 17's verdict window can afford (4 flips + the 45-query r12
cohort + 1 ADVICE spare = 50 — see NOTES "Round 17 plan"). Staging
them here keeps the cohort-clear promise intact; flip cost comes out
of round 18's spare slots.

NOT imported by ``queries._load_all``: nothing here reaches
``queries()`` until round 18 flips it on. Until then the queries run
under the exact driver compare via
tests/test_round16_ops.py::test_pending_r18_passes_the_driver_compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_opendata_etl_spark.queries.pending_r17 import KNN_RANKED_CTE
from nyc_opendata_etl_spark.sources.tables import load_table

PENDING: dict[str, tuple] = {}


def _pending(name: str, oracle: str):
    def deco(fn):
        PENDING[name] = (fn, oracle)
        return fn

    return deco


@_pending(
    "corpus_knn_label",
    # knn protocol CTE shared VERBATIM with similarity_knn_join's
    # oracle; only the vote aggregation is new
    oracle=KNN_RANKED_CTE
    + """
    , lab AS (
        SELECT r.query_id, e2.label
        FROM ranked r JOIN embeddings e2 ON r.vec_id = e2.vec_id
        WHERE r.rk <= 5 AND e2.label IS NOT NULL
    ),
    v AS (
        SELECT query_id, label, count(*) AS votes
        FROM lab GROUP BY 1, 2
    )
    SELECT query_id,
           CAST(first(label ORDER BY votes DESC, label) AS INT)
               AS pred_label,
           CAST(first(votes ORDER BY votes DESC, label) AS BIGINT)
               AS votes,
           CAST(sum(votes) AS BIGINT) AS n_neighbors
    FROM v GROUP BY query_id
    """,
)
def q_corpus_knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label transfer (operators/similarity.knn_label): the
    ``vec_id % 20 == 3`` query slice is classified by the majority
    label of its top-5 knn_join neighbors — the quality-classifier
    bootstrap of LLM data curation (hand-label a seed, propagate
    through embedding neighborhoods, train the cheap classifier on
    the propagation). Pure composition: knn_join (same cells/probe/k
    as similarity_knn_join — the oracle literally shares its WITH
    chain) + a label join-back on a bounded Q·k relation + two hash
    aggregates with a (votes, smaller-label) deterministic tie. Votes
    count labeled neighbors only."""
    from nyc_opendata_etl_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings", spread_input=True)
    return similarity.knn_label(
        emb,
        emb.filter(F.col("vec_id") % 20 == 3),
        n_centroids=64,
        n_probe=2,
        k=5,
    )
