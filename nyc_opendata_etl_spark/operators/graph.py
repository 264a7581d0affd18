"""Iterative graph centrality over DataFrame edge lists (weighted
PageRank), engineered for exact cross-engine verification.

Floating-point PageRank is order-dependent (double sums differ by
partitioning), so this implementation runs entirely in scaled INTEGER
arithmetic: ranks carry ``SCALE = 10^12`` fixed-point units, every
division is a floor-div, and every aggregate is an exact long sum —
independent of row order, partitioning, and engine. A DuckDB oracle
can therefore replay the identical recurrence to the last unit (see
``queries/relational.py:graph_pagerank_trade``).

Recurrence (damping d = 85/100, all ops integer):

    r_0(v)      = SCALE // N
    contrib(u→v) = r_k(u) * w(u,v) // W(u)          W(u) = total out-weight
    r_{k+1}(v)  = (SCALE // N) * 15 // 100  +  85 * Σ_in contrib // 100

Dangling-node mass leaks (the standard simplification); nodes with no
in-edges keep the teleport base. Overflow bound: r * w stays inside
int64 while ``max_rank * max_edge_weight < 2^63`` — with SCALE = 1e12
that allows per-edge weights up to ~9e6 per unit of rank share; the
caller aggregates edges first, so weights are bounded by design.

Scale shape: the expensive part at 100 TB is building the edge list
(one aggregated shuffle, done once, cached); each iteration joins the
tiny rank relation (|V| rows) to the edges — the rank side broadcasts,
so iterations add no shuffle of the edge mass. O(K) tiny jobs, no
driver-side data movement beyond the loop counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12
DAMP_NUM, DAMP_DEN = 85, 100

__all__ = ["pagerank_int"]


def pagerank_int(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    id_col: str = "node_id",
) -> DataFrame:
    """Weighted PageRank in exact fixed-point arithmetic.

    ``nodes``: one column ``id_col`` (every vertex, including edge-less
    ones). ``edges``: ``src``, ``dst``, ``weight`` (long, positive,
    pre-aggregated per (src, dst)). Returns (id_col, rank_scaled) with
    ``rank_scaled`` in SCALE fixed-point units after ``iterations``
    synchronous updates.
    """
    n = nodes.count()  # |V| is tiny metadata (bounded), not data motion
    init = SCALE // n
    base = init * (DAMP_DEN - DAMP_NUM) // DAMP_DEN

    out_w = edges.groupBy("src").agg(F.sum("weight").alias("w_out"))
    e = edges.join(out_w, "src").select("src", "dst", "weight", "w_out")
    e = e.localCheckpoint(eager=False)  # edges reused every iteration

    ranks = nodes.select(F.col(id_col), F.lit(init).cast("long").alias("r"))
    for _ in range(iterations):
        contrib = (
            e.join(
                F.broadcast(ranks), e.src == F.col(id_col), "inner"
            )
            .select(
                "dst",
                F.expr("(r * weight) div w_out").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        # contrib has at most |V| rows (grouped by dst) — provably
        # bounded, so the hint is always safe.
        ranks = (
            nodes.join(F.broadcast(contrib), nodes[id_col] == contrib.dst, "left")
            .select(
                F.col(id_col),
                (
                    F.lit(base)
                    + F.expr(f"({DAMP_NUM} * coalesce(s, 0)) div {DAMP_DEN}")
                ).cast("long").alias("r"),
            )
        )
    return ranks.select(F.col(id_col), F.col("r").alias("rank_scaled"))
