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

__all__ = ["pagerank_int", "triangle_count"]


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


def triangle_count(
    edges: DataFrame, materialize_input: bool = True
) -> DataFrame:
    """Exact global triangle count via degree-ordered orientation +
    neighborhood-list intersection.

    ``edges``: undirected simple graph as distinct ``(a, b)`` rows with
    ``a < b`` (no self-loops, no duplicates). Returns ONE row:
    ``(n_edges, n_wedges, n_triangles, global_clustering)`` where
    ``n_wedges = Σ_v C(deg(v), 2)`` and ``global_clustering =
    3·triangles / wedges`` (the transitivity ratio).

    Algorithm: orient every edge from the endpoint SMALLER in the total
    order ``(degree, id)`` to the larger — each triangle then has
    exactly one vertex with two out-edges, so
    ``Σ_{(v,w)∈oriented} |N⁺(v) ∩ N⁺(w)|`` counts each triangle exactly
    once. The out-neighborhoods are materialized as sorted arrays and
    joined onto the edge list, so the SHUFFLE volume is O(m) rows plus
    each node's list once per incident oriented edge — the O(m^1.5)
    wedge work happens CPU-side inside array_intersect, never as
    shuffled rows (measured at sf0.1: ~4× faster than materializing
    the 41M-row wedge relation this replaced). Orientation bounds
    out-degrees by O(√m), so hub vertices cannot blow up either the
    array sizes or the intersection cost — that bound is what keeps
    the plan runnable on power-law graphs at corpus scale. The
    adjacency relation is O(|V|) rows and unhinted: AQE broadcasts it
    while it fits and falls back to a shuffle join beyond that.

    Determinism: every quantity is an exact integer; the clustering
    coefficient is one double division of two exact BIGINTs rounded to
    6 dp, so a DuckDB oracle reproduces it bit-for-bit.
    """
    # edges feeds four consumers (degrees, edge count, both orientation
    # sides) — materialize once so an expensive upstream edge build
    # (e.g. a basket self-join) doesn't replay per consumer. Callers
    # reading a staged/bucketed edge table pass materialize_input=False:
    # replaying a clustered scan is cheaper than checkpointing it (and
    # checkpointing would discard the scan's bucketing distribution).
    if materialize_input:
        edges = edges.localCheckpoint(eager=False)
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    n_edges = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    n_wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).cast("long").alias("n_wedges")
    )

    # deg is O(|V|) rows — same cardinality class as the adjacency
    # relation below, so it gets the same treatment: no broadcast hint.
    # AQE broadcasts it while it fits executor memory and falls back to
    # a shuffle join on graphs whose vertex set is too large to ship.
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    e = edges.join(da, "a").join(db, "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    ).localCheckpoint(eager=False)  # reused by adjacency + edge probe

    adj = oriented.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("nbrs")
    )
    av = adj.select(F.col("src").alias("__v__"), F.col("nbrs").alias("nv"))
    aw = adj.select(F.col("src").alias("__w__"), F.col("nbrs").alias("nw"))
    n_tri = (
        oriented.join(av, oriented.src == F.col("__v__"), "inner")
        .join(aw, oriented.dst == F.col("__w__"), "inner")
        .select(F.size(F.array_intersect("nv", "nw")).alias("c"))
        .agg(F.sum("c").cast("long").alias("n_triangles"))
    )

    return (
        n_edges.crossJoin(F.broadcast(n_wedges))
        .crossJoin(F.broadcast(n_tri))
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
            ).alias("global_clustering"),
        )
    )
