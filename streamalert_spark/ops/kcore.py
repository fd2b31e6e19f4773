"""k-core decomposition (fixed k): iterative degree peeling.

The k-core is the maximal subgraph where every node keeps >= k neighbors
INSIDE the subgraph — the standard dense-region extractor (community
cores, spam/bot rings, hub backbones) that degree filtering alone cannot
compute because removals cascade: dropping one weak node can demote its
neighbors below k.

Distributed peel: each round recomputes alive-degrees with two
key-partitioned joins against the shrinking alive set and drops nodes
below k; rounds repeat until a fixpoint. Round count is the peel depth
of the graph (small for real graphs — cascades are local), NOT the
diameter; each round localCheckpoint()s to truncate lineage and the only
driver values are the per-round alive counts (the convergence check —
same metadata-scale discipline as k-means and connected components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kcore(
    edges: DataFrame,
    k: int,
    a_col: str = "a",
    b_col: str = "b",
    max_iterations: int = 20,
) -> DataFrame:
    """Nodes of the k-core with their within-core degree: (node,
    core_deg). ``edges`` is an undirected edge list (one row per edge,
    any orientation, self-loops ignored)."""
    sym = (
        edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .unionByName(
            edges.select(F.col(b_col).alias("a"), F.col(a_col).alias("b"))
            .filter(F.col("a") != F.col("b")))
        .distinct()
        .localCheckpoint()
    )
    alive = sym.select(F.col("a").alias("node")).distinct().localCheckpoint()
    n_prev = alive.count()
    converged = n_prev == 0
    for _ in range(max_iterations):
        deg = (
            sym.join(alive.select(F.col("node").alias("a")), "a")
            .join(alive.select(F.col("node").alias("b")), "b")
            .groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
        )
        new_alive = (deg.filter(F.col("deg") >= k)
                     .select(F.col("a").alias("node"))
                     .localCheckpoint())
        n_new = new_alive.count()
        alive = new_alive
        if n_new == n_prev:
            converged = True
            break
        n_prev = n_new
    if not converged:
        # a silently-unpeeled result is NOT a k-core; callers comparing
        # against a bounded-iteration oracle must also pass a matching cap
        raise RuntimeError(
            f"k-core peel did not converge within {max_iterations} rounds")
    return (
        sym.join(alive.select(F.col("node").alias("a")), "a")
        .join(alive.select(F.col("node").alias("b")), "b")
        .groupBy(F.col("a").alias("node"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_deg"))
    )


def ktruss(
    edges: DataFrame,
    k: int,
    rounds: int,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """k-truss pruning: keep edges participating in >= k-2 triangles of
    the CURRENT subgraph, repeated for ``rounds`` prune rounds (removals
    cascade — dropping one weak edge can demote the triangles of its
    neighbors, which is why triangle-count filtering alone is not a
    truss). A fixed round count keeps the computation oracle-checkable
    (the DuckDB twin unrolls the same rounds as MATERIALIZED CTEs — the
    k-means precedent); production runs until the per-round removed
    count hits zero, same loop.

    Output: surviving (a, b, sup) with each edge's final-round support.

    Scale per round: triangles via the ordered-wedge join (edges
    oriented low->high so hub fan-out is bounded), support = one
    partial-aggregated union count, prune = one edge-keyed join. Each
    round localCheckpoint()s to truncate lineage; NOTHING is collected
    to the driver.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if k < 3:
        # the prune inner-joins support counts onto edges, so edges in zero
        # triangles drop unconditionally — correct for k >= 3 (minsup >= 1),
        # wrong for k <= 2 where the truss is every edge. Reject rather
        # than silently return the 3-truss.
        raise ValueError("k must be >= 3 (the 2-truss is the edge set itself)")
    e = (
        edges.select(F.least(a_col, b_col).alias("a"),
                     F.greatest(a_col, b_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    minsup = k - 2
    out = None
    for _ in range(rounds):
        e1 = e.select(F.col("a").alias("a"), F.col("b").alias("w"))
        e2 = e.select(F.col("a").alias("w"), F.col("b").alias("c"))
        wedges = e1.join(e2, "w").select("a", F.col("w").alias("b"), "c")
        tri = wedges.join(
            e.select(F.col("a").alias("a"), F.col("b").alias("c")),
            ["a", "c"])
        sup = (
            tri.select(F.col("a").alias("x"), F.col("b").alias("y"))
            .unionByName(tri.select(F.col("b").alias("x"),
                                    F.col("c").alias("y")))
            .unionByName(tri.select(F.col("a").alias("x"),
                                    F.col("c").alias("y")))
            .groupBy(F.col("x").alias("a"), F.col("y").alias("b"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("sup"))
        )
        out = (sup.join(e, ["a", "b"])
               .filter(F.col("sup") >= minsup)
               .localCheckpoint())
        e = out.select("a", "b")
    return out
