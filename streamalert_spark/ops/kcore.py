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
