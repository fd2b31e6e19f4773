"""Integer-arithmetic PageRank — node-importance ranking over a document
graph (duplicate clusters, link graphs, citation webs): which node is
the natural canonical representative.

All arithmetic is INTEGER: every node starts with mass S = 10^12; each
iteration a node sends (mass * d_num) DIV (d_den * out_degree) to
every out-neighbor and keeps the teleport term (S * (d_den - d_num))
DIV d_den. The damping step is TRUE integer division (Spark `DIV`,
never a double round-trip), so the result is exact at any mass/degree
magnitude — integer sums are order-independent, which makes a
fixed-iteration run bit-identical across engines (float PageRank hangs
cross-engine equality on summation order). The trade: mass is not perfectly conserved (floor
truncation), which affects no ranking use case.

Scale per iteration: one join of masses onto edges (keyed src) + one
partial-aggregated sum keyed dst — the standard distributed PR shape;
out-degrees are computed once. A fixed small iteration count also makes
the operator SQL-expressible by unrolling, so it stays oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

START_MASS = 10**12


def integer_pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, mass) after ``iters`` integer-PageRank steps over a
    directed edge list. Nodes = union of srcs and dsts; sinks (no
    out-edges) keep only the teleport term."""
    from streamalert_spark.ops.dedup import _swap_cache

    nodes = _swap_cache("pr_nodes", (
        edges.select(F.col(src_col).alias("node"))
        .unionByName(edges.select(F.col(dst_col).alias("node")))
        .distinct()
    ))
    # degrees are loop-INVARIANT: fold them onto the edge list once and
    # cache, so an iters-deep lineage does not recompute the edge
    # build + degree aggregate per iteration (each iteration's plan
    # embeds every prior one — without the cache the source scan and
    # degree shuffle run O(iters) times in the final single-job DAG).
    # _swap_cache bounds the footprint to one copy per process across
    # repeated invocations.
    degrees = edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("deg"))
    edges_deg = _swap_cache("pr_edges_deg", edges.join(degrees, src_col))
    base = (START_MASS * (damping_den - damping_num)) // damping_den
    masses = nodes.withColumn("mass", F.lit(START_MASS).cast("bigint"))
    for _ in range(iters):
        contribs = (
            edges_deg.join(masses, edges_deg[src_col] == masses["node"])
            .select(
                F.col(dst_col).alias("node"),
                # bigint DIV bigint — exact beyond 2^53, where a
                # floor(double-division) could round the quotient
                F.expr(f"(mass * {damping_num}) DIV ({damping_den} * deg)")
                 .cast("bigint").alias("c"),
            )
            .groupBy("node").agg(F.sum("c").alias("in_mass"))
        )
        masses = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("in_mass"), F.lit(0)))
                .cast("bigint").alias("mass"),
            )
        )
    return masses
