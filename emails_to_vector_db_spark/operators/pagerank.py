"""Distributed PageRank over an edge-list DataFrame.

The canonical iterative graph pattern on Spark (the same join-agg loop
as GraphX/Pregel, expressed on DataFrames): per iteration, the rank
VECTOR (one row per node) joins the static edge list and re-aggregates
by destination. The scale discipline that matters at 100 TB:

- the EDGE list — the big relation — is materialized once, pre-joined
  with out-degrees, and cached; iterations never shuffle it again
  beyond the src-keyed join;
- what moves per iteration is the rank vector (|V| rows, tiny next to
  |E|), the "ship the vector, not the graph" shape;
- iteration count is fixed (power iteration, damping 0.85); lineage
  grows by one join-agg per iteration, fine for small iteration counts
  (checkpoint periodically for long runs — same pattern as
  operators/bpe.py).

Dangling nodes (out-degree 0) cannot occur for symmetric edge lists
(every dst is a src); the builder in plans/graph.py symmetrizes, so no
dangling-mass redistribution term is needed — with asymmetric input,
dropped mass would make ranks sum below 1 (documented, guarded by the
caller).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iters: int = 3,
    damping: float = 0.85,
    broadcast_vector: bool = True,
) -> DataFrame:
    """Power-iteration PageRank.

    ``edges``: distinct directed (src: string, dst: string) pairs.
    Returns (node: string, pr: double) after ``n_iters`` iterations
    from the uniform vector. Deterministic given the edge set.

    ``broadcast_vector`` (default): the rank vector is broadcast into
    the cached edge list each iteration — the EDGE relation is scanned
    map-side with NO shuffle; the per-iteration shuffle is only the
    |V|-sized partial-aggregated contribution. This is the right plan
    while |V| fits the broadcast budget (hundreds of millions of edges,
    millions of nodes). Beyond that, pass False for the co-partitioned
    shuffle join (|V| rows repartitioned onto the edge partitioning) —
    the GraphX-style layout.
    """
    from pyspark.sql import Window

    # out-degree via an unordered window over the src partitioning: ONE
    # shuffle of the edge list, no agg+re-join second pass
    ed = edges.withColumn(
        "deg",
        F.count(F.lit(1)).over(Window.partitionBy("src")).cast("double"),
    ).cache()
    nodes = edges.select(F.col("src").alias("node")).distinct().cache()
    n = nodes.count()  # |V|: part of the algorithm, not plan-time sniffing
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    for _ in range(n_iters):
        vec = F.broadcast(ranks) if broadcast_vector else ranks
        contrib = (
            ed.join(vec, ed["src"] == vec["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("mass"))
        )
        ranks = nodes.join(
            F.broadcast(contrib) if broadcast_vector else contrib,
            nodes["node"] == contrib["dst"],
            "left",
        ).select(
            "node",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))
            ).alias("pr"),
        )
    # ed/nodes stay cached: the returned plan reuses them per iteration
    # when executed; callers (bench, tests) clearCache() after.
    return ranks
