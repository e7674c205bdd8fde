"""Graph analytics over the warehouse: PageRank centrality on the
customer–supplier transaction graph.

Not in the reference (its only graph-shaped structure is the implicit
products⋈embeddings key, ``rag.py:48``), but a first-class curation
tool for large corpora: link-graph centrality is the classic quality /
importance prior for web-scale training data (the original PageRank use
case), and the Spark shape — static cached edge list, per-iteration
join-agg shipping only the rank vector — is the template for every
iterative graph pass (see operators/pagerank.py; near-dup connected
components in operators/components.py is the other instance).

Oracle: power iteration with a FIXED iteration count unrolls exactly
into SQL — one CTE per iteration replaying the same join-agg — so the
whole iterative computation is hash-checked, not rows-only. Ranks are
rounded to 6dp on both sides and the top-k ordering sorts by the
ROUNDED value (then node id), so float-association noise in the last
ulp cannot flip membership or order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emails_to_vector_db_spark.plans.registry import register
from emails_to_vector_db_spark.sources.tables import load_table

N_ITERS = 3
DAMPING = 0.85
TOP_K = 20


def _pagerank_oracle() -> str:
    iters = []
    prev = "r0"
    for i in range(1, N_ITERS + 1):
        iters.append(
            f"""r{i} AS (
    SELECT nodes.node,
           (1 - {DAMPING}) / nv.n + {DAMPING} * coalesce(c.mass, 0) AS pr
    FROM nodes CROSS JOIN nv
    LEFT JOIN (
        SELECT e.dst AS node, sum(r.pr / d.deg) AS mass
        FROM edges e
        JOIN {prev} r ON r.node = e.src
        JOIN deg d ON d.src = e.src
        GROUP BY e.dst
    ) c ON c.node = nodes.node
)"""
        )
        prev = f"r{i}"
    iter_sql = ",\n".join(iters)
    return f"""
WITH pairs AS (
    SELECT DISTINCT 'c' || o.o_custkey AS src, 's' || l.l_suppkey AS dst
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
edges AS (
    SELECT src, dst FROM pairs
    UNION ALL
    SELECT dst AS src, src AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nv AS (SELECT count(*)::DOUBLE AS n FROM nodes),
deg AS (SELECT src, count(*)::DOUBLE AS deg FROM edges GROUP BY src),
r0 AS (SELECT node, 1.0 / nv.n AS pr FROM nodes CROSS JOIN nv),
{iter_sql}
SELECT node, round(pr, 6) AS pagerank
FROM {prev}
ORDER BY round(pr, 6) DESC, node ASC
LIMIT {TOP_K}
"""


@register(
    "transaction_graph_pagerank",
    oracle=_pagerank_oracle(),
    tags=("graph", "iterative", "pagerank"),
)
def transaction_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} PageRank nodes of the symmetrized customer–supplier graph
    (an edge per distinct customer↔supplier trading relationship, from
    orders⋈lineitem — the corpus-scale fact join is the edge-extraction
    pass and happens ONCE). Symmetrization guarantees no dangling nodes,
    so the per-iteration update is exactly (1-d)/N + d·Σ pr/deg.

    Plan: edge list + degrees cached once; each of the {n} iterations
    joins the |V|-row rank vector to the edges and re-aggregates by
    destination — the vector moves, the graph does not.
    """
    from emails_to_vector_db_spark.operators.pagerank import pagerank

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        )
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
        .cache()
        # ^ the one corpus-scale pass (fact join + distinct): cached so
        #   the symmetrize/degree/node branches don't re-run it
    )
    edges = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = pagerank(edges, n_iters=N_ITERS, damping=DAMPING)
    return (
        ranks.select("node", F.round("pr", 6).alias("pagerank"))
        .orderBy(F.col("pagerank").desc(), F.col("node").asc())
        .limit(TOP_K)
    )
