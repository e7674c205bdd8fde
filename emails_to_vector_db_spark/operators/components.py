"""Connected components over a duplicate-pair edge list.

The step that turns pairwise near-duplicate findings (MinHash/SimHash/
embedding LSH — operators/dedup.py) into canonical duplicate CLUSTERS:
each document gets the minimum doc id of its transitive dup group, from
which a keep/drop decision is one `where(id != component)` away. The
reference has no dedup at all (it re-inserts blindly — ``rag.py:55``);
this is the standard large-corpus pipeline stage after LSH.

Algorithm: iterative min-label propagation. Each round every node
adopts the minimum label among itself and its neighbors; a fixpoint is
reached after O(graph diameter) rounds. LSH duplicate clusters are
near-cliques (every member collides with most others in some band), so
the diameter — and the round count — is small (2-4) regardless of
corpus size. Each round is one shuffle join on the edge list plus a
tiny aggregate; lineage is truncated per round with localCheckpoint so
the plan does not grow with the iteration count. For adversarial
long-chain graphs, the O(log n) alternating large-star/small-star
scheme (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC 2014) drops in behind the same interface; dup graphs do
not need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _union_find(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Driver-side union-find with path compression; returns
    node -> minimum node id of its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id so the root IS the component label
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    driver_cutover_edges: int = 2_000_000,
) -> DataFrame:
    """Label every node reachable through ``edges`` with the minimum node
    id of its component.

    Returns (id, component) for each distinct endpoint. Raises if the
    fixpoint is not reached within ``max_iter`` rounds (a loud failure
    beats silently-wrong clusters).

    Size-adaptive execution: the dup-pair edge list is orders of
    magnitude smaller than the corpus that produced it (LSH has already
    pruned the non-candidates — 100 TB of documents yields an edge list
    in the millions, tens of MB). At or below ``driver_cutover_edges``
    the transitive closure runs as a driver-side union-find with path
    compression (one collect of the pruned edges; microseconds of CPU),
    exactly the cutover a production graph pipeline applies before
    reaching for iterative propagation. Above it, the distributed
    min-label loop runs unchanged — each round a join-sized shuffle with
    per-round lineage truncation. Set ``driver_cutover_edges=0`` to
    force the distributed path (the tests do, so both paths stay
    equivalence-checked).
    """
    raw = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    ).localCheckpoint()  # one materialization reused by count + collect/loop

    if raw.count() <= driver_cutover_edges:
        # Union-find is direction- and duplicate-insensitive, so the raw
        # pruned edge list collects as-is: no symmetrize/distinct shuffle.
        comp = _union_find([(r["src"], r["dst"]) for r in raw.collect()])
        return edges.sparkSession.createDataFrame(
            list(comp.items()), "id long, component long"
        )

    sym = raw.union(
        raw.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    sym = sym.localCheckpoint()

    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("label")).first()[0]

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.src == labels.id)
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(nbr_min, labels.id == nbr_min.dst, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()  # eager: truncates lineage, runs the round
        )
        # Labels only ever decrease, so an unchanged sum == fixpoint; one
        # tiny agg per round instead of a join-based diff.
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            return labels.select("id", F.col("label").alias("component"))
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )
