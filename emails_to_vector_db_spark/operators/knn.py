"""KNN top-k and KNN similarity join.

Reference semantics: ``SELECT id, content, embedding <-> %s AS distance
FROM product_embeddings ORDER BY distance ASC LIMIT %s`` with k=5
(reference ``rag.py:68,77-82``) — an exact, full-scan top-k; the reference
never builds an ANN index, so exact scan parity is the baseline and the
LSH path (operators/similarity.py) is the scale upgrade.

Physical plan notes (SURVEY.md §4):
- ``knn_topk``: ``orderBy(...).limit(k)`` → Spark plans
  ``TakeOrderedAndProject`` — a per-partition bounded heap + driver merge;
  never a full sort, never a full shuffle. At 100 TB this is the right
  exact plan: each task returns k rows, the driver merges partitions·k.
- ``knn_join``: the probe side is broadcast (probes are small by
  construction — they are "queries"); distance is evaluated map-side against
  each base partition, then a per-probe top-k. The only shuffle is the
  window's repartition by probe_id over (bases × probes) rows, so probe
  count × k must stay bounded; for large probe sets use
  similarity.ann_lsh_join which blocks candidates by LSH bucket first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from emails_to_vector_db_spark.functions.vector import distance, vector_lit


def knn_topk(
    base: DataFrame,
    probe: Sequence[float] | Column,
    k: int = 5,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    metric: str = "l2",
    dist_col: str = "distance",
) -> DataFrame:
    """Exact top-k nearest rows of ``base`` to one probe vector.

    Ties break on ``id_col`` so results are deterministic (SURVEY.md §7
    "top-k ties"). Returns all base columns + ``dist_col``.
    """
    probe_col = vector_lit(probe) if not isinstance(probe, Column) else probe
    scored = base.withColumn(dist_col, distance(metric, F.col(vec_col), probe_col))
    return scored.orderBy(F.col(dist_col).asc(), F.col(id_col).asc()).limit(k)


def knn_join(
    probes: DataFrame,
    base: DataFrame,
    k: int = 5,
    *,
    probe_id: str = "probe_id",
    probe_vec: str = "probe_vec",
    base_id: str = "vec_id",
    base_vec: str = "embedding",
    metric: str = "l2",
    dist_col: str = "distance",
) -> DataFrame:
    """Exact KNN join: for every probe row, the k nearest base rows.

    The reference's search is the 1-probe special case (``rag.py:77-82``);
    this generalizes it to a relation of probes. Probes are broadcast —
    the base table streams through map-side distance evaluation, then a
    ``row_number`` window per probe takes the k nearest.
    """
    pairs = base.crossJoin(F.broadcast(probes.select(probe_id, probe_vec)))
    scored = pairs.withColumn(
        dist_col, distance(metric, F.col(base_vec), F.col(probe_vec))
    )
    w = Window.partitionBy(probe_id).orderBy(
        F.col(dist_col).asc(), F.col(base_id).asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn", probe_vec)
    )


# Above this probe count the exact broadcast plan stops being the right
# shape: the pair space is |base|·|probes| rows into the per-probe
# window shuffle, and the probe broadcast itself grows past comfort
# (10⁴ probes × 64 doubles ≈ 5 MB — fine; 10⁶ probes ≈ 500 MB — not).
MAX_BROADCAST_PROBES = 10_000


def knn_join_adaptive(
    probes: DataFrame,
    base: DataFrame,
    k: int = 5,
    *,
    max_broadcast_probes: int = MAX_BROADCAST_PROBES,
    n_probes: int | None = None,
    centroids: list[list[float]] | None = None,
    n_centroids: int | None = None,
    nprobe: int = 2,
    probe_id: str = "probe_id",
    probe_vec: str = "probe_vec",
    base_id: str = "vec_id",
    base_vec: str = "embedding",
    metric: str = "l2",
    dist_col: str = "distance",
) -> DataFrame:
    """KNN join with a PROBE-COUNT cutover — the named plan for "KNN
    join with 10⁶ probes".

    Under ``max_broadcast_probes`` this is the exact broadcast plan
    (knn_join above: probes broadcast, map-side distances, per-probe
    window top-k — the right shape while |base|·|probes| pairs fit a
    shuffle). Beyond it, the exact pair space is the scale killer, so
    the join routes through the IVF index (operators/ivf.py
    ``ivf_ann_join``: both sides bucketed by centroid list, candidates
    only within shared lists) — APPROXIMATE unless ``nprobe`` covers
    every centroid, which is exactly how the equivalence test pins the
    cutover's correctness on the fixture. Probe counting is one job
    over the PROBE table (the small side by definition — counting 10⁶
    probe rows is trivial next to the join it sizes); pass ``n_probes``
    when the caller already knows it.

    Both branches return the same (probe_id, base_id, dist_col) shape.
    """
    from emails_to_vector_db_spark.operators.ivf import (
        ivf_ann_join,
        n_centroids_for,
    )

    if n_probes is None:
        n_probes = probes.count()
    if n_probes <= max_broadcast_probes:
        return knn_join(
            probes,
            base,
            k,
            probe_id=probe_id,
            probe_vec=probe_vec,
            base_id=base_id,
            base_vec=base_vec,
            metric=metric,
            dist_col=dist_col,
        ).select(probe_id, base_id, dist_col)
    if n_centroids is None and centroids is None:
        # self-tune the list count from the base size (a count job is a
        # plain scan, trivial next to the join it sizes) — a fixed list
        # count re-creates the linear-growth bug one scale-up later
        # (docs/SCALE_NOTES.md rule 14): at 20k base vectors, 16 lists
        # means ~1250-vector rerank lists; n_centroids_for keeps
        # expected list length ~128 at any corpus size
        n_centroids = n_centroids_for(base.count())
    elif n_centroids is None:
        n_centroids = 16
    return ivf_ann_join(
        probes,
        base,
        k,
        centroids=centroids,
        n_centroids=n_centroids,
        nprobe=nprobe,
        probe_id=probe_id,
        probe_vec=probe_vec,
        base_id=base_id,
        base_vec=base_vec,
        metric=metric,
        dist_col=dist_col,
    )
