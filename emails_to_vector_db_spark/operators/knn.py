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
