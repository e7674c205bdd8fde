"""IVF (inverted-file) approximate nearest neighbors: k-means coarse
quantizer + bucket-local exact search.

The second ANN strategy next to random-hyperplane LSH
(operators/similarity.py) — IVF is what production vector stores build
(FAISS IVF, pgvector ivfflat; the reference never builds its pgvector index,
``rag.py:77-82``). Spark mapping:

- **index build** = MLlib KMeans on a sample (a driver-coordinated
  iterative job — run once, amortized like any index build);
- **assignment** = argmin over the centroid list as a native column
  expression (centroids are literals in the plan: n_centroids × dim
  doubles — tiny), so scan-time assignment is JVM-side, no UDF;
- **search** = probes explode to their ``nprobe`` nearest centroid buckets,
  bucket-equi-join against the assigned base, exact rerank inside buckets.
  The shuffle key is the centroid id: bucket-local pair space, same
  skeleton as the LSH join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from emails_to_vector_db_spark.functions.vector import distance, vector_lit


def train_centroids(
    base: DataFrame,
    *,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 42,
    max_iter: int = 20,
    sample_fraction: float | None = None,
) -> list[list[float]]:
    """K-means centroids via MLlib on (a sample of) the base vectors.
    At 100 TB you sample — k-means quality needs only ~1000× n_centroids
    points, not the corpus."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    df = base.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    if sample_fraction:
        df = df.sample(fraction=sample_fraction, seed=seed)
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(df)
    return [list(map(float, c)) for c in model.clusterCenters()]


def _dist_to(vec_col: Column, centroid: list[float]) -> Column:
    return distance("sqeuclidean", vec_col, vector_lit(centroid))


def assign_centroid(vec_col: Column, centroids: list[list[float]]) -> Column:
    """argmin centroid id as a pure column expression (no UDF): min over
    (dist, id) structs. (NOT a when-chain fold — a chained
    ``when(better, d).otherwise(best)`` references the running best twice
    per step, doubling the expression tree each iteration: exponential
    plan size by n_centroids=16.)"""
    entries = F.array(
        *[
            F.struct(_dist_to(vec_col, c).alias("d"), F.lit(i).alias("cid"))
            for i, c in enumerate(centroids)
        ]
    )
    return F.array_min(entries).getField("cid")


def nearest_centroids(
    vec_col: Column, centroids: list[list[float]], nprobe: int
) -> Column:
    """The ``nprobe`` nearest centroid ids, as an array (for probe-side
    multibucket search): sort (dist, id) structs, take the prefix."""
    entries = F.array(
        *[
            F.struct(
                _dist_to(vec_col, c).alias("d"), F.lit(i).alias("cid")
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.transform(
        F.slice(F.array_sort(entries), 1, nprobe), lambda s: s.getField("cid")
    )


def ivf_ann_join(
    probes: DataFrame,
    base: DataFrame,
    k: int = 5,
    *,
    centroids: list[list[float]] | None = None,
    n_centroids: int = 16,
    nprobe: int = 2,
    seed: int = 42,
    probe_id: str = "probe_id",
    probe_vec: str = "probe_vec",
    base_id: str = "vec_id",
    base_vec: str = "embedding",
    metric: str = "l2",
    dist_col: str = "distance",
) -> DataFrame:
    """Approximate KNN join through an IVF index. Pass prebuilt
    ``centroids`` to amortize the index across queries; otherwise trains
    on the full base (fine at test scale)."""
    if centroids is None:
        centroids = train_centroids(
            base, vec_col=base_vec, n_centroids=n_centroids, seed=seed
        )
    base_a = base.withColumn(
        "_cid", assign_centroid(F.col(base_vec), centroids)
    )
    probe_a = probes.withColumn(
        "_cid",
        F.explode(nearest_centroids(F.col(probe_vec), centroids, nprobe)),
    )
    cand = base_a.join(F.broadcast(probe_a), "_cid").withColumn(
        dist_col, distance(metric, F.col(base_vec), F.col(probe_vec))
    )
    w = Window.partitionBy(probe_id).orderBy(
        F.col(dist_col).asc(), F.col(base_id).asc()
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select(probe_id, base_id, dist_col)
    )
