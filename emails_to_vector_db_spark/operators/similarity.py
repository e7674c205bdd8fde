"""Similarity search over embedding columns: exact brute-force and
LSH-bucketed approximate nearest neighbors.

The reference's only search is an exact full scan (``rag.py:77-82`` —
pgvector with NO ANN index ever built). Exact stays the correctness
baseline (operators/knn.py); this module adds the scale path:

- **random-hyperplane LSH**: bucket = sign-bit signature of dot products
  with ``n_planes`` fixed random hyperplanes (deterministic seed). Probes
  search their own bucket plus all Hamming-distance-1 buckets (multiprobe),
  so recall degrades gracefully instead of falling off a bucket edge.
- The candidate join is bucket-local AND broadcast: the exploded probe side
  (probes × (n_planes+1) rows — tiny) is broadcast, so the base is scanned
  once map-side with no shuffle on the low-cardinality bucket key, and the
  quadratic probe×base blow-up of exact KNN-join becomes
  O(bucket_size × probes_per_bucket) — the property that matters at 100 TB.
  Plane count should come from a bucket-size budget (``n_planes_for``), not
  a constant: fixed 2^6 buckets means bucket size grows with the corpus.
- An IVF (k-means coarse quantizer) variant is the natural next step via
  ``pyspark.ml.clustering.KMeans`` over a sample; the bucket-join skeleton
  below is identical — only the bucket assignment changes.

Hyperplanes are embedded as literal arrays in the plan (they are tiny:
n_planes × dim floats), keeping everything JVM-side and codegen-able.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from emails_to_vector_db_spark.functions.vector import distance, vector_lit


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    # round to 6dp: shorter plan literals, and byte-identical values when the
    # same planes are embedded into an ANSI-SQL oracle as text
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def n_planes_for(
    n_rows: int, *, target_bucket_size: int = 1024, lo: int = 4, hi: int = 24
) -> int:
    """Plane count from a bucket-size budget: 2^n_planes buckets sized so the
    EXPECTED bucket holds ~target_bucket_size rows. A fixed plane count is
    the scale bug this avoids — with 6 planes (64 buckets), bucket size (and
    the bucket-local candidate quadratic) grows linearly with the corpus;
    deriving n_planes = ceil(log2(n/target)) keeps bucket-local work flat as
    the corpus grows 100×."""
    import math

    if n_rows <= target_bucket_size:
        return lo
    return min(hi, max(lo, math.ceil(math.log2(n_rows / target_bucket_size))))


def _plane_dot(vec_col: Column, plane: list[float]) -> Column:
    return F.aggregate(
        F.zip_with(
            vec_col.cast("array<double>"),
            vector_lit(plane),
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id in [0, 2^n_planes)."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        bucket = bucket + F.when(
            _plane_dot(vec_col, plane) > 0, F.lit(2**i)
        ).otherwise(F.lit(0))
    return bucket


def _probe_buckets(bucket_col: Column, n_planes: int) -> Column:
    """The multiprobe set: own bucket + every Hamming-distance-1 bucket."""
    return F.array(
        bucket_col, *[bucket_col.bitwiseXOR(F.lit(2**i)) for i in range(n_planes)]
    )


def ann_lsh_join(
    probes: DataFrame,
    base: DataFrame,
    k: int = 5,
    *,
    dim: int | None = None,
    planes: list[list[float]] | None = None,
    n_planes: int = 8,
    seed: int = 42,
    probe_id: str = "probe_id",
    probe_vec: str = "probe_vec",
    base_id: str = "vec_id",
    base_vec: str = "embedding",
    metric: str = "cosine",
    dist_col: str = "distance",
) -> DataFrame:
    """Approximate KNN join: per probe, the k nearest base rows *among LSH
    bucket candidates* (own bucket + Hamming-1 multiprobe).

    Returns (probe_id, base_id, distance). Recall is approximate by
    construction; exact-duplicate and near-duplicate probes always hit
    (identical sign bits → same bucket).

    Plan shape (the properties that matter at 100 TB):

    - pass ``planes`` (prebuilt, the index) or ``dim`` — plan construction
      launches NO Spark job (no ``.first()`` sniff: never run a job to plan
      a job). Use :func:`n_planes_for` to size the plane count from a
      bucket-size budget instead of letting buckets grow with the corpus.
    - the exploded probe side is broadcast: the base is scanned once,
      map-side, with no shuffle on the 2^n_planes-value bucket key (a
      low-cardinality shuffle key is guaranteed skew). The only shuffle is
      the per-probe top-k window on ``probe_id``, over candidate rows only.
    - probe multiprobe buckets are distinct and each base row has exactly
      one bucket, so each (probe, base) pair matches at most once — no
      dedup shuffle needed before the window.
    """
    if planes is None:
        if dim is None:
            raise ValueError(
                "ann_lsh_join: pass planes= (prebuilt index) or dim=; "
                "plan construction must not run a job to sniff the "
                "vector dimension"
            )
        planes = random_hyperplanes(dim, n_planes, seed)
    n_planes = len(planes)

    base_b = base.withColumn("_bucket", lsh_bucket(F.col(base_vec), planes))
    probe_b = probes.withColumn(
        "_bucket_probe",
        F.explode(
            _probe_buckets(lsh_bucket(F.col(probe_vec), planes), n_planes)
        ),
    )
    cand = base_b.join(
        F.broadcast(probe_b), base_b["_bucket"] == probe_b["_bucket_probe"]
    ).withColumn(dist_col, distance(metric, F.col(base_vec), F.col(probe_vec)))
    w = Window.partitionBy(probe_id).orderBy(
        F.col(dist_col).asc(), F.col(base_id).asc()
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select(probe_id, base_id, dist_col)
    )


def brute_force_join(
    probes: DataFrame,
    base: DataFrame,
    k: int = 5,
    *,
    probe_id: str = "probe_id",
    probe_vec: str = "probe_vec",
    base_id: str = "vec_id",
    base_vec: str = "embedding",
    metric: str = "cosine",
    dist_col: str = "distance",
) -> DataFrame:
    """Exact baseline with the same output shape as ann_lsh_join."""
    pairs = base.crossJoin(F.broadcast(probes.select(probe_id, probe_vec)))
    scored = pairs.withColumn(
        dist_col, distance(metric, F.col(base_vec), F.col(probe_vec))
    )
    w = Window.partitionBy(probe_id).orderBy(
        F.col(dist_col).asc(), F.col(base_id).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select(probe_id, base_id, dist_col)
    )
