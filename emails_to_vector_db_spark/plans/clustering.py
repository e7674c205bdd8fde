"""Density clustering: deterministic approximate DBSCAN over the
embedding corpus — the density-semantics member of the clustering
family (k-means partitions everything, connected components follows
reachability, SemDeDup prunes; DBSCAN distinguishes CORE / BORDER /
NOISE and leaves outliers unclustered, which is exactly what an
embedding-curation pass wants).

"Deterministic approximate": neighborhoods come from the SAME seeded
sign-LSH + Hamming-1 multiprobe + exact-cosine-verify pipeline as
embedding_near_dups_lsh_global (plans/dedup.py) — never all-pairs —
and the DuckDB oracle replays that identical pipeline plus a recursive
min-label closure, so the whole algorithm (candidate generation,
core/border/noise classification, cluster formation) is hash-checked.

Fixture geometry (module-level, seeded): the base corpus contributes
noise; colinear ×2/×0.5 plants give 20 all-core trios; and a literal
5-vector SIMPLEX fixture — four cores spread inside the eps ball plus
one point within eps of exactly ONE core — exercises the border lane,
which colinear plants cannot (scalar multiples are symmetric: any
colinear point neighbors the whole trio). The simplex angles are
rotated so every in-cluster pair survives Hamming-1 multiprobe under
the fixed planes (checked in tests).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emails_to_vector_db_spark.plans.dedup import _emb_planes
from emails_to_vector_db_spark.plans.registry import register
from emails_to_vector_db_spark.sources.tables import load_table

_EPS_COS = 0.99  # neighbor iff cosine >= eps
_MIN_PTS = 3  # core iff |N_eps(p)| >= 3 counting p itself
_TRIO_N = 20
_OFF1, _OFF2 = 100_000, 200_000
_SIMPLEX_BASE_ID = 900_001


def _simplex_vectors() -> list[list[float]]:
    """The literal border fixture: unit-plane arc at angles
    δ + [0, .05, .10, .07] (cores) and δ − .12 (border), δ = −1.5 chosen
    so all in-cluster pairs share an LSH bucket under the fixed seeded
    planes. Deterministic: seeded gaussian basis, 6dp rounding."""
    g = np.random.default_rng(777)
    a = g.standard_normal(64)
    e1 = a / np.linalg.norm(a)
    b = g.standard_normal(64)
    b = b - (b @ e1) * e1
    e2 = b / np.linalg.norm(b)
    delta = -1.5
    thetas = [delta + t for t in (0.0, 0.05, 0.10, 0.07, -0.12)]
    return [
        np.round((np.cos(t) * e1 + np.sin(t) * e2) * 10, 6).tolist()
        for t in thetas
    ]


def _dbscan_oracle() -> str:
    planes = _emb_planes(n_planes=10)
    bits = " + ".join(
        f"(CASE WHEN list_dot_product(v, {p}::DOUBLE[]) > 0 "
        f"THEN {2**i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    probes = ", ".join(
        ["bucket"] + [f"xor(bucket, {2**i})" for i in range(len(planes))]
    )
    simplex_values = ", ".join(
        f"({_SIMPLEX_BASE_ID + i}, {v}::DOUBLE[])"
        for i, v in enumerate(_simplex_vectors())
    )
    return f"""
WITH RECURSIVE base AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    UNION ALL
    SELECT vec_id + {_OFF1}, list_transform(embedding::DOUBLE[], x -> x * 2.0)
    FROM embeddings WHERE vec_id < {_TRIO_N}
    UNION ALL
    SELECT vec_id + {_OFF2}, list_transform(embedding::DOUBLE[], x -> x * 0.5)
    FROM embeddings WHERE vec_id < {_TRIO_N}
    UNION ALL
    SELECT * FROM (VALUES {simplex_values}) AS s(vec_id, v)
),
bucketed AS (
    SELECT vec_id, v, ({bits})::BIGINT AS bucket FROM base
),
probes AS (
    SELECT vec_id, v, unnest([{probes}]) AS probe_bucket FROM bucketed
),
pairs AS (
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
    FROM probes a JOIN bucketed b
      ON a.probe_bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v))
             * sqrt(list_dot_product(b.v, b.v))) >= {_EPS_COS}
),
nbr AS (
    SELECT id_a AS id, id_b AS nb FROM pairs
    UNION ALL
    SELECT id_b AS id, id_a AS nb FROM pairs
),
deg AS (SELECT id, count(*)::BIGINT AS d FROM nbr GROUP BY id),
core AS (SELECT id FROM deg WHERE d >= {_MIN_PTS - 1}),
core_edges AS (
    SELECT n.id AS src, n.nb AS dst FROM nbr n
    JOIN core c1 ON c1.id = n.id
    JOIN core c2 ON c2.id = n.nb
),
walk(id, label) AS (
    SELECT id, id AS label FROM core
    UNION
    SELECT e.dst AS id, w.label FROM walk w JOIN core_edges e ON e.src = w.id
),
core_lab AS (SELECT id, min(label) AS cluster FROM walk GROUP BY id),
border AS (
    SELECT n.id, min(cl.cluster) AS cluster
    FROM nbr n
    JOIN core_lab cl ON cl.id = n.nb
    WHERE n.id NOT IN (SELECT id FROM core)
    GROUP BY n.id
),
all_ids AS (SELECT vec_id AS id FROM base),
labeled AS (
    SELECT id, cluster, 'core' AS role FROM core_lab
    UNION ALL
    SELECT id, cluster, 'border' AS role FROM border
    UNION ALL
    SELECT a.id, -1 AS cluster, 'noise' AS role
    FROM all_ids a
    WHERE a.id NOT IN (SELECT id FROM core_lab)
      AND a.id NOT IN (SELECT id FROM border)
)
SELECT cluster::BIGINT AS cluster_id,
       sum(CASE WHEN role = 'core' THEN 1 ELSE 0 END)::BIGINT AS n_core,
       sum(CASE WHEN role = 'border' THEN 1 ELSE 0 END)::BIGINT AS n_border,
       count(*)::BIGINT AS n_points
FROM labeled
GROUP BY cluster
"""


@register(
    "dbscan_embedding_clusters",
    oracle=_dbscan_oracle(),
    tags=("clustering", "dbscan", "vector", "lsh"),
)
def dbscan_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate DBSCAN (eps = cosine 0.99, minPts = 3) over the
    planted embedding corpus: LSH-pruned eps-neighbor pairs → degree
    counts → core flags → connected components over core-core edges
    (operators/components.py) → border points adopt the minimum
    adjacent core cluster → everything else is noise (cluster −1).
    Returns per-cluster core/border/point counts plus the noise row.

    Plan shape at 100 TB: the neighbor stage is the bucketed LSH join
    (never all-pairs); degrees and the final report are
    map-side-combinable aggregates; the component pass runs on the
    LSH-pruned CORE subgraph only. The 5-vector literal simplex is the
    border-lane fixture — see module docstring.
    """
    from pyspark import StorageLevel

    from emails_to_vector_db_spark.functions.vector import dot, l2_norm
    from emails_to_vector_db_spark.operators.components import (
        connected_components,
    )
    from emails_to_vector_db_spark.operators.similarity import lsh_bucket

    planes = _emb_planes(n_planes=10)
    emb = load_table(spark, sf_dir, "embeddings")
    emb_d = F.col("embedding").cast("array<double>")
    simplex = spark.createDataFrame(
        [
            (_SIMPLEX_BASE_ID + i, v)
            for i, v in enumerate(_simplex_vectors())
        ],
        "vec_id long, v array<double>",
    )
    base = (
        emb.select("vec_id", emb_d.alias("v"))
        .unionByName(
            emb.where(F.col("vec_id") < _TRIO_N).select(
                (F.col("vec_id") + _OFF1).alias("vec_id"),
                F.transform(emb_d, lambda x: x * 2.0).alias("v"),
            )
        )
        .unionByName(
            emb.where(F.col("vec_id") < _TRIO_N).select(
                (F.col("vec_id") + _OFF2).alias("vec_id"),
                F.transform(emb_d, lambda x: x * 0.5).alias("v"),
            )
        )
        .unionByName(simplex)
        .withColumn("bucket", lsh_bucket(F.col("v"), planes).cast("long"))
        .withColumn("norm", l2_norm(F.col("v")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    probe_buckets = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(2**i))
            for i in range(len(planes))
        ],
    )
    a = base.select(
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("norm").alias("norm_a"),
        F.explode(probe_buckets).alias("probe_bucket"),
    )
    b = base.select(
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("norm").alias("norm_b"),
        F.col("bucket").alias("probe_bucket"),
    )
    pairs = (
        a.join(b, "probe_bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            dot("va", "vb") / (F.col("norm_a") * F.col("norm_b"))
            >= _EPS_COS
        )
        .select("id_a", "id_b")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nbr = pairs.select(
        F.col("id_a").alias("id"), F.col("id_b").alias("nb")
    ).unionAll(
        pairs.select(F.col("id_b").alias("id"), F.col("id_a").alias("nb"))
    )
    deg = nbr.groupBy("id").agg(F.count(F.lit(1)).alias("d"))
    core = deg.where(F.col("d") >= _MIN_PTS - 1).select("id")
    core_edges = (
        nbr.join(core.withColumnRenamed("id", "cid"), nbr["id"] == F.col("cid"))
        .drop("cid")
        .join(
            core.withColumnRenamed("id", "nid"), nbr["nb"] == F.col("nid")
        )
        .select(F.col("id").alias("src"), F.col("nb").alias("dst"))
    )
    core_lab = connected_components(core_edges).select(
        "id", F.col("component").alias("cluster")
    )
    # isolated cores cannot exist (core ⇒ degree ≥ 2 ⇒ it has core
    # neighbors only if they are cores too — but a core's neighbors may
    # all be non-core; such a core still forms its own cluster)
    core_lab = core.join(core_lab, "id", "left").select(
        "id", F.coalesce("cluster", F.col("id")).alias("cluster")
    )
    border = (
        nbr.join(core_lab.withColumnRenamed("id", "nb"), "nb")
        .join(core, "id", "left_anti")
        .groupBy("id")
        .agg(F.min("cluster").alias("cluster"))
    )
    labeled = (
        core_lab.select("id", "cluster", F.lit("core").alias("role"))
        .unionByName(
            border.select("id", "cluster", F.lit("border").alias("role"))
        )
    )
    noise = (
        base.select("vec_id")
        .join(labeled.select(F.col("id").alias("vec_id")), "vec_id", "left_anti")
        .select(
            F.col("vec_id").alias("id"),
            F.lit(-1).cast("long").alias("cluster"),
            F.lit("noise").alias("role"),
        )
    )
    return (
        labeled.unionByName(noise)
        .groupBy(F.col("cluster").alias("cluster_id"))
        .agg(
            F.sum((F.col("role") == "core").cast("long")).alias("n_core"),
            F.sum((F.col("role") == "border").cast("long")).alias(
                "n_border"
            ),
            F.count(F.lit(1)).alias("n_points"),
        )
    )


_DRIFT_SPLIT_ID = 250  # first/second "deployment window" halves

_DRIFT_ORACLE = f"""
WITH halves AS (
    SELECT label,
           CASE WHEN vec_id < {_DRIFT_SPLIT_ID} THEN 'a' ELSE 'b' END AS h,
           embedding::DOUBLE[] AS v
    FROM embeddings
),
per_dim AS (
    SELECT label, h, i, avg(v[i]) AS c
    FROM halves, generate_series(1, 64) AS gs(i)
    GROUP BY label, h, i
),
cents AS (
    SELECT a.label,
           sum(a.c * b.c) AS dot_ab,
           sum(a.c * a.c) AS sq_a,
           sum(b.c * b.c) AS sq_b
    FROM per_dim a JOIN per_dim b
      ON a.label = b.label AND a.i = b.i AND a.h = 'a' AND b.h = 'b'
    GROUP BY a.label
)
SELECT label,
       round(dot_ab / (sqrt(sq_a) * sqrt(sq_b)), 6) AS centroid_cosine,
       round(sqrt(sq_b) / sqrt(sq_a), 6) AS norm_ratio
FROM cents
"""


@register(
    "embedding_drift_monitor",
    oracle=_DRIFT_ORACLE,
    tags=("vector", "drift", "monitoring"),
)
def embedding_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMBEDDING-space drift: per label, the cosine between the centroid
    of the first corpus half and the second (plus the norm ratio) —
    the vector-lane member of the drift-monitor family (KS = numeric
    distributions, chi-square = categorical mixes, this = embedding
    geometry; a model/encoder change shows up here before retrieval
    quality visibly degrades).

    Plan: one (label, half) centroid aggregation via the grouped-map
    BLAS lane (operators/centroids.py — the applyInPandas form, Arrow
    batch per group), then the cosine fold over |labels| rows. The
    DuckDB oracle computes the same centroids by per-dimension
    averaging — a different decomposition of the same mean, exact
    under 6dp rounding.
    """
    from emails_to_vector_db_spark.operators.centroids import (
        label_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    half = F.when(F.col("vec_id") < _DRIFT_SPLIT_ID, "a").otherwise("b")
    # reuse the grouped-map centroid operator by folding the half into
    # a composite label, then splitting it back out
    tagged = emb.select(
        "vec_id",
        "embedding",
        (F.col("label") * 2 + (half == "b").cast("int")).alias("label"),
    )
    cents = label_centroids(tagged).select(
        (F.col("label") / 2).cast("int").alias("label"),
        (F.col("label") % 2 == 1).alias("is_b"),
        "centroid",
    )
    a = cents.where(~F.col("is_b")).select(
        "label", F.col("centroid").alias("ca")
    )
    b = cents.where(F.col("is_b")).select(
        "label", F.col("centroid").alias("cb")
    )
    dot_ab = F.aggregate(
        F.zip_with("ca", "cb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    sq = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
    )
    return a.join(b, "label").select(
        "label",
        F.round(dot_ab / (F.sqrt(sq("ca")) * F.sqrt(sq("cb"))), 6).alias(
            "centroid_cosine"
        ),
        F.round(F.sqrt(sq("cb")) / F.sqrt(sq("ca")), 6).alias("norm_ratio"),
    )


# ---------------------------------------------------------------------------
# Simplified silhouette: clustering-quality score against label centroids
# ---------------------------------------------------------------------------

_SIL_DIMS = 64

_SILHOUETTE_ORACLE = f"""
WITH per_dim AS (
    SELECT label, i, avg(e.embedding[i]::DOUBLE) AS m
    FROM embeddings e, generate_series(1, {_SIL_DIMS}) AS gs(i)
    GROUP BY label, i
),
cents AS (
    SELECT label AS clabel, list(m ORDER BY i) AS cvec
    FROM per_dim GROUP BY label
),
d AS (
    SELECT e.vec_id, e.label,
           min(CASE WHEN c.clabel = e.label
                    THEN list_distance(e.embedding::DOUBLE[], c.cvec)
               END) AS a,
           min(CASE WHEN c.clabel <> e.label
                    THEN list_distance(e.embedding::DOUBLE[], c.cvec)
               END) AS b
    FROM embeddings e CROSS JOIN cents c
    GROUP BY e.vec_id, e.label
)
SELECT label,
       count(*)::BIGINT AS n_points,
       round(avg((b - a) / greatest(a, b)), 6) AS simplified_silhouette
FROM d
GROUP BY label
"""


@register(
    "simplified_silhouette_score",
    oracle=_SILHOUETTE_ORACLE,
    tags=("clustering", "eval", "vector"),
)
def simplified_silhouette_score(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-cluster simplified silhouette (Hruschka et al. 2004): for
    each point, a = distance to its own label centroid, b = distance
    to the nearest OTHER centroid, s = (b-a)/max(a,b); averaged per
    label — the O(n·k) clustering-quality score that replaces the
    O(n²) classic silhouette at corpus scale, evaluating the label
    assignment the centroid/IVF/SemDeDup lanes all build on.

    Plan shape: centroids are ONE groupBy(label) aggregation of 64
    avg() columns assembled into arrays (no posexplode — the same
    explode-free trick as binary_quantized_knn's per-dim means), 10x64
    doubles broadcast onto a single corpus scan; per-point a and b
    fold in the same k-row-per-point aggregate; the output is one row
    per cluster. At 100 TB: one stats pass + one scan, nothing wide
    ever shuffles."""
    emb = load_table(spark, sf_dir, "embeddings")
    emb_d = F.col("embedding").cast("array<double>")
    cents = F.broadcast(
        emb.groupBy("label")
        .agg(
            *[
                F.avg(F.element_at(emb_d, i)).alias(f"m{i}")
                for i in range(1, _SIL_DIMS + 1)
            ]
        )
        .select(
            F.col("label").alias("clabel"),
            F.array(
                *[F.col(f"m{i}") for i in range(1, _SIL_DIMS + 1)]
            ).alias("cvec"),
        )
    )
    from emails_to_vector_db_spark.functions.vector import l2_distance

    d = (
        emb.crossJoin(cents)
        .withColumn("dist", l2_distance("embedding", "cvec"))
        .groupBy("vec_id", "label")
        .agg(
            F.min(
                F.when(F.col("clabel") == F.col("label"), F.col("dist"))
            ).alias("a"),
            F.min(
                F.when(F.col("clabel") != F.col("label"), F.col("dist"))
            ).alias("b"),
        )
    )
    s = (F.col("b") - F.col("a")) / F.greatest(F.col("a"), F.col("b"))
    return d.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.avg(s), 6).alias("simplified_silhouette"),
    )


# ---------------------------------------------------------------------------
# Calinski-Harabasz score for the label clustering
# ---------------------------------------------------------------------------

_CH_ORACLE = f"""
WITH per_dim AS (
    SELECT label, i, avg(e.embedding[i]::DOUBLE) AS m,
           count(*) AS nk
    FROM embeddings e, generate_series(1, {_SIL_DIMS}) AS gs(i)
    GROUP BY label, i
),
cents AS (
    SELECT label AS clabel, list(m ORDER BY i) AS cvec,
           min(nk)::DOUBLE AS nk
    FROM per_dim GROUP BY label
),
gdim AS (
    SELECT i, avg(embedding[i]::DOUBLE) AS g
    FROM embeddings, generate_series(1, {_SIL_DIMS}) AS gs(i)
    GROUP BY i
),
gmean AS (SELECT list(g ORDER BY i) AS gvec FROM gdim),
b AS (
    SELECT sum(c.nk * list_sum(list_transform(
               generate_series(1, {_SIL_DIMS}),
               i -> (c.cvec[i] - g.gvec[i]) * (c.cvec[i] - g.gvec[i]))))
           AS bss,
           count(*)::DOUBLE AS k
    FROM cents c CROSS JOIN gmean g
),
w AS (
    SELECT sum(list_sum(list_transform(
               generate_series(1, {_SIL_DIMS}),
               i -> (e.embedding[i]::DOUBLE - c.cvec[i])
                    * (e.embedding[i]::DOUBLE - c.cvec[i])))) AS wss,
           count(*)::DOUBLE AS n
    FROM embeddings e JOIN cents c ON c.clabel = e.label
)
SELECT w.n::BIGINT AS n_points,
       b.k::BIGINT AS n_clusters,
       round(b.bss, 4) AS between_ss,
       round(w.wss, 4) AS within_ss,
       round((b.bss / (b.k - 1)) / (w.wss / (w.n - b.k)), 4)
           AS calinski_harabasz
FROM b CROSS JOIN w
"""


@register(
    "calinski_harabasz_score",
    oracle=_CH_ORACLE,
    tags=("clustering", "eval", "vector"),
)
def calinski_harabasz_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calinski-Harabasz variance-ratio criterion for the label
    clustering — the second clustering-quality lens beside the
    simplified silhouette (silhouette judges per-point placement; CH
    judges the GLOBAL between/within variance ratio, the classic
    k-selection score a k-means/IVF tuning sweep reads).

    Plan shape: label centroids and the global mean are two
    explode-free aggregate rows broadcast onto one scan; the within-SS
    fold is a scan-local zip against the point's own centroid (k-row
    broadcast join on label); between-SS is arithmetic over the k-row
    centroid table. Two stats passes, zero wide shuffles."""
    from emails_to_vector_db_spark.functions.vector import squared_l2

    emb = load_table(spark, sf_dir, "embeddings")
    emb_d = F.col("embedding").cast("array<double>")
    cents = F.broadcast(
        emb.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("double").alias("nk"),
            *[
                F.avg(F.element_at(emb_d, i)).alias(f"m{i}")
                for i in range(1, _SIL_DIMS + 1)
            ],
        )
        .select(
            F.col("label").alias("clabel"),
            "nk",
            F.array(
                *[F.col(f"m{i}") for i in range(1, _SIL_DIMS + 1)]
            ).alias("cvec"),
        )
    )
    gmean = F.broadcast(
        emb.agg(
            *[
                F.avg(F.element_at(emb_d, i)).alias(f"g{i}")
                for i in range(1, _SIL_DIMS + 1)
            ]
        ).select(
            F.array(
                *[F.col(f"g{i}") for i in range(1, _SIL_DIMS + 1)]
            ).alias("gvec")
        )
    )
    b = cents.crossJoin(gmean).agg(
        F.sum(F.col("nk") * squared_l2("cvec", "gvec")).alias("bss"),
        F.count(F.lit(1)).cast("double").alias("k"),
    )
    w = (
        emb.join(cents, emb["label"] == cents["clabel"])
        .select(squared_l2(emb_d, F.col("cvec")).alias("d2"))
        .agg(
            F.sum("d2").alias("wss"),
            F.count(F.lit(1)).cast("double").alias("n"),
        )
    )
    return b.crossJoin(w).select(
        F.col("n").cast("long").alias("n_points"),
        F.col("k").cast("long").alias("n_clusters"),
        F.round("bss", 4).alias("between_ss"),
        F.round("wss", 4).alias("within_ss"),
        F.round(
            (F.col("bss") / (F.col("k") - 1))
            / (F.col("wss") / (F.col("n") - F.col("k"))),
            4,
        ).alias("calinski_harabasz"),
    )
