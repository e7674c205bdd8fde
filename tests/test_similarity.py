"""ANN LSH tests: determinism, guaranteed hits for duplicate probes, and
recall against the exact brute-force baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from emails_to_vector_db_spark.operators.similarity import (
    ann_lsh_join,
    brute_force_join,
)
from emails_to_vector_db_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _probes_from_base(emb, n=10):
    return emb.where(F.col("vec_id") < n).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )


DIM = 64  # fixture embedding dimension (TESTDATA.md)


def test_duplicate_probes_always_hit(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    probes = _probes_from_base(emb, 10)
    res = ann_lsh_join(probes, emb, k=1, dim=DIM)
    hits = {r.probe_id: (r.vec_id, r.distance) for r in res.collect()}
    # a probe identical to a base vector lands in the same bucket: its own
    # nearest neighbor (cosine distance ~0) must always be found
    assert set(hits) == set(range(10))
    for pid, (vid, dist) in hits.items():
        assert vid == pid
        assert dist < 1e-9


def test_ann_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    probes = _probes_from_base(emb, 20)
    k = 10
    exact = brute_force_join(probes, emb, k=k)
    # 6 planes ≈ 64 buckets over 500 near-uniform vectors (LSH's worst
    # case — no cluster structure); measured recall ~0.31 and deterministic
    approx = ann_lsh_join(probes, emb, k=k, dim=DIM, n_planes=6)
    e = {(r.probe_id, r.vec_id) for r in exact.collect()}
    a = {(r.probe_id, r.vec_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.25, f"recall {recall}"


def test_exact_knn_join_operator(spark):
    from emails_to_vector_db_spark.operators.knn import knn_join

    emb = load_table(spark, SF_SMOKE, "embeddings")
    probes = _probes_from_base(emb, 6)
    res = knn_join(probes, emb.select("vec_id", "embedding"), k=3, metric="l2")
    rows = {}
    for r in res.collect():
        rows.setdefault(r.probe_id, []).append(r)
    assert set(rows) == set(range(6))
    for pid, hits in rows.items():
        assert len(hits) == 3
        # self-match is the nearest (distance 0) since probes come from base
        best = min(hits, key=lambda r: r.distance)
        assert best.vec_id == pid and best.distance == 0.0


def test_ann_deterministic(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    probes = _probes_from_base(emb, 5)
    r1 = sorted(map(tuple, ann_lsh_join(probes, emb, k=5, dim=DIM).collect()))
    r2 = sorted(map(tuple, ann_lsh_join(probes, emb, k=5, dim=DIM).collect()))
    assert r1 == r2


def test_ann_plan_construction_launches_no_job(spark):
    """Never run a job to plan a job: building the ANN join plan must not
    execute anything — proven by giving it an upstream that EXPLODES if any
    row is ever computed."""

    @F.udf("array<double>")
    def boom():
        raise RuntimeError("plan construction executed a job")

    base = spark.range(100).select(
        F.col("id").alias("vec_id"), boom().alias("embedding")
    )
    probes = spark.range(4).select(
        F.col("id").alias("probe_id"), boom().alias("probe_vec")
    )
    # constructing the plan (no action) must not raise / run anything
    res = ann_lsh_join(probes, base, k=3, dim=8)
    assert "distance" in res.columns


def test_ann_base_side_not_shuffled(spark):
    """The candidate join must broadcast the exploded probe side — the base
    must NOT be exchanged on the low-cardinality bucket key (a 64-value
    shuffle key is guaranteed skew at scale)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    probes = _probes_from_base(emb, 5)
    res = ann_lsh_join(probes, emb, k=5, dim=DIM, n_planes=6)
    plan = res._sc._jvm.PythonSQLUtils.explainString(
        res._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "hashpartitioning(_bucket" not in plan, plan


def test_n_planes_for_budget():
    from emails_to_vector_db_spark.operators.similarity import n_planes_for

    assert n_planes_for(1_000) == 4  # floor
    assert n_planes_for(1_000_000, target_bucket_size=1024) == 10
    assert n_planes_for(10**12, target_bucket_size=1024) == 24  # ceiling
    # doubling the corpus adds ~one plane: bucket size stays ~flat
    assert (
        n_planes_for(2_000_000, target_bucket_size=1024)
        == n_planes_for(1_000_000, target_bucket_size=1024) + 1
    )


def test_ann_self_tuned_occupancy_flat_across_scales():
    """The registered ANN query's plane count self-tunes to the corpus
    (plans/vector.py::_ann_planes): measured MAX bucket occupancy on the
    REAL fixture embeddings must stay within a small factor of the
    bucket budget at BOTH sf0.01 (500 rows → 4 planes) and sf0.1
    (2000 rows → 5 planes) — i.e. growing the corpus 4× does not grow
    bucket-local work 4×. Measured with numpy directly (same sign-bit
    bucketing the plan compiles to)."""
    import numpy as np
    import pyarrow.parquet as pq

    from emails_to_vector_db_spark.plans.vector import (
        _ANN_TARGET_BUCKET,
        _ann_planes,
        _embeddings_rows,
    )

    occupancy = {}
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        n = _embeddings_rows(sf_dir)
        planes = np.array(_ann_planes(n))  # (p, 64)
        vecs = np.array(
            pq.read_table(
                f"{sf_dir}/embeddings.parquet", columns=["embedding"]
            )["embedding"].to_pylist(),
            dtype=np.float64,
        )
        bits = (vecs @ planes.T) > 0
        buckets = bits @ (1 << np.arange(planes.shape[0]))
        occupancy[sf_dir] = (n, planes.shape[0], np.bincount(buckets).max())
    (n1, p1, max1), (n2, p2, max2) = occupancy.values()
    assert (n1, n2) == (500, 2000) and p2 == p1 + 1  # corpus 4x -> +1 plane
    # real-data skew allowance: max bucket within 4x of the budget at
    # BOTH scales, and max occupancy growth far below corpus growth
    assert max1 <= 4 * _ANN_TARGET_BUCKET, max1
    assert max2 <= 4 * _ANN_TARGET_BUCKET, max2
    assert max2 / max1 < 3.0, (max1, max2)


def test_ivf_n_centroids_budget():
    from emails_to_vector_db_spark.operators.ivf import n_centroids_for

    assert n_centroids_for(500) == 16  # fixture scale: the floor
    assert n_centroids_for(2_000) == 16  # sf0.1 still under lo*target
    assert n_centroids_for(1_000_000, target_list_size=128) == 7813
    assert n_centroids_for(10**10) == 65536  # ceiling: broadcastable
    # doubling the corpus doubles the list count: list size stays flat
    assert (
        n_centroids_for(4_000_000) == 2 * n_centroids_for(2_000_000)
    )


def test_ann_requires_dim_or_planes(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    probes = _probes_from_base(emb, 2)
    import pytest

    with pytest.raises(ValueError, match="planes= .*or dim="):
        ann_lsh_join(probes, emb, k=1)


def test_int8_quantization_recall(spark):
    """int8 scalar quantization must preserve the exact-KNN neighborhood:
    ≥4 of the quantized top-5 appear in the full-precision top-5."""
    from emails_to_vector_db_spark.plans.vector import (
        PROBE_ID,
        int8_quantized_knn,
        knn_topk_l2,
    )

    quant = {r.vec_id for r in int8_quantized_knn(spark, SF_SMOKE).collect()}
    exact = {r.vec_id for r in knn_topk_l2(spark, SF_SMOKE).collect()}
    assert PROBE_ID not in quant
    assert len(quant & exact) >= 4


def test_knn_join_adaptive_cutover_picks_ivf_and_stays_exact(spark):
    """The probe-count cutover: under the limit the adaptive join IS
    the exact broadcast plan; forcing the cutover (limit=0) routes
    through IVF — and with nprobe covering every centroid the IVF
    candidates are the whole base, so results must be hash-identical
    to the exact path on the fixture."""
    from emails_to_vector_db_spark.operators.knn import knn_join_adaptive

    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )
    probes = _probes_from_base(emb, 6)

    def rows(df):
        return sorted(
            (r["probe_id"], r["vec_id"], round(r["distance"], 9))
            for r in df.collect()
        )

    exact = rows(knn_join_adaptive(probes, emb, k=3))
    forced = knn_join_adaptive(
        probes, emb, k=3, max_broadcast_probes=0, n_centroids=4, nprobe=4
    )
    # the forced plan must actually be the IVF path: centroid-list
    # bucketing appears as the _cid equi-join in the plan
    plan = forced._jdf.queryExecution().executedPlan().toString()
    assert "_cid" in plan
    assert rows(forced) == exact


def test_knn_join_adaptive_accepts_known_probe_count(spark):
    """n_probes passed by the caller skips the counting job and still
    drives the cutover decision."""
    from emails_to_vector_db_spark.operators.knn import knn_join_adaptive

    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )
    probes = _probes_from_base(emb, 4)
    res = knn_join_adaptive(probes, emb, k=2, n_probes=4)
    assert res.count() == 8
