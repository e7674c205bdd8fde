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


def test_duplicate_probes_always_hit(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    probes = _probes_from_base(emb, 10)
    res = ann_lsh_join(probes, emb, k=1)
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
    approx = ann_lsh_join(probes, emb, k=k, n_planes=6)
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
    r1 = sorted(map(tuple, ann_lsh_join(probes, emb, k=5).collect()))
    r2 = sorted(map(tuple, ann_lsh_join(probes, emb, k=5).collect()))
    assert r1 == r2
