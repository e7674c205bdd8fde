"""Dimensionality reduction: distributed Gram/PCA vs numpy, JL distance
preservation, and the projection UDF itself."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from emails_to_vector_db_spark.operators.projection import (
    gram_matrix,
    jl_matrix,
    pca_from_moments,
    project_vectors,
    train_pca_numpy,
)
from emails_to_vector_db_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sample():
    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    d = tbl.sort_by("vec_id").to_pydict()
    return np.asarray(d["embedding"], dtype=np.float64)


def test_gram_matrix_matches_numpy(spark, sample):
    emb = load_table(spark, SF, "embeddings")
    sum_outer, sum_vec, n = gram_matrix(emb, "embedding")
    assert n == len(sample)
    np.testing.assert_allclose(sum_vec, sample.sum(axis=0), rtol=1e-9)
    np.testing.assert_allclose(sum_outer, sample.T @ sample, rtol=1e-9)


def test_distributed_pca_matches_sequential(spark, sample):
    """The scale path (mapInPandas partial X^T X -> driver eigh) and the
    index builder (plain numpy) must agree: same eigenvalues, and each
    component colinear with its sequential twin."""
    emb = load_table(spark, SF, "embeddings")
    mu_d, comps_d, eig_d = pca_from_moments(*gram_matrix(emb, "embedding"), k=4)
    mean_s, comps_s, eig_s = train_pca_numpy(sample, k=4)
    np.testing.assert_allclose(mu_d, mean_s, atol=1e-7)
    np.testing.assert_allclose(eig_d, eig_s, rtol=1e-6)
    for j in range(4):
        cos = abs(float(np.dot(comps_d[:, j], comps_s[j])))
        assert cos > 0.9999, f"component {j} diverged (|cos|={cos})"
    # explained variance must be in decreasing order and positive
    assert all(a >= b for a, b in zip(eig_s, eig_s[1:]))
    assert eig_s[-1] > 0


def test_projection_udf_matches_numpy(spark, sample):
    m = jl_matrix(64, 16, seed=7)
    emb = load_table(spark, SF, "embeddings")
    rows = (
        project_vectors(emb, "embedding", m, "p")
        .select("vec_id", "p")
        .orderBy("vec_id")
        .collect()
    )
    got = np.asarray([r["p"] for r in rows])
    want = sample @ np.asarray(m)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_jl_preserves_pairwise_distance(spark):
    """JL guarantee at out_dim=16: typical distortion ~1/sqrt(16); the
    median adjacent-pair ratio must land well inside [0.7, 1.3]."""
    emb = load_table(spark, SF, "embeddings")
    m = jl_matrix(64, 16, seed=7)
    proj = project_vectors(emb, "embedding", m, "p").select("vec_id", "embedding", "p")
    rows = proj.orderBy("vec_id").collect()
    ratios = []
    for a, b in zip(rows, rows[1:]):
        orig = np.linalg.norm(np.subtract(a["embedding"], b["embedding"]))
        prj = np.linalg.norm(np.subtract(a["p"], b["p"]))
        if orig > 0:
            ratios.append(prj / orig)
    med = float(np.median(ratios))
    assert 0.8 < med < 1.2, med
    # and the spread is bounded: >90% of pairs within +/-50%
    frac = np.mean([(0.5 < r < 1.5) for r in ratios])
    assert frac > 0.9, frac
