"""Distributed Lloyd's k-means must match the sequential numpy iteration
from the same deterministic initialization."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from emails_to_vector_db_spark.operators.kmeans import lloyd_kmeans, lloyd_step
from emails_to_vector_db_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
K = 8


@pytest.fixture(scope="module")
def sample():
    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    d = tbl.sort_by("vec_id").to_pydict()
    return np.asarray(d["embedding"], dtype=np.float64)


def _numpy_lloyd(X, cents, n_iter):
    cents = np.asarray(cents, dtype=np.float64).copy()
    for _ in range(n_iter):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=-1)
        assign = d.argmin(axis=1)
        for j in range(len(cents)):
            m = assign == j
            if m.any():
                cents[j] = X[m].mean(axis=0)
    return cents


def _inertia(X, cents):
    d = ((X[:, None, :] - np.asarray(cents)[None, :, :]) ** 2).sum(axis=-1)
    return float(d.min(axis=1).sum())


def test_distributed_matches_numpy(spark, sample):
    init = sample[:K].tolist()  # deterministic init: first K by vec_id
    emb = load_table(spark, SF, "embeddings")
    got = lloyd_kmeans(emb, "embedding", init, n_iter=3)
    want = _numpy_lloyd(sample, init, 3)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-9)


def test_inertia_decreases(spark, sample):
    init = sample[:K].tolist()
    emb = load_table(spark, SF, "embeddings")
    cents = init
    prev = _inertia(sample, cents)
    for _ in range(3):
        cents = lloyd_step(emb, "embedding", cents)
        cur = _inertia(sample, cents)
        assert cur <= prev + 1e-9
        prev = cur
