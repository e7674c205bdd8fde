"""PageRank operator semantics (the registry query is hash-checked by
test_oracle_parity like everything else; these pin operator-level
invariants on a hand-built graph)."""

from __future__ import annotations

import pytest

from emails_to_vector_db_spark.operators.pagerank import pagerank


def _ranks(spark, edges, n_iters=3):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r["node"]: r["pr"] for r in pagerank(df, n_iters=n_iters).collect()}


def test_pagerank_mass_conserved_on_symmetric_graph(spark):
    # triangle + pendant, symmetrized: no dangling nodes → Σpr == 1
    base = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    edges = base + [(d, s) for s, d in base]
    pr = _ranks(spark, edges)
    assert pytest.approx(sum(pr.values()), abs=1e-9) == 1.0
    # the hub (c: degree 3) outranks the pendant (d: degree 1)
    assert pr["c"] > pr["d"]


def test_pagerank_symmetry_of_equivalent_nodes(spark):
    # a—b and c—d are isomorphic components: ranks must match exactly
    base = [("a", "b"), ("c", "d")]
    edges = base + [(d, s) for s, d in base]
    pr = _ranks(spark, edges)
    assert pr["a"] == pr["b"] == pr["c"] == pr["d"]


def test_pagerank_uniform_on_regular_graph(spark):
    # 4-cycle (2-regular): uniform stationary vector is exact at any
    # iteration count
    base = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    edges = base + [(d, s) for s, d in base]
    pr = _ranks(spark, edges, n_iters=5)
    for v in pr.values():
        assert pytest.approx(v, abs=1e-12) == 0.25
