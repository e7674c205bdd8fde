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


def test_kcore_probe_paths_equivalent(spark):
    """The broadcast-probe and shuffle-probe lanes of the k-core peel
    must produce identical per-round trajectories — the cutover
    (plans/graph.py::_KCORE_BROADCAST_MAX_NODES) only changes the
    physical semi-join strategy, never the result."""
    from emails_to_vector_db_spark.plans.graph import _kcore_rounds

    # hand-built graph: a 5-clique (the 3-core) plus a path of pendants
    # that peels away over several rounds
    clique = [(i, j) for i in range(5) for j in range(5) if i != j]
    chain = [(5, 0), (0, 5), (6, 5), (5, 6), (7, 6), (6, 7)]
    edges = spark.createDataFrame(
        clique + chain, "src long, dst long"
    ).persist()
    broadcast_path = _kcore_rounds(
        spark, edges, k=3, rounds=4, broadcast_max_nodes=10**9
    ).collect()
    shuffle_path = _kcore_rounds(
        spark, edges, k=3, rounds=4, broadcast_max_nodes=0
    ).collect()
    edges.unpersist()
    rows = [tuple(r) for r in broadcast_path]
    assert rows == [tuple(r) for r in shuffle_path]
    # the trajectory does real multi-round peeling and lands on the
    # 5-clique: 8 nodes -> ... -> 5 nodes, 10 undirected pairs
    assert rows[0][1] == 8
    assert rows[-1][1] == 5 and rows[-1][2] == 10


def test_kcore_delta_peel_equivalent(spark):
    """r12 delta-peeling (deg_r derived by subtracting removed-incident
    edge counts) must match the full-refilter form round for round. A
    path graph at k=2 peels two pendant ends per round — a gradual
    multi-round cascade where the delta path is actually taken (small
    removed fractions), including the degree-0 middle node edge case
    on the final round."""
    from emails_to_vector_db_spark.plans.graph import _kcore_rounds

    path = []
    for i in range(9):
        path += [(i, i + 1), (i + 1, i)]
    edges = spark.createDataFrame(path, "src long, dst long").persist()
    delta_forced = _kcore_rounds(
        spark, edges, k=2, rounds=6, broadcast_max_nodes=10**9,
        delta_max_frac=1.0,
    ).collect()
    delta_off = _kcore_rounds(
        spark, edges, k=2, rounds=6, broadcast_max_nodes=10**9,
        delta_max_frac=0.0,
    ).collect()
    edges.unpersist()
    rows = [tuple(r) for r in delta_forced]
    assert rows == [tuple(r) for r in delta_off]
    # 10-node path: ends peel 2 per round until everything dissolves
    assert rows[0][1] == 10
    assert rows[-1][1] == 0 and rows[-1][2] == 0
