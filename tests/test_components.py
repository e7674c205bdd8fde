"""Unit semantics for operators/components.py: min-label propagation
over edge lists (chains force multiple propagation rounds)."""

from __future__ import annotations

import pytest

from emails_to_vector_db_spark.operators.components import connected_components


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _cc(spark, pairs, **kw):
    rows = connected_components(_edges(spark, pairs), **kw).collect()
    return {r.id: r.component for r in rows}


def test_two_disjoint_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    # A 12-node path: the min label must walk the full diameter.
    pairs = [(i, i + 1) for i in range(100, 111)]
    got = _cc(spark, pairs)
    assert set(got.values()) == {100}
    assert len(got) == 12


def test_edge_direction_irrelevant(spark):
    assert _cc(spark, [(5, 2), (2, 9)]) == {2: 2, 5: 2, 9: 2}


def test_max_iter_guard(spark):
    # An 11-edge path cannot converge in 2 rounds: loud failure, not
    # silently-partial clusters.
    pairs = [(i, i + 1) for i in range(50, 61)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_edges(spark, pairs), max_iter=2)
