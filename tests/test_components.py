"""Unit semantics for operators/components.py: min-label propagation
over edge lists (chains force multiple propagation rounds), and the
size-adaptive driver-side union-find cutover.

All shape tests run BOTH paths (distributed forced via
``driver_cutover_edges=0``, union-find via the default) and require
identical labelings.
"""

from __future__ import annotations

import pytest

from emails_to_vector_db_spark.operators.components import connected_components

BOTH_PATHS = pytest.mark.parametrize(
    "cutover", [0, 2_000_000], ids=["distributed", "union-find"]
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _cc(spark, pairs, **kw):
    rows = connected_components(_edges(spark, pairs), **kw).collect()
    return {r.id: r.component for r in rows}


@BOTH_PATHS
def test_two_disjoint_components(spark, cutover):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)], driver_cutover_edges=cutover)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


@BOTH_PATHS
def test_long_chain_converges(spark, cutover):
    # A 12-node path: the min label must walk the full diameter.
    pairs = [(i, i + 1) for i in range(100, 111)]
    got = _cc(spark, pairs, driver_cutover_edges=cutover)
    assert set(got.values()) == {100}
    assert len(got) == 12


@BOTH_PATHS
def test_edge_direction_irrelevant(spark, cutover):
    got = _cc(spark, [(5, 2), (2, 9)], driver_cutover_edges=cutover)
    assert got == {2: 2, 5: 2, 9: 2}


def test_max_iter_guard(spark):
    # An 11-edge path cannot converge in 2 rounds: loud failure, not
    # silently-partial clusters (distributed path only — the union-find
    # cutover has no iteration to bound).
    pairs = [(i, i + 1) for i in range(50, 61)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            _edges(spark, pairs), max_iter=2, driver_cutover_edges=0
        )


def test_paths_agree_on_random_graph(spark):
    """Property: on a seeded random graph, union-find and distributed
    label propagation produce the identical labeling."""
    import random

    rng = random.Random(1234)
    pairs = [
        (rng.randrange(0, 120), rng.randrange(0, 120)) for _ in range(150)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    fast = _cc(spark, pairs)
    dist = _cc(spark, pairs, driver_cutover_edges=0)
    assert fast == dist


def test_block_size_guard_fails_loudly(spark):
    """An oversized block must raise with the offending keys, not launch
    an accidental quadratic join."""
    import pytest as _pytest

    from emails_to_vector_db_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.range(50).selectExpr(
        "id AS doc_id", "'one_block' AS source", "'a b c d' AS text"
    )
    with _pytest.raises(ValueError, match="one_block=50"):
        ngram_jaccard_pairs(df, max_block_rows=10)
    # disabled guard runs (and the tiny block is fine anyway)
    assert ngram_jaccard_pairs(df, max_block_rows=None).count() >= 0
