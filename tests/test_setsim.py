"""Prefix-filter set-similarity join (operators/setsim.py): exactness
vs a brute-force all-pairs baseline, plus boundary semantics. The
registry query is hash-checked by test_oracle_parity; these pin the
operator on adversarial synthetic inputs where the prefix theorem's
off-by-one edges would bite."""

from __future__ import annotations

import itertools
import random

import pytest

from emails_to_vector_db_spark.operators.setsim import (
    prefix_filter_jaccard_join,
)


def _brute(docs: dict[int, set[str]], tau: float) -> dict:
    out = {}
    for a, b in itertools.combinations(sorted(docs), 2):
        inter = len(docs[a] & docs[b])
        union = len(docs[a] | docs[b])
        if union and inter / union >= tau:
            out[(a, b)] = (inter, union)
    return out


def _spark_pairs(spark, docs: dict[int, set[str]], tau: float) -> dict:
    rows = [(d, t) for d, toks in docs.items() for t in toks]
    df = spark.createDataFrame(rows, ["doc_id", "token"])
    res = prefix_filter_jaccard_join(df, tau=tau).collect()
    return {
        (r["doc_a"], r["doc_b"]): (r["inter"], r["union_sz"]) for r in res
    }


@pytest.mark.parametrize("tau", [0.3, 0.5, 0.6, 0.8, 1.0])
def test_prefix_filter_matches_brute_force_random(spark, tau):
    rng = random.Random(1234)
    vocab = [f"t{i}" for i in range(60)]
    docs = {}
    for d in range(40):
        docs[d] = set(rng.sample(vocab, rng.randint(3, 18)))
    # plant high-overlap pairs across the size spectrum
    docs[100] = set(docs[0])
    docs[101] = set(docs[1]) | {"zzextra"}
    docs[102] = set(list(docs[2])[:-1]) if len(docs[2]) > 3 else docs[2]
    assert _spark_pairs(spark, docs, tau) == _brute(docs, tau)


def test_prefix_filter_exact_duplicates_at_tau_1(spark):
    docs = {1: {"a", "b", "c"}, 2: {"a", "b", "c"}, 3: {"a", "b"}}
    got = _spark_pairs(spark, docs, 1.0)
    assert got == {(1, 2): (3, 3)}


def test_prefix_filter_boundary_pair_is_kept(spark):
    # J = 2/4 = 0.5 exactly at tau=0.5: boundary must be INCLUSIVE
    docs = {1: {"a", "b", "c"}, 2: {"a", "b", "d"}}
    got = _spark_pairs(spark, docs, 0.5)
    assert got == {(1, 2): (2, 4)}


def test_prefix_filter_rejects_bad_tau(spark):
    import pyspark.sql.functions as F  # noqa: F401

    df = None
    with pytest.raises(ValueError):
        prefix_filter_jaccard_join(df, tau=0.0)
    with pytest.raises(ValueError):
        prefix_filter_jaccard_join(df, tau=1.5)
