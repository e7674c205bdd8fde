"""Distributed BPE trainer: differential vs the sequential reference,
merge-fold equivalence, and segmentation semantics.

The registered queries (bpe_merge_learning, bpe_segmentation_stats) are
additionally hash-checked against their fixture oracles by
tests/test_oracle_parity.py like every other registry entry; these tests
pin the operator-level semantics the oracle can't localize.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from emails_to_vector_db_spark.operators.bpe import (
    EOW,
    _apply_merge,
    _initial_symbols,
    learn_bpe_merges,
    learn_bpe_merges_distributed,
    learn_bpe_merges_driver,
    pretokenize_words,
    segment_word,
    word_histogram,
)

CORPUS = [
    "the cat sat on the mat",
    "the cat ran after the other cat",
    "a mat is what the cat sat on",
    "low lower lowest newer newest wide wider widest",
    "",
    "THE CAT, the cat; 42 cats!",
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )


def test_word_histogram_matches_counter(spark):
    hist = {
        r["word"]: r["cnt"] for r in word_histogram(_docs(spark)).collect()
    }
    ref = Counter(w for t in CORPUS for w in pretokenize_words(t))
    assert hist == dict(ref)


def test_distributed_equals_driver_trainer(spark):
    hist = word_histogram(_docs(spark))
    dist = learn_bpe_merges_distributed(hist, 10)
    drv = learn_bpe_merges_driver(
        [(r["word"], int(r["cnt"])) for r in hist.collect()], 10
    )
    assert dist == drv
    assert len(dist) == 10
    # counts are non-increasing only per-pair epoch, but every count >= 1
    assert all(c >= 1 for _, _, _, c in dist)


def test_size_adaptive_paths_agree(spark):
    docs = _docs(spark)
    via_driver = learn_bpe_merges(spark, docs, 6, driver_cutover_words=10**6)
    via_dist = learn_bpe_merges(spark, docs, 6, driver_cutover_words=0)
    assert via_driver == via_dist


def test_apply_merge_fold_equals_sequential_scan(spark):
    cases = [
        ["a", "a", "a", "a"],
        ["a", "a", "a"],
        ["a", "b", "b"],
        ["b", "a", "b", "a", "b"],
        [],
        ["a"],
    ]
    df = spark.createDataFrame([(c,) for c in cases], "syms: array<string>")
    for left, right in [("a", "a"), ("a", "b"), ("b", "a")]:
        got = [
            r["m"]
            for r in df.select(
                _apply_merge("syms", left, right).alias("m")
            ).collect()
        ]
        for case, out in zip(cases, got):
            ref, i = [], 0
            while i < len(case):
                if (
                    i + 1 < len(case)
                    and case[i] == left
                    and case[i + 1] == right
                ):
                    ref.append(left + right)
                    i += 2
                else:
                    ref.append(case[i])
                    i += 1
            assert out == ref, (case, left, right)


def test_initial_symbols_and_eow(spark):
    df = spark.createDataFrame([("cat",), ("a",)], ["word"])
    got = [r["s"] for r in df.select(_initial_symbols().alias("s")).collect()]
    assert got == [["c", "a", "t" + EOW], ["a" + EOW]]


def test_segment_word_applies_merges_in_rank_order():
    # merges learned on a corpus where 'th' then 'the</w>' win
    merges = [("t", "h"), ("th", "e" + EOW)]
    assert segment_word("the", merges) == ["the" + EOW]
    assert segment_word("that", merges) == ["th", "a", "t" + EOW]
    assert segment_word("", merges) == []


def test_merge_learning_query_shapes(spark):
    from emails_to_vector_db_spark.plans.registry import REGISTRY

    df = REGISTRY["bpe_merge_learning"].fn(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert [r["merge_rank"] for r in rows] == list(range(len(rows)))
    assert all(r["pair_count"] >= 1 for r in rows)


def test_segmentation_token_counts_bounded(spark):
    from emails_to_vector_db_spark.plans.registry import REGISTRY

    df = REGISTRY["bpe_segmentation_stats"].fn(spark, "/root/testdata/sf0.001")
    bad = df.where(
        (F.col("n_tokens") < F.col("n_words"))
        | (F.col("max_word_tokens") < F.when(F.col("n_words") > 0, 1).otherwise(0))
    )
    assert bad.count() == 0
