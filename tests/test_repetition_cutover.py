"""Cross-path equivalence + plan guards for the bigram-repetition
long-document cutover (operators/repetition.py).

The array form is a scan-local sorted-gram fold; the explode census
distributes a single huge document across partitions. Both must
compute IDENTICAL statistics, the router must send every document
above the cutover to the census, and the scan-local array expression
must never run without the cutover filter above it.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from emails_to_vector_db_spark.operators.repetition import (
    REP_CUTOVER_TOKENS,
    bigram_repetition_stats,
)

_BIG = 10**9  # cutover high enough that everything takes the array path


def _docs_df(spark, docs):
    return spark.createDataFrame(
        [(i, d.split()) for i, d in enumerate(docs)],
        "doc_id long, toks array<string>",
    )


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


HAND_DOCS = [
    "",  # single empty token after split semantics upstream; here: []
    "one",  # no grams
    "a b",  # one gram
    "a b a b a b a b",  # heavy repetition: 'a b' x4 + 'b a' x3
    "w x y z w x y z q",  # partial repeats
    "u v " * 20,  # pure loop
    " ".join(f"t{i}" for i in range(50)),  # all-distinct grams
    "p q p q r s r s p q",  # mixed
]


def test_hand_docs_equivalence(spark):
    """Array path and explode path agree on handcrafted edge docs."""
    df = _docs_df(spark, HAND_DOCS)
    via_array = bigram_repetition_stats(df, cutover_tokens=_BIG)
    via_explode = bigram_repetition_stats(df, cutover_tokens=0)
    assert _collect(via_array) == _collect(via_explode)


def test_random_docs_equivalence_across_cutover(spark):
    """Seeded random docs straddling a small cutover: the mixed-route
    result equals the pure-array reference row for row."""
    rng = random.Random(77)
    vocab = [f"w{i}" for i in range(12)]  # small vocab => many dup grams
    docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40)))
        for _ in range(60)
    ]
    df = _docs_df(spark, docs)
    mixed = bigram_repetition_stats(df, cutover_tokens=15)
    reference = bigram_repetition_stats(df, cutover_tokens=_BIG)
    assert _collect(mixed) == _collect(reference)


def test_carry_columns_ride_both_paths(spark):
    rows = [
        (1, "s1", 0.5, "a b a b".split()),
        (2, "s2", 0.1, " ".join(["x y"] * 30).split()),  # 60 tokens
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, sr double, toks array<string>"
    )
    out = bigram_repetition_stats(
        df, carry=("source", "sr"), cutover_tokens=10
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["source"] == "s1" and by_id[1]["sr"] == 0.5
    assert by_id[2]["source"] == "s2" and by_id[2]["sr"] == 0.1
    # doc 2 (60 tokens, cutover 10) went through the census: 'x y' x30
    # and 'y x' x29 -> max 30, every one of the 59 slots duplicated
    assert by_id[2]["max_gram_count"] == 30
    assert by_id[2]["dup_gram_slots"] == 59
    assert by_id[2]["n_bi"] == 59


def test_long_doc_takes_linear_path(spark):
    """A 60k-token document MUST route to the explode census at the
    default cutover — on the array path this would be ~3.6e9 string
    comparisons (minutes), on the census it is instant. Values are
    checked against the closed form of the periodic document."""
    n = 60_000
    toks = ["a", "b", "c"] * (n // 3)
    df = spark.createDataFrame(
        [(1, toks)], "doc_id long, toks array<string>"
    )
    row = bigram_repetition_stats(df).collect()[0]
    # grams: 'a b' and 'b c' x 20000 each, 'c a' x 19999
    assert row["n_tok"] == n
    assert row["n_bi"] == n - 1
    assert row["max_gram_count"] == 20_000
    assert row["dup_gram_slots"] == n - 1


@pytest.mark.parametrize("name", ["gopher_repetition_filters"])
def test_registry_hash_unchanged_vs_oracle(spark, name):
    """The cutover refactor must not move the registered query's values
    at fixture scale (the oracle replay in test_oracle_parity.py is the
    full gate; this is the fast inline check on the touched query)."""
    from emails_to_vector_db_spark.plans import REGISTRY
    from tests.conftest import SF_ORACLE, duck_con, rows_match

    df = REGISTRY[name].fn(spark, SF_ORACLE)
    duck = duck_con(SF_ORACLE).execute(REGISTRY[name].oracle).fetchall()
    ok, why = rows_match(df, duck)
    assert ok, why


def test_plan_guard_quadratic_scan_gated(spark):
    """Reintroduction guard: the optimized plan must (a) contain the
    explode census branch and (b) only evaluate the scan-local fold
    expression under a `size(...) <= cutover` filter. If the union
    ever collapses back to a single unguarded array scan, one or both
    assertions fail."""
    df = _docs_df(spark, HAND_DOCS)
    out = bigram_repetition_stats(df, cutover_tokens=21)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Generate explode" in plan, (
        "explode census branch disappeared from the cutover plan"
    )
    assert "<= 21)" in plan and "> 21)" in plan, (
        "cutover routing filters disappeared from the plan"
    )
    # the quadratic expression (a lambda filter nested inside a lambda
    # transform) appears in the SHORT branch only; the long branch must
    # carry no nested-lambda count expression
    import re

    branches = re.split(r"\bUnion\b", plan, maxsplit=1)
    assert len(branches) == 2, "expected a Union of the two routes"


def test_chars_guard_equivalence_even_with_lying_metadata(spark):
    """chars_col is a routing HINT, never a correctness dependency:
    an understated length (below 2*cutover for a genuinely long doc)
    may only demote that doc to the array branch — results identical,
    no row lost. NULL lengths fall back to token-count routing."""
    rows = [
        (1, "a b a b a b".split(), 11),         # honest short
        (2, ("x y " * 20).split(), 159),        # honest long (40 toks)
        (3, ("p q " * 20).split(), 3),          # LYING: long doc, tiny len
        (4, ("m n " * 20).split(), None),       # NULL length
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, toks array<string>, n_chars long"
    )
    with_hint = bigram_repetition_stats(
        df, cutover_tokens=10, chars_col="n_chars"
    )
    reference = bigram_repetition_stats(df, cutover_tokens=_BIG)
    got = _collect(with_hint.drop("n_chars"))
    assert len(got) == 4
    assert got == _collect(reference.drop("n_chars"))


def test_chars_guard_pushes_to_scan(tmp_path, spark):
    """The whole point of chars_col: the long branch's parquet scan must
    carry a pushed n_chars predicate so row-group stats prune the second
    corpus scan on short-document corpora."""
    df = spark.createDataFrame(
        [(1, "a b c", 5)], "doc_id long, text string, n_chars long"
    )
    p = str(tmp_path / "docs.parquet")
    df.write.mode("overwrite").parquet(p)
    d = spark.read.parquet(p).select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("toks"), "n_chars"
    )
    out = bigram_repetition_stats(d, chars_col="n_chars")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert (
        f"GreaterThan(n_chars,{2 * REP_CUTOVER_TOKENS})" in plan
    ), "n_chars guard no longer reaches PushedFilters"


def test_fold_matches_python_ground_truth(spark):
    """Independent oracle: both Spark branches could in principle share
    a bug, so check the fold against a plain-Python Counter over seeded
    random docs (small vocab => dense run structure in the sorted gram
    array: runs of every length, ties for the max)."""
    from collections import Counter

    rng = random.Random(1234)
    vocab = [f"v{i}" for i in range(6)]
    docs = [
        [rng.choice(vocab) for _ in range(rng.randint(0, 60))]
        for _ in range(80)
    ]
    expected = {}
    for i, toks in enumerate(docs):
        grams = Counter(
            f"{a} {b}" for a, b in zip(toks, toks[1:], strict=False)
        )
        expected[i] = (
            len(toks),
            sum(grams.values()),
            max(grams.values(), default=0),
            sum(c for c in grams.values() if c >= 2),
        )
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, toks array<string>"
    )
    out = bigram_repetition_stats(df, cutover_tokens=_BIG).collect()
    got = {
        r["doc_id"]: (
            r["n_tok"],
            r["n_bi"],
            r["max_gram_count"],
            r["dup_gram_slots"],
        )
        for r in out
    }
    assert got == expected
