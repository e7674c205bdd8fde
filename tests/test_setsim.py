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


def test_distributed_row_number_matches_global_window(spark):
    """distributed_row_number == row_number().over(Window.orderBy(...))
    exactly, for a multi-partition input with heavy ties on the first
    order column (the rarest-first df ranking shape)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from emails_to_vector_db_spark.operators.ranking import (
        distributed_row_number,
    )

    rows = [(f"tok{i:04d}", (i * 7) % 13) for i in range(500)]
    df = spark.createDataFrame(rows, "token string, df int").repartition(8)
    order = [F.col("df").asc(), F.col("token").asc()]
    expected = {
        (r["token"], r["rank"])
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    got = {
        (r["token"], r["rank"])
        for r in distributed_row_number(df, order).collect()
    }
    spark.catalog.clearCache()
    assert got == expected


def test_distributed_row_number_no_single_partition_window(spark):
    """The distributed rank plan must not contain an unpartitioned
    Window (the single-partition straggler it exists to avoid)."""
    from pyspark.sql import functions as F

    from emails_to_vector_db_spark.operators.ranking import (
        distributed_row_number,
    )

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    ranked = distributed_row_number(df, [F.col("k").asc(), F.col("id").asc()])
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    spark.catalog.clearCache()
    # every Window in the plan must carry a partition spec: the
    # unpartitioned form prints "Window [...], [order...]" with an
    # empty partition list "], [" directly after the function list —
    # ours prints partitionBy __pid
    for line in plan.splitlines():
        if "Window " in line:
            assert "__pid" in line, f"unpartitioned window: {line}"


def _brute_contain(docs: dict[int, set[str]], tau: float) -> dict:
    out = {}
    for a, b in itertools.combinations(sorted(docs), 2):
        inter = len(docs[a] & docs[b])
        m = min(len(docs[a]), len(docs[b]))
        if m and inter / m >= tau:
            out[(a, b)] = (inter, m)
    return out


def _spark_contain(spark, docs: dict[int, set[str]], tau: float) -> dict:
    from emails_to_vector_db_spark.operators.setsim import (
        prefix_filter_containment_join,
    )

    rows = [(d, t) for d, toks in docs.items() for t in toks]
    df = spark.createDataFrame(rows, ["doc_id", "token"])
    res = prefix_filter_containment_join(df, tau=tau).collect()
    return {(r["doc_a"], r["doc_b"]): (r["inter"], r["min_sz"]) for r in res}


@pytest.mark.parametrize("tau", [0.5, 0.8, 0.9, 1.0])
def test_containment_matches_brute_force_random(spark, tau):
    rng = random.Random(77)
    vocab = [f"t{i}" for i in range(60)]
    docs = {}
    for d in range(40):
        docs[d] = set(rng.sample(vocab, rng.randint(3, 18)))
    # adversarial plants: strict subset (tiny inside huge — the pair
    # Jaccard misses), exact duplicate, and equal-size near-overlap
    docs[100] = set(list(docs[0])[:3])
    docs[101] = set(docs[1])
    docs[102] = set(list(docs[2])[:-1]) | {"zzx"} if len(docs[2]) > 3 else docs[2]
    assert _spark_contain(spark, docs, tau) == _brute_contain(docs, tau)


def test_containment_subset_found_where_jaccard_misses(spark):
    # 3-token subset of a 30-token doc: containment 1.0, Jaccard 0.1
    big = {f"w{i}" for i in range(30)}
    docs = {1: big, 2: set(list(big)[:3])}
    assert _spark_contain(spark, docs, 0.9) == {(1, 2): (3, 3)}
    assert _spark_pairs(spark, docs, 0.9) == {}


def test_containment_boundary_inclusive(spark):
    # inter=2, min=|{a,b}|=2 at tau=1.0 -> kept; removing one shared
    # token drops it below
    docs = {1: {"a", "b", "c", "d"}, 2: {"a", "b"}}
    assert _spark_contain(spark, docs, 1.0) == {(1, 2): (2, 2)}
    docs2 = {1: {"a", "x", "c", "d"}, 2: {"a", "b"}}
    assert _spark_contain(spark, docs2, 1.0) == {}


def test_distributed_prefix_agg_matches_global_window(spark):
    """distributed_prefix_agg cumsum/cummax == the global-window form
    exactly, for a multi-partition input with nulls in the aggregated
    columns and ties on the order prefix."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from emails_to_vector_db_spark.operators.ranking import (
        distributed_prefix_agg,
    )

    rows = [
        (i, (i * 7) % 13, None if i % 11 == 0 else float(i % 5),
         (i * 3) % 97)
        for i in range(500)
    ]
    df = spark.createDataFrame(
        rows, "id long, grp int, v double, m int"
    ).repartition(8)
    order = [F.col("grp").asc(), F.col("id").asc()]
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    expected = {
        (r["id"], r["cs"], r["cm"])
        for r in df.select(
            "id", F.sum("v").over(w).alias("cs"), F.max("m").over(w).alias("cm")
        ).collect()
    }
    got = {
        (r["id"], r["cs"], r["cm"])
        for r in distributed_prefix_agg(
            df, order, sums=[("v", "cs")], maxs=[("m", "cm")]
        ).select("id", "cs", "cm").collect()
    }
    spark.catalog.clearCache()
    assert got == expected


def test_distributed_prefix_agg_no_single_partition_window(spark):
    """The prefix-agg plan must not contain an unpartitioned Window."""
    from pyspark.sql import functions as F

    from emails_to_vector_db_spark.operators.ranking import (
        distributed_prefix_agg,
    )

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    out = distributed_prefix_agg(
        df, [F.col("id").asc()], sums=[("k", "ck")], maxs=[("k", "mk")]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    spark.catalog.clearCache()
    for line in plan.splitlines():
        if "Window " in line:
            assert "__pid" in line, f"unpartitioned window: {line}"


def test_distributed_helpers_release_input_pin(spark):
    """Both ranking helpers must unpersist the input pin before
    returning; with pins=[] the caller can release the local table too,
    leaving zero cache entries (the ADVICE.md leak)."""
    from pyspark.sql import functions as F

    from emails_to_vector_db_spark.operators.ranking import (
        distributed_prefix_agg,
        distributed_row_number,
    )

    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc.sc()

    def n_cached():
        return jsc.getPersistentRDDs().size()

    # DELTA assertions: earlier tests in the shared session may leave
    # localCheckpointed RDDs behind (e.g. the k-core peel), which
    # clearCache() cannot remove and the ContextCleaner reaps
    # asynchronously — only the helpers' own net effect is under test.
    base = n_cached()
    df = spark.range(200).select(
        F.col("id"), (F.col("id") % 5).alias("k")
    )
    pins = []
    distributed_row_number(
        df, [F.col("k").asc(), F.col("id").asc()], pins=pins
    ).count()
    assert len(pins) == 1
    assert n_cached() - base == 1  # only the local table remains
    pins[0].unpersist()
    assert n_cached() - base == 0

    pins = []
    distributed_prefix_agg(
        df, [F.col("id").asc()], sums=[("k", "ck")], pins=pins
    ).count()
    assert len(pins) == 1
    assert n_cached() - base == 1
    pins[0].unpersist()
    assert n_cached() - base == 0


def test_distributed_ntile_matches_global_window(spark):
    """distributed_ntile == ntile(k).over(Window.orderBy(...)) exactly,
    across bucket counts that exercise every closed-form branch: k
    dividing n evenly, k with a remainder (the first r buckets take one
    extra row), k > n (each row its own bucket), and k = 1."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from emails_to_vector_db_spark.operators.ranking import (
        distributed_ntile,
    )

    for n, k in [(120, 8), (123, 8), (7, 16), (50, 1), (97, 13)]:
        rows = [(i, (i * 11) % 17) for i in range(n)]
        df = spark.createDataFrame(rows, "id long, v int").repartition(6)
        order = [F.col("v").asc(), F.col("id").asc()]
        expected = {
            (r["id"], r["b"])
            for r in df.withColumn(
                "b", F.ntile(k).over(Window.orderBy(*order))
            ).collect()
        }
        got = {
            (r["id"], r["b"])
            for r in distributed_ntile(df, order, k, "b").collect()
        }
        spark.catalog.clearCache()
        assert got == expected, f"ntile mismatch at n={n}, k={k}"


def test_distributed_ntile_no_single_partition_window(spark):
    """The distributed ntile plan must not contain an unpartitioned
    Window — same guard as distributed_row_number."""
    from pyspark.sql import functions as F

    from emails_to_vector_db_spark.operators.ranking import (
        distributed_ntile,
    )

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    bucketed = distributed_ntile(
        df, [F.col("k").asc(), F.col("id").asc()], 4
    )
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    spark.catalog.clearCache()
    for line in plan.splitlines():
        if "Window " in line:
            assert "__pid" in line, f"unpartitioned window: {line}"
