"""Unit semantics for operators/heavyhitters.py and warehouse merge_upsert."""

from __future__ import annotations

from pyspark.sql import functions as F

from emails_to_vector_db_spark.operators.heavyhitters import (
    heavy_hitters,
    misra_gries,
)


def test_misra_gries_guarantee():
    # 1000 items: 'a' has freq 400 > N/(c+1) for c=4 — must survive any
    # arrival order, including worst-case interleaving.
    stream = ["a", "b1", "b2", "b3", "b4"] * 100 + ["a"] * 300
    counters = misra_gries(iter(stream), capacity=4)
    assert "a" in counters


def test_misra_gries_capacity_bound():
    counters = misra_gries(iter([str(i) for i in range(1000)]), capacity=8)
    assert len(counters) <= 8


def test_heavy_hitters_exact_on_skewed(spark):
    rows = (
        [("x",)] * 50 + [("y",)] * 30 + [("z",)] * 20 + [(str(i),) for i in range(40)]
    )
    df = spark.createDataFrame(rows, "item string").repartition(8)
    got = [(r.item, r.freq) for r in heavy_hitters(df, k=3, capacity=64).collect()]
    assert got == [("x", 51), ("y", 30), ("z", 20)] or got == [
        ("x", 50),
        ("y", 30),
        ("z", 20),
    ]
    # ("x",) appears 50 times plus maybe str-collision: check precisely
    exact = (
        df.groupBy("item")
        .count()
        .orderBy(F.col("count").desc(), F.col("item").asc())
        .limit(3)
        .collect()
    )
    assert got == [(r.item, r["count"]) for r in exact]


def test_merge_upsert_semantics(spark):
    from emails_to_vector_db_spark.sources.warehouse import merge_upsert

    existing = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    updates = spark.createDataFrame([(2, "B"), (9, "Z")], "k long, v string")
    got = {r.k: r.v for r in merge_upsert(existing, updates, key="k").collect()}
    assert got == {1: "a", 2: "B", 3: "c", 9: "Z"}
