"""Salted join / salted aggregation must be result-identical to the plain
forms (they only change the shuffle shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from emails_to_vector_db_spark.operators.skew import (
    salted_groupby_agg,
    salted_join,
)
from emails_to_vector_db_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_salted_join_matches_plain(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").withColumn(
        "_rid", F.monotonically_increasing_id()
    )
    o = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(o, "l_orderkey").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s")
    ).collect()[0]
    salted = salted_join(
        li, o, "l_orderkey", n_salts=8, big_unique_col="_rid"
    ).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s")
    ).collect()[0]
    assert (plain.n, plain.s) == (salted.n, salted.s)


def test_salted_groupby_matches_plain(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    plain = {
        (r.l_returnflag, r.l_linestatus): (r.n, round(r.s, 2), r.mx)
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("s"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag, r.l_linestatus): (r.n, round(r.s, 2), r.mx)
        for r in salted_groupby_agg(
            li,
            ["l_returnflag", "l_linestatus"],
            {
                "n": ("count", "l_quantity"),
                "s": ("sum", "l_quantity"),
                "mx": ("max", "l_extendedprice"),
            },
            n_salts=8,
            unique_col="l_orderkey",
        ).collect()
    }
    assert plain == salted


def test_aqe_skew_join_fires(spark):
    """The AQE skew-join claimed in README actually triggers: a 90%-skewed
    key with thresholds lowered to fixture scale shows skew-split reads
    in the final adaptive plan, and results stay correct."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.shuffle.partitions": "4",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(0, 50).select(
            F.col("id").alias("k"), F.lit("dim").alias("v")
        )
        joined = left.join(right, "k").select("k")
        # collect() executes THIS Dataset's QueryExecution, so the adaptive
        # final plan (with skew splits) is inspectable on it afterwards
        rows = joined.collect()
        expected = left.where(F.col("k") < 50).count()
        assert len(rows) == expected
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final
        assert "isSkew=true" in final or "skewed" in final.lower(), final[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
