"""Additional TPC-H-shaped relational coverage (Q10/Q12/Q14/Q18/Q19/Q22
analogues adapted to the fixture schema) — breadth for the relational
surface: disjunctive predicates, HAVING, conditional shares, correlated
NOT EXISTS with scalar subquery, multi-way classification aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emails_to_vector_db_spark.plans.registry import register
from emails_to_vector_db_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


_Q10_ORACLE = """
SELECT c.c_custkey, c.c_name, n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
"""


@register("q10_returned_item_customers", oracle=_Q10_ORACLE, tags=("join", "agg", "topk"), bench=True)
def q10_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-shaped: customers who returned the most revenue in a year."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    agg = j.groupBy("c_custkey", "c_name", "n_name").agg(
        F.sum(rev).alias("rev_raw")
    )
    return (
        agg.orderBy(F.col("rev_raw").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey", "c_name", "n_name", F.round("rev_raw", 2).alias("revenue")
        )
    )


_Q12_ORACLE = """
SELECT o.o_orderpriority,
       sum(CASE WHEN l.l_quantity >= 25 THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN l.l_quantity <  25 THEN 1 ELSE 0 END)::BIGINT AS low_line_count
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY o.o_orderpriority
"""


@register("q12_priority_line_classes", oracle=_Q12_ORACLE, tags=("join", "agg", "conditional"))
def q12_priority_line_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-shaped: conditional classification counts inside an agg."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    hi = F.when(F.col("l_quantity") >= 25, 1).otherwise(0)
    lo = F.when(F.col("l_quantity") < 25, 1).otherwise(0)
    return j.groupBy("o_orderpriority").agg(
        F.sum(hi).alias("high_line_count"), F.sum(lo).alias("low_line_count")
    )


_Q14_ORACLE = """
SELECT round(
         100.0 * sum(CASE WHEN p.p_type IN ('PROMO', 'ECONOMY')
                          THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
         / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-07-01'
"""


@register("q14_promo_revenue_share", oracle=_Q14_ORACLE, tags=("join", "agg", "conditional"))
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-shaped: conditional revenue share with a broadcast part join."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").isin("PROMO", "ECONOMY"), rev).otherwise(
        F.lit(0.0)
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return j.agg(
        F.round(100.0 * F.sum(promo) / F.sum(rev), 6).alias("promo_revenue_pct")
    )


_Q18_ORACLE = """
SELECT o.o_orderkey, round(o.o_totalprice, 2) AS totalprice,
       round(sum(l.l_quantity), 2) AS total_qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, o.o_totalprice
HAVING sum(l.l_quantity) > 120
"""


@register("q18_large_quantity_orders", oracle=_Q18_ORACLE, tags=("join", "agg", "having"))
def q18_large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-shaped: HAVING on an aggregate (post-aggregation filter)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    return (
        j.groupBy("o_orderkey", "o_totalprice")
        .agg(F.sum("l_quantity").alias("qty_raw"))
        .where(F.col("qty_raw") > 120)
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("qty_raw", 2).alias("total_qty"),
        )
    )


_Q19_ORACLE = """
SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*)::BIGINT AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 10)
   OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity >= 20)
   OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity >= 30)
"""


@register("q19_disjunctive_predicates", oracle=_Q19_ORACLE, tags=("join", "filter", "disjunction"))
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-shaped: OR-of-ANDs predicate spanning both join sides —
    Catalyst extracts the common join key and keeps the disjunction as a
    post-join filter."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 20))
        | ((F.col("p_brand") == "Brand#33") & F.col("p_size").between(20, 50) & (F.col("l_quantity") >= 30))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.where(cond).agg(
        F.round(F.sum(rev), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


_Q22_ORACLE = """
WITH avg_bal AS (
    SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
)
SELECT substr(c.c_name, 1, 9) AS name_prefix_grp,
       count(*)::BIGINT        AS n_customers,
       round(sum(c.c_acctbal), 2) AS total_bal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.a
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY substr(c.c_name, 1, 9)
"""


@register("q22_dormant_rich_customers", oracle=_Q22_ORACLE, tags=("agg", "anti", "subquery"))
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-shaped: scalar subquery (global average) + anti join (no recent
    orders) + prefix grouping."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("a")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("a")
    )
    dormant = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return dormant.groupBy(
        F.substring("c_name", 1, 9).alias("name_prefix_grp")
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )
