"""Relational query surface: scans, filters, joins, aggregations, windows,
set ops, rollup/cube, pivot, subqueries.

The reference ships every relational operation to PostgreSQL as SQL strings
(SURVEY.md §2.1-2.7) and itself contains only a projection scan
(``rag.py:40``) and a top-k (``rag.py:77-82``). This module is the full
relational operator surface a user of a SQL-backed store expects, expressed
as Catalyst-optimized DataFrame plans over the fixture star schema.

Scale notes (100 TB): every query here groups/joins on its natural key and
lets AQE pick broadcast vs sort-merge; dimension tables (region, nation,
supplier) are broadcast explicitly; aggregations are partial (map-side
combine) by construction of ``groupBy().agg()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from emails_to_vector_db_spark.plans.registry import register
from emails_to_vector_db_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Q1-style pricing summary: the canonical partial-agg (map-side combine) scan.
# --------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 6)                                        AS avg_qty,
       round(avg(l_extendedprice), 4)                                   AS avg_price,
       round(avg(l_discount), 6)                                        AS avg_disc,
       count(*)::BIGINT                                                 AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_ORACLE, tags=("agg", "scan"), bench=True)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: filtered scan + 8-way hash agg.
    Filter pushes to the parquet scan; agg is partial then final."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# --------------------------------------------------------------------------
# Q3-style: 3-way join + agg + top-k.
# --------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       epoch(o.o_orderdate)::BIGINT                          AS order_epoch,
       o.o_orderpriority
FROM customer c
JOIN orders o    ON c.c_custkey = o.o_custkey
JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY sum(l.l_extendedprice * (1 - l.l_discount)) DESC, l.l_orderkey ASC
LIMIT 10
"""


@register("q3_shipping_priority", oracle=_Q3_ORACLE, tags=("join", "agg", "topk"), bench=True)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: customer⋈orders⋈lineitem, revenue agg, top-10.
    Customer (selective filter) broadcasts; top-k is TakeOrderedAndProject."""
    cutoff = F.lit("1998-01-01").cast("timestamp")
    cust = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
        li.l_orderkey == orders.o_orderkey,
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(revenue).alias("rev_raw")
    )
    return (
        agg.orderBy(F.col("rev_raw").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            F.round("rev_raw", 2).alias("revenue"),
            F.unix_timestamp("o_orderdate").alias("order_epoch"),
            "o_orderpriority",
        )
    )


# --------------------------------------------------------------------------
# Q5-style: 5-way join through the dimension chain with broadcast dims.
# --------------------------------------------------------------------------

_Q5_ORACLE = """
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey  = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey  = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n.n_name
"""


@register("q5_local_supplier_volume", oracle=_Q5_ORACLE, tags=("join", "agg"), bench=True)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: 6-table join; supplier/nation/region broadcast
    (they are tiny at every scale factor); one shuffle for the final agg."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


# --------------------------------------------------------------------------
# Window functions.
# --------------------------------------------------------------------------

_TOP3_ORACLE = """
WITH ranked AS (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC
           ) AS rn
    FROM orders
)
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn::INT AS rn
FROM ranked WHERE rn <= 3
"""


@register("top3_orders_per_customer", oracle=_TOP3_ORACLE, tags=("window",))
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-N via row_number window (SURVEY.md §2.6)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.col("rn").cast("int").alias("rn"),
        )
    )


_DAILY_ORACLE = """
WITH daily AS (
    SELECT date_trunc('day', o_orderdate) AS day, count(*)::BIGINT AS n_orders
    FROM orders GROUP BY 1
)
SELECT epoch(day)::BIGINT AS day_epoch,
       n_orders,
       lag(n_orders) OVER w  AS prev_n,
       lead(n_orders) OVER w AS next_n,
       round(avg(n_orders) OVER (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
           AS ma7
FROM daily
WINDOW w AS (ORDER BY day)
"""


@register("daily_orders_moving_avg", oracle=_DAILY_ORACLE, tags=("window", "date"))
def daily_orders_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead + 7-row moving average over a date-bucketed aggregate.
    The un-partitioned window runs on ~2k aggregated rows, not the raw
    table — at scale the agg shrinks the data before the single-partition
    window, which is the correct order of operations."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    w = Window.orderBy("day")
    return daily.select(
        F.unix_timestamp("day").alias("day_epoch"),
        "n_orders",
        F.lag("n_orders").over(w).alias("prev_n"),
        F.lead("n_orders").over(w).alias("next_n"),
        F.round(F.avg("n_orders").over(w.rowsBetween(-6, 0)), 6).alias("ma7"),
    )


_SHARE_ORACLE = """
WITH per_priority AS (
    SELECT o_orderpriority, round(sum(o_totalprice), 2) AS total_revenue
    FROM orders GROUP BY 1
)
SELECT o_orderpriority, total_revenue,
       round(total_revenue / sum(total_revenue) OVER (), 6) AS share
FROM per_priority
"""


@register("priority_revenue_share", oracle=_SHARE_ORACLE, tags=("window", "agg"))
def priority_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate + global-window share-of-total (sum over empty frame)."""
    o = _t(spark, sf_dir, "orders")
    per = o.groupBy("o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total_revenue")
    )
    w = Window.partitionBy()
    return per.select(
        "o_orderpriority",
        "total_revenue",
        F.round(F.col("total_revenue") / F.sum("total_revenue").over(w), 6).alias(
            "share"
        ),
    )


# --------------------------------------------------------------------------
# Rollup / cube / pivot / distinct aggregates.
# --------------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT r.r_name, n.n_name,
       round(sum(s.s_acctbal), 2) AS total_acctbal,
       count(*)::BIGINT           AS n_suppliers
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
"""


@register("rollup_supplier_acctbal", oracle=_ROLLUP_ORACLE, tags=("agg", "rollup"))
def rollup_supplier_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region → nation → grand total)."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.round(F.sum("s_acctbal"), 2).alias("total_acctbal"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )


_CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       count(*)::BIGINT            AS n_items,
       round(sum(l_quantity), 2)   AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("cube_lineitem_flags", oracle=_CUBE_ORACLE, tags=("agg", "cube"))
def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over the two lineitem status dimensions."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


_PIVOT_ORACLE = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'O')::BIGINT AS status_O,
       count(*) FILTER (WHERE o_orderstatus = 'F')::BIGINT AS status_F,
       count(*) FILTER (WHERE o_orderstatus = 'P')::BIGINT AS status_P
FROM orders
GROUP BY o_orderpriority
"""


@register("pivot_status_by_priority", oracle=_PIVOT_ORACLE, tags=("agg", "pivot"))
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (conditional aggregation) — order counts by status column."""
    o = _t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("status_O"),
        F.coalesce(F.col("F"), F.lit(0)).alias("status_F"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_P"),
    )


_DISTINCT_ORACLE = """
SELECT c.c_mktsegment,
       count(*)::BIGINT                    AS n_orders,
       count(DISTINCT c.c_custkey)::BIGINT AS n_customers,
       round(avg(o.o_totalprice), 4)       AS avg_order_value
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment
"""


@register("segment_distinct_customers", oracle=_DISTINCT_ORACLE, tags=("agg", "distinct"))
def segment_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT) alongside plain aggregates (expand-based plan)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey)
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("c_custkey").alias("n_customers"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_order_value"),
    )


# --------------------------------------------------------------------------
# Set operations & semi/anti joins.
# --------------------------------------------------------------------------

_SETOPS_ORACLE = """
SELECT DISTINCT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
EXCEPT
SELECT DISTINCT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
"""


@register("churned_customers_except", oracle=_SETOPS_ORACLE, tags=("setops",))
def churned_customers_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers ordering in 1995 but not 1996 (SURVEY.md §2.6)."""
    o = _t(spark, sf_dir, "orders")

    def year(y):
        return o.where(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
        ).select("o_custkey")

    # subtract == EXCEPT (distinct semantics), matching the SQL oracle.
    return year(1995).subtract(year(1996))


_ANTI_ORACLE = """
SELECT n.n_name, count(*)::BIGINT AS n_customers_no_orders
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
)
GROUP BY n.n_name
"""


@register("customers_without_orders", oracle=_ANTI_ORACLE, tags=("join", "anti", "J4"))
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS) — the dedup-before-insert idiom the reference
    lacks (it re-inserts blindly, ``rag.py:55``; SURVEY.md J4). Counts
    customers per nation with no 400k+ order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    n = _t(spark, sf_dir, "nation")
    no_orders = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    return (
        no_orders.join(F.broadcast(n), no_orders.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers_no_orders"))
    )


_SEMI_ORACLE = """
SELECT c.c_mktsegment, count(*)::BIGINT AS n_active_customers
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
GROUP BY c.c_mktsegment
"""


@register("big_spenders_semi", oracle=_SEMI_ORACLE, tags=("join", "semi"))
def big_spenders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS): customers with at least one 300k+ order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_active_customers"))
    )


# --------------------------------------------------------------------------
# Subqueries & scalar functions.
# --------------------------------------------------------------------------

_ABOVE_AVG_ORACLE = """
SELECT p.p_partkey, p.p_name, p.p_type, round(p.p_retailprice, 2) AS retailprice
FROM part p
JOIN (
    SELECT p_type, avg(p_retailprice) AS type_avg FROM part GROUP BY p_type
) t ON p.p_type = t.p_type
WHERE p.p_retailprice > t.type_avg
"""


@register("parts_above_type_avg", oracle=_ABOVE_AVG_ORACLE, tags=("join", "subquery"))
def parts_above_type_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decorrelated correlated-subquery: parts priced above their type's
    average (broadcast the per-type aggregate)."""
    p = _t(spark, sf_dir, "part")
    avg_t = p.groupBy(F.col("p_type").alias("t_type")).agg(
        F.avg("p_retailprice").alias("type_avg")
    )
    return (
        p.join(F.broadcast(avg_t), p.p_type == avg_t.t_type)
        .where(F.col("p_retailprice") > F.col("type_avg"))
        .select(
            "p_partkey",
            "p_name",
            "p_type",
            F.round("p_retailprice", 2).alias("retailprice"),
        )
    )


_SQL_API_ORACLE = """
SELECT n.n_name,
       count(DISTINCT c.c_custkey)::BIGINT AS n_customers,
       round(sum(c.c_acctbal), 2)          AS total_acctbal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@register("sql_api_nation_customers", oracle=_SQL_API_ORACLE, tags=("sql", "agg", "join"))
def sql_api_nation_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same engine through the SQL front door: temp views + ``spark.sql``
    (Catalyst produces the identical plan either way — SURVEY.md §2's
    'SQL API' row). Views are registered from the same loaders."""
    from emails_to_vector_db_spark.sources.tables import register_views

    register_views(spark, sf_dir, names=("customer", "nation"))
    return spark.sql(
        """
        SELECT n.n_name,
               count(DISTINCT c.c_custkey) AS n_customers,
               round(sum(c.c_acctbal), 2)  AS total_acctbal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )


_SCAN_ORACLE = """
SELECT p_partkey, p_name, p_brand, round(p_retailprice, 2) AS retailprice
FROM part
WHERE p_brand = 'Brand#11' AND p_size > 25
"""


@register("part_filter_scan", oracle=_SCAN_ORACLE, tags=("scan", "filter", "S2"))
def part_filter_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + predicate scan — the reference's S2 full-table SELECT
    (``rag.py:40``) upgraded with pushdown: both the brand/size predicates
    and the 4-column projection reach the parquet reader."""
    p = _t(spark, sf_dir, "part")
    return (
        p.where((F.col("p_brand") == "Brand#11") & (F.col("p_size") > 25))
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            F.round("p_retailprice", 2).alias("retailprice"),
        )
    )
