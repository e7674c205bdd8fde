"""TPC-H breadth, second batch: Q4/Q6/Q7/Q8/Q9/Q13/Q15/Q16/Q17/Q20/Q21
analogues adapted to the fixture schema (no partsupp table, no
commit/receipt dates — "late" predicates use shipdate vs orderdate).

These exercise the planner shapes the first batch didn't: EXISTS /
NOT-EXISTS rewrites into semi/anti joins (Q4, Q20, Q21 — including
same-table semi+anti in one query), pure pushdown scans (Q6), multi-way
join trees with two independent dimension chains (Q7, Q8, Q9), left
outer join + double aggregation (Q13), scalar-subquery-against-agg
top-1 (Q15), distinct aggregation after anti join (Q16), and a
correlated per-group average threshold (Q17).

The reference itself has no relational queries at all (its single SQL
SELECT is ``rag.py:40``); this surface exists because the engine's bar
is the full SURVEY.md §2 A/J/W/SO rows at oracle-checked parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from emails_to_vector_db_spark.plans.registry import register
from emails_to_vector_db_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _ts(s: str):
    return F.lit(s).cast("timestamp")


_Q4_ORACLE = """
SELECT o.o_orderpriority, count(*)::BIGINT AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority
"""


@register("q4_order_priority_checking", oracle=_Q4_ORACLE, tags=("semi", "agg"))
def q4_order_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shaped: EXISTS → left-semi join (orders with at least one
    lineitem shipped >60 days after ordering), priority histogram."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-07-01"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


_Q6_ORACLE = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS forecast_revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=_Q6_ORACLE, tags=("scan", "pushdown", "agg"), bench=True)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6-shaped: the pushdown showcase — a single scan whose three
    predicates all reach the parquet reader (PushedFilters) and whose
    projection prunes to 4 columns, then one global agg. No joins, no
    shuffle beyond the final partial-agg merge."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("forecast_revenue")
        )
    )


_Q7_ORACLE = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l.l_shipdate)::INT AS ship_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS volume
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
"""


@register("q7_volume_shipping", oracle=_Q7_ORACLE, tags=("join", "agg", "multiway"), bench=True)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-shaped: two independent dimension chains (supplier→nation,
    order→customer→nation) hanging off the fact table, with a
    cross-chain disjunctive filter. The nation joins broadcast; the
    orders join is the only large shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
    ).agg(F.round(F.sum(rev), 2).alias("volume"))


_Q8_ORACLE = """
WITH all_sales AS (
    SELECT year(o.o_orderdate)::INT AS order_year,
           l.l_extendedprice * (1 - l.l_discount) AS volume,
           n1.n_name AS supp_nation
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n2.n_regionkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
)
SELECT order_year,
       round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
             / sum(volume), 6) AS market_share
FROM all_sales GROUP BY order_year
"""


@register("q8_market_share", oracle=_Q8_ORACLE, tags=("join", "agg", "multiway"))
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8-shaped: one nation's share of PROMO-part revenue sold into a
    region, per year — an 8-table join tree where every dimension
    broadcast-joins onto the lineitem spine."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_vol = F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(0.0)
    return (
        j.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.round(F.sum(nation_vol) / F.sum(vol), 6).alias("market_share")
        )
    )


_Q9_ORACLE = """
SELECT n.n_name AS nation, year(o.o_orderdate)::INT AS order_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)
                 - l.l_quantity * p.p_retailprice * 0.1), 2) AS profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%gear%'
GROUP BY n.n_name, year(o.o_orderdate)
"""


@register("q9_product_type_profit", oracle=_Q9_ORACLE, tags=("join", "agg", "multiway"), bench=True)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-shaped: profit (revenue minus a retail-price-derived cost — the
    fixture has no partsupp/supplycost) by supplier nation and year for a
    LIKE-filtered part subset."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "l_quantity"
    ) * F.col("p_retailprice") * F.lit(0.1)
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").alias("order_year"),
    ).agg(F.round(F.sum(profit), 2).alias("profit"))


_Q13_ORACLE = """
WITH per_customer AS (
    SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS c_count
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
)
SELECT c_count, count(*)::BIGINT AS custdist
FROM per_customer GROUP BY c_count
"""


@register("q13_customer_order_distribution", oracle=_Q13_ORACLE, tags=("outer-join", "agg"))
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-shaped: LEFT OUTER join (customers with zero orders survive
    with count 0) followed by a second aggregation over the first —
    the order-count histogram."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


_Q15_ORACLE = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-07-01'
    GROUP BY l_suppkey
),
ranked AS (
    SELECT supplier_no, total_rev,
           row_number() OVER (ORDER BY total_rev DESC, supplier_no ASC) AS rn
    FROM revenue
)
SELECT s.s_suppkey, s.s_name, r.total_rev
FROM ranked r JOIN supplier s ON s.s_suppkey = r.supplier_no
WHERE r.rn = 1
"""


@register("q15_top_supplier", oracle=_Q15_ORACLE, tags=("agg", "topk", "join"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-shaped: the half-year revenue leader among suppliers (the
    classic view + max(total_revenue) formulated as a deterministic
    rank-1 with a suppkey tiebreak). The rank-1 is orderBy().limit(1)
    — TakeOrderedAndProject, a distributed partial top-k — not a
    row_number window, which would single-partition the supplier-grain
    revenue table."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-07-01"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_rev")
        )
    )
    top = rev.orderBy(
        F.col("total_rev").desc(), F.col("supplier_no").asc()
    ).limit(1)
    s = _t(spark, sf_dir, "supplier")
    return top.join(
        F.broadcast(s), top.supplier_no == s.s_suppkey
    ).select("s_suppkey", "s_name", "total_rev")


_Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#3'
  AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register("q16_supplier_part_kinds", oracle=_Q16_ORACLE, tags=("anti", "distinct-agg"))
def q16_supplier_part_kinds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-shaped: distinct-supplier counts per part kind, excluding
    suppliers with negative balance (the "complaints" NOT IN → anti
    join; the fixture's lineitem stands in for partsupp)."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#3")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).join(
        bad, li.l_suppkey == bad.s_suppkey, "left_anti"
    )
    return j.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


_Q17_ORACLE = """
WITH part_avg AS (
    SELECT l_partkey, avg(l_quantity) AS avg_qty
    FROM lineitem GROUP BY l_partkey
)
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN part_avg a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#11'
  AND l.l_quantity < 0.5 * a.avg_qty
"""


@register("q17_small_quantity_revenue", oracle=_Q17_ORACLE, tags=("join", "agg", "correlated"))
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-shaped: the correlated per-part average-quantity threshold
    (classically a correlated scalar subquery; planned here — and by any
    modern optimizer — as a decorrelated aggregate self-join)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#11")
    # Filter-first windowization: the brand predicate keeps WHOLE parts,
    # so the per-part average over the brand-filtered rows equals the
    # correlated subquery's average — compute it as a window over the
    # already-filtered join instead of aggregating ALL of lineitem by
    # partkey and joining back. One lineitem scan, and the partkey
    # shuffle carries only the brand's ~4% of rows instead of the full
    # table (the decorrelated self-join form shuffles everything).
    j = li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
    w = Window.partitionBy("l_partkey")
    flt = j.withColumn("avg_qty", F.avg("l_quantity").over(w)).where(
        F.col("l_quantity") < 0.5 * F.col("avg_qty")
    )
    return flt.agg(
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
    )


_Q20_ORACLE = """
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE 'small%'
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_suppkey
    HAVING sum(l.l_quantity) > 100
)
"""


@register("q20_part_supply_candidates", oracle=_Q20_ORACLE, tags=("semi", "having"))
def q20_part_supply_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20-shaped: nested IN-subquery with its own aggregate+HAVING →
    an aggregated semi join (suppliers who moved >100 units of the
    small* part family in 1997)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    movers = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 100)
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    return s.join(
        movers, s.s_suppkey == movers.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


_Q21_ORACLE = """
WITH late AS (
    SELECT l.l_orderkey, l.l_suppkey
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
)
SELECT s.s_name, count(*)::BIGINT AS numwait
FROM late l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s.s_name
"""


@register("q21_suppliers_kept_orders_waiting", oracle=_Q21_ORACLE, tags=("semi", "anti", "multiway"), bench=True)
def q21_suppliers_kept_orders_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-shaped: the hardest classic rewrite — EXISTS and NOT EXISTS
    against the SAME derived relation become a semi join plus an anti
    join over two aliases of it: suppliers who were the SOLE late
    shipper on a multi-supplier finished order ("late" = shipped >90
    days after ordering; the fixture has no receiptdate)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    # Aggregate rewrite of the semi+anti formulation (the oracle keeps
    # that shape): ONE lineitem scan instead of three. Per (order,
    # supplier) count the lines and the late lines; per order the
    # qualifying condition "sole late supplier on a multi-supplier
    # order" becomes (exactly one supplier with n_late>0) AND (>1
    # suppliers total); that supplier is credited with their n_late —
    # matching the per-l1-row counting of the EXISTS form (a supplier
    # with two late lines in one order counts twice). Group states are
    # bounded by suppliers-per-order, so both aggregates map-side
    # combine; the (order,supplier) rows entering the second shuffle are
    # already line-count-collapsed.
    late_flag = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 90 DAYS"
    )
    per_os = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.count(F.when(late_flag, 1)).alias("n_late"))
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.sum((F.col("n_late") > 0).cast("int")).alias("n_late_supps"),
        F.count(F.lit(1)).alias("n_supps"),
        F.max(F.when(F.col("n_late") > 0, F.col("l_suppkey"))).alias(
            "late_supp"
        ),
        F.sum(F.when(F.col("n_late") > 0, F.col("n_late"))).alias("late_cnt"),
    )
    sole_late = per_o.where(
        (F.col("n_late_supps") == 1) & (F.col("n_supps") > 1)
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        sole_late.join(F.broadcast(s), F.col("late_supp") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("late_cnt").cast("long").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Q2/Q11 analogues over an EMULATED partsupp: the fixture has no partsupp
# table, so one is derived deterministically from lineitem — the distinct
# (partkey, suppkey) pairs that actually traded, with supplycost/availqty
# as pure integer functions of the keys (identical expressions in both
# engines, so the emulation is hash-checkable like any base table).
# ---------------------------------------------------------------------------

_PS_COST = "round(((l_partkey * 7 + l_suppkey * 13) % 10000) / 100.0, 2)"
_PS_QTY = "((l_partkey * 31 + l_suppkey * 17) % 1000 + 1)"

_PS_SQL = f"""
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           {_PS_COST} AS ps_supplycost,
           {_PS_QTY}::INT AS ps_availqty
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
"""


def _partsupp(spark, sf_dir) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    return li.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
        F.round(
            ((F.col("l_partkey") * 7 + F.col("l_suppkey") * 13) % 10000) / 100.0, 2
        ).alias("ps_supplycost"),
        ((F.col("l_partkey") * 31 + F.col("l_suppkey") * 17) % 1000 + 1)
        .cast("int")
        .alias("ps_availqty"),
    )


_Q2_ORACLE = f"""
WITH ps AS ({_PS_SQL}),
eligible AS (
    SELECT ps.ps_partkey, ps.ps_supplycost,
           s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
    FROM ps
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
),
min_cost AS (
    SELECT ps_partkey, min(ps_supplycost) AS mc
    FROM eligible GROUP BY ps_partkey
)
SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_type, e.ps_supplycost
FROM eligible e
JOIN min_cost m ON m.ps_partkey = e.ps_partkey AND e.ps_supplycost = m.mc
JOIN part p     ON p.p_partkey = e.ps_partkey
WHERE p.p_size = 15 AND p.p_type = 'PROMO'
"""


@register("q2_min_cost_supplier", oracle=_Q2_ORACLE, tags=("join", "correlated", "partsupp"))
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-shaped: cheapest EUROPE supplier per PROMO/size-15 part — the
    classic correlated-min subquery decorrelated into an aggregate
    self-join (min_cost is tiny: one row per part, broadcast back)."""
    ps = _partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "PROMO")
    )
    # Filter-first windowization (same rule as Q17): the part predicate
    # keeps whole parts, so joining the filtered part list BEFORE the
    # per-part min leaves the min unchanged while shrinking the window
    # input ~25x — and the window replaces the aggregate self-join that
    # re-derived the (distinct-over-lineitem) partsupp emulation twice.
    eligible = (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "ps_partkey", "ps_supplycost", "s_suppkey", "s_name",
            "s_acctbal", "n_name", "p_partkey", "p_type",
        )
    )
    w = Window.partitionBy("ps_partkey")
    return (
        eligible.withColumn("mc", F.min("ps_supplycost").over(w))
        .where(F.col("ps_supplycost") == F.col("mc"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "ps_supplycost"
        )
    )


_Q11_ORACLE = f"""
WITH ps AS ({_PS_SQL}),
national AS (
    SELECT ps.ps_partkey,
           ps.ps_supplycost * ps.ps_availqty AS value
    FROM ps
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_3'
),
per_part AS (
    SELECT ps_partkey, sum(value) AS part_value FROM national GROUP BY ps_partkey
),
total AS (
    SELECT sum(part_value) AS total_value FROM per_part
)
SELECT pp.ps_partkey, round(pp.part_value, 2) AS part_value
FROM per_part pp CROSS JOIN total t
WHERE pp.part_value > 0.001 * t.total_value
"""


@register("q11_important_stock", oracle=_Q11_ORACLE, tags=("agg", "scalar-subquery", "partsupp"))
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11-shaped: parts whose NATION_3 stock value exceeds a fraction of
    the national total — the global-scalar-subquery shape: the total is a
    1-row aggregate broadcast onto the per-part values (never a second
    scan of the base data)."""
    ps = _partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    national = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty")).alias("value"),
        )
    )
    # persist the NARROW shared derivative (rule 10, docs/SCALE_NOTES):
    # both the total branch and the filter consume per_part, and without
    # the persist each branch re-derives the distinct-over-lineitem
    # partsupp emulation from scratch.
    per_part = (
        national.groupBy("ps_partkey")
        .agg(F.sum("value").alias("part_value"))
        .persist()
    )
    total = per_part.agg(F.sum("part_value").alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("part_value") > 0.001 * F.col("total_value"))
        .select("ps_partkey", F.round("part_value", 2).alias("part_value"))
    )
