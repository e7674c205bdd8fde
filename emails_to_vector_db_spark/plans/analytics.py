"""Behavioral analytics + aggregate-surface extensions: multi-step funnel
conversion, argmax/argmin aggregates, and an Arrow-batched UDAF.

None of these exist in the reference (its only aggregates are the two
``len()`` progress counts at ``rag.py:43`` / ``email_fetching.py:59``);
they round out the aggregation surface a warehouse user expects
(SURVEY.md §2.4 "hash-agg … absent in reference" row and the §2.9 "UDAF
… absent" row) over the driver's `events` / `orders` fixtures.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from emails_to_vector_db_spark.plans.registry import register
from emails_to_vector_db_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Multi-step funnel: view -> click -> purchase, strictly ordered per user.
# --------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH base AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'view' THEN ts END) AS t1
    FROM events GROUP BY user_id
),
clicked AS (
    SELECT e.user_id, min(e.ts) AS t2
    FROM events e JOIN base b ON e.user_id = b.user_id
    WHERE e.event_type = 'click' AND e.ts >= b.t1
    GROUP BY e.user_id
),
purchased AS (
    SELECT e.user_id, min(e.ts) AS t3
    FROM events e JOIN clicked c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts >= c.t2
    GROUP BY e.user_id
),
funnel AS (
    SELECT b.user_id, b.t1, c.t2, p.t3
    FROM base b
    LEFT JOIN clicked c ON b.user_id = c.user_id
    LEFT JOIN purchased p ON b.user_id = p.user_id
)
SELECT count(*) AS users_total,
       count(t1) AS step_view,
       count(t2) AS step_click,
       count(t3) AS step_purchase,
       round(count(t2) * 1.0 / count(t1), 4) AS view_to_click,
       round(count(t3) * 1.0 / count(t2), 4) AS click_to_purchase
FROM funnel
"""


@register(
    "event_funnel_conversion",
    oracle=_FUNNEL_ORACLE,
    tags=("agg", "events", "funnel"),
    bench=True,
)
def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel (view, then click at/after the first view,
    then purchase at/after that click) with per-step user counts and
    conversion rates.

    Plan shape (asserted in tests/test_plan_budget.py): exactly TWO
    exchanges — one hash partitioning on user_id shared by all three
    chained window passes AND the per-user fold (Catalyst plans
    successive Windows + the final aggregate over the existing
    partitioning without re-exchanging), then the single-partition
    1-row summary. Per-user state is one timestamp per step, so a
    100 TB event log reduces at scan speed; the join-per-step
    formulation (the oracle\'s SQL shape) would shuffle the event
    table once per step instead.
    """
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = ev.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") >= F.col("t1")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") >= F.col("t2")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t3", t3)
    per_user = staged.groupBy("user_id").agg(
        F.max("t1").alias("t1"),
        F.max("t2").alias("t2"),
        F.max("t3").alias("t3"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("users_total"),
        F.count("t1").alias("step_view"),
        F.count("t2").alias("step_click"),
        F.count("t3").alias("step_purchase"),
        F.round(F.count("t2") / F.count("t1"), 4).alias("view_to_click"),
        F.round(F.count("t3") / F.count("t2"), 4).alias("click_to_purchase"),
    )


# --------------------------------------------------------------------------
# argmax / argmin aggregates (max_by / min_by) with deterministic ties.
# --------------------------------------------------------------------------

_ARGMAX_ORACLE = """
WITH ranked AS (
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey DESC
           ) AS rn_max,
           row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice ASC, o_orderkey ASC
           ) AS rn_min
    FROM orders
)
SELECT o_orderpriority,
       max(CASE WHEN rn_max = 1 THEN o_orderkey END) AS priciest_order,
       max(CASE WHEN rn_min = 1 THEN o_orderkey END) AS cheapest_order,
       round(max(o_totalprice), 2) AS max_price,
       count(*) AS n_orders
FROM ranked
GROUP BY o_orderpriority
"""


@register(
    "priority_argmax_orders",
    oracle=_ARGMAX_ORACLE,
    tags=("agg", "argmax"),
)
def priority_argmax_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / min_by (argmax aggregates) with an explicit struct
    tiebreaker: on equal price, max_by prefers the larger orderkey and
    min_by the smaller, so the result is deterministic under ties (the
    §7 "top-k ties" discipline applied to argmax). The oracle spells the
    identical semantics with ranked windows.

    Scale shape: max_by is a plain hash aggregate with map-side partials
    (each partial keeps one (price, key) champion per group) — unlike the
    oracle's window form, no per-group sort materializes. 5 groups, one
    shuffle of 5×n_partitions champion rows.
    """
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr(
            "max_by(o_orderkey, struct(o_totalprice, o_orderkey))"
        ).alias("priciest_order"),
        F.expr(
            "min_by(o_orderkey, struct(o_totalprice, o_orderkey))"
        ).alias("cheapest_order"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --------------------------------------------------------------------------
# Arrow-batched UDAF (grouped-agg pandas_udf): geometric mean.
# --------------------------------------------------------------------------


def _geomean_udaf():
    """Grouped-agg pandas UDAF: geometric mean via log-mean-exp (stable
    for positive inputs). Arrow transfers the whole group's values in one
    batch; numpy reduces them vectorized. Built lazily — ``pandas_udf``
    DDL-string return types need a live session to parse, so creating it
    at import time would order-couple module import to session startup.
    """
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def geomean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))

    return geomean


_GEOMEAN_ORACLE = """
SELECT o_orderpriority,
       round(exp(avg(ln(o_totalprice))), 2) AS geomean_udaf,
       round(exp(avg(ln(o_totalprice))), 2) AS geomean_native,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


@register(
    "priority_geomean_udaf",
    oracle=_GEOMEAN_ORACLE,
    tags=("agg", "udaf", "pandas"),
)
def priority_geomean_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDAF surface SURVEY.md §2.9 lists as absent in the reference:
    a grouped-agg ``pandas_udf`` (Arrow-batched, usable in ``agg`` and
    ``Window``) computing the per-priority geometric mean of order value,
    emitted NEXT TO the algebraically identical built-in form
    ``exp(avg(ln(x)))`` — the query itself cross-checks the UDAF against
    the native expression, and the oracle checks both.

    Scale note (why the twin column exists): grouped-agg pandas UDFs do
    no partial aggregation — every raw value shuffles to its group's
    executor. The built-in twin IS the map-side-combinable form, which is
    what a 100 TB job should run; the UDAF is for aggregations with no
    SQL-algebraic equivalent. Rounded to 2dp so numpy's pairwise log-sum
    vs the oracle's sequential avg can't flip the hash.
    """
    o = _t(spark, sf_dir, "orders")
    geomean = _geomean_udaf()
    # Spark forbids mixing a grouped-agg pandas UDF with JVM aggregates in
    # one agg() (INVALID_PANDAS_UDF_PLACEMENT): two aggregations over the
    # same 5-group key, joined back (broadcast-sized).
    udaf_side = o.groupBy("o_orderpriority").agg(
        F.round(geomean("o_totalprice"), 2).alias("geomean_udaf")
    )
    native_side = o.groupBy("o_orderpriority").agg(
        F.round(F.exp(F.avg(F.ln("o_totalprice"))), 2).alias("geomean_native"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return udaf_side.join(native_side, "o_orderpriority").select(
        "o_orderpriority", "geomean_udaf", "geomean_native", "n_orders"
    )


# --------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE): dense calendar spine + gap fill.
# --------------------------------------------------------------------------

_SPINE_ORACLE = """
WITH RECURSIVE months AS (
    SELECT date_trunc('month', min(o_orderdate)) AS m,
           date_trunc('month', max(o_orderdate)) AS last_m
    FROM orders
    UNION ALL
    SELECT m + INTERVAL 1 MONTH, last_m FROM months WHERE m < last_m
),
per AS (
    SELECT date_trunc('month', o_orderdate) AS m,
           count(*) AS n, round(sum(o_totalprice), 2) AS rev
    FROM orders GROUP BY 1
)
SELECT strftime(months.m, '%Y-%m') AS month,
       coalesce(n, 0)::BIGINT AS n_orders,
       coalesce(rev, 0.0) + 0.0 AS revenue
FROM months LEFT JOIN per ON months.m = per.m
"""


@register(
    "monthly_order_spine",
    oracle=_SPINE_ORACLE,
    tags=("sql", "recursive-cte", "calendar"),
)
def monthly_order_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense monthly calendar spine via Spark 4's ``WITH RECURSIVE``
    (SQL:1999 recursion — new surface in Spark 4.x, absent in 3.x),
    left-joined with per-month order counts so months with no orders
    report zero instead of vanishing — the standard gap-fill every
    reporting pipeline needs. DuckDB runs the identical recursive SQL.

    Scale shape: the recursion generates the SPINE (one row per month —
    dozens of rows regardless of corpus size), never touches fact data;
    the fact side is one ordinary month-keyed aggregate. Recursion depth
    = month span, far under Spark's recursion limit."""
    from emails_to_vector_db_spark.sources.tables import register_views

    register_views(spark, sf_dir, names=("orders",))
    return spark.sql(
        """
        WITH RECURSIVE months AS (
            SELECT date_trunc('MONTH', min(o_orderdate)) AS m,
                   date_trunc('MONTH', max(o_orderdate)) AS last_m
            FROM orders
            UNION ALL
            SELECT m + INTERVAL 1 MONTH, last_m FROM months WHERE m < last_m
        ),
        per AS (
            SELECT date_trunc('MONTH', o_orderdate) AS m,
                   count(*) AS n, round(sum(o_totalprice), 2) AS rev
            FROM orders GROUP BY 1
        )
        SELECT date_format(months.m, 'yyyy-MM') AS month,
               coalesce(n, 0L) AS n_orders,
               coalesce(rev, 0.0d) + 0.0d AS revenue
        FROM months LEFT JOIN per ON months.m = per.m
        """
    )


# --------------------------------------------------------------------------
# Linear-regression aggregates (regr_slope / regr_intercept / regr_r2).
# --------------------------------------------------------------------------

_REGR_X = "epoch_us(ts) / 86400000000.0 - 19723.0"

_REGR_ORACLE = f"""
SELECT event_type,
       round(regr_slope(value, {_REGR_X}), 6) + 0.0 AS slope_per_day,
       round(regr_intercept(value, {_REGR_X}), 4) + 0.0 AS intercept,
       round(regr_r2(value, {_REGR_X}), 6) + 0.0 AS r2,
       count(*) AS n_events
FROM events GROUP BY event_type
"""


@register(
    "event_value_regression",
    oracle=_REGR_ORACLE,
    tags=("agg", "regression", "events"),
)
def event_value_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type least-squares trend of value over time via the
    SQL:2016 linear-regression aggregates (regr_slope / regr_intercept /
    regr_r2) — per-entity model fitting as a plain aggregate, no ML
    library. The x axis is days since the corpus epoch (computed from
    the same integer microseconds in both engines, so x is bit-identical
    and only the summation order differs — absorbed by the rounds).

    Scale shape: regression aggregates are moment sums (Σx, Σy, Σxy,
    Σx², Σy²) — map-side partials, one shuffle of five doubles per
    group. Fitting a trend per entity over 100 TB of events costs the
    same as a count."""
    ev = _t(spark, sf_dir, "events")
    x = F.unix_micros("ts") / F.lit(86400000000.0) - F.lit(19723.0)
    return (
        ev.select("event_type", F.col("value").alias("y"), x.alias("x"))
        .groupBy("event_type")
        .agg(
            (F.round(F.expr("regr_slope(y, x)"), 6) + F.lit(0.0)).alias(
                "slope_per_day"
            ),
            (F.round(F.expr("regr_intercept(y, x)"), 4) + F.lit(0.0)).alias(
                "intercept"
            ),
            (F.round(F.expr("regr_r2(y, x)"), 6) + F.lit(0.0)).alias("r2"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# --------------------------------------------------------------------------
# IQR outlier filter (per-group robust outlier detection)
# --------------------------------------------------------------------------

_IQR_ORACLE = """
WITH q AS (
    SELECT source,
           quantile_cont(n_chars, 0.25) AS q1,
           quantile_cont(n_chars, 0.75) AS q3
    FROM documents GROUP BY source
)
SELECT d.source,
       count(*)::BIGINT AS n_docs,
       round(any_value(q.q1), 4) AS q1,
       round(any_value(q.q3), 4) AS q3,
       count(*) FILTER (
           d.n_chars < q.q1 - 1.5 * (q.q3 - q.q1)
           OR d.n_chars > q.q3 + 1.5 * (q.q3 - q.q1)
       )::BIGINT AS n_outliers
FROM documents d JOIN q ON d.source = q.source
GROUP BY d.source
"""


@register(
    "doc_length_outliers",
    oracle=_IQR_ORACLE,
    tags=("stats", "quality", "outliers"),
)
def doc_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source robust (IQR) outlier detection on document length —
    the Tukey-fence quality rule: flag docs outside
    [q1 − 1.5·IQR, q3 + 1.5·IQR]. Exact interpolated percentiles per
    group (broadcast back to the fact side), so the fences are
    deterministic and the oracle reproduces them bit-for-bit.

    Scale shape: the quartile table is group-cardinality-sized
    (broadcast); at 100 TB the exact per-group percentile becomes the
    sketch (percentile_approx — its checkable form is
    order_approx_percentiles); the fence join is unchanged."""
    d = _t(spark, sf_dir, "documents").select("source", "n_chars")
    q = d.groupBy("source").agg(
        F.expr("percentile(n_chars, 0.25)").alias("q1"),
        F.expr("percentile(n_chars, 0.75)").alias("q3"),
    )
    j = d.join(F.broadcast(q), "source")
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("n_chars") < F.col("q1") - 1.5 * iqr) | (
        F.col("n_chars") > F.col("q3") + 1.5 * iqr
    )
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.first("q1"), 4).alias("q1"),
        F.round(F.first("q3"), 4).alias("q3"),
        F.count(F.when(is_out, 1)).alias("n_outliers"),
    )


# --------------------------------------------------------------------------
# Gaps and islands: contiguous daily-activity streaks per user.
# --------------------------------------------------------------------------

_STREAK_ORACLE = """
WITH days AS (
    SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
),
tagged AS (
    SELECT user_id, d,
           date_diff('day', DATE '2024-01-01', d)
           - row_number() OVER (PARTITION BY user_id ORDER BY d) AS island
    FROM days
),
islands AS (
    SELECT user_id, island, count(*) AS len
    FROM tagged GROUP BY user_id, island
)
SELECT user_id,
       count(*)::BIGINT AS n_streaks,
       max(len)::BIGINT AS longest_streak_days,
       sum(len)::BIGINT AS active_days
FROM islands GROUP BY user_id
"""


@register(
    "user_activity_streaks",
    oracle=_STREAK_ORACLE,
    tags=("events", "window", "gaps-islands"),
)
def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: contiguous daily-activity streaks per user via
    the classic day-index-minus-row-number island key — consecutive days
    share an island id, any gap starts a new one. One shuffle on
    user_id reused by the window and both aggregates.

    (The alternative lag/cumsum formulation is user_sessionization's
    shape; this is the arithmetic variant that needs no conditional.)"""
    ev = _t(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    tagged = days.withColumn(
        "island",
        F.datediff(F.col("d"), F.lit("2024-01-01").cast("date"))
        - F.row_number().over(w),
    )
    islands = tagged.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").alias("longest_streak_days"),
        F.sum("len").alias("active_days"),
    )


# --------------------------------------------------------------------------
# Window-function breadth: cume_dist / nth_value / first-last over frames.
# --------------------------------------------------------------------------

_DIST_ORACLE = """
SELECT c_custkey, c_mktsegment,
       round(cume_dist() OVER w, 6) AS balance_cume_dist,
       first_value(c_custkey) OVER w2 AS poorest_in_segment,
       last_value(c_custkey) OVER w2 AS richest_in_segment,
       nth_value(c_custkey, 2) OVER w2 AS runner_up_poorest
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey),
       w2 AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


@register(
    "customer_balance_distribution",
    oracle=_DIST_ORACLE,
    tags=("window", "cume-dist", "nth-value"),
)
def customer_balance_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The window functions customer_balance_ranking doesn't cover:
    cume_dist over the running frame, first/last/nth_value over the full
    partition (explicit UNBOUNDED frame — last_value over the DEFAULT
    frame is the classic silent bug: it returns the current row). Unique
    (c_acctbal, c_custkey) ordering keeps ties deterministic. One
    shuffle on the segment key shared by both window specs."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    w2 = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.cume_dist().over(w), 6).alias("balance_cume_dist"),
        F.first("c_custkey").over(w2).alias("poorest_in_segment"),
        F.last("c_custkey").over(w2).alias("richest_in_segment"),
        F.nth_value("c_custkey", 2).over(w2).alias("runner_up_poorest"),
    )


_PRORATE_ORACLE = """
WITH alloc AS (
    SELECT l.l_returnflag,
           o.o_totalprice
             * l.l_extendedprice
             / sum(l.l_extendedprice) OVER (PARTITION BY l.l_orderkey)
               AS allocated
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
per_mode AS (
    SELECT l_returnflag,
           count(*)::BIGINT AS n_items,
           sum(allocated) AS alloc_sum
    FROM alloc GROUP BY l_returnflag
),
conservation AS (
    SELECT abs(sum(alloc_sum)
               - (SELECT sum(o_totalprice) FROM orders o
                  WHERE EXISTS (SELECT 1 FROM lineitem l
                                WHERE l.l_orderkey = o.o_orderkey))
           ) < 0.01 AS conserved
    FROM per_mode
)
SELECT p.l_returnflag, p.n_items,
       round(p.alloc_sum, 2) AS allocated_revenue,
       round(p.alloc_sum / sum(p.alloc_sum) OVER (), 6) AS share_of_total,
       c.conserved
FROM per_mode p CROSS JOIN conservation c
"""


@register(
    "order_revenue_proration",
    oracle=_PRORATE_ORACLE,
    tags=("analytics", "allocation", "window"),
)
def order_revenue_proration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted allocation (ratio-to-report): each order's headline
    total prorated across its line items by extended-price share, then
    rolled up by return flag — the finance/attribution workhorse join
    shape. CONSERVATION is verified in-query and emitted as a
    hash-bearing boolean the oracle expects TRUE: the allocation must
    redistribute exactly the order totals, never invent or lose money
    (the HLL-audit pattern for an exactness property).

    Plan: the ratio window partitions by l_orderkey — a
    corpus-cardinality key but a BOUNDED group (≤7 lines/order), which
    is the case rule 16 permits: no hot key can exist. One orderkey
    exchange serves the join and the window; the rollup is map-side
    combinable.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    w = Window.partitionBy("l_orderkey")
    alloc = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .withColumn(
            "allocated",
            F.col("o_totalprice")
            * F.col("l_extendedprice")
            / F.sum("l_extendedprice").over(w),
        )
    )
    per_mode = alloc.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("allocated").alias("alloc_sum"),
    )
    orders_with_lines = orders.join(
        li.select("l_orderkey").distinct(),
        orders["o_orderkey"] == F.col("l_orderkey"),
        "left_semi",
    ).agg(F.sum("o_totalprice").alias("order_total"))
    conservation = F.broadcast(
        per_mode.agg(F.sum("alloc_sum").alias("t"))
        .crossJoin(F.broadcast(orders_with_lines))
        .select(
            (F.abs(F.col("t") - F.col("order_total")) < 0.01).alias(
                "conserved"
            )
        )
    )
    w_all = Window.partitionBy()
    return (
        per_mode.crossJoin(conservation)
        .select(
            "l_returnflag",
            "n_items",
            F.round("alloc_sum", 2).alias("allocated_revenue"),
            F.round(
                F.col("alloc_sum") / F.sum("alloc_sum").over(w_all), 6
            ).alias("share_of_total"),
            "conserved",
        )
    )


_BACKTEST_CUTOFFS = (
    "1995-01-01", "1996-01-01", "1996-07-01", "1997-01-01", "1997-07-01",
)

_BACKTEST_ORACLE = f"""
WITH daily AS (
    SELECT date_trunc('day', o_orderdate) AS d,
           date_diff('day', DATE '1990-01-01', o_orderdate::DATE) AS dnum,
           count(*)::DOUBLE AS y
    FROM orders GROUP BY 1, 2
),
cutoffs AS (
    SELECT unnest(['{"', '".join(_BACKTEST_CUTOFFS)}']) AS cutoff
),
cut AS (
    SELECT cutoff,
           date_diff('day', DATE '1990-01-01', cutoff::DATE) AS cut_dnum
    FROM cutoffs
),
fits AS (
    SELECT c.cutoff, c.cut_dnum,
           count(*)::BIGINT AS n_train_days,
           regr_slope(d.y, d.dnum) AS slope,
           regr_intercept(d.y, d.dnum) AS icept
    FROM cut c JOIN daily d ON d.dnum < c.cut_dnum
    GROUP BY c.cutoff, c.cut_dnum
)
SELECT f.cutoff,
       f.n_train_days,
       round(f.icept + f.slope * f.cut_dnum, 6) AS predicted,
       coalesce(a.y, 0)::BIGINT AS actual,
       round(abs(f.icept + f.slope * f.cut_dnum - coalesce(a.y, 0)), 6)
           AS abs_error
FROM fits f LEFT JOIN daily a ON a.dnum = f.cut_dnum
"""


@register(
    "forecast_walkforward_backtest",
    oracle=_BACKTEST_ORACLE,
    tags=("analytics", "forecast", "backtest", "ml"),
)
def forecast_walkforward_backtest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Walk-forward backtest of a linear daily-volume forecaster: at
    each of five frozen cutoff dates, fit trend = regr_slope/intercept
    on ALL history strictly before the cutoff, predict the cutoff day's
    order count, and report the absolute error — the time-series
    cross-validation loop (train on past, test on next) that keeps a
    forecasting layer honest, expressed entirely as aggregates.

    Plan: one daily-rollup pass over orders; each fold is then a
    range-joined aggregation over the TINY daily table (5 folds × ~2k
    day rows), so adding folds costs nothing corpus-scale. regr_*
    moment aggregates are map-side combinable.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1990-01-01").cast("date"),
            ).alias("dnum")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .cache()
    )
    cuts = spark.createDataFrame(
        [(c,) for c in _BACKTEST_CUTOFFS], "cutoff string"
    ).select(
        "cutoff",
        F.datediff(
            F.col("cutoff").cast("date"), F.lit("1990-01-01").cast("date")
        ).alias("cut_dnum"),
    )
    fits = (
        F.broadcast(cuts)
        .join(daily, daily["dnum"] < cuts["cut_dnum"])
        .groupBy("cutoff", "cut_dnum")
        .agg(
            F.count(F.lit(1)).alias("n_train_days"),
            F.regr_slope("y", "dnum").alias("slope"),
            F.regr_intercept("y", "dnum").alias("icept"),
        )
    )
    pred = F.col("icept") + F.col("slope") * F.col("cut_dnum")
    actual = daily.select(
        F.col("dnum").alias("a_dnum"), F.col("y").alias("actual_y")
    )
    return (
        fits.join(actual, fits["cut_dnum"] == actual["a_dnum"], "left")
        .select(
            "cutoff",
            "n_train_days",
            F.round(pred, 6).alias("predicted"),
            F.coalesce(F.col("actual_y"), F.lit(0.0))
            .cast("long")
            .alias("actual"),
            F.round(
                F.abs(pred - F.coalesce(F.col("actual_y"), F.lit(0.0))), 6
            ).alias("abs_error"),
        )
    )


_BASKET_MIN_SUPPORT = 3

_BASKET_ORACLE = f"""
WITH items AS (
    SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
),
n AS (SELECT count(DISTINCT basket)::DOUBLE AS n_baskets FROM items),
item_supp AS (
    SELECT item, count(*)::BIGINT AS supp FROM items GROUP BY item
),
pair_supp AS (
    SELECT a.item AS p1, b.item AS p2, count(*)::BIGINT AS support
    FROM items a JOIN items b
      ON a.basket = b.basket AND a.item < b.item
    GROUP BY 1, 2
    HAVING count(*) >= {_BASKET_MIN_SUPPORT}
)
SELECT p.p1, p.p2, p.support,
       round(p.support * n.n_baskets / (s1.supp * s2.supp), 6) AS lift
FROM pair_supp p
JOIN item_supp s1 ON s1.item = p.p1
JOIN item_supp s2 ON s2.item = p.p2
CROSS JOIN n
"""


@register(
    "market_basket_part_pairs",
    oracle=_BASKET_ORACLE,
    tags=("analytics", "association", "basket"),
)
def market_basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: part pairs co-ordered in ≥ 3
    baskets, with LIFT (observed co-support over the independence
    expectation) — the A-priori first pass and the classic
    recommendation signal, over order baskets instead of supplier
    co-occurrence (cosupply_triangle_count's graph).

    Plan: baskets distinct once; the pair space comes from the
    basket-keyed self-join (co-partitioned on the join key — bounded
    per-basket fan-out, ≤ C(7,2) pairs per TPC-H order); the support
    HAVING prunes before the two broadcast margin joins. At 100 TB the
    frequent-item prefilter (drop items below min-support before
    pairing) is the standard A-priori pruning — unnecessary at fixture
    scale but the same plan shape.
    """
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    ).distinct()
    n_baskets = items.agg(
        F.countDistinct("basket").cast("double").alias("n_baskets")
    )
    item_supp = items.groupBy("item").agg(F.count(F.lit(1)).alias("supp"))
    a = items.alias("a")
    b = items.alias("b")
    pair_supp = (
        a.join(
            b,
            (F.col("a.basket") == F.col("b.basket"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("p1"), F.col("b.item").alias("p2"))
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= _BASKET_MIN_SUPPORT)
    )
    s1 = item_supp.select(
        F.col("item").alias("p1"), F.col("supp").alias("supp1")
    )
    s2 = item_supp.select(
        F.col("item").alias("p2"), F.col("supp").alias("supp2")
    )
    return (
        pair_supp.join(F.broadcast(s1), "p1")
        .join(F.broadcast(s2), "p2")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "p1",
            "p2",
            "support",
            F.round(
                F.col("support") * F.col("n_baskets")
                / (F.col("supp1") * F.col("supp2")),
                6,
            ).alias("lift"),
        )
    )


_SURVIVAL_DAYS = (1, 3, 7, 14, 21, 28)

_SURVIVAL_ORACLE = f"""
WITH life AS (
    SELECT user_id,
           date_diff('day', min(ts)::DATE, max(ts)::DATE) AS lifetime_days
    FROM events GROUP BY user_id
),
n AS (SELECT count(*)::DOUBLE AS n_users FROM life)
SELECT t.day AS day_threshold,
       sum(CASE WHEN l.lifetime_days >= t.day THEN 1 ELSE 0 END)::BIGINT
           AS n_surviving,
       round(sum(CASE WHEN l.lifetime_days >= t.day THEN 1 ELSE 0 END)
             / n.n_users, 6) AS survival_rate
FROM life l
CROSS JOIN (SELECT unnest([{", ".join(map(str, _SURVIVAL_DAYS))}]) AS day) t
CROSS JOIN n
GROUP BY t.day, n.n_users
"""


@register(
    "user_lifetime_survival",
    oracle=_SURVIVAL_ORACLE,
    tags=("analytics", "survival", "events"),
)
def user_lifetime_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement survival curve: S(t) = share of users whose observed
    lifetime (last − first event, days) reaches each threshold — the
    retention complement of the weekly cohort matrix, as the monotone
    curve a growth team actually plots.

    Plan: one user_id aggregation (min+max ts), then a 6-threshold
    cross join over the tiny per-user lifetime table. Nothing
    corpus-scale after the first agg.
    """
    ev = load_table(spark, sf_dir, "events")
    life = ev.groupBy("user_id").agg(
        F.datediff(
            F.max(F.col("ts")).cast("date"), F.min(F.col("ts")).cast("date")
        ).alias("lifetime_days")
    )
    n_users = life.agg(
        F.count(F.lit(1)).cast("double").alias("n_users")
    )
    days = spark.createDataFrame(
        [(d,) for d in _SURVIVAL_DAYS], "day int"
    )
    surv = F.sum(
        (F.col("lifetime_days") >= F.col("day")).cast("long")
    )
    return (
        life.crossJoin(F.broadcast(days))
        .crossJoin(F.broadcast(n_users))
        .groupBy(F.col("day").alias("day_threshold"), "n_users")
        .agg(
            surv.alias("n_surviving"),
        )
        .select(
            "day_threshold",
            "n_surviving",
            F.round(F.col("n_surviving") / F.col("n_users"), 6).alias(
                "survival_rate"
            ),
        )
    )


_RFM_REF_DATE = "1998-12-31"

_RFM_ORACLE = f"""
WITH cust AS (
    SELECT o_custkey,
           date_diff('day', max(o_orderdate)::DATE, DATE '{_RFM_REF_DATE}')
               AS recency_days,
           count(*)::BIGINT AS frequency,
           sum(o_totalprice) AS monetary
    FROM orders GROUP BY o_custkey
),
coded AS (
    SELECT o_custkey,
           ntile(4) OVER (ORDER BY recency_days ASC, o_custkey) AS r,
           ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f,
           ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m
    FROM cust
)
SELECT r * 100 + f * 10 + m AS rfm_code,
       count(*)::BIGINT AS n_customers
FROM coded GROUP BY 1
"""


@register(
    "rfm_customer_segments",
    oracle=_RFM_ORACLE,
    tags=("analytics", "rfm", "window"),
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (the CRM classic): each customer coded by
    recency / frequency / monetary quartile (1 = best on every axis:
    most recent, most frequent, highest spend), reported as segment
    sizes — the 64-cell base layer of lifecycle marketing.

    Plan: one customer aggregation, then three exact quartile codings
    with deterministic id tiebreaks, each through
    operators/ranking.py::distributed_ntile (customer tables are
    unbounded-grain — no single-partition ntile window; the _approx
    sibling remains the even cheaper percentile-boundary path).
    """
    from emails_to_vector_db_spark.operators.ranking import (
        distributed_ntile,
    )

    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(_RFM_REF_DATE).cast("date"),
            F.max(F.col("o_orderdate")).cast("date"),
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("o_totalprice").alias("monetary"),
    )
    coded = distributed_ntile(
        distributed_ntile(
            distributed_ntile(
                cust,
                [F.col("recency_days").asc(), F.col("o_custkey").asc()],
                4,
                "r",
            ),
            [F.col("frequency").desc(), F.col("o_custkey").asc()],
            4,
            "f",
        ),
        [F.col("monetary").desc(), F.col("o_custkey").asc()],
        4,
        "m",
    ).select(
        (F.col("r") * 100 + F.col("f") * 10 + F.col("m")).alias("rfm_code")
    )
    return coded.groupBy("rfm_code").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


_RFM_APPROX_TOL = 0.25  # per-quartile mass within ±25% of n/4

_RFM_APPROX_ORACLE = """
SELECT a.axis, q.quartile, TRUE AS within_tolerance
FROM (SELECT unnest(['f', 'm', 'r']) AS axis) a
CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS quartile) q
"""


@register(
    "rfm_customer_segments_approx",
    oracle=_RFM_APPROX_ORACLE,
    tags=("analytics", "rfm", "approx"),
    bench=True,
)
def rfm_customer_segments_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The SCALE-PATH twin of rfm_customer_segments: quartile fences
    from percentile_approx (one mergeable-sketch pass, NO global ntile
    sort), each customer coded by a broadcast fence lookup, and the
    quartile-balance GUARANTEE — every (axis, quartile) cell within
    ±25% of n/4 — verified IN-QUERY and emitted as a hash-bearing
    boolean the oracle expects TRUE (the orders_equi_depth_approx
    pattern: approximation quality is part of the checked result, the
    approximate fences themselves are engine-specific by design).

    Ties are broken exactly as the exact form's ntile does — by
    o_custkey — via a composite sort value (axis value plus a
    custkey-scaled epsilon), so heavily-tied axes (frequency is small
    integers) still quarter cleanly. At 100 TB this is THE RFM plan:
    three global sorts become one sketch aggregation plus a map-side
    code assignment.
    """
    from pyspark import StorageLevel

    orders = load_table(spark, sf_dir, "orders")
    # per-customer rows (≪ orders), consumed by the fence training agg,
    # the coding pass, and the n_total agg — persisted so the orders
    # scan + customer aggregation run once (rule 10)
    cust = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(_RFM_REF_DATE).cast("date"),
            F.max(F.col("o_orderdate")).cast("date"),
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("o_totalprice").alias("monetary"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # ascending composites; quartile 1 = best on every axis (most
    # recent / most frequent / highest spend), matching the exact form.
    # The custkey tiebreak is scaled by the OBSERVED max custkey (one
    # broadcast scalar off the already-persisted per-customer table),
    # so its magnitude is bounded by 1e-6 at ANY key range — a fixed
    # 1e9 divisor would exceed the smallest real value gap (0.01 on
    # the monetary axis, 1 on the integer axes) once keys pass 1e7 and
    # start reordering genuinely different values, corrupting the
    # quartile coding instead of only breaking ties.
    # one driver-side scalar off the persisted table (a literal, not a
    # plan branch: a broadcast-crossJoin form re-ran the aggregate —
    # and its exchange — once per consumer of vals)
    mx_ck = float(cust.agg(F.max("o_custkey")).first()[0])
    tie = F.col("o_custkey").cast("double") / F.lit(mx_ck * 1e6)
    vals = cust.select(
        (F.col("recency_days").cast("double") + tie).alias("vr"),
        (-F.col("frequency").cast("double") + tie).alias("vf"),
        (-F.col("monetary") + tie).alias("vm"),
    )
    probs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    fences = F.broadcast(
        vals.agg(
            F.percentile_approx("vr", probs, 10000).alias("br"),
            F.percentile_approx("vf", probs, 10000).alias("bf"),
            F.percentile_approx("vm", probs, 10000).alias("bm"),
        )
    )

    def quartile(v: str, b: str):
        return F.lit(1) + F.aggregate(
            F.col(b),
            F.lit(0),
            lambda acc, fence: acc + (F.col(v) > fence).cast("int"),
        )

    stacked = (
        vals.crossJoin(fences)
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("r").alias("axis"),
                        quartile("vr", "br").alias("quartile"),
                    ),
                    F.struct(
                        F.lit("f").alias("axis"),
                        quartile("vf", "bf").alias("quartile"),
                    ),
                    F.struct(
                        F.lit("m").alias("axis"),
                        quartile("vm", "bm").alias("quartile"),
                    ),
                )
            ).alias("s")
        )
        .select("s.axis", "s.quartile")
    )
    sizes = stacked.groupBy("axis", "quartile").agg(
        F.count(F.lit(1)).alias("n_cell")
    )
    n_total = cust.agg(F.count(F.lit(1)).cast("double").alias("n"))
    cells = spark.createDataFrame(
        [(a, q) for a in ("f", "m", "r") for q in (1, 2, 3, 4)],
        "axis string, quartile int",
    )
    ideal = F.col("n") / 4
    return (
        cells.join(sizes, ["axis", "quartile"], "left")
        .crossJoin(F.broadcast(n_total))
        .select(
            "axis",
            F.col("quartile").cast("long").alias("quartile"),
            (
                (F.coalesce("n_cell", F.lit(0)) >= (1 - _RFM_APPROX_TOL) * ideal)
                & (F.coalesce("n_cell", F.lit(0)) <= (1 + _RFM_APPROX_TOL) * ideal)
            ).alias("within_tolerance"),
        )
    )


@register(
    "supplier_concentration_hhi",
    oracle="""
WITH rev AS (
    SELECT s.s_nationkey AS nation, l.l_suppkey,
           sum(l.l_extendedprice * (1 - l.l_discount)) AS r
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY 1, 2
),
tot AS (
    SELECT nation, sum(r) AS t, count(*)::BIGINT AS n_suppliers,
           max(r) AS max_r
    FROM rev GROUP BY nation
)
SELECT t.nation, t.n_suppliers,
       round(sum(pow(v.r / t.t, 2)), 6) AS hhi,
       round(max(t.max_r) / max(t.t), 6) AS top_share
FROM rev v JOIN tot t ON t.nation = v.nation
GROUP BY t.nation, t.n_suppliers
""",
    tags=("analytics", "concentration", "agg"),
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market concentration per nation: the Herfindahl–Hirschman index
    (Σ share²) of supplier revenue plus the top-supplier share — the
    economics metric behind single-source-risk dashboards (HHI → 1/n
    means even competition, → 1 means monopoly).

    Plan: one fact join + supplier-level revenue aggregation, then
    nation-level margins joined back — all map-side combinable, the
    squared-share fold runs over |suppliers| rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    rev = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .groupBy(F.col("s_nationkey").alias("nation"), "l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("r")
        )
    )
    tot = rev.groupBy("nation").agg(
        F.sum("r").alias("t"),
        F.count(F.lit(1)).alias("n_suppliers"),
        F.max("r").alias("max_r"),
    )
    return (
        rev.join(F.broadcast(tot), "nation")
        .groupBy("nation", "n_suppliers")
        .agg(
            F.round(F.sum(F.pow(F.col("r") / F.col("t"), 2)), 6).alias(
                "hhi"
            ),
            F.round(F.max("max_r") / F.max("t"), 6).alias("top_share"),
        )
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier product-limit survival with right-censoring
# ---------------------------------------------------------------------------

_KM_CENSOR_US = 3 * 86400 * 1_000_000  # active within 3 days of corpus end

_KM_ORACLE = f"""
WITH ev AS (
    SELECT user_id, epoch_us(ts) AS t FROM events
),
horizon AS (SELECT max(t) AS h FROM ev),
life AS (
    SELECT user_id,
           CAST((max(t) - min(t)) // 86400000000 AS BIGINT) AS days,
           max(t) AS last_t
    FROM ev GROUP BY user_id
),
obs AS (
    SELECT days,
           CASE WHEN l.last_t >= hz.h - {_KM_CENSOR_US}
                THEN 0 ELSE 1 END AS event
    FROM life l CROSS JOIN horizon hz
),
times AS (
    SELECT days AS t,
           sum(event)::DOUBLE AS d,
           count(*)::DOUBLE AS removed
    FROM obs GROUP BY days
),
risk AS (
    SELECT t, d,
           sum(removed) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS n_risk
    FROM times
),
km AS (
    SELECT t, d, n_risk,
           exp(sum(ln(1.0 - d / n_risk)) OVER (
               ORDER BY t ASC ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)) AS s
    FROM risk
    WHERE d > 0
)
SELECT t AS lifetime_days, n_risk::BIGINT AS n_at_risk,
       d::BIGINT AS n_events, round(s, 6) AS survival
FROM km
ORDER BY t
"""


@register(
    "kaplan_meier_retention",
    oracle=_KM_ORACLE,
    tags=("analytics", "survival", "stats"),
)
def kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit survival curve over user lifetimes
    WITH right-censoring: users still active within 3 days of the
    corpus horizon are censored, not counted as churned — the
    estimator user_lifetime_survival (fixed thresholds, no censoring)
    approximates; ignoring censoring biases every retention number
    down, which is why KM is the standard.

    Plan shape: lifetimes are one per-user aggregate of the fact
    table; everything after runs on the distinct-lifetime table
    (days-sized): the risk set is a DESCENDING cumulative window (no
    self-join), and the product limit is exp(cumsum(ln(1 - d/n))) —
    the CUSUM-family trick of turning a sequential product into a
    prefix sum. Two tiny windows, zero corpus re-scans."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("t")
    )
    horizon = F.broadcast(ev.agg(F.max("t").alias("h")))
    life = ev.groupBy("user_id").agg(
        F.floor((F.max("t") - F.min("t")) / 86400000000).alias("days"),
        F.max("t").alias("last_t"),
    )
    obs = life.crossJoin(horizon).select(
        "days",
        F.when(
            F.col("last_t") >= F.col("h") - _KM_CENSOR_US, 0
        )
        .otherwise(1)
        .alias("event"),
    )
    times = obs.groupBy(F.col("days").alias("t")).agg(
        F.sum("event").cast("double").alias("d"),
        F.count(F.lit(1)).cast("double").alias("removed"),
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = times.select(
        "t",
        "d",
        F.sum("removed").over(w_desc).alias("n_risk"),
    )
    w_asc = Window.orderBy(F.col("t").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    km = (
        risk.where(F.col("d") > 0)
        .select(
            "t",
            "d",
            "n_risk",
            F.exp(
                F.sum(F.log(1.0 - F.col("d") / F.col("n_risk"))).over(
                    w_asc
                )
            ).alias("s"),
        )
    )
    return km.select(
        F.col("t").alias("lifetime_days"),
        F.col("n_risk").cast("long").alias("n_at_risk"),
        F.col("d").cast("long").alias("n_events"),
        F.round("s", 6).alias("survival"),
    ).orderBy("lifetime_days")


# ---------------------------------------------------------------------------
# Item co-occurrence recommender, evaluated out-of-time by hit-rate
# ---------------------------------------------------------------------------

_REC_SPLIT_Q = 0.8

_REC_HITRATE_ORACLE = f"""
WITH ok AS (
    SELECT l.l_orderkey AS okey, l.l_partkey AS pk,
           epoch(o.o_orderdate) AS t
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
cut AS (SELECT quantile_cont(t, {_REC_SPLIT_Q}) AS c FROM ok),
train AS (
    SELECT DISTINCT okey, pk FROM ok CROSS JOIN cut WHERE t <= cut.c
),
test AS (
    SELECT DISTINCT okey, pk FROM ok CROSS JOIN cut WHERE t > cut.c
),
co AS (
    SELECT a.pk AS pa, b.pk AS pb, count(*)::BIGINT AS n
    FROM train a JOIN train b
      ON a.okey = b.okey AND a.pk <> b.pk
    GROUP BY a.pk, b.pk
),
rec AS (
    SELECT pa, pb AS rec_pk FROM (
        SELECT pa, pb,
               row_number() OVER (
                   PARTITION BY pa ORDER BY n DESC, pb ASC
               ) AS rn
        FROM co
    ) WHERE rn = 1
),
slots AS (
    SELECT t.okey, t.pk, r.rec_pk,
           CASE WHEN EXISTS (
               SELECT 1 FROM test x
               WHERE x.okey = t.okey AND x.pk = r.rec_pk
           ) THEN 1 ELSE 0 END AS hit
    FROM test t JOIN rec r ON r.pa = t.pk
)
SELECT count(DISTINCT okey)::BIGINT AS n_test_baskets,
       count(*)::BIGINT AS n_item_slots,
       round(avg(hit), 6) AS slot_hitrate,
       round(count(DISTINCT CASE WHEN hit = 1 THEN okey END)::DOUBLE
             / count(DISTINCT okey), 6) AS basket_hitrate
FROM slots
"""


@register(
    "item_cooccurrence_hitrate",
    oracle=_REC_HITRATE_ORACLE,
    tags=("analytics", "recommendation", "ml", "eval"),
)
def item_cooccurrence_hitrate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """An item-to-item co-occurrence recommender ('customers who bought
    a also bought b' — the Amazon-style baseline every recsys is
    measured against) trained on baskets before the 80% order-date
    quantile and EVALUATED out-of-time: for each item in a later
    basket, does the recommended companion actually appear in that
    basket? Reports per-slot and per-basket hit-rates — turning the
    descriptive market-basket table into an evaluated model, the same
    temporal-split discipline as the Markov and walk-forward lanes.

    Plan shape: the co-occurrence matrix is a basket-keyed
    co-partitioned self-join of the TRAIN slice (the market-basket
    shuffle); the argmax is a bounded per-item window; scoring joins
    the vocabulary-sized rec table (broadcast) onto test items and
    probes basket membership with a left-semi self-join on
    (basket, recommended-item). One fact scan feeds train and test."""
    from pyspark import StorageLevel

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pk")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.unix_timestamp("o_orderdate").alias("t")
    )
    ok = li.join(o, li["okey"] == o["o_orderkey"]).select(
        "okey", "pk", "t"
    )
    cut = F.broadcast(
        ok.agg(F.percentile(F.col("t"), F.lit(_REC_SPLIT_Q)).alias("c"))
    )
    ok = ok.crossJoin(cut).persist(StorageLevel.MEMORY_AND_DISK)
    train = ok.where(F.col("t") <= F.col("c")).select("okey", "pk").distinct()
    test = (
        ok.where(F.col("t") > F.col("c"))
        .select("okey", "pk")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = train.alias("a")
    b = train.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.pk") != F.col("b.pk")),
        )
        .groupBy(F.col("a.pk").alias("pa"), F.col("b.pk").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rn = F.row_number().over(
        Window.partitionBy("pa").orderBy(
            F.col("n").desc(), F.col("pb").asc()
        )
    )
    rec = (
        co.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select("pa", F.col("pb").alias("rec_pk"))
    )
    slots = test.join(
        F.broadcast(rec), test["pk"] == rec["pa"]
    ).select("okey", "pk", "rec_pk")
    hits = slots.join(
        test.select(
            F.col("okey").alias("h_okey"), F.col("pk").alias("h_pk")
        ),
        (F.col("okey") == F.col("h_okey"))
        & (F.col("rec_pk") == F.col("h_pk")),
        "left",
    ).select(
        "okey",
        F.when(F.col("h_okey").isNotNull(), 1).otherwise(0).alias("hit"),
    )
    return hits.agg(
        F.countDistinct("okey").alias("n_test_baskets"),
        F.count(F.lit(1)).alias("n_item_slots"),
        F.round(F.avg("hit"), 6).alias("slot_hitrate"),
        F.round(
            F.countDistinct(
                F.when(F.col("hit") == 1, F.col("okey"))
            ).cast("double")
            / F.countDistinct("okey"),
            6,
        ).alias("basket_hitrate"),
    )


# ---------------------------------------------------------------------------
# Repurchase cadence: inter-order gap percentiles per market segment
# ---------------------------------------------------------------------------

_CADENCE_ORACLE = """
WITH gaps AS (
    SELECT c.c_mktsegment AS segment,
           date_diff('day',
               lag(o.o_orderdate) OVER (
                   PARTITION BY o.o_custkey
                   ORDER BY o.o_orderdate, o.o_orderkey),
               o.o_orderdate)::DOUBLE AS gap_days
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
)
SELECT segment,
       count(gap_days)::BIGINT AS n_gaps,
       round(quantile_cont(gap_days, 0.5), 2) AS p50_days,
       round(quantile_cont(gap_days, 0.9), 2) AS p90_days,
       round(avg(gap_days), 2) AS mean_days
FROM gaps
WHERE gap_days IS NOT NULL
GROUP BY segment
"""


@register(
    "repurchase_cadence_percentiles",
    oracle=_CADENCE_ORACLE,
    tags=("analytics", "window", "percentiles"),
)
def repurchase_cadence_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Repurchase cadence: the distribution of days between a
    customer's consecutive orders, rolled up to p50/p90/mean per
    market segment — the purchase-frequency number behind churn
    definitions ('inactive' should mean 'quiet for longer than this
    segment's p90 gap', not an arbitrary 30 days; the
    user_lifetime_survival and RFM lanes both consume exactly this
    calibration).

    Plan shape: one lag() window on the custkey exchange (the
    per-entity sequence shuffle every cadence/sessionization query
    shares), customer dim broadcast, and a per-segment aggregate whose
    two percentiles share one fused buffer."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    gaps = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w)
            )
            .cast("double")
            .alias("gap_days"),
        )
        .where(F.col("gap_days").isNotNull())
    )
    qs = F.percentile(
        F.col("gap_days"), F.array(F.lit(0.5), F.lit(0.9))
    )
    return (
        gaps.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            qs.alias("q2"),
            F.round(F.avg("gap_days"), 2).alias("mean_days"),
        )
        .select(
            "segment",
            "n_gaps",
            F.round(F.element_at("q2", 1), 2).alias("p50_days"),
            F.round(F.element_at("q2", 2), 2).alias("p90_days"),
            "mean_days",
        )
    )


# ---------------------------------------------------------------------------
# Year-over-year revenue growth per region
# ---------------------------------------------------------------------------

_YOY_ORACLE = """
WITH rev AS (
    SELECT r.r_name AS region,
           year(o.o_orderdate)::BIGINT AS yr,
           sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name, year(o.o_orderdate)
),
g AS (
    SELECT region, yr, revenue,
           lag(revenue) OVER (PARTITION BY region ORDER BY yr) AS prev
    FROM rev
)
SELECT region, yr,
       round(revenue, 2) AS revenue,
       round(100.0 * (revenue - prev) / prev, 4) AS yoy_growth_pct
FROM g
WHERE prev IS NOT NULL
ORDER BY region, yr
"""


@register(
    "region_revenue_yoy_growth",
    oracle=_YOY_ORACLE,
    tags=("analytics", "window", "reporting"),
)
def region_revenue_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per region — the executive
    reporting primitive (period-over-period deltas on a rolled-up
    grain) that composes the star-join lane (q5's join tree) with a
    lag window over the TINY (region, year) grain, where the window
    belongs: the classic mistake is lagging at row grain and
    re-aggregating, which double-counts partial periods.

    Plan shape: one star join with every dimension broadcast, one
    (region, year) aggregation of the fact table, then the lag runs
    over ~35 rows. Revenue rounded AFTER the growth ratio so the
    ratio's operands are full precision on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(
            F.broadcast(c), o["o_custkey"] == c["c_custkey"]
        )
        .join(
            F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]
        )
        .join(
            F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]
        )
        .groupBy(
            F.col("r_name").alias("region"),
            F.year("o_orderdate").cast("long").alias("yr"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )
    w = Window.partitionBy("region").orderBy("yr")
    g = rev.withColumn("prev", F.lag("revenue").over(w))
    return (
        g.where(F.col("prev").isNotNull())
        .select(
            "region",
            "yr",
            F.round("revenue", 2).alias("revenue"),
            F.round(
                100.0
                * (F.col("revenue") - F.col("prev"))
                / F.col("prev"),
                4,
            ).alias("yoy_growth_pct"),
        )
        .orderBy("region", "yr")
    )


# ---------------------------------------------------------------------------
# Basket-size distribution of orders
# ---------------------------------------------------------------------------

_BASKET_ORACLE = """
WITH b AS (
    SELECT l_orderkey, count(*)::BIGINT AS n_items
    FROM lineitem GROUP BY l_orderkey
),
tot AS (SELECT count(*)::DOUBLE AS n FROM b)
SELECT b.n_items AS basket_size,
       count(*)::BIGINT AS n_orders,
       round(count(*) / t.n, 6) AS share,
       round(sum(count(*)) OVER (ORDER BY b.n_items) / t.n, 6)
           AS cum_share
FROM b CROSS JOIN tot t
GROUP BY b.n_items, t.n
ORDER BY basket_size
"""


@register(
    "basket_size_distribution",
    oracle=_BASKET_ORACLE,
    tags=("analytics", "stats", "histogram"),
)
def basket_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order basket-size distribution with cumulative shares — the
    shape parameter behind every basket-keyed plan here (the
    market-basket and co-occurrence self-joins cost Σ size² per
    basket, so THIS histogram is what says whether those joins are
    safe or need a basket-size cap), doubling as the assortment
    metric merchandising reads.

    Plan shape: one groupBy(orderkey) count (map-side combinable),
    one size-grain aggregation with the total broadcast, cumulative
    share as a window over the ~7-row size table."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items")
    )
    tot = F.broadcast(
        b.agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    sizes = (
        b.groupBy(F.col("n_items").alias("basket_size"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .crossJoin(tot)
    )
    w = Window.orderBy("basket_size").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        sizes.select(
            "basket_size",
            "n_orders",
            F.round(F.col("n_orders") / F.col("n"), 6).alias("share"),
            F.round(
                F.sum("n_orders").over(w) / F.col("n"), 6
            ).alias("cum_share"),
        )
        .orderBy("basket_size")
    )


# ---------------------------------------------------------------------------
# Duplicate-invoice detection: near-identical orders per customer
# ---------------------------------------------------------------------------

_DUPINV_WINDOW_DAYS = 7
_DUPINV_TOL = 0.01

_DUPINV_ORACLE = f"""
WITH pairs AS (
    SELECT a.o_custkey AS custkey,
           a.o_orderkey AS order_a, b.o_orderkey AS order_b,
           date_diff('day', a.o_orderdate, b.o_orderdate)::BIGINT
               AS days_apart,
           round(abs(a.o_totalprice - b.o_totalprice)
                 / greatest(a.o_totalprice, b.o_totalprice), 6)
               AS price_delta
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND b.o_orderdate BETWEEN a.o_orderdate
         AND a.o_orderdate + INTERVAL {_DUPINV_WINDOW_DAYS} DAY
    WHERE abs(a.o_totalprice - b.o_totalprice)
          / greatest(a.o_totalprice, b.o_totalprice) <= {_DUPINV_TOL}
)
SELECT custkey, order_a, order_b, days_apart, price_delta
FROM pairs
ORDER BY custkey, order_a, order_b
"""


@register(
    "duplicate_invoice_detection",
    oracle=_DUPINV_ORACLE,
    tags=("analytics", "dedup", "audit", "join"),
)
def duplicate_invoice_detection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RELATIONAL near-duplicate detection: order pairs from the same
    customer within {_DUPINV_WINDOW_DAYS} days whose totals agree
    within {_DUPINV_TOL:.0%} — the double-charge / resubmitted-invoice
    audit. The text lanes dedup by content similarity; structured
    records dedup by BLOCKED attribute agreement, and this is that
    lane: blocking key = customer, candidate window = date range,
    verification = the price tolerance.

    Plan shape: a self-join co-partitioned on the customer blocking
    key (the quadratic space is per-customer, bounded by per-customer
    order counts — the basket_size_distribution argument applied to
    customers), with the date-range band applied IN the join condition
    so candidates never materialize outside the window."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    a = o.alias("a")
    b = o.alias("b")
    delta = F.abs(
        F.col("a.o_totalprice") - F.col("b.o_totalprice")
    ) / F.greatest(F.col("a.o_totalprice"), F.col("b.o_totalprice"))
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (
                F.col("b.o_orderdate").between(
                    F.col("a.o_orderdate"),
                    F.date_add(
                        F.col("a.o_orderdate"), _DUPINV_WINDOW_DAYS
                    ),
                )
            ),
        )
        .where(delta <= _DUPINV_TOL)
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.o_orderkey").alias("order_a"),
            F.col("b.o_orderkey").alias("order_b"),
            F.datediff(
                F.col("b.o_orderdate"), F.col("a.o_orderdate")
            )
            .cast("long")
            .alias("days_apart"),
            F.round(delta, 6).alias("price_delta"),
        )
        .orderBy("custkey", "order_a", "order_b")
    )


# ---------------------------------------------------------------------------
# Cold-start fallback: popularity recommendation for history-less customers
# ---------------------------------------------------------------------------

_COLD_ORACLE = f"""
WITH ok AS (
    SELECT l.l_orderkey AS okey, o.o_custkey AS ck, l.l_partkey AS pk,
           epoch(o.o_orderdate) AS t
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
cut AS (SELECT quantile_cont(t, {_REC_SPLIT_Q}) AS c FROM ok),
train AS (SELECT * FROM ok CROSS JOIN cut WHERE t <= cut.c),
test AS (SELECT DISTINCT okey, ck, pk FROM ok CROSS JOIN cut
         WHERE t > cut.c),
top_item AS (
    SELECT pk FROM (
        SELECT pk, count(*) AS n,
               row_number() OVER (ORDER BY count(*) DESC, pk ASC) AS rn
        FROM train GROUP BY pk
    ) WHERE rn = 1
),
known AS (SELECT DISTINCT ck FROM train),
cold AS (
    SELECT t.okey, t.ck, t.pk FROM test t
    WHERE t.ck NOT IN (SELECT ck FROM known)
),
per_basket AS (
    SELECT c.okey,
           max(CASE WHEN c.pk = (SELECT pk FROM top_item)
                    THEN 1 ELSE 0 END) AS hit
    FROM cold c GROUP BY c.okey
)
SELECT (SELECT count(DISTINCT okey) FROM test)::BIGINT AS n_test_baskets,
       count(*)::BIGINT AS n_cold_baskets,
       round(count(*)::DOUBLE
             / (SELECT count(DISTINCT okey) FROM test), 6)
           AS cold_basket_frac,
       sum(hit)::BIGINT AS n_hits,
       round(avg(hit), 6) AS cold_hitrate
FROM per_basket
"""


@register(
    "cold_start_popularity_hitrate",
    oracle=_COLD_ORACLE,
    tags=("analytics", "recommendation", "eval"),
)
def cold_start_popularity_hitrate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The recommender's COLD-START branch, evaluated: test-period
    baskets from customers with NO training-period history (the
    co-occurrence model has nothing to condition on) get the global
    popularity fallback, and its basket hit-rate is measured
    out-of-time — the companion number to item_cooccurrence_hitrate
    that says how much of the traffic the personalized path cannot
    serve and how well the fallback does there.

    Plan shape: the same temporal split as the co-occurrence lane;
    cold customers come from a broadcast anti-join against the train
    customer set; the fallback item is a 1-row argmax broadcast; the
    evaluation is one per-basket aggregate."""
    from pyspark import StorageLevel

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pk")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("ck"),
        F.unix_timestamp("o_orderdate").alias("t"),
    )
    ok = li.join(o, li["okey"] == o["o_orderkey"]).select(
        "okey", "ck", "pk", "t"
    )
    cut = F.broadcast(
        ok.agg(F.percentile(F.col("t"), F.lit(_REC_SPLIT_Q)).alias("c"))
    )
    ok = ok.crossJoin(cut).persist(StorageLevel.MEMORY_AND_DISK)
    train = ok.where(F.col("t") <= F.col("c"))
    test = (
        ok.where(F.col("t") > F.col("c"))
        .select("okey", "ck", "pk")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    top_item = F.broadcast(
        train.groupBy("pk")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("pk").asc())
        .limit(1)
        .select(F.col("pk").alias("top_pk"))
    )
    known = train.select("ck").distinct()
    cold = test.join(known, "ck", "left_anti")
    per_basket = (
        cold.crossJoin(top_item)
        .groupBy("okey")
        .agg(
            F.max(
                F.when(F.col("pk") == F.col("top_pk"), 1).otherwise(0)
            ).alias("hit")
        )
    )
    n_test = F.broadcast(
        test.agg(F.countDistinct("okey").alias("n_test_baskets"))
    )
    # aggregate FIRST, attach the totals after: an ungrouped aggregate
    # over an empty per_basket still yields its one row (count 0), so a
    # fixture with no cold customers reports (n, 0, 0.0, null, null)
    # exactly like the oracle's scalar subqueries — crossJoin before
    # the agg would collapse the empty case to zero rows instead
    return (
        per_basket.agg(
            F.count(F.lit(1)).alias("n_cold_baskets"),
            F.sum("hit").cast("long").alias("n_hits"),
            F.round(F.avg("hit"), 6).alias("cold_hitrate"),
        )
        .crossJoin(n_test)
        .select(
            "n_test_baskets",
            "n_cold_baskets",
            F.round(
                F.col("n_cold_baskets").cast("double")
                / F.col("n_test_baskets"),
                6,
            ).alias("cold_basket_frac"),
            "n_hits",
            "cold_hitrate",
        )
    )


# ---------------------------------------------------------------------------
# ABC / Pareto inventory classification by part revenue
# ---------------------------------------------------------------------------

_ABC_A = 0.8
_ABC_B = 0.95

_ABC_ORACLE = f"""
WITH rev AS (
    SELECT l_partkey AS pk,
           CAST(round(sum(l_extendedprice * (1 - l_discount)), 6)
                AS DECIMAL(38, 6)) AS r
    FROM lineitem GROUP BY l_partkey
),
ranked AS (
    SELECT pk, r,
           CAST(sum(r) OVER (ORDER BY r DESC, pk ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE)
               / CAST(sum(r) OVER () AS DOUBLE) AS cum_share
    FROM rev
),
classed AS (
    SELECT CASE WHEN cum_share <= {_ABC_A} THEN 'A'
                WHEN cum_share <= {_ABC_B} THEN 'B'
                ELSE 'C' END AS abc_class,
           r
    FROM ranked
)
SELECT abc_class,
       count(*)::BIGINT AS n_parts,
       round(CAST(sum(r) AS DOUBLE), 2) AS revenue,
       round(CAST(sum(r) AS DOUBLE)
             / (SELECT CAST(sum(r) AS DOUBLE) FROM rev), 6) AS revenue_share
FROM classed
GROUP BY abc_class
"""


@register(
    "inventory_abc_classes",
    oracle=_ABC_ORACLE,
    tags=("analytics", "pareto", "economics"),
)
def inventory_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) inventory classification: parts ranked by revenue,
    class A = the head covering {_ABC_A:.0%} of revenue, B = to
    {_ABC_B:.0%}, C = the tail — the 80/15/5 segmentation that decides
    stocking policy and, in the data-curation reading, which 'head'
    entities deserve per-item treatment vs bucketed handling (the same
    head/tail split the heavy-hitter sketches formalize
    probabilistically; this is its exact form).

    Plan shape: a per-part revenue aggregate, then the cumulative
    share through operators/ranking.py::distributed_prefix_agg (part
    tables are unbounded-grain — no single-partition running-sum
    window; the heavy-hitters sketch remains the named streaming-scale
    stand-in for the contract itself), then a 3-row rollup."""
    from emails_to_vector_db_spark.operators.ranking import (
        distributed_prefix_agg,
    )

    li = load_table(spark, sf_dir, "lineitem")
    # quantize per-part revenue to an exact decimal BEFORE the prefix
    # sum: decimal addition is associative, so the running sum (and the
    # A/B/C threshold comparison) is bit-identical no matter where the
    # range-partition / AQE boundaries land — a double running sum is
    # not, and a part within an ulp of the 0.8/0.95 cut could flip class
    rev = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            6,
        )
        .cast("decimal(38,6)")
        .alias("r")
    )
    prefixed = distributed_prefix_agg(
        rev,
        [F.col("r").desc(), F.col("pk").asc()],
        sums=[("r", "cum_r")],
    )
    # the grand total re-aggregates the PREFIX output (persisted by the
    # helper), not the upstream fact aggregate — one lineitem pass
    tot = F.broadcast(prefixed.agg(F.sum("r").alias("tot")))
    ranked = prefixed.crossJoin(tot).select(
        "r",
        (
            F.col("cum_r").cast("double") / F.col("tot").cast("double")
        ).alias("cum_share"),
        "tot",
    )
    classed = ranked.select(
        F.when(F.col("cum_share") <= _ABC_A, "A")
        .when(F.col("cum_share") <= _ABC_B, "B")
        .otherwise("C")
        .alias("abc_class"),
        "r",
        "tot",
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.sum("r").cast("double"), 2).alias("revenue"),
        F.round(
            F.sum("r").cast("double") / F.max("tot").cast("double"), 6
        ).alias("revenue_share"),
    )


# ---------------------------------------------------------------------------
# New vs returning revenue split per month
# ---------------------------------------------------------------------------

_NEWRET_ORACLE = """
WITH first_order AS (
    SELECT o_custkey, min(o_orderdate) AS first_d
    FROM orders GROUP BY o_custkey
),
classed AS (
    SELECT strftime(o.o_orderdate, '%Y-%m') AS ym,
           o.o_totalprice,
           CASE WHEN date_trunc('month', o.o_orderdate)
                     = date_trunc('month', f.first_d)
                THEN 1 ELSE 0 END AS is_new
    FROM orders o JOIN first_order f ON f.o_custkey = o.o_custkey
)
SELECT ym AS year_month,
       count(*)::BIGINT AS n_orders,
       round(sum(CASE WHEN is_new = 1 THEN o_totalprice ELSE 0 END), 2)
           AS revenue_new,
       round(sum(CASE WHEN is_new = 0 THEN o_totalprice ELSE 0 END), 2)
           AS revenue_returning,
       round(sum(CASE WHEN is_new = 1 THEN o_totalprice ELSE 0 END)
             / sum(o_totalprice), 6) AS new_share
FROM classed
GROUP BY ym
ORDER BY ym
"""


@register(
    "new_vs_returning_revenue",
    oracle=_NEWRET_ORACLE,
    tags=("analytics", "cohorts", "reporting"),
)
def new_vs_returning_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue split between NEW customers (orders in their
    acquisition month) and RETURNING ones — the growth-accounting
    decomposition every subscription/commerce dashboard leads with: a
    flat topline can hide acquisition collapsing while the base
    over-monetizes, and this split is what shows it. Composes the
    cohort machinery (first-order month) with the reporting grain.

    Plan shape: the first-order table is one per-customer aggregate
    joined back on the customer key (co-partitioned with the fact
    shuffle it already needs); classification is scan-local date
    arithmetic; the rollup is month-grain."""
    o = load_table(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_d")
    )
    classed = o.join(first, "o_custkey").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        "o_totalprice",
        F.when(
            F.trunc("o_orderdate", "month")
            == F.trunc("first_d", "month"),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    new_rev = F.sum(
        F.when(F.col("is_new") == 1, F.col("o_totalprice")).otherwise(0)
    )
    ret_rev = F.sum(
        F.when(F.col("is_new") == 0, F.col("o_totalprice")).otherwise(0)
    )
    return (
        classed.groupBy(F.col("ym").alias("year_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(new_rev, 2).alias("revenue_new"),
            F.round(ret_rev, 2).alias("revenue_returning"),
            F.round(
                new_rev / F.sum("o_totalprice"), 6
            ).alias("new_share"),
        )
        .orderBy("year_month")
    )


# ---------------------------------------------------------------------------
# Cohort LTV curves: cumulative revenue by acquisition cohort and age
# ---------------------------------------------------------------------------

_LTV_MAX_AGE = 11  # months since acquisition, 0-based

_LTV_ORACLE = f"""
WITH first_order AS (
    SELECT o_custkey, date_trunc('month', min(o_orderdate)) AS cohort_m
    FROM orders GROUP BY o_custkey
),
sized AS (
    SELECT cohort_m, count(*)::DOUBLE AS cohort_size
    FROM first_order GROUP BY cohort_m
),
aged AS (
    SELECT f.cohort_m,
           (year(o.o_orderdate) - year(f.cohort_m)) * 12
               + (month(o.o_orderdate) - month(f.cohort_m)) AS age,
           sum(o.o_totalprice) AS rev
    FROM orders o JOIN first_order f ON f.o_custkey = o.o_custkey
    GROUP BY 1, 2
),
cum AS (
    SELECT cohort_m, age, rev,
           sum(rev) OVER (PARTITION BY cohort_m ORDER BY age) AS cum_rev
    FROM aged WHERE age <= {_LTV_MAX_AGE}
)
SELECT strftime(c.cohort_m, '%Y-%m') AS cohort,
       c.age::BIGINT AS months_since_acq,
       round(c.cum_rev, 2) AS cum_revenue,
       round(c.cum_rev / s.cohort_size, 4) AS ltv_per_customer
FROM cum c JOIN sized s USING (cohort_m)
ORDER BY cohort, months_since_acq
"""


@register(
    "cohort_ltv_curves",
    oracle=_LTV_ORACLE,
    tags=("analytics", "cohorts", "ltv"),
)
def cohort_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value curves by acquisition cohort: cumulative
    revenue per cohort at each month since acquisition, normalized per
    cohort member — the DOLLAR twin of the retention matrix
    (cohort_retention_matrix counts who comes back; this prices what
    they're worth), and the curve whose flattening point sets
    acquisition-spend payback policy.

    Plan shape: the first-order table joins back co-partitioned on the
    customer key; the (cohort, age) grain aggregates the fact table
    once; the cumulative sum is a window over ≤{_LTV_MAX_AGE + 1} rows
    per cohort."""
    o = load_table(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.trunc(F.min("o_orderdate"), "month").alias("cohort_m")
    )
    sized = first.groupBy("cohort_m").agg(
        F.count(F.lit(1)).cast("double").alias("cohort_size")
    )
    age = (F.year("o_orderdate") - F.year("cohort_m")) * 12 + (
        F.month("o_orderdate") - F.month("cohort_m")
    )
    aged = (
        o.join(first, "o_custkey")
        .groupBy("cohort_m", age.alias("age"))
        .agg(F.sum("o_totalprice").alias("rev"))
        .where(F.col("age") <= _LTV_MAX_AGE)
    )
    w = Window.partitionBy("cohort_m").orderBy("age")
    cum = aged.withColumn("cum_rev", F.sum("rev").over(w))
    return (
        cum.join(F.broadcast(sized), "cohort_m")
        .select(
            F.date_format("cohort_m", "yyyy-MM").alias("cohort"),
            F.col("age").cast("long").alias("months_since_acq"),
            F.round("cum_rev", 2).alias("cum_revenue"),
            # 4dp, not money-2dp: cohort_size divisions land exactly on
            # half-cent ties (e.g. /2 of any odd-cent total), where the
            # two engines' double-rounding can split; 4dp has no tie
            F.round(
                F.col("cum_rev") / F.col("cohort_size"), 4
            ).alias("ltv_per_customer"),
        )
        .orderBy("cohort", "months_since_acq")
    )


# ---------------------------------------------------------------------------
# Fellegi-Sunter probabilistic record linkage (blocked, supervised m/u)
# ---------------------------------------------------------------------------

_FS_TOP = 20
_FS_BAL_TOL = 0.25
# Sorted-neighborhood window (Hernández & Stolfo 1995): records within
# W-1 positions of each other in (name, rec_id) order are candidate
# pairs. The name perturbation touches only the LAST character, so a
# dirtied twin sorts at most ~10 ranks from its base (the other last-
# digit names plus their at-most-two twins) at ANY corpus size — W=16
# keeps every true pair co-windowed while the pair space stays exactly
# n*(W-1): linear in the data, unlike a fixed-cardinality block key
# whose occupancy (and pair space) grows with the corpus.
_FS_WINDOW = 16

_FS_ORACLE = f"""
WITH recs AS (
    SELECT c_custkey * 10 AS rec_id, c_custkey AS base,
           c_name AS name, c_mktsegment AS seg, c_acctbal AS bal
    FROM customer
    UNION ALL
    SELECT c_custkey * 10 + 1, c_custkey,
           CASE WHEN c_custkey % 3 = 0
                THEN substr(c_name, 1, length(c_name) - 1) || 'X'
                ELSE c_name END,
           CASE WHEN c_custkey % 5 = 0
                THEN 'UNKNOWN' ELSE c_mktsegment END,
           CASE WHEN c_custkey % 2 = 0
                THEN c_acctbal + 0.5 ELSE c_acctbal END
    FROM customer WHERE c_custkey % 7 = 0
),
ranked AS (
    SELECT *, row_number() OVER (ORDER BY name, rec_id) AS rn FROM recs
),
pairs AS (
    SELECT a.rec_id AS rec_a, b.rec_id AS rec_b,
           (a.base = b.base) AS is_match,
           (a.name = b.name) AS name_eq,
           (a.seg = b.seg) AS seg_eq,
           (abs(a.bal - b.bal) <= {_FS_BAL_TOL}) AS bal_eq
    FROM ranked a JOIN ranked b
      ON b.rn > a.rn AND b.rn <= a.rn + {_FS_WINDOW - 1}
),
mu AS (
    SELECT
      (sum(CASE WHEN is_match AND name_eq THEN 1 ELSE 0 END) + 0.5)
        / (sum(CASE WHEN is_match THEN 1 ELSE 0 END) + 1.0) AS m_name,
      (sum(CASE WHEN NOT is_match AND name_eq THEN 1 ELSE 0 END) + 0.5)
        / (sum(CASE WHEN NOT is_match THEN 1 ELSE 0 END) + 1.0) AS u_name,
      (sum(CASE WHEN is_match AND seg_eq THEN 1 ELSE 0 END) + 0.5)
        / (sum(CASE WHEN is_match THEN 1 ELSE 0 END) + 1.0) AS m_seg,
      (sum(CASE WHEN NOT is_match AND seg_eq THEN 1 ELSE 0 END) + 0.5)
        / (sum(CASE WHEN NOT is_match THEN 1 ELSE 0 END) + 1.0) AS u_seg,
      (sum(CASE WHEN is_match AND bal_eq THEN 1 ELSE 0 END) + 0.5)
        / (sum(CASE WHEN is_match THEN 1 ELSE 0 END) + 1.0) AS m_bal,
      (sum(CASE WHEN NOT is_match AND bal_eq THEN 1 ELSE 0 END) + 0.5)
        / (sum(CASE WHEN NOT is_match THEN 1 ELSE 0 END) + 1.0) AS u_bal
    FROM pairs
),
scored AS (
    SELECT p.rec_a, p.rec_b, p.is_match,
           (CASE WHEN p.name_eq THEN ln(m.m_name / m.u_name)
                 ELSE ln((1 - m.m_name) / (1 - m.u_name)) END
          + CASE WHEN p.seg_eq THEN ln(m.m_seg / m.u_seg)
                 ELSE ln((1 - m.m_seg) / (1 - m.u_seg)) END
          + CASE WHEN p.bal_eq THEN ln(m.m_bal / m.u_bal)
                 ELSE ln((1 - m.m_bal) / (1 - m.u_bal)) END) AS w
    FROM pairs p CROSS JOIN mu m
)
SELECT rec_a, rec_b, is_match, round(w, 4) AS weight
FROM scored
ORDER BY w DESC, rec_a, rec_b
LIMIT {_FS_TOP}
"""

def _fs_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood candidate pairs for fellegi_sunter_linkage.

    Exposed as a helper so tests/test_dedup_star_edges.py can assert the
    LINEAR candidate contract at two scales: with n records and window W
    the pair count is EXACTLY n*(W-1) - W*(W-1)/2 (each rank pairs with
    the next W-1 ranks, truncated at the tail) — a fixed-cardinality
    block key (the round-5 mod-97 regression) would make it quadratic
    in n and fail the formula immediately."""
    from emails_to_vector_db_spark.operators.ranking import (
        distributed_row_number,
    )

    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        (F.col("c_custkey") * 10).alias("rec_id"),
        F.col("c_custkey").alias("base"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("bal"),
    )
    twin = c.where(F.col("c_custkey") % 7 == 0).select(
        (F.col("c_custkey") * 10 + 1).alias("rec_id"),
        F.col("c_custkey").alias("base"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(
                F.expr("substring(c_name, 1, length(c_name) - 1)"),
                F.lit("X"),
            ),
        )
        .otherwise(F.col("c_name"))
        .alias("name"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit("UNKNOWN"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
        F.when(F.col("c_custkey") % 2 == 0, F.col("c_acctbal") + 0.5)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    recs = base.unionByName(twin)
    ranked = distributed_row_number(
        recs, [F.col("name").asc(), F.col("rec_id").asc()], "rn"
    )
    offsets = spark.range(1, _FS_WINDOW).select(
        F.col("id").cast("int").alias("d")
    )
    a = (
        ranked.crossJoin(F.broadcast(offsets))
        .withColumn("rn_b", F.col("rn") + F.col("d"))
        .alias("a")
    )
    b = ranked.alias("b")
    return a.join(b, F.col("a.rn_b") == F.col("b.rn")).select(
        F.col("a.rec_id").alias("rec_a"),
        F.col("b.rec_id").alias("rec_b"),
        (F.col("a.base") == F.col("b.base")).alias("is_match"),
        (F.col("a.name") == F.col("b.name")).alias("name_eq"),
        (F.col("a.seg") == F.col("b.seg")).alias("seg_eq"),
        (
            F.abs(F.col("a.bal") - F.col("b.bal")) <= _FS_BAL_TOL
        ).alias("bal_eq"),
    )


@register(
    "fellegi_sunter_linkage",
    oracle=_FS_ORACLE,
    tags=("analytics", "linkage", "dedup", "entity-resolution"),
)
def fellegi_sunter_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage (1969) over a
    deterministically-dirtied customer registry: every 7th customer
    gains a perturbed twin (name tail, mktsegment, balance each
    flipped on independent key residues), candidate pairs come from
    SORTED-NEIGHBORHOOD blocking (Hernández & Stolfo 1995): rank all
    records by (name, rec_id) and pair those within {_FS_WINDOW - 1}
    positions — the perturbation only rewrites the last name
    character, so twins sort adjacently and every true pair
    co-windows, while the candidate space is exactly n*{_FS_WINDOW - 1}
    (LINEAR in the corpus; the round-5 mod-97 block key's occupancy
    grew with the data, quadratic pair space — this is its scale-real
    replacement). Each pair is scored by the log-likelihood-ratio
    weight Σ ln(m_f/u_f) over its field-agreement vector; m/u are
    estimated from the labeled-by-construction pairs with Laplace
    smoothing (+0.5/+1 — keeps perfectly-separating fields like the
    unique name finite), the supervised variant of the EM fit real
    linkage runs; entity_canonical_groups is the exact-key sibling,
    this is the NOISY-field one. Top-{_FS_TOP} pairs by weight: the
    decision list a clerical-review threshold cuts.

    Plan shape: the global name rank runs through
    operators/ranking.py::distributed_row_number (record tables are
    corpus-grain — no single-partition sort); neighbors materialize
    via an explode of the {_FS_WINDOW - 1} rank offsets and ONE equi
    self-join on the shifted rank; the m/u fit is one 1-row aggregate
    broadcast back; scoring is map-side; the decision list is
    TakeOrderedAndProject."""
    pairs = _fs_candidate_pairs(spark, sf_dir).persist()
    def _m(flag):
        return (
            F.sum(F.when(F.col("is_match") & F.col(flag), 1).otherwise(0))
            + 0.5
        ) / (F.sum(F.when(F.col("is_match"), 1).otherwise(0)) + 1.0)

    def _u(flag):
        return (
            F.sum(F.when(~F.col("is_match") & F.col(flag), 1).otherwise(0))
            + 0.5
        ) / (F.sum(F.when(~F.col("is_match"), 1).otherwise(0)) + 1.0)

    mu = F.broadcast(
        pairs.agg(
            _m("name_eq").alias("m_name"),
            _u("name_eq").alias("u_name"),
            _m("seg_eq").alias("m_seg"),
            _u("seg_eq").alias("u_seg"),
            _m("bal_eq").alias("m_bal"),
            _u("bal_eq").alias("u_bal"),
        )
    )

    def _w(flag, m, u):
        return F.when(
            F.col(flag), F.log(F.col(m) / F.col(u))
        ).otherwise(F.log((1 - F.col(m)) / (1 - F.col(u))))

    return (
        pairs.crossJoin(mu)
        .withColumn(
            "w",
            _w("name_eq", "m_name", "u_name")
            + _w("seg_eq", "m_seg", "u_seg")
            + _w("bal_eq", "m_bal", "u_bal"),
        )
        .orderBy(F.col("w").desc(), "rec_a", "rec_b")
        .limit(_FS_TOP)
        .select("rec_a", "rec_b", "is_match", F.round("w", 4).alias("weight"))
    )


# ---------------------------------------------------------------------------
# Log-rank test: do the two arms' churn survival curves differ?
# ---------------------------------------------------------------------------

_LOGRANK_ORACLE = f"""
WITH ev AS (
    SELECT user_id, user_id % 2 AS arm, epoch_us(ts) AS t FROM events
),
horizon AS (SELECT max(t) AS h FROM ev),
life AS (
    SELECT user_id, max(arm) AS arm,
           CAST((max(t) - min(t)) // 86400000000 AS BIGINT) AS days,
           max(t) AS last_t
    FROM ev GROUP BY user_id
),
obs AS (
    SELECT arm, days,
           CASE WHEN l.last_t >= hz.h - {_KM_CENSOR_US}
                THEN 0 ELSE 1 END AS event
    FROM life l CROSS JOIN horizon hz
),
times AS (
    SELECT days AS t,
           sum(event)::DOUBLE AS d,
           count(*)::DOUBLE AS removed,
           sum(CASE WHEN arm = 1 THEN event ELSE 0 END)::DOUBLE AS d1,
           sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::DOUBLE AS removed1
    FROM obs GROUP BY days
),
risk AS (
    SELECT t, d, d1,
           sum(removed) OVER w AS n_risk,
           sum(removed1) OVER w AS n1_risk
    FROM times
    WINDOW w AS (ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
),
terms AS (
    SELECT d1, d * n1_risk / n_risk AS e1,
           d * (n1_risk / n_risk) * (1 - n1_risk / n_risk)
             * (n_risk - d) / (n_risk - 1) AS v
    FROM risk WHERE d > 0 AND n_risk > 1
),
agg AS (
    SELECT sum(d1) AS o1, sum(e1) AS e1, sum(v) AS v FROM terms
),
arms AS (
    SELECT sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_treat,
           sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_ctrl
    FROM life
)
SELECT a.n_treat, a.n_ctrl,
       g.o1::BIGINT AS observed_events_treat,
       round(g.e1, 4) AS expected_events_treat,
       round((g.o1 - g.e1) * (g.o1 - g.e1) / g.v, 4) AS logrank_chi2,
       ((g.o1 - g.e1) * (g.o1 - g.e1) / g.v > 3.841) AS differs_5pct
FROM agg g CROSS JOIN arms a
"""


@register(
    "logrank_test_arms",
    oracle=_LOGRANK_ORACLE,
    tags=("analytics", "survival", "hypothesis-test", "stats"),
)
def logrank_test_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel-Cox) test comparing the two hash arms' churn
    survival — the hypothesis-test companion to kaplan_meier_retention
    (KM draws the curves; this says whether they DIFFER, censoring
    handled correctly where a naive mean-lifetime t-test is biased):
    at each distinct lifetime, observed arm-1 deaths vs the expected
    share d·n1/n under the null, pooled into the standard chi-square
    with hypergeometric variance, against the literal 5% critical
    value (3.841, 1 df).

    Plan shape: same economics as the KM query — one user-grain
    aggregation (the only corpus shuffle), a lifetime-day-grain census,
    reverse-cumulative at-risk counts via day-grain windows (calendar-
    bounded), and a 1-row fold."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        (F.col("user_id") % 2).alias("arm"),
        F.unix_micros("ts").alias("t"),
    )
    horizon = F.broadcast(ev.agg(F.max("t").alias("h")))
    life = ev.groupBy("user_id").agg(
        F.max("arm").alias("arm"),
        ((F.max("t") - F.min("t")) / F.lit(86400000000))
        .cast("long")
        .alias("days"),
        F.max("t").alias("last_t"),
    )
    obs = life.crossJoin(horizon).select(
        "arm",
        "days",
        F.when(
            F.col("last_t") >= F.col("h") - _KM_CENSOR_US, 0
        ).otherwise(1).alias("event"),
    )
    times = obs.groupBy(F.col("days").alias("t")).agg(
        F.sum("event").cast("double").alias("d"),
        F.count(F.lit(1)).cast("double").alias("removed"),
        F.sum(F.when(F.col("arm") == 1, F.col("event")).otherwise(0))
        .cast("double")
        .alias("d1"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("double")
        .alias("removed1"),
    )
    w = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = times.select(
        "t",
        "d",
        "d1",
        F.sum("removed").over(w).alias("n_risk"),
        F.sum("removed1").over(w).alias("n1_risk"),
    )
    frac = F.col("n1_risk") / F.col("n_risk")
    terms = risk.where((F.col("d") > 0) & (F.col("n_risk") > 1)).select(
        "d1",
        (F.col("d") * frac).alias("e1"),
        (
            F.col("d")
            * frac
            * (1 - frac)
            * (F.col("n_risk") - F.col("d"))
            / (F.col("n_risk") - 1)
        ).alias("v"),
    )
    agg = terms.agg(
        F.sum("d1").alias("o1"), F.sum("e1").alias("e1"), F.sum("v").alias("v")
    )
    arms = F.broadcast(
        life.agg(
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_treat"),
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_ctrl"),
        )
    )
    chi2 = (F.col("o1") - F.col("e1")) ** 2 / F.col("v")
    return agg.crossJoin(arms).select(
        "n_treat",
        "n_ctrl",
        F.col("o1").cast("long").alias("observed_events_treat"),
        F.round("e1", 4).alias("expected_events_treat"),
        F.round(chi2, 4).alias("logrank_chi2"),
        (chi2 > 3.841).alias("differs_5pct"),
    )
