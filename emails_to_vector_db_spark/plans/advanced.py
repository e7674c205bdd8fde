"""Advanced relational coverage: as-of join, range-predicate join, batch
sliding windows, ranking functions, INTERSECT, scalar function surface,
approximate distinct.

None of these exist in the reference (SURVEY.md §2.3 J5, §2.6: "absent");
they complete the engine surface a SQL-backed store user expects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from emails_to_vector_db_spark.plans.registry import register
from emails_to_vector_db_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# As-of join (J5): last click before each purchase, per user.
# --------------------------------------------------------------------------

_ASOF_ORACLE = """
WITH purchases AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
clicks AS (
    SELECT user_id, ts FROM events WHERE event_type = 'click'
)
SELECT p.event_id,
       p.user_id,
       epoch_us(p.ts) AS purchase_us,
       epoch_us(c.ts) AS last_click_us
FROM purchases p
ASOF JOIN clicks c ON p.user_id = c.user_id AND c.ts <= p.ts
"""


@register("asof_last_click_before_purchase", oracle=_ASOF_ORACLE, tags=("join", "asof", "J5"), bench=True)
def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join expressed the scalable Spark way: tag both
    sides, single sort within user partitions, running last_value with
    ignoreNulls — one shuffle on user_id, no pairwise join blow-up.
    (DuckDB spells the same thing ASOF JOIN.)"""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("is_probe")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit(0).alias("is_probe"),
    )
    tagged = purchases.unionByName(clicks)
    # clicks sort before purchases at equal ts (is_probe asc) => ties count,
    # matching ASOF's c.ts <= p.ts
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_probe").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = tagged.withColumn(
        "last_click_us",
        F.last(
            F.when(F.col("is_probe") == 0, F.unix_micros("ts")), ignorenulls=True
        ).over(w),
    )
    return (
        matched.where((F.col("is_probe") == 1) & F.col("last_click_us").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("purchase_us"),
            "last_click_us",
        )
    )


# --------------------------------------------------------------------------
# Range-predicate join: lineitems shipped within 30 days of order date.
# --------------------------------------------------------------------------

_RANGE_ORACLE = """
SELECT o.o_orderpriority,
       count(*)::BIGINT AS n_fast_items,
       round(avg(date_diff('day', o.o_orderdate, l.l_shipdate)), 6) AS avg_lag_days
FROM orders o
JOIN lineitem l
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate <  o.o_orderdate + INTERVAL 30 DAY
GROUP BY o.o_orderpriority
"""


@register("fast_shipments_range_join", oracle=_RANGE_ORACLE, tags=("join", "range", "J5"))
def fast_shipments_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi join with a range residual predicate: the equi key carries the
    shuffle; the range condition evaluates post-match (no interval
    explosion)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = li.join(
        o,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_fast_items"),
        F.round(
            F.avg(F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))), 6
        ).alias("avg_lag_days"),
    )


# --------------------------------------------------------------------------
# Batch sliding windows: 1-hour windows, 15-minute slide.
# --------------------------------------------------------------------------

_SLIDING_ORACLE = """
WITH expanded AS (
    SELECT event_type,
           (floor(epoch(ts) / 900) - i.i) * 900 AS ws_epoch
    FROM events, (SELECT unnest(generate_series(0, 3)) AS i) i
)
SELECT ws_epoch::BIGINT AS window_start_epoch,
       event_type,
       count(*)::BIGINT AS n_events
FROM expanded
GROUP BY 1, 2
"""


@register("sliding_window_counts", oracle=_SLIDING_ORACLE, tags=("events", "window", "sliding"), bench=True)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping (sliding) windows in batch via F.window(1h, 15m) — each
    event lands in exactly 4 windows. The streaming twin is
    streaming/ingest.py::sliding_counts; the oracle expands windows
    arithmetically."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp("w.start").alias("window_start_epoch"),
            "event_type",
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# Ranking functions.
# --------------------------------------------------------------------------

_RANKING_ORACLE = """
SELECT c_mktsegment, c_custkey,
       round(c_acctbal, 2) AS acctbal,
       rank()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC)::INT AS rnk,
       dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC)::INT AS drnk,
       round(percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC), 6) AS prnk,
       ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)::INT AS quartile
FROM customer
"""


@register("customer_balance_ranking", oracle=_RANKING_ORACLE, tags=("window", "rank"))
def customer_balance_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank / ntile. The rank family uses a
    tie-collapsing order (safe under duplicate balances); ntile gets a
    unique tiebreaker because tile assignment within ties is positional."""
    c = _t(spark, sf_dir, "customer")
    w_rank = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    w_tile = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_mktsegment",
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.rank().over(w_rank).cast("int").alias("rnk"),
        F.dense_rank().over(w_rank).cast("int").alias("drnk"),
        F.round(F.percent_rank().over(w_rank), 6).alias("prnk"),
        F.ntile(4).over(w_tile).cast("int").alias("quartile"),
    )


# --------------------------------------------------------------------------
# INTERSECT.
# --------------------------------------------------------------------------

_INTERSECT_ORACLE = """
SELECT DISTINCT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
INTERSECT
SELECT DISTINCT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
"""


@register("retained_customers_intersect", oracle=_INTERSECT_ORACLE, tags=("setops",))
def retained_customers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers active in both 1995 and 1996."""
    o = _t(spark, sf_dir, "orders")

    def year(y):
        return o.where(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
        ).select("o_custkey")

    return year(1995).intersect(year(1996))


# --------------------------------------------------------------------------
# Scalar function surface: string / date / array.
# --------------------------------------------------------------------------

_SCALARS_ORACLE = """
SELECT o_orderkey,
       upper(o_orderstatus)                         AS status_u,
       substr(o_orderpriority, 3)                   AS priority_name,
       length(o_orderpriority)::INT                 AS priority_len,
       year(o_orderdate)::INT                       AS order_year,
       quarter(o_orderdate)::INT                    AS order_quarter,
       date_diff('day', o_orderdate, TIMESTAMP '2000-01-01')::INT AS days_to_y2k,
       round(o_totalprice / 1000.0, 3)              AS price_k
FROM orders
WHERE o_orderkey % 100 = 0
"""


@register("order_scalar_functions", oracle=_SCALARS_ORACLE, tags=("scalar", "date", "string"))
def order_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String + date scalar surface (SURVEY.md §2.7 'absent in reference'
    rows): upper/substr/length/year/quarter/datediff/arithmetic."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 100 == 0)
    return o.select(
        "o_orderkey",
        F.upper("o_orderstatus").alias("status_u"),
        F.substring("o_orderpriority", 3, 100).alias("priority_name"),
        F.length("o_orderpriority").cast("int").alias("priority_len"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.quarter("o_orderdate").cast("int").alias("order_quarter"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), F.col("o_orderdate"))
        .cast("int")
        .alias("days_to_y2k"),
        F.round(F.col("o_totalprice") / 1000.0, 3).alias("price_k"),
    )


_ARRAY_ORACLE = """
SELECT vec_id,
       len(embedding)::INT                                   AS dim,
       round(list_aggregate(embedding::DOUBLE[], 'max'), 6)  AS max_val,
       list_position(embedding::DOUBLE[],
                     list_aggregate(embedding::DOUBLE[], 'max'))::INT AS argmax_pos,
       round(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x), 'sum'), 6)
           AS sq_norm
FROM embeddings
WHERE vec_id < 100
"""


@register("embedding_array_functions", oracle=_ARRAY_ORACLE, tags=("scalar", "array", "vector"))
def embedding_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar surface over the embedding column: size / array_max /
    array_position / element-wise transform + aggregate."""
    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    v = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(F.array_max(v), 6).alias("max_val"),
        F.array_position(v, F.array_max(v)).cast("int").alias("argmax_pos"),
        F.round(
            F.aggregate(
                F.transform(v, lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("sq_norm"),
    )


_APPROX_RSD = 0.02

_APPROX_DISTINCT_ORACLE = """
SELECT c_mktsegment,
       count(DISTINCT o_orderkey)::BIGINT AS exact_orders,
       TRUE AS within_tolerance
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c_mktsegment
"""


@register(
    "segment_approx_distinct",
    oracle=_APPROX_DISTINCT_ORACLE,
    tags=("agg", "approx"),
)
def segment_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) per segment. The sketch estimate
    itself differs across engines, so the CLAIM is made checkable
    instead: the query emits the exact distinct count plus a boolean
    asserting |approx − exact| / exact ≤ 3×rsd, and the oracle computes
    the exact count in SQL with ``TRUE`` for the tolerance column — a
    drifting sketch flips the boolean and fails the hash match."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey)
    agg = j.groupBy("c_mktsegment").agg(
        F.approx_count_distinct("o_orderkey", rsd=_APPROX_RSD).alias("_approx"),
        F.countDistinct("o_orderkey").alias("exact_orders"),
    )
    rel_err = F.abs(F.col("_approx") - F.col("exact_orders")) / F.col(
        "exact_orders"
    )
    return agg.select(
        "c_mktsegment",
        "exact_orders",
        (rel_err <= F.lit(3 * _APPROX_RSD)).alias("within_tolerance"),
    )


# --------------------------------------------------------------------------
# MERGE/upsert (CDC apply)
# --------------------------------------------------------------------------

_MERGE_ORACLE = """
WITH updates AS (
    SELECT c_custkey, c_name,
           round(c_acctbal + 100.0, 2) AS c_acctbal, 'updated' AS row_src
    FROM customer WHERE c_custkey % 10 = 0
    UNION ALL
    SELECT c_custkey + 1000000 AS c_custkey,
           'new_' || c_name AS c_name,
           0.0 AS c_acctbal, 'inserted' AS row_src
    FROM customer WHERE c_custkey % 100 = 0
),
merged AS (
    SELECT * FROM updates
    UNION ALL
    SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal,
           'kept' AS row_src
    FROM customer
    WHERE c_custkey NOT IN (SELECT c_custkey FROM updates)
)
SELECT row_src, count(*)::BIGINT AS n_rows,
       round(sum(c_acctbal), 2) AS total_bal
FROM merged GROUP BY row_src
"""


@register("merge_upsert_customers", oracle=_MERGE_ORACLE, tags=("merge", "cdc"))
def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply via sources/warehouse.py::merge_upsert: a deterministic
    updates batch (+100 balance for every 10th customer, brand-new rows
    for every 100th) merged into the customer table — updates win,
    unmatched rows survive, inserts land. Verified by per-disposition
    row counts and balance totals against the SQL MERGE expansion."""
    from emails_to_vector_db_spark.sources.warehouse import merge_upsert

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal")
    ).withColumn("row_src", F.lit("kept"))
    updates = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 10 == 0)
        .select(
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal") + 100.0, 2).alias("c_acctbal"),
            F.lit("updated").alias("row_src"),
        )
        .unionByName(
            _t(spark, sf_dir, "customer")
            .where(F.col("c_custkey") % 100 == 0)
            .select(
                (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
                F.concat(F.lit("new_"), F.col("c_name")).alias("c_name"),
                F.lit(0.0).alias("c_acctbal"),
                F.lit("inserted").alias("row_src"),
            )
        )
    )
    merged = merge_upsert(c, updates, key="c_custkey")
    return merged.groupBy("row_src").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


_APPROX_PCT_ORACLE = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 2)  AS exact_p50,
       round(quantile_cont(o_totalprice, 0.95), 2) AS exact_p95,
       TRUE AS approx_within_5pct
FROM orders
GROUP BY o_orderpriority
"""


@register(
    "order_approx_percentiles",
    oracle=_APPROX_PCT_ORACLE,
    tags=("agg", "approx", "percentile"),
)
def order_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch (percentile_approx / KLL-style) made
    checkable the same way as segment_approx_distinct: the query emits
    the EXACT interpolated percentiles plus a boolean asserting the
    sketch lands within 5% relative error of them — the oracle computes
    the exact values with TRUE, so a drifting sketch flips the boolean
    and fails the hash. The sketch (not the exact form) is what runs at
    100 TB: it merges map-side without holding the value set."""
    o = _t(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("_exact50"),
        F.expr("percentile(o_totalprice, 0.95)").alias("_exact95"),
        F.expr("percentile_approx(o_totalprice, 0.5, 10000)").alias("_a50"),
        F.expr("percentile_approx(o_totalprice, 0.95, 10000)").alias("_a95"),
    )
    ok = (
        (F.abs(F.col("_a50") - F.col("_exact50")) / F.col("_exact50") <= 0.05)
        & (F.abs(F.col("_a95") - F.col("_exact95")) / F.col("_exact95") <= 0.05)
    )
    return agg.select(
        "o_orderpriority",
        F.round("_exact50", 2).alias("exact_p50"),
        F.round("_exact95", 2).alias("exact_p95"),
        ok.alias("approx_within_5pct"),
    )


_WZOO_MAX_CUST = 200

_WZOO_ORACLE = f"""
WITH o AS (
    SELECT o_custkey, o_orderkey, o_totalprice,
           date_diff('day', DATE '1990-01-01', o_orderdate::DATE) AS dnum
    FROM orders WHERE o_custkey < {_WZOO_MAX_CUST}
)
SELECT o_custkey, o_orderkey,
       row_number() OVER w AS rn,
       round(cume_dist() OVER w, 6) AS cd,
       round(nth_value(o_totalprice, 2) OVER (
           PARTITION BY o_custkey ORDER BY dnum, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ), 2) AS second_price,
       round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY dnum
           RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
       ), 2) AS rolling_30d
FROM o
WINDOW w AS (PARTITION BY o_custkey ORDER BY dnum, o_orderkey)
"""


@register(
    "window_function_zoo",
    oracle=_WZOO_ORACLE,
    tags=("window", "api-surface"),
)
def window_function_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The window-frame surface beyond rank/lag (SURVEY §2.6): cume_dist,
    nth_value over an explicit unbounded ROWS frame, and a true
    RANGE-interval frame (30-day rolling revenue keyed on a numeric
    day index — Spark's rangeBetween needs a numeric order key, so the
    date is projected to days-since-epoch identically on both sides;
    ties inside a RANGE frame are whole-peer-group by definition, which
    is why the rolling sum orders by dnum alone and stays
    deterministic). One user_id-style exchange (o_custkey) serves all
    three windows.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_custkey") < _WZOO_MAX_CUST)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date")
            ).alias("dnum"),
        )
    )
    w = Window.partitionBy("o_custkey").orderBy("dnum", "o_orderkey")
    w_full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_range = (
        Window.partitionBy("o_custkey")
        .orderBy("dnum")
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.round(F.nth_value("o_totalprice", 2).over(w_full), 2).alias(
            "second_price"
        ),
        F.round(F.sum("o_totalprice").over(w_range), 2).alias("rolling_30d"),
    )


# --------------------------------------------------------------------------
# Skyline (Pareto-front) operator: cheapest-largest parts
# --------------------------------------------------------------------------

_SKYLINE_ORACLE = """
SELECT a.p_partkey, a.p_name,
       round(a.p_retailprice, 2) AS price,
       a.p_size::BIGINT AS size
FROM part a
WHERE NOT EXISTS (
    SELECT 1 FROM part b
    WHERE b.p_retailprice <= a.p_retailprice
      AND b.p_size >= a.p_size
      AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
)
ORDER BY price, a.p_partkey
"""


@register(
    "skyline_pareto_parts",
    oracle=_SKYLINE_ORACLE,
    tags=("advanced", "skyline", "pareto", "operator"),
    bench=True,
)
def skyline_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline operator (Börzsönyi et al. 2001): the Pareto front of
    parts under (minimize retail price, maximize size) — every part no
    other part dominates (≤ price AND ≥ size, strict in at least one).
    The query class behind "best tradeoff" shortlists that plain
    ORDER BY can't express; duplicates of a front point all survive
    (equal pairs don't dominate each other).

    Plan shape: the naive form is the O(n²) dominance anti-join (the
    DuckDB oracle runs exactly that — this query is a differential
    against it). The engine instead uses the SORT-FIRST 2-D skyline
    identity: a row is dominated iff a strictly-cheaper price level
    reaches its size (prefix-max over price order) or its own price
    level has a strictly larger size. Price levels are data-sized, so
    the prefix-max and the level shift run through the DISTRIBUTED
    two-pass helpers (operators/ranking.py) — no single-partition
    stage, no pairwise join: corpus-scale work is one groupBy(price)
    plus one broadcast-offset pass, O(n) vs the oracle's O(n²)."""
    from emails_to_vector_db_spark.operators.ranking import (
        distributed_prefix_agg,
        distributed_row_number,
    )

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.col("p_retailprice").alias("price"),
        F.col("p_size").cast("long").alias("size"),
    )
    levels = p.groupBy("price").agg(F.max("size").alias("mx"))
    ranked = distributed_row_number(levels, [F.col("price").asc()], "rk")
    cm = distributed_prefix_agg(
        ranked, [F.col("price").asc()], maxs=[("mx", "cm_incl")]
    )
    prev = cm.select(
        (F.col("rk") + 1).alias("rk"), F.col("cm_incl").alias("cm_excl")
    )
    lvl = cm.join(prev, "rk", "left").select("price", "mx", "cm_excl")
    return (
        p.join(lvl, "price")
        .where(
            ~(
                F.coalesce(
                    F.col("cm_excl") >= F.col("size"), F.lit(False)
                )
                | (F.col("mx") > F.col("size"))
            )
        )
        .select(
            "p_partkey",
            "p_name",
            F.round("price", 2).alias("price"),
            "size",
        )
        .orderBy("price", "p_partkey")
    )


# --------------------------------------------------------------------------
# Spatial radius join: grid-bucketed candidate generation, exact verify
# --------------------------------------------------------------------------

_SR_RADIUS = 0.01
_SR_SPACE = 1152921504606846976.0  # 2^60, the portable md5-hash range

_SR_ORACLE = f"""
WITH pts AS (
    SELECT c_custkey AS id,
           ('0x' || substr(md5('x|' || c_custkey), 1, 15))::BIGINT
               / {_SR_SPACE} AS x,
           ('0x' || substr(md5('y|' || c_custkey), 1, 15))::BIGINT
               / {_SR_SPACE} AS y
    FROM customer
)
SELECT a.id AS id_a, b.id AS id_b,
       round(sqrt((a.x - b.x) * (a.x - b.x)
                  + (a.y - b.y) * (a.y - b.y)), 6) AS dist
FROM pts a JOIN pts b ON a.id < b.id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      <= {_SR_RADIUS} * {_SR_RADIUS}
ORDER BY dist, id_a, id_b
"""


@register(
    "spatial_radius_join",
    oracle=_SR_ORACLE,
    tags=("join", "spatial", "operator"),
    bench=True,
)
def spatial_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius (distance) self-join — the geospatial lane the
    engine was missing beside its set-, lexical-, and dense-vector
    similarity joins: all point pairs within Euclidean distance r of
    each other, found by GRID BUCKETING (the geohash/H3 move): with
    cell side = r, any qualifying pair lies in the same or an adjacent
    cell, so candidates come from a 9-cell neighborhood equi-join and
    recall is 1 BY CONSTRUCTION. The oracle is the O(n²) all-pairs
    distance join, so the hash match is a zero-miss proof on this
    fixture (the skyline/prefix-filter differential discipline).
    Points are deterministic md5-derived unit-square coordinates per
    customer (the fixtures carry no native lat/lon; the operator, not
    the geography, is the content — swap in real coordinates and
    nothing changes).

    Plan shape: each point lands in ONE home cell; the probe side
    replicates 9x (the fixed neighbor stencil — constant fan-out,
    unlike the all-pairs join's O(n) fan-out); the join is equi on the
    cell key, so it shuffles on cell ids (skew = locally dense
    regions, the same AQE-skew story as every key join), verification
    is map-side arithmetic, and a<b dedupes the symmetric hits. Cell
    side r is the candidate-density knob: halve it (emit 25 cells) to
    cut candidate pairs 4x where points cluster."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id")
    )

    def coord(axis: str) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{axis}|"), F.col("id"))), 1, 15
                ),
                16,
                10,
            ).cast("double")
            / _SR_SPACE
        )

    r = _SR_RADIUS
    pts = c.select(
        "id",
        coord("x").alias("x"),
        coord("y").alias("y"),
    ).select(
        "id",
        "x",
        "y",
        F.floor(F.col("x") / r).cast("long").alias("cx"),
        F.floor(F.col("y") / r).cast("long").alias("cy"),
    )
    from pyspark import StorageLevel

    pts = pts.persist(StorageLevel.MEMORY_AND_DISK)
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = pts.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(offsets).alias("o"),
        "cx",
        "cy",
    ).select(
        "id_a",
        "xa",
        "ya",
        (F.col("cx") + F.col("o.dx")).alias("cx"),
        (F.col("cy") + F.col("o.dy")).alias("cy"),
    )
    home = pts.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        "cx",
        "cy",
    )
    d2 = (F.col("xa") - F.col("xb")) ** 2 + (F.col("ya") - F.col("yb")) ** 2
    return (
        probe.join(home, ["cx", "cy"])
        .where((F.col("id_a") < F.col("id_b")) & (d2 <= F.lit(r * r)))
        .select(
            "id_a",
            "id_b",
            F.round(F.sqrt(d2), 6).alias("dist"),
        )
        .orderBy("dist", "id_a", "id_b")
    )


# --------------------------------------------------------------------------
# Bounded spatial reporting twin: per-point top-k neighbors within radius
# --------------------------------------------------------------------------

_SR_TOPK = 3

_SRTOPK_ORACLE = f"""
WITH pts AS (
    SELECT c_custkey AS id,
           ('0x' || substr(md5('x|' || c_custkey), 1, 15))::BIGINT
               / {_SR_SPACE} AS x,
           ('0x' || substr(md5('y|' || c_custkey), 1, 15))::BIGINT
               / {_SR_SPACE} AS y
    FROM customer
),
cand AS (
    SELECT a.id AS id_a, b.id AS id_b,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
    FROM pts a JOIN pts b ON a.id <> b.id
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
          <= {_SR_RADIUS} * {_SR_RADIUS}
),
ranked AS (
    SELECT id_a, id_b, d2,
           row_number() OVER (PARTITION BY id_a ORDER BY d2, id_b) AS rk
    FROM cand
)
SELECT id_a, id_b, round(sqrt(d2), 6) AS dist, rk::BIGINT AS rk
FROM ranked WHERE rk <= {_SR_TOPK}
"""


@register(
    "spatial_radius_topk",
    oracle=_SRTOPK_ORACLE,
    tags=("join", "spatial", "operator", "scale-twin"),
    bench=True,
)
def spatial_radius_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OUTPUT-BOUNDED twin of spatial_radius_join: each point's
    {_SR_TOPK} nearest neighbors within radius r, instead of every
    qualifying pair. spatial_radius_join's output grows ~n²r² (3.5M
    rows at sf10, 140s mostly spent emitting and globally sorting
    pairs) — a contract that cannot survive 100×. This form caps the
    output at n×k rows (linear in the corpus), which is what a
    100 TB consumer actually reads: "who is near each point", not the
    full pair cloud. Same zero-miss grid-stencil candidate generation;
    the oracle is the O(n²) all-pairs form, so the hash match proves
    the bounded plan loses nothing inside the radius.

    Plan shape: operators/spatial.py::radius_topk — a TWO-PHASE
    adaptive grid. Phase 1 probes a FINE r/4 stencil; a point with
    ≥ k neighbors inside r/4 is provably exact from fine candidates
    alone (its kth-nearest is ≤ r/4 away, everything outside r/4 is
    strictly farther), at 1/16 the coarse candidate cost — and dense
    regions, exactly where the coarse stencil's candidates explode,
    are exactly where points satisfy. Phase 2 escalates ONLY the
    unsatisfied (sparse-neighborhood) points to the full cell-side-r
    stencil. Per-point window rank grain is one point's candidates,
    never the corpus; no global sort — the result is keyed, not
    ordered. Phase-split exactness is pinned against a brute-force
    reference in tests/test_spatial_topk.py."""
    from emails_to_vector_db_spark.operators.spatial import radius_topk

    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id")
    )

    def coord(axis: str) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{axis}|"), F.col("id"))), 1, 15
                ),
                16,
                10,
            ).cast("double")
            / _SR_SPACE
        )

    pts = c.select("id", coord("x").alias("x"), coord("y").alias("y"))
    return radius_topk(pts, _SR_RADIUS, _SR_TOPK).select(
        "id_a",
        "id_b",
        F.round(F.sqrt("d2"), 6).alias("dist"),
        F.col("rk").cast("long").alias("rk"),
    )
