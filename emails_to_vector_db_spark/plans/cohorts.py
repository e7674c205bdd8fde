"""Cohort retention analysis over the event stream.

Not in the reference (its only event-shaped data is the IMAP fetch log,
``email_fetching.py:20-45``) but a canonical warehouse workload over
exactly the tables this engine serves: weekly signup cohorts × week
offsets → retention matrix, the product-analytics staple.

Scale shape: ONE corpus-scale shuffle. The first-event timestamp and
the distinct activity-week set are computed in the SAME user_id
aggregation (min + collect_set over the truncated week — bounded by
the timeline span, ~52 cells/user/year), so the events table is
scanned once and exchanged once; the per-user week set then explodes
into (cohort, offset) cells whose aggregation is |users×weeks|-scale,
and the cohort-size divisor joins broadcast. Nothing corpus-scale is
ever windowed or collected.

Oracle: week boundaries via date_trunc('week') (Monday 00:00 in both
Spark and DuckDB), offsets as exact integer day-diffs / 7, retention as
a 6dp-rounded ratio of exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emails_to_vector_db_spark.plans.registry import register
from emails_to_vector_db_spark.sources.tables import load_table

_RETENTION_ORACLE = """
WITH first_week AS (
    SELECT user_id,
           date_trunc('week', min(ts)) AS w0
    FROM events GROUP BY user_id
),
activity AS (
    SELECT DISTINCT user_id, date_trunc('week', ts) AS w
    FROM events
),
cells AS (
    SELECT strftime(f.w0, '%Y-%m-%d') AS cohort_week,
           (date_diff('day', f.w0, a.w) / 7)::INT AS week_offset,
           count(*)::BIGINT AS active_users
    FROM activity a JOIN first_week f ON a.user_id = f.user_id
    GROUP BY 1, 2
),
sizes AS (
    SELECT cohort_week, active_users AS cohort_size
    FROM cells WHERE week_offset = 0
)
SELECT c.cohort_week, c.week_offset, c.active_users,
       round(c.active_users / s.cohort_size::DOUBLE, 6) AS retention_rate
FROM cells c JOIN sizes s ON c.cohort_week = s.cohort_week
"""


@register(
    "cohort_retention_matrix",
    oracle=_RETENTION_ORACLE,
    tags=("analytics", "cohorts", "events"),
    bench=True,
)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their first
    event; each cell counts how many of them were active `week_offset`
    weeks later, as a count and a share of the cohort's week-0 size.

    Every user appears in their own offset-0 cell by construction (the
    first event IS week-0 activity), so cohort_size is the offset-0
    cell — no separate signup scan. One user_id aggregation carries
    both the first event and the activity-week set; everything after
    it is users×weeks-scale.
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", F.date_trunc("week", F.col("ts")).alias("w")
    )
    per_user = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("w0"),
        F.collect_set("w").alias("weeks"),
    )
    cells = (
        per_user.select("w0", F.explode("weeks").alias("w"))
        .groupBy(
            F.date_format("w0", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("w"), F.col("w0")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    sizes = cells.where(F.col("week_offset") == 0).select(
        "cohort_week", F.col("active_users").alias("cohort_size")
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "active_users",
            F.round(
                F.col("active_users") / F.col("cohort_size").cast("double"), 6
            ).alias("retention_rate"),
        )
    )
