"""Bucketed warehouse tables: shuffle-free co-located joins.

The 100 TB join strategy the fixture-parquet queries can't show: write both
fact tables bucketed (and sorted) by the join key, and every subsequent
equi-join on that key is exchange-free — the sort-merge join reads
co-located buckets directly. This is Spark's answer to the reference's
"let Postgres handle it" (every reference join is delegated SQL;
SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+sorted) managed parquet table. S7-equivalent
    bootstrap: ``saveAsTable`` creates-or-replaces idempotently."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, left: str, right: str, on: str):
    """Read two bucketed tables for an exchange-free join on ``on``."""
    return spark.table(left), spark.table(right), on


def merge_upsert(
    existing: DataFrame, updates: DataFrame, *, key: str
) -> DataFrame:
    """MERGE/upsert semantics without a table format: rows from
    ``updates`` win on key collision (matched → update), unmatched
    existing rows pass through, brand-new keys insert. Planned as one
    anti join + union — at scale both inputs shuffle once on the key
    (or zero times if both are bucketed by it via write_bucketed).
    The CDC-apply step of a foreachBatch pipeline; pair with
    EmbeddingStore.compact-style rewrite for the physical swap."""
    return updates.unionByName(
        existing.join(updates.select(key), key, "left_anti")
    )
