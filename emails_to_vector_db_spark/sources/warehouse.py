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


def list_versions(table_dir: str) -> list[int]:
    """Version numbers present in a versioned table directory (the
    ``v{n}`` layout written by streaming/ingest.py::stream_merge_upsert),
    ascending."""
    import os
    import re

    if not os.path.isdir(table_dir):
        return []
    return sorted(
        int(m.group(1))
        for d in os.listdir(table_dir)
        if (m := re.fullmatch(r"v(\d+)", d)) and
        os.path.isdir(os.path.join(table_dir, d))
    )


def read_versioned(spark: SparkSession, table_dir: str, version: int | None = None):
    """Time-travel read of a versioned table: ``version=None`` follows
    the ``_LATEST`` pointer (the live state); an explicit version reads
    that historical snapshot. Old versions are immutable directories —
    this is the poor-man's Delta/Iceberg time travel, and the reason the
    CDC apply keeps superseded versions around until an explicit
    retention sweep."""
    import os

    if version is None:
        pointer = os.path.join(table_dir, "_LATEST")
        with open(pointer) as fh:
            sub = fh.read().strip()
    else:
        sub = f"v{version}"
        if not os.path.isdir(os.path.join(table_dir, sub)):
            raise FileNotFoundError(
                f"version {version} not present in {table_dir}; "
                f"available: {list_versions(table_dir)}"
            )
    return spark.read.parquet(os.path.join(table_dir, sub))


def vacuum_versions(table_dir: str, *, keep_last: int = 2) -> list[int]:
    """Retention sweep for the versioned table: delete all but the newest
    ``keep_last`` version directories (never the one _LATEST points to),
    returning the versions removed. Old versions are immutable, so the
    sweep is a plain directory delete — the time-travel window shrinks to
    the retained set, exactly like Delta/Iceberg VACUUM."""
    import os
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = list_versions(table_dir)
    pointer = os.path.join(table_dir, "_LATEST")
    current = None
    if os.path.exists(pointer):
        with open(pointer) as fh:
            current = int(fh.read().strip()[1:])
    doomed = [
        v for v in versions[:-keep_last] if v != current
    ]
    for v in doomed:
        shutil.rmtree(os.path.join(table_dir, f"v{v}"))
    return doomed
