"""Structured Streaming tests: windowed aggregations and dedup over the
bounded events file-source must agree with their batch equivalents
(SURVEY.md §2.8 — batch-checked streaming)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from emails_to_vector_db_spark.plans.registry import REGISTRY
from emails_to_vector_db_spark.streaming.ingest import (
    deduped_stream,
    read_events_stream,
    session_counts,
    tumbling_counts,
)
from tests.conftest import SF_SMOKE


def _run_complete(df, name, spark, timeout=120):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(timeout), "stream did not finish in time"
    return spark.table(name)


def test_tumbling_counts_match_batch(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    result = _run_complete(tumbling_counts(stream), "tumbling_t", spark)
    batch = REGISTRY["hourly_event_counts"].fn(spark, SF_SMOKE)
    s = {
        (r.hour_epoch, r.event_type): (r.n_events, r.total_value)
        for r in result.collect()
    }
    b = {
        (r.hour_epoch, r.event_type): (r.n_events, r.total_value)
        for r in batch.collect()
    }
    assert s == b


def test_session_counts_match_batch_totals(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    result = _run_complete(session_counts(stream), "sessions_t", spark)
    batch = REGISTRY["user_sessionization"].fn(spark, SF_SMOKE)
    s_sessions = result.groupBy("user_id").count().collect()
    b = {r.user_id: r.n_sessions for r in batch.collect()}
    s = {r.user_id: r["count"] for r in s_sessions}
    assert s == b
    # total events preserved
    assert result.agg(F.sum("n_events")).collect()[0][0] == sum(
        r.n_events for r in batch.collect()
    )


def test_dedup_within_watermark(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    q = (
        deduped_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    n = spark.table("dedup_t").count()
    n_batch = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    # fixture has unique event_ids: dedup must not drop anything
    assert n == n_batch
