"""Structured Streaming tests: windowed aggregations and dedup over the
bounded events file-source must agree with their batch equivalents
(SURVEY.md §2.8 — batch-checked streaming)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from emails_to_vector_db_spark.plans.registry import REGISTRY
from emails_to_vector_db_spark.sources.tables import load_table
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


def test_multi_batch_stateful_agg(spark, tmp_path):
    """Stateful aggregation across MANY micro-batches: events split into 6
    files ingested one file per trigger (out of event-time order within the
    stream) must still converge to the batch answer — state merges across
    batches."""
    src = tmp_path / "ev_multi"
    ev = load_table(spark, SF_SMOKE, "events")
    # hash-split: each file holds an arbitrary time-interleaved slice
    ev.withColumn("part", F.pmod(F.xxhash64("event_id"), F.lit(6))).repartition(
        6, "part"
    ).drop("part").write.parquet(str(src))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = (
        stream.groupBy(
            F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_epoch"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("multi_batch_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    assert q.lastProgress is not None
    got = {
        (r.hour_epoch, r.event_type): r.n_events
        for r in spark.table("multi_batch_t").collect()
    }
    want = {
        (r.hour_epoch, r.event_type): r.n_events
        for r in ev.groupBy(
            F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_epoch"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    assert got == want


def test_foreachbatch_store_exactly_once(spark, tmp_path):
    """foreachBatch -> embed -> idempotent store append: restarting the
    stream over the same data (fresh checkpoint, same store) must not
    duplicate rows — the anti-join makes replays exactly-once in effect."""
    from emails_to_vector_db_spark.pipeline.embedder import HashingEmbedder
    from emails_to_vector_db_spark.pipeline.store import EmbeddingStore
    from emails_to_vector_db_spark.streaming.ingest import stream_embed_to_store

    src_dir = tmp_path / "texts"
    spark.createDataFrame(
        [(f"m{i}", f"text number {i}") for i in range(40)],
        "msg_id string, text string",
    ).repartition(4).write.parquet(str(src_dir))

    store = EmbeddingStore(spark, str(tmp_path / "st"), id_col="msg_id")
    emb = HashingEmbedder(dim=16)

    def run(checkpoint: str):
        stream = (
            spark.readStream.schema("msg_id string, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir))
        )
        q = stream_embed_to_store(
            stream, store, emb, checkpoint=checkpoint
        ).start()
        assert q.awaitTermination(120)

    run(str(tmp_path / "ckpt1"))
    assert store.read().count() == 40
    # full replay with a fresh checkpoint: at-least-once delivery from the
    # source, exactly-once effect at the sink
    run(str(tmp_path / "ckpt2"))
    assert store.read().count() == 40
    assert store.read().select("msg_id").distinct().count() == 40


def test_stateful_user_profiles_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-user running profiles accumulated over
    6 micro-batches must converge to the batch aggregate."""
    from emails_to_vector_db_spark.streaming.stateful import (
        running_user_profiles,
    )

    src = tmp_path / "ev_state"
    ev = load_table(spark, SF_SMOKE, "events")
    ev.withColumn("part", F.pmod(F.xxhash64("event_id"), F.lit(6))).repartition(
        6, "part"
    ).drop("part").write.parquet(str(src))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        running_user_profiles(stream)
        .writeStream.format("memory")
        .queryName("profiles_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    # update-mode memory sink appends each batch's updated rows; the live
    # profile is the row with the max n_events per user
    rows = spark.table("profiles_t").collect()
    final = {}
    for r in rows:
        cur = final.get(r.user_id)
        if cur is None or r.n_events > cur.n_events:
            final[r.user_id] = r
    want = {
        r.user_id: (r.n, round(r.total, 6), r.last_us)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
            F.max(F.unix_micros("ts")).alias("last_us"),
        )
        .collect()
    }
    got = {
        uid: (r.n_events, round(r.total_value, 6), r.last_seen_us)
        for uid, r in final.items()
    }
    assert got == want


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


def test_stream_merge_upsert_versioned(spark, tmp_path):
    """foreachBatch CDC apply: three micro-batches of upserts merge into
    the versioned table; the final state equals the sequential merge and
    the version pointer survives each flip."""
    import os

    from emails_to_vector_db_spark.streaming.ingest import stream_merge_upsert

    src = str(tmp_path / "updates")
    os.makedirs(src)
    batches = [
        [(1, "a0"), (2, "b0")],
        [(2, "b1"), (3, "c1")],
        [(1, "a2"), (4, "d2")],
    ]
    # land each batch as one file -> maxFilesPerTrigger=1 = one micro-batch each
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "k long, v string").coalesce(1).write.parquet(
            f"{src}/b{i}", mode="overwrite"
        )
    stream = (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    table = str(tmp_path / "table")
    q = stream_merge_upsert(
        stream, table, key="k", checkpoint=str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(120)

    with open(os.path.join(table, "_LATEST")) as fh:
        latest = fh.read()
    final = {
        r.k: r.v
        for r in spark.read.parquet(os.path.join(table, latest)).collect()
    }
    # sequential expectation (later batches win) — file order is lexical b0,b1,b2
    assert final == {1: "a2", 2: "b1", 3: "c1", 4: "d2"}


def test_tws_plan_construction(spark):
    """transformWithStateInPandas (Spark 4 typed-state API): the logical
    plan builds and carries the declared output schema without executing
    (execution needs google.protobuf — gated below)."""
    from emails_to_vector_db_spark.streaming.ingest import read_events_stream
    from emails_to_vector_db_spark.streaming.tws import (
        running_user_profiles_tws,
    )

    prof = running_user_profiles_tws(read_events_stream(spark, SF_SMOKE))
    assert prof.isStreaming
    assert [f.name for f in prof.schema.fields] == [
        "user_id",
        "n_events",
        "n_types",
        "total_value",
    ]


def test_tws_profiles_across_batches(spark, tmp_path):
    """Full transformWithStateInPandas execution across 4 micro-batches:
    final per-user profiles must equal the batch GROUP BY. Skips when the
    container lacks google.protobuf (PySpark's TWS state-server protocol)."""
    pytest.importorskip("google.protobuf")
    from emails_to_vector_db_spark.streaming.tws import (
        running_user_profiles_tws,
    )

    src = tmp_path / "ev_tws"
    ev = load_table(spark, SF_SMOKE, "events")
    ev.withColumn("part", F.pmod(F.xxhash64("event_id"), F.lit(4))).repartition(
        4, "part"
    ).drop("part").write.parquet(str(src))

    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            running_user_profiles_tws(stream)
            .writeStream.format("memory")
            .queryName("tws_profiles_t")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)
        final = (
            spark.table("tws_profiles_t")
            .groupBy("user_id")
            .agg(
                F.max("n_events").alias("n_events"),
                F.max("n_types").alias("n_types"),
                F.round(F.max("total_value"), 2).alias("total_value"),
            )
        )
        expect = ev.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        assert final.exceptAll(expect).count() == 0
        assert expect.exceptAll(final).count() == 0
    finally:
        if old is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", old
            )


def test_versioned_table_time_travel(spark, tmp_path):
    """Every intermediate CDC state stays readable: version n is the
    merge of batches 0..n, _LATEST follows the newest, and a missing
    version fails loudly with the available list."""
    import os

    import pytest as _pytest

    from emails_to_vector_db_spark.sources.warehouse import (
        list_versions,
        read_versioned,
    )
    from emails_to_vector_db_spark.streaming.ingest import stream_merge_upsert

    src = str(tmp_path / "updates")
    os.makedirs(src)
    batches = [
        [(1, "a0"), (2, "b0")],
        [(2, "b1"), (3, "c1")],
        [(1, "a2"), (4, "d2")],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "k long, v string").coalesce(1).write.parquet(
            f"{src}/b{i}", mode="overwrite"
        )
    stream = (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    table = str(tmp_path / "table")
    q = stream_merge_upsert(
        stream, table, key="k", checkpoint=str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(120)

    assert list_versions(table) == [0, 1, 2]
    snap = lambda v: {r.k: r.v for r in read_versioned(spark, table, v).collect()}
    assert snap(0) == {1: "a0", 2: "b0"}
    assert snap(1) == {1: "a0", 2: "b1", 3: "c1"}
    assert snap(2) == {1: "a2", 2: "b1", 3: "c1", 4: "d2"}
    latest = {r.k: r.v for r in read_versioned(spark, table).collect()}
    assert latest == snap(2)
    with _pytest.raises(FileNotFoundError, match="available"):
        read_versioned(spark, table, 99)


def test_stateful_profiles_on_rocksdb_state_store(spark, tmp_path):
    """The RocksDB state store provider (what bounds streaming-state
    memory at scale: state lives off-heap/on-disk per key range, not in
    executor heap) must produce identical profiles to the default HDFS
    provider for the applyInPandasWithState operator."""
    from emails_to_vector_db_spark.streaming.stateful import (
        running_user_profiles,
    )

    src = tmp_path / "ev_rocks"
    ev = load_table(spark, SF_SMOKE, "events")
    ev.withColumn("part", F.pmod(F.xxhash64("event_id"), F.lit(3))).repartition(
        3, "part"
    ).drop("part").write.parquet(str(src))

    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            running_user_profiles(stream)
            .writeStream.format("memory")
            .queryName("profiles_rocks_t")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)
        final = (
            spark.table("profiles_rocks_t")
            .groupBy("user_id")
            .agg(F.max("n_events").alias("n_events"))
        )
        expect = ev.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events")
        )
        assert final.exceptAll(expect).count() == 0
        assert expect.exceptAll(final).count() == 0
    finally:
        if old is not None:
            spark.conf.set(key, old)


def test_vacuum_versions_retention(spark, tmp_path):
    import os

    import pytest as _pytest

    from emails_to_vector_db_spark.sources.warehouse import (
        list_versions,
        read_versioned,
        vacuum_versions,
    )
    from emails_to_vector_db_spark.streaming.ingest import stream_merge_upsert

    src = str(tmp_path / "updates")
    os.makedirs(src)
    for i, rows in enumerate([[(1, "a0")], [(2, "b1")], [(3, "c2")]]):
        spark.createDataFrame(rows, "k long, v string").coalesce(1).write.parquet(
            f"{src}/b{i}", mode="overwrite"
        )
    stream = (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    table = str(tmp_path / "table")
    q = stream_merge_upsert(
        stream, table, key="k", checkpoint=str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(120)
    assert list_versions(table) == [0, 1, 2]

    removed = vacuum_versions(table, keep_last=2)
    assert removed == [0]
    assert list_versions(table) == [1, 2]
    # latest still readable; vacuumed version fails loudly
    assert read_versioned(spark, table).count() == 3
    with _pytest.raises(FileNotFoundError):
        read_versioned(spark, table, 0)


def test_streaming_observe_metrics_in_progress(spark, tmp_path):
    """df.observe on a streaming query surfaces per-micro-batch custom
    metrics in StreamingQueryProgress (observedMetrics) — the hook a
    production ingest job uses for row-level SLO counters without a
    second aggregation pass."""
    import os

    src = tmp_path / "ev_obs"
    ev = load_table(spark, SF_SMOKE, "events")
    ev.limit(200).write.parquet(str(src))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    observed = stream.observe(
        "ingest_metrics",
        F.count(F.lit(1)).alias("rows"),
        F.count(F.when(F.col("value") > 0, 1)).alias("positive_rows"),
    )
    q = (
        observed.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    metrics = [
        p["observedMetrics"]["ingest_metrics"]
        for p in q.recentProgress
        if "ingest_metrics" in p.get("observedMetrics", {})
    ]
    assert metrics, "no observed metrics in progress events"
    total = sum(m["rows"] for m in metrics)
    assert total == 200
    assert all(0 <= m["positive_rows"] <= m["rows"] for m in metrics)
