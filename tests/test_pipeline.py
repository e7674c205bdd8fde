"""Email ingestion + embedder + store pipeline tests (reference parity:
email_fetching.py and rag.py:22-62 behaviors, SURVEY.md §3.2-3.3)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from emails_to_vector_db_spark.pipeline.embedder import HashingEmbedder
from emails_to_vector_db_spark.pipeline.store import EmbeddingStore, embed_and_store
from emails_to_vector_db_spark.sources.emails import (
    extract_plain_text,
    ingest_emails,
    synthetic_emails,
)
from emails_to_vector_db_spark.sources.products import (
    product_content,
    read_products_csv,
)


def test_extract_plain_text_filters_and_order(spark):
    raw = synthetic_emails(spark, n=8)
    texts = {r.msg_id: r.text for r in extract_plain_text(raw).collect()}
    # kind 0 (multipart plain+html): plain kept, html dropped (P3)
    assert "plain body 0" in texts["m0000"]
    assert "html" not in texts["m0000"]
    # kind 2 (html only): entirely filtered out (P5)
    assert "m0002" not in texts and "m0006" not in texts
    # kind 3 (two plain parts): both present, original order (P7)
    assert texts["m0003"].index("part one") < texts["m0003"].index("part two")
    # broken bytes: Python's email parser is lenient — a headerless blob
    # parses as a text/plain body (same as the reference's msg.walk path);
    # the point is it must not crash and must decode with replacement.
    assert "broken" in texts


def test_hashing_embedder_deterministic_unit_norm(spark):
    df = spark.createDataFrame(
        [("a", "hello world"), ("b", "hello world"), ("c", "other text")],
        "id string, content string",
    )
    emb = HashingEmbedder(dim=64)
    out = {r.id: r.e for r in df.select("id", emb("content").alias("e")).collect()}
    assert len(out["a"]) == 64
    assert out["a"] == out["b"]  # deterministic
    assert out["a"] != out["c"]
    norm = math.sqrt(sum(v * v for v in out["a"]))
    assert abs(norm - 1.0) < 1e-5


def test_store_append_idempotent_and_search(spark, tmp_path):
    store = EmbeddingStore(spark, str(tmp_path / "store"))
    src = spark.createDataFrame(
        [(i, f"doc number {i} about topic{i % 3}") for i in range(30)],
        "id long, content string",
    )
    emb = HashingEmbedder(dim=64)
    n1 = embed_and_store(spark, src, store, emb)
    assert n1 == 30
    # re-run: anti-join dedup makes it a no-op (the reference would crash /
    # duplicate here, rag.py:55)
    n2 = embed_and_store(spark, src, store, emb)
    assert n2 == 0
    assert store.read().count() == 30

    probe = src.where(F.col("id") == 7)
    probe_vec = (
        probe.select(emb("content").alias("e")).collect()[0].e
    )
    hits = store.search(probe_vec, k=5).collect()
    assert len(hits) == 5
    # nearest neighbor of doc 7's own vector is doc 7 at distance ~0
    assert hits[0].id == 7
    assert hits[0].distance < 1e-5


def test_ingest_emails_end_to_end(spark, tmp_path):
    store = EmbeddingStore(spark, str(tmp_path / "emails"), id_col="msg_id")
    raw = synthetic_emails(spark, n=12)
    n = ingest_emails(spark, raw, store, HashingEmbedder(dim=64))
    # 12 messages + 1 broken blob, 1/4 html-only filtered out -> 10
    assert n == 10
    assert ingest_emails(spark, raw, store, HashingEmbedder(dim=64)) == 0


def test_products_csv_roundtrip(spark, tmp_path):
    csv = tmp_path / "products.csv"
    csv.write_text(
        "id,name,price,img_url,color,category,description\n"
        '1,Widget,9.99,http://x/1.png,red,Tools - Hand,A fine widget\n'
        '2,Gadget,19.5,http://x/2.png,blue,Tools - Power,"A gadget, deluxe"\n'
    )
    df = read_products_csv(spark, str(csv))
    assert df.count() == 2
    rows = {r.id: r for r in product_content(df).collect()}
    assert rows[1].content.startswith("Widget, category: Tools - Hand")
    assert "price: 9.99$" in rows[1].content
    assert "A gadget, deluxe" in rows[2].content


def test_email_datasource_connector(spark):
    """The Python DataSource connector: partition-parallel scan, option
    handling, and agreement with the createDataFrame fixture path."""
    from emails_to_vector_db_spark.sources.email_datasource import (
        EmailCorpusDataSource,
    )
    from emails_to_vector_db_spark.sources.emails import synthetic_email_rows

    spark.dataSource.register(EmailCorpusDataSource)
    raw = (
        spark.read.format("email_corpus")
        .option("n", "12")
        .option("numPartitions", "3")
        .load()
    )
    assert raw.rdd.getNumPartitions() == 3
    got = {(r.msg_id, bytes(r.raw)) for r in raw.collect()}
    assert got == set(synthetic_email_rows(12))

    no_broken = (
        spark.read.format("email_corpus")
        .option("n", "8")
        .option("includeBroken", "false")
        .load()
    )
    assert no_broken.count() == 8


def test_email_datasource_filter_pushdown(spark):
    """msg_id range predicates narrow the generated range at the source;
    unsupported filters are left for Spark; results stay correct."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        IsNotNull,
        LessThan,
        StringContains,
    )

    from emails_to_vector_db_spark.sources.email_datasource import (
        EmailCorpusDataSource,
        EmailCorpusReader,
    )

    # unit: bound narrowing + unsupported passthrough
    r = EmailCorpusReader({"n": "40", "numPartitions": "4"})
    leftover = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("msg_id",), "m0010"),
                LessThan(("msg_id",), "m0020"),
                IsNotNull(("msg_id",)),
                StringContains(("raw",), "receipt"),
            ]
        )
    )
    assert (r.lo, r.hi) == (10, 20)
    assert r.include_broken is False  # 'broken' < 'm0010'
    assert len(leftover) == 1 and isinstance(leftover[0], StringContains)
    total = sum(p.end - p.start for p in r.partitions())
    assert total == 10

    # equality on the broken row: m-range fully pruned, broken survives
    r2 = EmailCorpusReader({"n": "40"})
    assert list(r2.pushFilters([EqualTo(("msg_id",), "broken")])) == []
    assert r2.hi == r2.lo and r2.include_broken is True

    # end-to-end through the planner
    spark.dataSource.register(EmailCorpusDataSource)
    df = (
        spark.read.format("email_corpus")
        .option("n", "40")
        .load()
        .where("msg_id >= 'm0010' AND msg_id < 'm0020'")
    )
    ids = sorted(row.msg_id for row in df.select("msg_id").collect())
    assert ids == [f"m{i:04d}" for i in range(10, 20)]


def test_mmr_rerank_prefers_diversity():
    """Two near-duplicate top candidates: pure relevance would keep
    both; MMR must demote the duplicate in favor of a diverse third."""
    from emails_to_vector_db_spark.pipeline.rag import mmr_rerank

    cands = [
        (1, 0.99, [1.0, 0.0, 0.0]),
        (2, 0.98, [0.999, 0.01, 0.0]),   # near-dup of 1
        (3, 0.80, [0.0, 1.0, 0.0]),      # diverse
    ]
    out = mmr_rerank(cands, k=2, lam=0.5)
    assert [c[0] for c in out] == [1, 3]
    # with lam=1.0 MMR degenerates to pure relevance order
    out_rel = mmr_rerank(cands, k=2, lam=1.0)
    assert [c[0] for c in out_rel] == [1, 2]


def test_mmr_rerank_edges():
    from emails_to_vector_db_spark.pipeline.rag import mmr_rerank

    assert mmr_rerank([], k=3) == []
    one = [(7, 0.5, [1.0, 0.0])]
    assert mmr_rerank(one, k=0) == []
    assert [c[0] for c in mmr_rerank(one, k=5)] == [7]


def test_mmr_registered_query_matches_driver_mmr(spark):
    """The registered mmr_rerank query (plans/retrieval.py — engine-
    identical greedy over the collected top-15) must select the SAME
    documents in the SAME order as the driver-side API
    pipeline.rag.mmr_rerank given the same candidates and lambda."""
    from pyspark.sql import functions as F

    from emails_to_vector_db_spark.functions.vector import cosine_similarity
    from emails_to_vector_db_spark.pipeline.rag import mmr_rerank
    from emails_to_vector_db_spark.plans import REGISTRY
    from emails_to_vector_db_spark.plans.retrieval import (
        _MMR_LAM,
        _MMR_POOL,
        _PROBE_ID,
    )
    from emails_to_vector_db_spark.sources.tables import load_table
    from tests.conftest import SF_ORACLE

    got = [
        r.vec_id
        for r in REGISTRY["mmr_rerank"]
        .fn(spark, SF_ORACLE)
        .orderBy("sel_rank")
        .collect()
    ]

    emb = load_table(spark, SF_ORACLE, "embeddings")
    probe = F.broadcast(
        emb.where(F.col("vec_id") == _PROBE_ID).select(
            F.col("embedding").alias("q")
        )
    )
    cands = [
        (r.vec_id, r.rel, list(r.v))
        for r in emb.where(F.col("vec_id") != _PROBE_ID)
        .crossJoin(probe)
        .select(
            "vec_id",
            F.col("embedding").alias("v"),
            F.round(cosine_similarity("embedding", "q"), 6).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), F.col("vec_id").asc())
        .limit(_MMR_POOL)
        .collect()
    ]
    want = [c[0] for c in mmr_rerank(cands, k=5, lam=_MMR_LAM)]
    assert got == want


def test_email_streaming_connector_matches_batch(spark):
    """The Spark 4 Python DataSource STREAMING reader: incremental
    message-id offsets over the same corpus must deliver exactly the
    batch connector's rows, in multiple bounded micro-batches (the
    streaming twin of the reference's last-N polling loop)."""
    import time

    from emails_to_vector_db_spark.sources.email_datasource import (
        EmailCorpusDataSource,
    )

    try:
        spark.dataSource.register(EmailCorpusDataSource)
    except Exception:
        pass  # already registered by an earlier test in this session
    batch = (
        spark.read.format("email_corpus")
        .option("n", "20")
        .option("includeBroken", "false")
        .load()
    )
    stream = (
        spark.readStream.format("email_corpus")
        .option("n", "20")
        .option("batchSize", "8")
        .option("includeBroken", "false")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("em_stream_t")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table("em_stream_t").count() >= 20:
                break
            time.sleep(0.5)
        # r11: the DRAINED stream must stay alive — Spark probes the
        # empty end==start batch with next(), so read() must hand back
        # an iterator there; a list kills the query with a TypeError
        # right after the last real batch. Give the poller time for at
        # least one drained-mailbox cycle, then assert no exception.
        time.sleep(2.0)
        assert q.exception() is None, f"stream died on drain: {q.exception()}"
        assert q.isActive
    finally:
        q.stop()
    got = {
        r.msg_id: bytes(r.raw)
        for r in spark.table("em_stream_t").collect()
    }
    want = {r.msg_id: bytes(r.raw) for r in batch.collect()}
    assert got == want
    n_batches = len(
        [p for p in q.recentProgress if p["numInputRows"] > 0]
    )
    assert n_batches >= 2, "expected multiple bounded micro-batches"


def test_store_schema_evolution_merge(spark, tmp_path):
    """Appends that add a column must not break existing readers:
    mergeSchema reconciles old and new part files (missing values null),
    and the default read still sees the original columns — the parquet
    schema-evolution contract a long-lived store depends on."""
    path = str(tmp_path / "evolving_store")
    spark.createDataFrame(
        [(1, "a", [0.1, 0.2])], "id long, content string, embedding array<double>"
    ).write.parquet(path)
    spark.createDataFrame(
        [(2, "b", [0.3, 0.4], "en")],
        "id long, content string, embedding array<double>, lang string",
    ).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "content", "embedding", "lang"}
    rows = {r.id: r.lang for r in merged.collect()}
    assert rows == {1: None, 2: "en"}
