"""RAG orchestration (intent routing, context assembly) and multimodal
column plumbing tests."""

from __future__ import annotations

import pytest

from emails_to_vector_db_spark.pipeline.embedder import (
    HashingEmbedder,
    _hash_embed_batch,
)
from emails_to_vector_db_spark.pipeline.rag import (
    ADVISORY_CONTEXT,
    classify_intent_rule_based,
    generate_with_llm,
    retrieve,
)
from emails_to_vector_db_spark.pipeline.store import EmbeddingStore, embed_and_store
from emails_to_vector_db_spark.sources.multimodal import (
    decode_image,
    extract_features,
    frame_sample_plan,
    synthetic_media,
)


def test_intent_rules_and_fallback():
    assert classify_intent_rule_based("what is the price of the red mug") == "product_search"
    assert classify_intent_rule_based("any advice for beginners?") == "niche_advice"
    assert classify_intent_rule_based("recommend a product to buy") == "mixed"
    # fallback label on unmatched input == rag.py:123 behavior
    assert classify_intent_rule_based("") == "product_search"
    assert classify_intent_rule_based("zzz qqq") == "product_search"


def test_retrieve_routes_and_assembles(spark, tmp_path):
    store = EmbeddingStore(spark, str(tmp_path / "rag_store"))
    src = spark.createDataFrame(
        [
            (1, "red mug price 5$"),
            (2, "blue mug price 6$"),
            (3, "green kettle price 20$"),
        ],
        "id long, content string",
    )
    emb = HashingEmbedder(dim=64)
    embed_and_store(spark, src, store, emb)

    def embed_query(q: str) -> list[float]:
        import pandas as pd

        return list(_hash_embed_batch(pd.Series([q]), 64)[0])

    out = retrieve("price of red mug", store=store, embed_query=embed_query, k=2)
    assert out["intent"] == "product_search"
    # context is the top-k docs joined by blank lines, nearest first
    assert "red mug" in out["context"]
    assert out["context"].count("\n\n") == 1
    first = out["context"].split("\n\n")[0]
    assert "red mug" in first

    advice = retrieve("any advice?", store=store, embed_query=embed_query)
    assert advice["intent"] == "niche_advice"
    assert advice["context"] == ADVISORY_CONTEXT
    assert advice["hits"] is None


def test_llm_generation_fallback_without_key():
    # no key/endpoint -> the reference's fallback string (rag.py:166),
    # and definitely no network call
    assert generate_with_llm("q", "ctx") == "LLM call failed."


def test_multimodal_features(spark):
    media = synthetic_media(spark, n=24)
    feats = extract_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 24
    by_id = {r.media_id: r for r in rows}
    assert all(len(r.feature) == 16 for r in rows)
    # deterministic across runs
    rows2 = {r.media_id: r.feature for r in extract_features(media, dim=16).collect()}
    assert all(by_id[i].feature == rows2[i] for i in by_id)
    # payload size recorded
    assert all(r.n_bytes > 0 for r in rows)


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG....")


def test_frame_sampling(spark):
    media = synthetic_media(spark, n=9)
    frames = frame_sample_plan(media, every_ms=1000)
    rows = frames.collect()
    # 3 videos (ids 2,5,8) with durations 3000/6000/9000 ms
    per = {}
    for r in rows:
        per.setdefault(r.media_id, []).append(r.frame_ts_ms)
    assert set(per) == {2, 5, 8}
    assert sorted(per[2]) == [0, 1000, 2000, 3000]
