"""Contract test for the real-model embed path (SentenceTransformerEmbedder)
with a MOCKED ``sentence_transformers`` module — no network, no model
weights, still catches signature rot in the batch function the pandas_udf
executes (reference parity target: ``rag.py:24,27,49``: all-MiniLM-L6-v2,
384-dim, batched encode)."""

from __future__ import annotations

import sys
import types

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def fake_sentence_transformers(monkeypatch):
    """Inject a fake sentence_transformers module recording constructor and
    encode calls; yields the recorder."""
    calls = {"constructed": [], "encoded": []}

    class FakeModel:
        def __init__(self, name):
            calls["constructed"].append(name)
            self.name = name

        def encode(self, texts):
            assert isinstance(texts, list)  # batched list-of-str contract
            assert all(isinstance(t, str) for t in texts)  # NaN filled
            calls["encoded"].append(len(texts))
            return np.full((len(texts), 384), 0.5, dtype=np.float32)

    mod = types.ModuleType("sentence_transformers")
    mod.SentenceTransformer = FakeModel
    monkeypatch.setitem(sys.modules, "sentence_transformers", mod)

    from emails_to_vector_db_spark.pipeline import embedder

    monkeypatch.setattr(embedder, "_MODEL_CACHE", {})
    return calls


def test_st_batch_shape_dtype_and_single_load(fake_sentence_transformers):
    from emails_to_vector_db_spark.pipeline.embedder import _st_embed_batch

    calls = fake_sentence_transformers
    out = _st_embed_batch(
        pd.Series(["hello", None, "world"]), "all-MiniLM-L6-v2"
    )
    # batch shape: one vector per input row, 384-dim float32 (rag.py:35)
    assert len(out) == 3
    assert all(v.shape == (384,) and v.dtype == np.float32 for v in out)
    # None was filled to "" before encode — the model never sees NaN
    assert calls["encoded"] == [3]

    # second batch: model NOT reconstructed (per-process cache — the fix
    # for the reference reloading the model per call, rag.py:72)
    _st_embed_batch(pd.Series(["again"]), "all-MiniLM-L6-v2")
    assert calls["constructed"] == ["all-MiniLM-L6-v2"]
    assert calls["encoded"] == [3, 1]

    # a different model name is a separate cache entry
    _st_embed_batch(pd.Series(["x"]), "other-model")
    assert calls["constructed"] == ["all-MiniLM-L6-v2", "other-model"]


def test_st_embedder_udf_signature(spark):
    """The embedder exposes the Embedder protocol: dim attribute and a
    column-in/column-out callable (no execution here — the UDF body is
    covered by test_st_batch_shape_dtype_and_single_load)."""
    from pyspark.sql import Column

    from emails_to_vector_db_spark.pipeline.embedder import (
        SentenceTransformerEmbedder,
    )

    e = SentenceTransformerEmbedder()
    assert e.model_name == "all-MiniLM-L6-v2" and e.dim == 384
    from pyspark.sql import functions as F

    assert isinstance(e(F.lit("text")), Column)


def test_st_missing_dependency_message(monkeypatch):
    monkeypatch.setitem(sys.modules, "sentence_transformers", None)
    from emails_to_vector_db_spark.pipeline.embedder import _st_embed_batch

    with pytest.raises(ImportError, match="HashingEmbedder"):
        _st_embed_batch(pd.Series(["x"]), "m")
