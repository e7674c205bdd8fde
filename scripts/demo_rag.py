"""End-to-end RAG demo: the reference's full lifecycle on this engine.

Mirrors zainjavedev/Emails-to-Vector-DB's two entry points in one run:
1. embed_and_store (reference rag.py:22-62): part table → document
   template → deterministic embedder → idempotent parquet store;
2. chat retrieval turn (reference rag.py:169-196): classify intent →
   route → KNN search → assemble context (→ LLM generation is gated off).

Usage: python scripts/demo_rag.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from emails_to_vector_db_spark.pipeline.embedder import (  # noqa: E402
    HashingEmbedder,
    _hash_embed_batch,
)
from emails_to_vector_db_spark.pipeline.rag import (  # noqa: E402
    generate_with_llm,
    retrieve,
)
from emails_to_vector_db_spark.pipeline.store import (  # noqa: E402
    EmbeddingStore,
    embed_and_store,
)
from emails_to_vector_db_spark.session import get_spark  # noqa: E402
from emails_to_vector_db_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
DIM = 64


def main() -> None:
    spark = get_spark(app_name="rag-demo", cpus="8")
    embedder = HashingEmbedder(dim=DIM)

    # -- 1. embed_and_store (products -> retrieval documents) --------------
    part = load_table(spark, SF_DIR, "part")
    docs = part.select(
        F.col("p_partkey").alias("id"),
        F.format_string(
            "%s, type: %s, brand: %s, price: %.2f$",
            "p_name", "p_type", "p_brand", "p_retailprice",
        ).alias("content"),
    )
    store = EmbeddingStore(
        spark, os.path.join(tempfile.mkdtemp(prefix="ragdemo"), "store")
    )
    n = embed_and_store(spark, docs, store, embedder)
    print(f"indexed {n} product documents "
          f"(re-run would add {embed_and_store(spark, docs, store, embedder)})")

    # -- 2. chat retrieval turns -------------------------------------------
    def embed_query(q: str) -> list[float]:
        return list(_hash_embed_batch(pd.Series([q]), DIM)[0])

    for query in (
        "what is the price of a STANDARD Brand#11 part",
        "any advice on choosing parts?",
        "recommend a LARGE part to buy",
    ):
        out = retrieve(query, store=store, embed_query=embed_query, k=3)
        print(f"\nQ: {query}\n  intent: {out['intent']}")
        preview = out["context"].split("\n\n")[0][:100]
        print(f"  context[0]: {preview}")
        print(f"  llm: {generate_with_llm(query, out['context'])}")

    spark.stop()


if __name__ == "__main__":
    main()
