"""Chunking: native expression vs Python UDTF must agree exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from emails_to_vector_db_spark.functions.udtf import ChunkDocument
from emails_to_vector_db_spark.plans.chunking import chunk_documents
from emails_to_vector_db_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_native_chunker_basics(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(100))), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    rows = chunk_documents(df, size=10, stride=8).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc1: 100 tokens, size 10, stride 8 -> ceil((100-10)/8)+1 = 13 chunks
    assert len(by_doc[1]) == 13
    # overlap: chunk i starts at i*8 -> chunk0 tokens t0..t9, chunk1 t8..t17
    c = {r.chunk_idx: r.chunk for r in by_doc[1]}
    assert c[0].split()[-2:] == ["t8", "t9"]
    assert c[1].split()[:2] == ["t8", "t9"]
    # short doc: one chunk, whole text
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk == "a b"
    # empty text: filtered (split('') gives [''], one 1-token chunk of '')
    assert 3 not in by_doc or by_doc[3][0].chunk == ""


def test_udtf_matches_native(spark):
    docs = load_table(spark, SF_SMOKE, "documents").where(F.col("doc_id") < 50)
    native = {
        (r.doc_id, r.chunk_idx): r.chunk
        for r in chunk_documents(docs.select("doc_id", "text"), size=64, stride=48).collect()
    }
    spark.udtf.register("chunk_document", ChunkDocument)
    docs.createOrReplaceTempView("docs_for_udtf")
    via_udtf = {
        (r.doc_id, r.chunk_idx): r.chunk
        for r in spark.sql(
            """
            SELECT d.doc_id, c.chunk_idx, c.chunk
            FROM docs_for_udtf d,
                 LATERAL chunk_document(d.text, 64, 48) c
            """
        ).collect()
    }
    assert native == via_udtf
