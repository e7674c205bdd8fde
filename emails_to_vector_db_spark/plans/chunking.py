"""Document chunking for RAG embedding + VARIANT JSON handling.

Chunking: the missing stage of the reference's embed pipeline (it embeds
one string per product/email, ``rag.py:48-49`` / ``email_fetching.py:54``;
real RAG chunks long documents with overlap first). Native implementation:
sequence → slice → posexplode, all JVM-side, one narrow stage — exactly
what the 100 TB path wants. The UDTF twin (functions/udtf.py) is the
imperative escape hatch; tests assert both produce identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emails_to_vector_db_spark.functions.text import tokens
from emails_to_vector_db_spark.plans.registry import register
from emails_to_vector_db_spark.sources.tables import load_table

CHUNK_SIZE = 64
STRIDE = 48  # 16-token overlap

_TOKENS_SQL = "regexp_split_to_array(trim(text), '\\s+')"

_CHUNK_ORACLE = f"""
WITH t AS (
    SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents WHERE doc_id < 300
),
chunked AS (
    SELECT doc_id,
           i AS chunk_idx,
           array_to_string(toks[(i * {STRIDE} + 1):(i * {STRIDE} + {CHUNK_SIZE})], ' ') AS chunk
    FROM t,
         unnest(generate_series(0,
             greatest(0, ceil((len(toks) - {CHUNK_SIZE})::DOUBLE / {STRIDE})::INT))) AS g(i)
    WHERE len(toks) > 0
)
SELECT doc_id, chunk_idx::INT AS chunk_idx,
       len(regexp_split_to_array(chunk, ' '))::INT AS n_tokens,
       md5(chunk) AS chunk_fp
FROM chunked
"""


def chunk_documents(
    df: DataFrame,
    *,
    text_col: str = "text",
    size: int = CHUNK_SIZE,
    stride: int = STRIDE,
) -> DataFrame:
    """Native overlapping-window chunker: one row per chunk, with the
    window arithmetic as array ops (no Python)."""
    tok = tokens(text_col)
    n_chunks = F.greatest(
        F.lit(0),
        F.ceil((F.size(tok) - size) / F.lit(float(stride))).cast("int"),
    ) + F.lit(1)
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(tok, i * stride + 1, size), " "),
    )
    return df.where(F.size(tok) > 0).select(
        "*", F.posexplode(chunks).alias("chunk_idx", "chunk")
    )


@register("document_chunking", oracle=_CHUNK_ORACLE, tags=("text", "rag", "chunking"))
def document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG chunking (64-token windows, 16-token overlap) over documents —
    the stage between text extraction and embedding."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    c = chunk_documents(d.select("doc_id", "text"))
    return c.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(F.split("chunk", " ")).cast("int").alias("n_tokens"),
        F.md5("chunk").alias("chunk_fp"),
    )


_VARIANT_ORACLE = """
SELECT count(*)::BIGINT                                    AS n_events,
       sum(json_extract_string(props, '$.k')::INT)::BIGINT AS sum_k,
       count(DISTINCT json_extract_string(props, '$.k')::INT)::BIGINT AS n_distinct_k
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
"""


@register("props_variant_stats", oracle=_VARIANT_ORACLE, tags=("events", "json", "variant"))
def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured data: parse_json once into
    a variant column, then typed variant_get extraction — the shredded-
    JSON upgrade over per-access string parsing (get_json_object)."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(F.parse_json("props").alias("v"))
    k = F.variant_get(F.col("v"), "$.k", "int")
    return (
        v.where(k.isNotNull())
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.countDistinct(k).alias("n_distinct_k"),
        )
    )
