"""Reference-parity pipeline queries: the document-template projection and
the end-to-end embed→store→search path with a deterministic hash embedder.

These mirror the reference's ``embed_and_store_products`` (``rag.py:22-62``)
and ``perform_search`` (``rag.py:65-90``) as one declarative plan each —
the per-row Python loop of the reference (``rag.py:46-49``) becomes a
columnar expression; the real sentence-transformers model stays behind the
pluggable embedder interface in pipeline/embedder.py (SURVEY.md §5.3:
correctness tests never depend on model weights).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emails_to_vector_db_spark.functions.text import md5_long, tokens
from emails_to_vector_db_spark.plans.registry import register
from emails_to_vector_db_spark.sources.tables import load_table

_TEMPLATE_ORACLE = """
SELECT p_partkey,
       p_name || ', type: ' || p_type || ', brand: ' || p_brand
              || ', price: ' || printf('%.2f', p_retailprice) || '$' AS content,
       md5(p_name || ', type: ' || p_type || ', brand: ' || p_brand
              || ', price: ' || printf('%.2f', p_retailprice) || '$') AS content_fp
FROM part
"""


@register("product_content_template", oracle=_TEMPLATE_ORACLE, tags=("pipeline", "P2"))
def product_content_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retrieval-document template projection (reference ``rag.py:48``:
    f-string over product attributes) as a columnar format_string — the
    first stage of the embed-and-store pipeline, over the ``part`` table."""
    p = load_table(spark, sf_dir, "part")
    content = F.format_string(
        "%s, type: %s, brand: %s, price: %.2f$",
        F.col("p_name"),
        F.col("p_type"),
        F.col("p_brand"),
        F.col("p_retailprice"),
    )
    return p.select(
        "p_partkey",
        content.alias("content"),
        F.md5(content).alias("content_fp"),
    )


def _intent_oracle() -> str:
    from emails_to_vector_db_spark.pipeline.rag import (
        _ADVICE_WORDS,
        _PRODUCT_WORDS,
    )

    adv = ", ".join(f"'{w}'" for w in _ADVICE_WORDS)
    prod = ", ".join(f"'{w}'" for w in _PRODUCT_WORDS)
    return f"""
WITH t AS (
    SELECT doc_id,
           regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
    FROM documents WHERE doc_id < 500
),
flags AS (
    SELECT doc_id,
           len(list_filter(toks, x -> x IN ({adv})))  > 0 AS has_advice,
           len(list_filter(toks, x -> x IN ({prod}))) > 0 AS has_product
    FROM t
)
SELECT CASE WHEN has_advice AND has_product THEN 'mixed'
            WHEN has_advice THEN 'niche_advice'
            ELSE 'product_search' END AS intent,
       count(*)::BIGINT AS n_queries
FROM flags
GROUP BY 1
"""


@register("intent_routing_counts", oracle=_intent_oracle(), tags=("rag", "U2", "F6"))
def intent_routing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intent classification (U2) as a declarative column expression over a
    column of query texts — the routed-retrieval gate of the reference's
    chat loop (``rag.py:183-191``) with the deterministic rule classifier,
    aggregated to a routing histogram."""
    from emails_to_vector_db_spark.pipeline.rag import classify_intent_expr

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    return (
        d.select(classify_intent_expr("text").alias("intent"))
        .groupBy("intent")
        .agg(F.count(F.lit(1)).alias("n_queries"))
    )


_DIM = 16
_PROBE_DOC = 3
_TOKENS_SQL = "regexp_split_to_array(trim(text), '\\s+')"

_HASH_EMBED_ORACLE = f"""
WITH hashed AS (
    SELECT doc_id,
           list_transform({_TOKENS_SQL},
               t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % {_DIM}) AS hl
    FROM documents
),
emb AS (
    SELECT doc_id,
           list_transform(generate_series(0, {_DIM - 1}),
               j -> len(list_filter(hl, h -> h = j))::DOUBLE
                    / greatest(len(hl), 1)) AS e
    FROM hashed
),
probe AS (SELECT e AS q FROM emb WHERE doc_id = {_PROBE_DOC})
SELECT emb.doc_id,
       round(list_distance(emb.e, p.q), 6) AS distance
FROM emb CROSS JOIN probe p
WHERE emb.doc_id <> {_PROBE_DOC}
ORDER BY list_distance(emb.e, p.q) ASC, emb.doc_id ASC
LIMIT 10
"""


@register("hash_embed_knn", oracle=_HASH_EMBED_ORACLE, tags=("pipeline", "vector", "U1"), bench=True)
def hash_embed_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end embed→search parity: a deterministic 16-dim hashing
    embedder (token → md5 bucket, count-normalized — the test stand-in for
    sentence-transformers, SURVEY.md §5.3) over documents, then exact L2
    top-10 for a stored probe document (reference ``rag.py:65-90``).

    The whole pipeline — tokenize, embed, distance, top-k — is one
    declarative plan with zero Python boundary.
    """
    d = load_table(spark, sf_dir, "documents")
    # Stage 1: hash every token ONCE (one md5 pass); the hl column is
    # referenced _DIM times below, so CollapseProject keeps it materialized.
    hashed = d.select(
        "doc_id",
        F.transform(tokens("text"), lambda t: md5_long(t) % _DIM).alias("hl"),
    )
    embed = F.transform(
        F.sequence(F.lit(0), F.lit(_DIM - 1)),
        lambda j: F.size(F.filter("hl", lambda h: h == j))
        / F.greatest(F.size("hl"), F.lit(1)),
    )
    emb = hashed.select("doc_id", embed.alias("e"))
    probe = F.broadcast(
        emb.where(F.col("doc_id") == _PROBE_DOC).select(F.col("e").alias("q"))
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with("e", "q", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return (
        emb.where(F.col("doc_id") != _PROBE_DOC)
        .crossJoin(probe)
        .withColumn("dist_raw", dist)
        .orderBy(F.col("dist_raw").asc(), F.col("doc_id").asc())
        .limit(10)
        .select("doc_id", F.round("dist_raw", 6).alias("distance"))
    )
