"""Driver-visible ingestion queries: the email/MIME and multimodal paths
as registry entries. Neither is SQL-expressible (stdlib MIME parsing,
mapInPandas feature extraction), so the driver records rows-only checks;
the full behavioral assertions live in tests/test_pipeline.py and
tests/test_rag_multimodal.py.

Both are deterministic end-to-end: synthetic fixtures are generated
inside the query from fixed seeds/ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emails_to_vector_db_spark.plans.registry import register


@register("email_ingest_text_stats", oracle=None, tags=("email", "ingest", "U4", "P7"))
def email_ingest_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's email pipeline (``email_fetching.py:30-51``) end to
    end on the synthetic MIME corpus: parse UDF → text/plain explode/
    filter → order-preserving re-concat → non-empty filter → per-message
    text stats. (sf_dir unused: the corpus is generated, not scaled.)"""
    from emails_to_vector_db_spark.sources.emails import (
        extract_plain_text,
        synthetic_emails,
    )

    raw = synthetic_emails(spark, n=40)
    texts = extract_plain_text(raw)
    return texts.select(
        "msg_id",
        F.length("text").alias("n_chars"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
    )


@register("multimodal_feature_stats", oracle=None, tags=("multimodal", "mapInPandas"))
def multimodal_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column plumbing through the driver contract: synthetic
    binary media → mapInPandas feature extraction (deterministic
    byte-histogram stand-in for a real decoder) → per-modality stats."""
    from emails_to_vector_db_spark.sources.multimodal import (
        extract_features,
        synthetic_media,
    )

    media = synthetic_media(spark, n=48)
    feats = extract_features(media, dim=16)
    return feats.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg(F.element_at("feature", 1)), 6).alias("avg_f0"),
    )
