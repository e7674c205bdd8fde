"""End-to-end curation pipeline as ONE composed plan: redact → exact
dedup → quality gate → deterministic split → per-split token stats.

Every stage already exists as an individually-checked operator
(plans/cleaning.py, plans/dedup.py); the point of THIS query is the
COMPOSITION — a real curation run chains them, and chaining is where
engines rot (a stage materializes, a shuffle duplicates, a filter stops
pushing down). The whole five-stage pipeline is declared lazily, so
Catalyst sees one tree: the PII regex and quality features fuse into
the scan projection, the dedup groupBy is the single corpus-scale
shuffle, and the split + stats ride the dedup output.

The DuckDB oracle replays all five stages as one CTE chain — the
composition is hash-checked end-to-end, not stage-by-stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emails_to_vector_db_spark.functions import text as TX
from emails_to_vector_db_spark.plans.registry import register
from emails_to_vector_db_spark.sources.tables import load_table

_MIN_TOKENS = 20  # quality gate: drop stubs
_MAX_PUNCT_FRAC = 0.10  # and punctuation-noise docs
_SPLIT_SALT = "curate-v1"
_DUP_OFFSET = 100_000
_N_PLANT = 50

_PIPELINE_ORACLE = f"""
WITH raw AS (
    SELECT doc_id, text, lang FROM documents
    UNION ALL
    SELECT doc_id + {_DUP_OFFSET}, text, lang
    FROM documents WHERE doc_id < {_N_PLANT}
),
redacted AS (
    SELECT doc_id, lang,
           regexp_replace(
               regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
                   '<EMAIL>', 'g'),
               '\\b\\d{{3}}-\\d{{3}}-\\d{{4}}\\b', '<PHONE>', 'g') AS text
    FROM raw
),
fp AS (
    SELECT doc_id, lang, text,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM redacted
),
deduped AS (
    SELECT fp, min(doc_id) AS doc_id,
           min_by(text, doc_id) AS text, min_by(lang, doc_id) AS lang
    FROM fp GROUP BY fp
),
gated AS (
    SELECT doc_id, lang, text,
           len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
    FROM deduped
    WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= {_MIN_TOKENS}
      AND length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
            <= {_MAX_PUNCT_FRAC} * length(text)
),
split AS (
    SELECT doc_id, lang, n_tokens,
           CASE
             WHEN ('0x' || substr(md5('{_SPLIT_SALT}|' || doc_id), 1, 15))::BIGINT
                  % 10 < 8 THEN 'train'
             WHEN ('0x' || substr(md5('{_SPLIT_SALT}|' || doc_id), 1, 15))::BIGINT
                  % 10 = 8 THEN 'val'
             ELSE 'test'
           END AS split
    FROM gated
)
SELECT split, lang,
       count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens,
       round(avg(n_tokens), 6) AS avg_tokens
FROM split
GROUP BY split, lang
"""


@register(
    "curation_pipeline_e2e",
    oracle=_PIPELINE_ORACLE,
    tags=("cleaning", "pipeline", "dedup", "e2e"),
    bench=True,
)
def curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five curation stages composed into one lazy plan: (1) PII
    redaction (email + phone regexes, per-row — fuses into the scan),
    (2) exact dedup on the normalized-text fingerprint keeping the
    min-id survivor (the single corpus-scale shuffle; min_by carries
    the payload through the same aggregate), (3) quality gate (token
    floor + punctuation-noise ceiling — evaluated on the REDACTED
    text, the order a real pipeline uses), (4) salted-md5 80/10/10
    split, (5) per-(split, lang) token accounting. Planted duplicate
    copies prove stage 2 fires inside the composition.

    At 100 TB: stages 1, 3, 4 are pure row expressions (zero shuffle);
    the dedup groupBy and the final tiny stats aggregation are the only
    exchanges — chaining adds NOTHING over the dedup operator alone,
    which is the property this query pins.
    """
    d = load_table(spark, sf_dir, "documents")
    raw = d.select("doc_id", "text", "lang").unionByName(
        d.where(F.col("doc_id") < _N_PLANT).select(
            (F.col("doc_id") + _DUP_OFFSET).alias("doc_id"), "text", "lang"
        )
    )
    redacted = raw.withColumn(
        "text",
        F.regexp_replace(
            F.regexp_replace(
                F.col("text"),
                r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
                "<EMAIL>",
            ),
            r"\b\d{3}-\d{3}-\d{4}\b",
            "<PHONE>",
        ),
    )
    deduped = (
        redacted.withColumn("fp", TX.fingerprint("text"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("text", "doc_id").alias("text"),
            F.min_by("lang", "doc_id").alias("lang"),
        )
    )
    n_tokens = F.size(TX.tokens("text"))
    punct_len = F.length(F.regexp_replace("text", r"[^.,!?;:]", ""))
    gated = deduped.where(
        (n_tokens >= _MIN_TOKENS)
        & (punct_len <= _MAX_PUNCT_FRAC * F.length("text"))
    ).select("doc_id", "lang", n_tokens.alias("n_tokens"))
    bucket = TX.md5_long(
        F.concat(F.lit(f"{_SPLIT_SALT}|"), F.col("doc_id"))
    ) % 10
    split = gated.withColumn(
        "split",
        F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise(
            "test"
        ),
    )
    return split.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
    )
