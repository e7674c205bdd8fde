"""Tokenizer-training queries: distributed BPE merge learning and
native-expression BPE segmentation.

The reference repo never trains a tokenizer — it inherits the WordPiece
vocab baked into its sentence-transformers checkpoint (``rag.py:27,49``).
A corpus-scale pipeline has to produce that artifact itself, and BPE
training has the best-understood distributed shape of any preprocessing
job: ONE corpus-scale word-histogram shuffle, then per-merge iterations
over the tiny (distinct-word, count) table. See operators/bpe.py for the
trainer; these queries put both the training loop and the inference
(segmentation) pass under the driver's DuckDB oracle gate.

Oracle construction: BPE's argmax-per-iteration loop is not expressible
in one ANSI-SQL statement, so the oracle follows the multimodal-fixture
precedent (plans/ingest.py) — an INDEPENDENT sequential implementation
(plain-Python Counter loop, Sennrich-style; operators/bpe.py::
learn_bpe_merges_driver / segment_word) is materialized once as a
parquet fixture over the driver's correctness corpus (sf0.01 documents)
and the oracle SELECTs it. The Spark lane shares no execution code with
that reference: merges are learned by per-iteration DataFrame
aggregations and applied by native ``aggregate`` array folds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from emails_to_vector_db_spark.operators.bpe import (
    _apply_merge,
    _initial_symbols,
    learn_bpe_merges_distributed,
    word_histogram,
)
from emails_to_vector_db_spark.plans.registry import register
from emails_to_vector_db_spark.sources.fixtures import (
    FIXTURE_BPE_MERGES,
    ensure_fixtures,
)
from emails_to_vector_db_spark.sources.tables import load_table

_FIXTURES = ensure_fixtures()

_MERGES_ORACLE = f"""
SELECT merge_rank, left_sym, right_sym, pair_count
FROM read_parquet('{_FIXTURES["bpe_merges_ref"]}')
"""


@register(
    "bpe_merge_learning",
    oracle=_MERGES_ORACLE,
    tags=("tokenizer", "bpe", "iterative"),
)
def bpe_merge_learning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first {n} BPE merges over ``documents.text`` with the
    DISTRIBUTED trainer: wordcount histogram (the only corpus-scale
    pass), then per-merge pair-explode → weighted count →
    TakeOrderedAndProject(1) argmax → native array-fold merge, histogram
    re-cached per round with lineage cut. The driver-side Counter loop
    that would normally serve this corpus size (see
    learn_bpe_merges' cutover) is exactly what the fixture oracle ran —
    so this query differentially proves the Spark iteration against the
    sequential algorithm.
    """
    docs = load_table(spark, sf_dir, "documents")
    merges = learn_bpe_merges_distributed(
        word_histogram(docs), FIXTURE_BPE_MERGES
    )
    schema = T.StructType(
        [
            T.StructField("merge_rank", T.LongType(), False),
            T.StructField("left_sym", T.StringType(), False),
            T.StructField("right_sym", T.StringType(), False),
            T.StructField("pair_count", T.LongType(), False),
        ]
    )
    return spark.createDataFrame(
        [(int(r), l, rt, int(c)) for r, l, rt, c in merges], schema
    )


def _fixture_merges() -> list[tuple[str, str]]:
    """The persisted tokenizer artifact: rank-ordered merge pairs from
    the fixture (reference-trained over the sf0.01 corpus) — loaded via
    pyarrow at import, no Spark session, mirroring how the IVF queries
    load their persisted quantizer (plans/vector.py)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        _FIXTURES["bpe_merges_ref"], columns=["merge_rank", "left_sym", "right_sym"]
    ).sort_by("merge_rank")
    d = t.to_pydict()
    return list(zip(d["left_sym"], d["right_sym"]))


_SEGMENT_ORACLE = f"""
SELECT doc_id, n_words, n_tokens, max_word_tokens
FROM read_parquet('{_FIXTURES["bpe_segment_ref"]}')
"""


@register(
    "bpe_segmentation_stats",
    oracle=_SEGMENT_ORACLE,
    tags=("tokenizer", "bpe", "native-fold"),
    bench=True,
)
def bpe_segmentation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE inference as PURE Catalyst expressions, with the fold work
    paid per DISTINCT word, not per occurrence: higher-order-function
    folds are interpreted (not codegen'd), so applying 12 chained
    merges to every word occurrence would burn corpus-scale CPU on
    vocabulary-scale work. Instead: per-doc word occurrence counts
    (one shuffle), the distinct vocabulary segmented through the
    native ``aggregate`` fold chain (tiny — distinct words, the same
    cardinality argument as BPE training itself), token lengths
    broadcast-joined back onto the occurrence table, then one weighted
    per-doc aggregation. Measured 18.4s → ~1s at sf0.1; at 100 TB the
    fold cost stays bounded by vocabulary size while the corpus-scale
    passes are a wordcount and a broadcast hash join.

    Per-doc outputs: word count, BPE token count, worst-case
    tokens-per-word. The oracle is the sequential ``segment_word``
    applied by the fixture writer — a genuinely different execution of
    the same merge table.
    """
    return _per_doc_bpe_stats(spark, sf_dir)


def _per_doc_bpe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_words, n_tokens, max_word_tokens) via the
    distinct-vocabulary fold pipeline — shared by the per-doc query
    above and the per-language fertility rollup below."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode_outer(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("word"),
    )
    occ = words.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).alias("occ")
    )
    vocab = (
        occ.where(F.col("word").isNotNull()).select("word").distinct()
    ).withColumn("syms", _initial_symbols())
    for left, right in _fixture_merges():
        vocab = vocab.withColumn("syms", _apply_merge("syms", left, right))
    seg = vocab.select("word", F.size("syms").alias("tok_len"))
    joined = occ.join(F.broadcast(seg), "word", "left")
    return joined.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("word").isNotNull(), F.col("occ")).otherwise(0)
        )
        .cast("long")
        .alias("n_words"),
        F.sum(F.coalesce(F.col("occ") * F.col("tok_len"), F.lit(0)))
        .cast("long")
        .alias("n_tokens"),
        F.max(F.coalesce(F.col("tok_len"), F.lit(0)))
        .cast("long")
        .alias("max_word_tokens"),
    )


_FERTILITY_ORACLE = f"""
SELECT d.lang,
       count(*)::BIGINT AS n_docs,
       sum(r.n_words)::BIGINT AS total_words,
       sum(r.n_tokens)::BIGINT AS total_tokens,
       round(sum(r.n_tokens) / sum(r.n_words)::DOUBLE, 6) AS fertility,
       max(r.max_word_tokens)::BIGINT AS worst_word_tokens
FROM read_parquet('{_FIXTURES["bpe_segment_ref"]}') r
JOIN documents d ON d.doc_id = r.doc_id
GROUP BY d.lang
"""


@register(
    "bpe_fertility_by_lang",
    oracle=_FERTILITY_ORACLE,
    tags=("tokenizer", "bpe", "eval"),
)
def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY per language (BPE tokens per word) — the
    standard multilingual-tokenizer evaluation metric: a vocabulary
    trained on a mixed corpus compresses majority languages better,
    and this table quantifies exactly how much worse the tail pays
    (the basis of vocabulary-size and data-mixing decisions).

    Spark side re-runs the LIVE distinct-vocabulary fold segmentation
    (shared with bpe_segmentation_stats) and rolls up per language;
    the oracle aggregates the sequential reference segmentation —
    so the differential check covers inference AND rollup.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    per_doc = _per_doc_bpe_stats(spark, sf_dir)
    return (
        per_doc.join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(
                F.sum("n_tokens") / F.sum("n_words").cast("double"), 6
            ).alias("fertility"),
            F.max("max_word_tokens").alias("worst_word_tokens"),
        )
    )
