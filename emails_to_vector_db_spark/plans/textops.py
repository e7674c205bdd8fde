"""Text-analysis queries over the ``documents`` table: token statistics,
quality scoring, language-ID heuristic, fingerprinting, term frequency.

These are the training-data-pipeline operators the north star adds beyond
the reference's surface. Every expression is JVM-native (no UDFs) with an
exact DuckDB twin; see functions/text.py.

Portability notes baked into the oracles:
- tokenization: ``regexp_split_to_array(trim(text), '\\s+')`` ≡
  ``F.split(F.trim(text), r'\\s+')``
- token hash:  ``('0x' || substr(md5(t), 1, 15))::BIGINT`` ≡
  ``F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast('long')``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emails_to_vector_db_spark.functions import text as TX
from emails_to_vector_db_spark.plans.registry import register
from emails_to_vector_db_spark.sources.tables import load_table

_TOKENS_SQL = "regexp_split_to_array(trim(text), '\\s+')"

_STATS_ORACLE = f"""
WITH t AS (
    SELECT lang, source, {_TOKENS_SQL} AS toks, length(text) AS n_chars
    FROM documents
)
SELECT lang, source,
       count(*)::BIGINT                 AS n_docs,
       sum(len(toks))::BIGINT           AS total_tokens,
       round(avg(len(toks)), 6)         AS avg_tokens,
       round(avg(n_chars), 6)           AS avg_chars
FROM t
GROUP BY lang, source
"""


@register("doc_token_stats", oracle=_STATS_ORACLE, tags=("text", "agg"), bench=True)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer) aggregated per (lang, source)."""
    d = load_table(spark, sf_dir, "documents")
    tok = TX.tokens("text")
    return (
        d.select("lang", "source", F.size(tok).alias("n_tok"), F.length("text").alias("n_chars"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.round(F.avg("n_tok"), 6).alias("avg_tokens"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
    )


_EN = TX.LANG_STOPWORDS["en"]
_EN_SQL = ", ".join(f"'{w}'" for w in _EN)

_QUALITY_ORACLE = f"""
WITH t AS (
    SELECT doc_id, {_TOKENS_SQL} AS toks, text FROM documents
),
m AS (
    SELECT doc_id,
           len(toks) AS n_tok,
           len(list_filter(toks, x -> x IN ({_EN_SQL})))::DOUBLE
               / greatest(len(toks), 1) AS stop_ratio,
           length(regexp_replace(text, '[^.,!?;:''"()\\[\\]{{}}-]', '', 'g'))::DOUBLE
               / greatest(length(text), 1) AS punct_ratio
    FROM t
)
SELECT doc_id,
       n_tok::INT AS n_tok,
       round(stop_ratio, 6)  AS stop_ratio,
       round(punct_ratio, 6) AS punct_ratio,
       round(least(n_tok / 100.0, 1.0) * 0.4
             + least(stop_ratio * 5.0, 1.0) * 0.4
             + (1.0 - least(punct_ratio * 4.0, 1.0)) * 0.2, 6) AS quality
FROM m
"""


@register(
    "doc_quality_scores",
    oracle=_QUALITY_ORACLE,
    tags=("text", "quality"),
    bench=True,
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring: length / stopword-ratio / punctuation
    components (the composite formula of functions.text.quality_score)."""
    d = load_table(spark, sf_dir, "documents")
    tok = TX.tokens("text")
    d = d.select(
        "doc_id",
        F.size(tok).alias("n_tok"),
        TX.stopword_ratio(tok, _EN).alias("stop_ratio_raw"),
        TX.punct_ratio("text").alias("punct_ratio_raw"),
    )
    quality = (
        F.least(F.col("n_tok") / 100.0, F.lit(1.0)) * 0.4
        + F.least(F.col("stop_ratio_raw") * 5.0, F.lit(1.0)) * 0.4
        + (1.0 - F.least(F.col("punct_ratio_raw") * 4.0, F.lit(1.0))) * 0.2
    )
    return d.select(
        "doc_id",
        F.col("n_tok").cast("int").alias("n_tok"),
        F.round("stop_ratio_raw", 6).alias("stop_ratio"),
        F.round("punct_ratio_raw", 6).alias("punct_ratio"),
        F.round(quality, 6).alias("quality"),
    )


_LANG_CASES_SQL = "\n".join(
    f"           len(list_filter(toks, x -> x IN ({', '.join(repr(w) for w in ws)})))::DOUBLE"
    f" / greatest(len(toks), 1) AS score_{lang},"
    for lang, ws in TX.LANG_STOPWORDS.items()
).rstrip(",")

_LANGID_ORACLE = f"""
WITH t AS (
    SELECT doc_id, lang AS actual_lang, {_TOKENS_SQL} AS toks FROM documents
),
scored AS (
    SELECT doc_id, actual_lang,
{_LANG_CASES_SQL}
    FROM t
),
pred AS (
    SELECT actual_lang,
           CASE WHEN greatest(score_en, score_fr, score_es, score_de) = 0 THEN 'und'
                WHEN score_en >= greatest(score_fr, score_es, score_de) THEN 'en'
                WHEN score_fr >= greatest(score_es, score_de) THEN 'fr'
                WHEN score_es >= score_de THEN 'es'
                ELSE 'de' END AS predicted_lang
    FROM scored
)
SELECT actual_lang, predicted_lang, count(*)::BIGINT AS n_docs
FROM pred GROUP BY 1, 2
"""


@register(
    "lang_id_confusion",
    oracle=_LANGID_ORACLE,
    tags=("text", "langid"),
    bench=True,
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language-ID heuristic, reported as a confusion matrix
    against the fixture's lang column. Deterministic tiebreak: en>fr>es>de,
    'und' when no stopwords hit.

    ROUND-11 (r10 verdict task 3): the four per-language scores are now
    ``regexp_count`` over the raw text with whitespace-boundary
    lookarounds ``(?<!\\S)(word|…)(?!\\S)`` — a token of the \\s+ split
    matches a stopword iff that bounded occurrence matches, so the
    count is EXACTLY ``size(filter(tokens, isin(stopwords)))`` — but
    evaluated inside whole-stage codegen instead of the interpreted
    per-token higher-order fold × 4 languages that made this query the
    one corpus-composition-sensitive bench mover (r9→r10 triage:
    0.47→0.82s tracked per-doc token counts). One scan, one exchange
    (the final confusion-matrix groupBy), budget unchanged."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.greatest(F.size(TX.tokens("text")), F.lit(1))
    scored = d.select(
        F.col("lang").alias("actual_lang"),
        *[
            (
                F.regexp_count(
                    "text",
                    F.lit("(?<!\\S)(?:" + "|".join(ws) + ")(?!\\S)"),
                )
                / n_tok
            ).alias(f"score_{lang}")
            for lang, ws in TX.LANG_STOPWORDS.items()
        ],
    )
    best = F.greatest(*[F.col(f"score_{l}") for l in TX.LANG_STOPWORDS])
    pred = (
        F.when(best == 0, F.lit("und"))
        .when(F.col("score_en") >= F.greatest("score_fr", "score_es", "score_de"), F.lit("en"))
        .when(F.col("score_fr") >= F.greatest("score_es", "score_de"), F.lit("fr"))
        .when(F.col("score_es") >= F.col("score_de"), F.lit("es"))
        .otherwise(F.lit("de"))
    )
    return (
        scored.withColumn("predicted_lang", pred)
        .groupBy("actual_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_FP_ORACLE = """
SELECT source,
       count(*)::BIGINT AS n_docs,
       count(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))))::BIGINT
           AS n_distinct_fingerprints
FROM documents
GROUP BY source
"""


@register("doc_fingerprints", oracle=_FP_ORACLE, tags=("text", "fingerprint", "dedup"))
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (md5 of normalized text) + distinct count
    per source — the exact-dedup cardinality check."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(TX.fingerprint("text")).alias("n_distinct_fingerprints"),
    )


_TF_ORACLE = """
WITH tok AS (
    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
    FROM documents
)
SELECT term, count(*)::BIGINT AS freq
FROM tok
GROUP BY term
ORDER BY freq DESC, term ASC
LIMIT 20
"""


@register("term_frequency_top20", oracle=_TF_ORACLE, tags=("text", "agg", "topk"))
def term_frequency_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global term frequency top-20 (explode → partial agg → top-k). The
    classic wordcount: map-side combine keeps the shuffle tiny even at
    100 TB; top-k is TakeOrderedAndProject."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(TX.tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("term").asc())
        .limit(20)
    )


_CONTEXT_ORACLE = """
SELECT source,
       count(*)::BIGINT AS n_docs,
       string_agg(substr(text, 1, 30), chr(10) || chr(10) ORDER BY doc_id) AS context
FROM documents
WHERE doc_id < 60
GROUP BY source
"""


@register("context_assembly_per_source", oracle=_CONTEXT_ORACLE, tags=("text", "agg", "A2"))
def context_assembly_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: ordered string aggregation — the reference's
    ``"\\n\\n".join(documents)`` context assembly (``rag.py:189``) as
    concat_ws over an order-restoring collect_list (collect_list alone is
    partition-order nondeterministic; sort structs first)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 60)
    snip = F.substring("text", 1, 30)
    return (
        d.select("source", "doc_id", snip.alias("snip"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.concat_ws(
                "\n\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "snip"))),
                    lambda s: s.getField("snip"),
                ),
            ).alias("context"),
        )
    )


_SHINGLE_ORACLE = f"""
WITH t AS (
    SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents WHERE doc_id < 100
)
SELECT doc_id,
       len(toks)::INT AS n_tokens,
       len(list_distinct(CASE WHEN len(toks) < 3 THEN []::VARCHAR[]
           ELSE list_transform(generate_series(1, len(toks) - 2),
                i -> array_to_string(toks[i:i+2], ' ')) END))::INT AS n_distinct_shingles
FROM t
"""


@register("shingle_cardinality", oracle=_SHINGLE_ORACLE, tags=("text", "shingles"))
def shingle_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram shingle set cardinality per document (the MinHash input)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    tok = TX.tokens("text")
    return d.select(
        "doc_id",
        F.size(tok).cast("int").alias("n_tokens"),
        F.size(F.array_distinct(TX.shingles(tok, 3))).cast("int").alias(
            "n_distinct_shingles"
        ),
    )


_HH_ORACLE = f"""
WITH t AS (
    SELECT unnest({_TOKENS_SQL}) AS term FROM documents
)
SELECT term, count(*)::BIGINT AS freq
FROM t GROUP BY term
ORDER BY freq DESC, term ASC
LIMIT 20
"""


@register(
    "heavy_hitter_terms",
    oracle=_HH_ORACLE,
    tags=("text", "heavy-hitters", "mapInPandas"),
    bench=True,
)
def heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-20 terms via the bounded-memory heavy-hitters operator
    (operators/heavyhitters.py): per-partition Misra-Gries candidate
    generation (no shuffle of the distinct-term space), then an exact
    broadcast-filtered rescoring pass. The oracle is the plain GROUP BY
    top-20 — a hash match proves the sketch+rescore pipeline exact at
    this capacity (256 ≫ corpus vocabulary), and the guarantee that makes
    that hold at 100 TB is documented on the operator."""
    from emails_to_vector_db_spark.operators.heavyhitters import heavy_hitters

    d = load_table(spark, sf_dir, "documents")
    terms = d.select(F.explode(TX.tokens("text")).alias("item"))
    return heavy_hitters(terms, k=20, capacity=256).select(
        F.col("item").alias("term"), "freq"
    )


# ---------------------------------------------------------------------------
# Tokenizer-economics audit: bytes per token by (source, lang)
# ---------------------------------------------------------------------------

_BPT_ORACLE = """
SELECT source, lang,
       count(*)::BIGINT AS n_docs,
       sum(strlen(text))::BIGINT AS total_bytes,
       sum(len(regexp_split_to_array(trim(text), '\\s+')))::BIGINT
           AS total_tokens,
       round(sum(strlen(text))
             / sum(len(regexp_split_to_array(trim(text), '\\s+')))::DOUBLE,
             6) AS bytes_per_token
FROM documents
GROUP BY source, lang
"""


@register(
    "bytes_per_token_by_source",
    oracle=_BPT_ORACLE,
    tags=("text", "tokenizer", "audit"),
    bench=True,
)
def bytes_per_token_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer economics per (source, lang): bytes of raw text per
    whitespace token — the compression-ratio table a training budget is
    priced from (a source whose bytes/token is 2× the corpus mean costs
    2× the storage and bandwidth per training token; per-language BPE
    fertility lives in bpe_fertility_by_lang, this is its raw-byte
    counterpart).

    Plan: pure scan projections into one map-side-combinable
    (source, lang) aggregate — zero joins, one shuffle of cell rows."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.octet_length("text")).alias("total_bytes"),
        F.sum(n_tok).alias("total_tokens"),
        F.round(
            F.sum(F.octet_length("text"))
            / F.sum(n_tok).cast("double"),
            6,
        ).alias("bytes_per_token"),
    )


# ---------------------------------------------------------------------------
# Unicode normalization hygiene: NFC + accent folding over planted text
# ---------------------------------------------------------------------------

# Deterministic plants exercising both lanes on the all-ASCII fixture:
# a DECOMPOSED accent (e + U+0301 — NFC recomposes it, 1 char shorter)
# and a PRECOMPOSED one (U+00E9 — NFC-stable, accent folding changes
# it). Identical literals on both sides.
_UNI_DECOMPOSED = " caf" + "e\u0301"
_UNI_PRECOMPOSED = " caf\u00e9"

_UNICODE_ORACLE = f"""
WITH planted AS (
    SELECT source,
           CASE WHEN doc_id % 25 = 0 THEN text || '{_UNI_DECOMPOSED}'
                WHEN doc_id % 25 = 5 THEN text || '{_UNI_PRECOMPOSED}'
                ELSE text END AS t
    FROM documents
),
norm AS (
    SELECT source, t,
           nfc_normalize(t) AS t_nfc,
           strip_accents(t) AS t_fold
    FROM planted
)
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN t_nfc <> t THEN 1 ELSE 0 END)::BIGINT
           AS n_changed_nfc,
       sum(length(t) - length(t_nfc))::BIGINT AS nfc_char_delta,
       sum(CASE WHEN t_fold <> t THEN 1 ELSE 0 END)::BIGINT
           AS n_changed_fold
FROM norm
GROUP BY source
"""


@register(
    "unicode_normalization_stats",
    oracle=_UNICODE_ORACLE,
    tags=("text", "multilingual", "curation", "pandas_udf"),
)
def unicode_normalization_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Unicode text hygiene for a multilingual corpus: NFC
    canonicalization (decomposed accent sequences recompose — without
    it, 'café' and 'cafe\\u0301' hash as DIFFERENT documents and every
    exact-dedup/fingerprint lane silently misses the pair) and accent
    folding (the search-side analyzer normalization), reported as
    per-source changed-document counts and character deltas. The
    fixture is pure ASCII, so deterministic plants (one decomposed,
    one precomposed) prove both lanes actually fire.

    Plan shape: Spark has no built-in NFC, so normalization runs in
    the Arrow lane — one pandas_udf per form, unicodedata inside,
    scan-local, zero shuffles before the per-source aggregate; DuckDB's
    native nfc_normalize/strip_accents replay it for the hash check
    (cross-IMPLEMENTATION differential: ICU-style C++ vs Python
    unicodedata agreeing byte-for-byte is the test)."""
    def _nfc_fn(col):
        import unicodedata

        return col.map(lambda t: unicodedata.normalize("NFC", t))

    def _fold_fn(col):
        import unicodedata

        def _strip(t: str) -> str:
            return "".join(
                c
                for c in unicodedata.normalize("NFD", t)
                if not unicodedata.combining(c)
            )

        return col.map(_strip)

    nfc = F.pandas_udf(_nfc_fn, "string")
    fold = F.pandas_udf(_fold_fn, "string")

    d = load_table(spark, sf_dir, "documents")
    t = (
        F.when(
            F.col("doc_id") % 25 == 0,
            F.concat(F.col("text"), F.lit(_UNI_DECOMPOSED)),
        )
        .when(
            F.col("doc_id") % 25 == 5,
            F.concat(F.col("text"), F.lit(_UNI_PRECOMPOSED)),
        )
        .otherwise(F.col("text"))
    )
    norm = d.select("source", t.alias("t")).select(
        "source",
        "t",
        nfc(F.col("t")).alias("t_nfc"),
        fold(F.col("t")).alias("t_fold"),
    )
    return norm.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("t_nfc") != F.col("t"), 1).otherwise(0)
        ).alias("n_changed_nfc"),
        F.sum(F.length("t") - F.length("t_nfc")).alias("nfc_char_delta"),
        F.sum(
            F.when(F.col("t_fold") != F.col("t"), 1).otherwise(0)
        ).alias("n_changed_fold"),
    )


# ---------------------------------------------------------------------------
# Language-purity audit: documents with signals from multiple languages
# ---------------------------------------------------------------------------

_PURITY_MIN_HITS = 2

_PURITY_CASES_SQL = "\n".join(
    f"           len(list_filter(toks, x -> x IN"
    f" ({', '.join(repr(w) for w in ws)}))) AS hits_{lang},"
    for lang, ws in TX.LANG_STOPWORDS.items()
).rstrip(",")

_PURITY_ORACLE = f"""
WITH t AS (
    SELECT doc_id, lang, {_TOKENS_SQL} AS toks FROM documents
),
scored AS (
    SELECT doc_id, lang,
{_PURITY_CASES_SQL}
    FROM t
),
flags AS (
    SELECT doc_id, lang,
           {" + ".join(f"CASE WHEN hits_{lg} >= {_PURITY_MIN_HITS} THEN 1 ELSE 0 END" for lg in TX.LANG_STOPWORDS)}
               AS n_langs_detected
    FROM scored
)
SELECT lang,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN n_langs_detected >= 2 THEN 1 ELSE 0 END)::BIGINT
           AS n_mixed,
       round(avg(CASE WHEN n_langs_detected >= 2 THEN 1.0 ELSE 0.0 END), 6)
           AS mixed_frac
FROM flags
GROUP BY lang
"""


@register(
    "language_purity_audit",
    oracle=_PURITY_ORACLE,
    tags=("text", "langid", "curation"),
)
def language_purity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-switching / mislabeling audit: documents whose stopword
    profile fires for TWO OR MORE languages (≥{_PURITY_MIN_HITS} hits
    each), rolled up per labeled language — the purity check beside
    the lang-ID confusion matrix: confusion says the classifier and
    label disagree, THIS says the document itself is mixed, which is a
    different curation action (segment-level splitting, not
    relabeling).

    Plan shape: scan-local stopword-hit counts per language family
    (array filters over the token array — the lang_id_confusion
    expression set reused), one per-language rollup. Zero shuffles
    before the 5-row aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    hit_cols = [
        F.size(F.filter(toks, lambda x: x.isin(*ws))).alias(
            f"hits_{lang}"
        )
        for lang, ws in TX.LANG_STOPWORDS.items()
    ]
    scored = docs.select("doc_id", "lang", *hit_cols)
    n_detected = None
    for lang in TX.LANG_STOPWORDS:
        flag = F.when(
            F.col(f"hits_{lang}") >= _PURITY_MIN_HITS, 1
        ).otherwise(0)
        n_detected = flag if n_detected is None else n_detected + flag
    mixed = (n_detected >= 2).cast("int")
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(mixed).cast("long").alias("n_mixed"),
        F.round(F.avg(mixed.cast("double")), 6).alias("mixed_frac"),
    )


# ---------------------------------------------------------------------------
# Filter ablation matrix: per-filter, per-source token retention
# ---------------------------------------------------------------------------

_FA_MIN_TOK = 30  # length floor (binds on ~1/4 of the fixture)
_FA_STOP_MIN = 0.04  # stopword-ratio floor (natural-language gate)
_FA_DUP2_MAX = 0.15  # the Gopher dup-2-gram ceiling (gopher_repetition)

_FA_ORACLE = f"""
WITH t AS (
    SELECT doc_id, source, {_TOKENS_SQL} AS toks FROM documents
),
g AS (
    SELECT doc_id, source, len(toks) AS n_tok,
           len(list_filter(toks, x -> x IN ({_EN_SQL})))::DOUBLE
               / greatest(len(toks), 1) AS stop_ratio,
           list_transform(generate_series(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i + 1]) AS grams
    FROM t
),
flags AS (
    SELECT source, n_tok,
           n_tok >= {_FA_MIN_TOK} AS f_len,
           stop_ratio >= {_FA_STOP_MIN} AS f_stop,
           len(list_filter(
                   list_transform(grams,
                       x -> len(list_filter(grams, y -> y = x))),
                   c -> c >= 2))::DOUBLE / greatest(len(grams), 1)
               <= {_FA_DUP2_MAX} AS f_rep
    FROM g
),
longf AS (
    SELECT source, n_tok, 'min_length' AS filter, f_len AS keep FROM flags
    UNION ALL
    SELECT source, n_tok, 'stopword_floor', f_stop FROM flags
    UNION ALL
    SELECT source, n_tok, 'repetition', f_rep FROM flags
    UNION ALL
    SELECT source, n_tok, 'all', f_len AND f_stop AND f_rep FROM flags
)
SELECT filter, source,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       round(sum(CASE WHEN keep THEN n_tok ELSE 0 END)::DOUBLE
             / greatest(sum(n_tok), 1), 6) AS token_retention
FROM longf GROUP BY filter, source
"""


@register(
    "filter_ablation_matrix",
    oracle=_FA_ORACLE,
    tags=("text", "quality", "curation", "ablation"),
    bench=True,
)
def filter_ablation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation decision table: each quality filter applied
    INDEPENDENTLY (length floor, stopword-ratio floor, the Gopher
    dup-2-gram repetition ceiling) plus their conjunction, reported as
    per-source document and TOKEN retention — before committing a
    filter stack at 100 TB you read exactly this matrix to see which
    rule costs which source how much data (a filter that silently
    deletes 40% of one source's tokens is a mixing decision, not a
    hygiene step). doc_quality_scores blends these signals into one
    number; this keeps them separate and prices them.

    Plan shape: the length/stopword flags are SCAN-LOCAL array
    expressions; the repetition flag comes from
    operators/repetition.py::bigram_repetition_stats (scan-local
    sorted-gram fold up to REP_CUTOVER_TOKENS tokens, explode census
    above — the gopher_repetition cutover, with the pushable n_chars
    guard pruning the census branch's scan); the long format is a
    4-way per-row explode; the final exchange is the (filter,
    source)-grain aggregate."""
    from emails_to_vector_db_spark.operators.repetition import (
        bigram_repetition_stats,
    )

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = d.select(
        "doc_id", "source", toks.alias("toks"), "n_chars"
    ).withColumn("stop_ratio", TX.stopword_ratio(F.col("toks"), _EN))
    stats = bigram_repetition_stats(
        base, carry=("source", "stop_ratio"), chars_col="n_chars"
    )
    dup_frac = F.col("dup_gram_slots").cast("double") / F.greatest(
        F.col("n_bi"), F.lit(1)
    )
    flags = stats.select(
        "source",
        "n_tok",
        (F.col("n_tok") >= _FA_MIN_TOK).alias("f_len"),
        (F.col("stop_ratio") >= _FA_STOP_MIN).alias("f_stop"),
        (dup_frac <= _FA_DUP2_MAX).alias("f_rep"),
    )
    longf = flags.select(
        "source",
        "n_tok",
        F.explode(
            F.array(
                F.struct(
                    F.lit("min_length").alias("filter"),
                    F.col("f_len").alias("keep"),
                ),
                F.struct(
                    F.lit("stopword_floor").alias("filter"),
                    F.col("f_stop").alias("keep"),
                ),
                F.struct(
                    F.lit("repetition").alias("filter"),
                    F.col("f_rep").alias("keep"),
                ),
                F.struct(
                    F.lit("all").alias("filter"),
                    (
                        F.col("f_len") & F.col("f_stop") & F.col("f_rep")
                    ).alias("keep"),
                ),
            )
        ).alias("e"),
    )
    return longf.groupBy(
        F.col("e.filter").alias("filter"), "source"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("e.keep").cast("long")).alias("n_kept"),
        F.round(
            F.sum(F.when(F.col("e.keep"), F.col("n_tok")).otherwise(0))
            .cast("double")
            / F.greatest(F.sum("n_tok"), F.lit(1)),
            6,
        ).alias("token_retention"),
    )
