"""Training-data cleaning operators: PII redaction, deterministic
stratified sampling, and sequence packing.

These are corpus-preparation stages a large-scale LLM training pipeline
runs after dedup/quality filtering (none exist in the reference, whose
corpus is 1,000 product rows — ``data/dummy-products.csv``). All three
are pure column-expression plans with exact DuckDB twins.

Scale notes
-----------
- PII redaction is embarrassingly parallel (per-row regexp), no shuffle.
- The stratified sample uses a deterministic md5-derived bucket, so the
  sample is reproducible across runs/engines and requires no shuffle —
  the filter is applied at scan time and pushes the per-stratum rate
  through a broadcast map.
- Sequence packing windows per (source) partition — the 100 TB shape:
  never a single global cumulative sum; each shard packs independently
  and pack ids are (source, local_pack). Skewed sources can be further
  split by salting the partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from emails_to_vector_db_spark.functions import text as TX
from emails_to_vector_db_spark.plans.registry import register
from emails_to_vector_db_spark.sources.tables import load_table

_TOKENS_SQL = "regexp_split_to_array(trim(text), '\\s+')"

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

_RE_EMAIL = r"[A-Za-z0-9._]+@[A-Za-z0-9.]+\.[A-Za-z]{2,}"
_RE_SSN = r"\d{3}-\d{2}-\d{4}"
_RE_PHONE = r"\d{3}-\d{3}-\d{4}"


def _docs_with_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plant deterministic synthetic PII into a subset of documents
    (the fixture text itself contains none): email on doc_id%7==0,
    phone on doc_id%5==0, SSN on doc_id%11==0 — overlapping moduli
    give some docs multiple PII kinds."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    email = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(F.lit(" reach user"), F.col("doc_id"), F.lit("@mail.example.com")),
    ).otherwise(F.lit(""))
    phone = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            F.lit(" call 555-"),
            F.lpad((F.col("doc_id") * 7 % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") * 13 % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    ssn = F.when(
        F.col("doc_id") % 11 == 0,
        F.concat(
            F.lit(" ssn 123-45-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    return d.select(
        "doc_id", F.concat("text", email, phone, ssn).alias("text")
    )


_PII_DOCS_SQL = """
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 7 = 0
                THEN ' reach user' || doc_id || '@mail.example.com' ELSE '' END
           || CASE WHEN doc_id % 5 = 0
                THEN ' call 555-' || lpad((doc_id * 7 % 1000)::VARCHAR, 3, '0')
                     || '-' || lpad((doc_id * 13 % 10000)::VARCHAR, 4, '0')
                ELSE '' END
           || CASE WHEN doc_id % 11 = 0
                THEN ' ssn 123-45-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                ELSE '' END AS text
    FROM documents
"""

_PII_ORACLE = f"""
WITH docs AS ({_PII_DOCS_SQL}),
counted AS (
    SELECT doc_id,
           len(regexp_extract_all(text, '{_RE_EMAIL}'))::BIGINT AS n_emails,
           len(regexp_extract_all(text, '{_RE_SSN}'))::BIGINT   AS n_ssns,
           regexp_replace(
               regexp_replace(
                   regexp_replace(text, '{_RE_EMAIL}', '[EMAIL]', 'g'),
                   '{_RE_SSN}', '[SSN]', 'g'),
               '{_RE_PHONE}', '[PHONE]', 'g') AS redacted
    FROM docs
)
SELECT doc_id, n_emails, n_ssns,
       len(regexp_extract_all(redacted, '\\[PHONE\\]'))::BIGINT AS n_phones,
       md5(redacted) AS redacted_fp
FROM counted
WHERE n_emails + n_ssns
      + len(regexp_extract_all(redacted, '\\[PHONE\\]')) > 0
"""


@register("pii_redaction", oracle=_PII_ORACLE, tags=("text", "cleaning", "pii"))
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: replace emails / SSNs / phone numbers with typed
    placeholder tokens and report per-document match counts plus the
    fingerprint of the redacted text (hash-checking the exact redaction
    output, not just the counts). SSNs are replaced before phones so the
    overlapping \\d{3}-\\d{2}/\\d{3}-\\d{3} families can't double-fire;
    phone count is taken from the placeholder occurrences for the same
    reason. Pure per-row regexp — no shuffle at any scale."""
    docs = _docs_with_pii(spark, sf_dir)
    counted = docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(_RE_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count("text", F.lit(_RE_SSN)).cast("long").alias("n_ssns"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("text", _RE_EMAIL, "[EMAIL]"),
                _RE_SSN,
                "[SSN]",
            ),
            _RE_PHONE,
            "[PHONE]",
        ).alias("redacted"),
    )
    return (
        counted.withColumn(
            "n_phones",
            F.regexp_count("redacted", F.lit(r"\[PHONE\]")).cast("long"),
        )
        .where(F.col("n_emails") + F.col("n_ssns") + F.col("n_phones") > 0)
        .select(
            "doc_id",
            "n_emails",
            "n_ssns",
            "n_phones",
            F.md5("redacted").alias("redacted_fp"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------

# Per-language keep-rate (percent of the 100 md5 buckets): downsample the
# dominant language, keep more of the tail — the classic rebalancing move.
_RATES = {"en": 10, "de": 40, "es": 40, "fr": 40, "zh": 40}

_RATES_SQL = " ".join(
    f"WHEN lang = '{lang}' THEN {rate}" for lang, rate in _RATES.items()
)

_SAMPLE_ORACLE = f"""
WITH bucketed AS (
    SELECT doc_id, lang,
           ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 AS bucket
    FROM documents
)
SELECT doc_id, lang, bucket
FROM bucketed
WHERE bucket < CASE {_RATES_SQL} ELSE 0 END
"""


@register(
    "stratified_sample",
    oracle=_SAMPLE_ORACLE,
    tags=("cleaning", "sampling"),
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified (per-language) downsampling via an
    md5-derived bucket in [0,100): en keeps 10%, tail languages 40% —
    reproducible across engines and runs (unlike ``df.sample``), applied
    as a scan-time filter with zero shuffle. The md5→BIGINT construction
    is the repo-standard portable hash (plans/textops.py)."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 100
    )
    rate = F.lit(0)
    for lang, r in _RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return (
        d.select("doc_id", "lang", bucket.alias("bucket"))
        .where(F.col("bucket") < rate)
    )


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------

_PACK_BUDGET = 512

_PACK_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, source, len({_TOKENS_SQL}) AS n_tok
    FROM documents
),
packed AS (
    SELECT source, n_tok,
           CAST(floor(
               (sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tok)
               / {_PACK_BUDGET}.0) AS BIGINT) AS pack_id
    FROM toks
)
SELECT source, pack_id,
       count(*)::BIGINT AS n_docs,
       sum(n_tok)::BIGINT AS pack_tokens
FROM packed
GROUP BY source, pack_id
"""


@register(
    "sequence_packing",
    oracle=_PACK_ORACLE,
    tags=("cleaning", "packing", "window"),
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: stream documents per source shard in
    doc_id order and open a new pack whenever the running token total
    crosses a 512-token budget (pack = floor(exclusive-prefix-sum /
    budget) — first-fit in arrival order, a doc may straddle the
    boundary and overflows into its assigned pack). The window is
    partitioned by source, so at 100 TB each shard packs independently
    — no global ordering bottleneck."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", F.size(TX.tokens("text")).alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "pack_id",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / float(_PACK_BUDGET))
        .cast("long"),
    )
    return packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("pack_tokens"),
    )


# ---------------------------------------------------------------------------
# Deterministic per-group reservoir sampling
# ---------------------------------------------------------------------------

_RESERVOIR_N = 5

_RESERVOIR_ORACLE = f"""
WITH ranked AS (
    SELECT doc_id, lang,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(doc_id::VARCHAR) ASC, doc_id ASC
           ) AS rn
    FROM documents
)
SELECT doc_id, lang, rn::INT AS rn
FROM ranked WHERE rn <= {_RESERVOIR_N}
"""


@register(
    "per_group_reservoir",
    oracle=_RESERVOIR_ORACLE,
    tags=("cleaning", "sampling", "window"),
)
def per_group_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size (n=5) per-language sample — the deterministic analogue
    of per-group reservoir sampling: rank by the md5 of the id (a
    reproducible uniform ordering) inside each stratum and keep the first
    n. One shuffle on the stratum key; at scale, rank-within-group
    truncates via the window's running row_number, never a global sort."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    return (
        d.select("doc_id", "lang")
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= _RESERVOIR_N)
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (train/eval n-gram overlap removal)
# ---------------------------------------------------------------------------

_DECON_N = 4
_EVAL_SOURCES = ("src0", "src1")
_EVAL_IN = ", ".join(f"'{s}'" for s in _EVAL_SOURCES)

_DECON_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, source, {_TOKENS_SQL} AS t FROM documents
),
sh AS (
    SELECT doc_id, source,
           unnest(list_distinct(list_transform(
               generate_series(1, len(t) - {_DECON_N - 1}),
               i -> array_to_string(t[i:i + {_DECON_N - 1}], ' ')
           ))) AS s
    FROM toks WHERE len(t) >= {_DECON_N}
),
eval_sh AS (
    SELECT DISTINCT s, doc_id AS eval_doc FROM sh
    WHERE source IN ({_EVAL_IN})
),
train_sh AS (
    SELECT doc_id, source, s FROM sh WHERE source NOT IN ({_EVAL_IN})
)
SELECT t.doc_id, t.source,
       count(DISTINCT e.eval_doc)::BIGINT AS n_eval_docs,
       count(DISTINCT t.s)::BIGINT AS n_shared_shingles
FROM train_sh t JOIN eval_sh e USING (s)
GROUP BY t.doc_id, t.source
"""


@register(
    "benchmark_decontamination",
    oracle=_DECON_ORACLE,
    tags=("text", "cleaning", "decontamination"),
    bench=True,
)
def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval overlap detection — the decontamination pass every LLM
    training pipeline runs before training: a training document is
    contaminated if it shares any {n}-token shingle with the benchmark
    ("eval") set; contaminated docs are reported with how many eval docs
    and distinct shingles they hit (the removal itself is then an
    anti-join on doc_id).

    Scale shape: the eval set is tiny and FIXED relative to the corpus
    (benchmarks are KBs; the corpus is 100 TB), so its distinct-shingle
    set is broadcast — the corpus is scanned once, shingled in place, and
    never shuffled; only per-doc hit counts aggregate. The same plan at
    n=13 (industry default for token-level decontamination) is a
    parameter change. Shingling is an interpreted higher-order-function
    stage, so the corpus is spread to full parallelism first (same rule
    as MinHash — operators/dedup.py::spread; a no-op at real scale where
    inputs arrive in thousands of splits).
    """
    from emails_to_vector_db_spark.operators.dedup import spread

    d = spread(load_table(spark, sf_dir, "documents"))
    tok = TX.tokens("text")
    sh = F.array_distinct(TX.shingles(tok, _DECON_N))
    shingled = d.select(
        "doc_id", "source", F.explode(sh).alias("s")
    )
    is_eval = F.col("source").isin(*_EVAL_SOURCES)
    eval_sh = (
        shingled.where(is_eval)
        .select("s", F.col("doc_id").alias("eval_doc"))
        .distinct()
    )
    train_sh = shingled.where(~is_eval)
    # size(collect_set) instead of two countDistinct: multi-countDistinct
    # plans an Expand (doubling the candidate stream before the shuffle);
    # the set-collect is single-pass and per-doc sets are bounded by the
    # doc's own shingle count. Measured 4.2s -> 1.2s at sf0.1.
    return (
        train_sh.join(F.broadcast(eval_sh), "s")
        .groupBy("doc_id", "source")
        .agg(
            F.size(F.collect_set("eval_doc")).cast("long").alias("n_eval_docs"),
            F.size(F.collect_set("s")).cast("long").alias("n_shared_shingles"),
        )
    )


# ---------------------------------------------------------------------------
# Intra-document repetition filter (Gopher-style quality signal)
# ---------------------------------------------------------------------------

_REP_TOK_THRESHOLD = 0.6
_REP_G2_THRESHOLD = 0.3

_REPETITION_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, source, {_TOKENS_SQL} AS t FROM documents
),
m AS (
    SELECT doc_id, source,
           1 - len(list_distinct(t)) * 1.0 / len(t) AS tok_dup,
           CASE WHEN len(t) >= 2 THEN
               1 - len(list_distinct(list_transform(
                       generate_series(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i + 1]
                   ))) * 1.0 / (len(t) - 1)
           ELSE 0.0 END AS gram2_dup
    FROM toks
)
SELECT source,
       count(*)::BIGINT AS n_docs,
       count(*) FILTER (
           tok_dup > {_REP_TOK_THRESHOLD} OR gram2_dup > {_REP_G2_THRESHOLD}
       )::BIGINT AS n_flagged,
       round(avg(tok_dup), 4) + 0.0 AS avg_tok_dup,
       round(avg(gram2_dup), 4) + 0.0 AS avg_gram2_dup
FROM m GROUP BY source
"""


@register(
    "doc_repetition_filter",
    oracle=_REPETITION_ORACLE,
    tags=("text", "cleaning", "quality"),
)
def doc_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition metrics (the Gopher/MassiveText-style
    quality rules): duplicate-token fraction and duplicate-bigram
    fraction per document, aggregated per source with flag counts at the
    published-style thresholds. Pure column expressions over the token
    array — zero shuffle until the tiny per-source aggregate; at 100 TB
    this runs at scan speed alongside the other quality signals
    (doc_quality_scores) in one pass."""
    d = load_table(spark, sf_dir, "documents")
    t = TX.tokens("text")
    m = d.select(
        "doc_id",
        "source",
        (
            F.lit(1)
            - F.size(F.array_distinct(t)) / F.size(t)
        ).alias("tok_dup"),
        F.when(
            F.size(t) >= 2,
            F.lit(1)
            - F.size(F.array_distinct(TX.shingles(t, 2)))
            / (F.size(t) - 1),
        )
        .otherwise(F.lit(0.0))
        .alias("gram2_dup"),
    )
    flagged = (F.col("tok_dup") > _REP_TOK_THRESHOLD) | (
        F.col("gram2_dup") > _REP_G2_THRESHOLD
    )
    return m.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(flagged, 1)).alias("n_flagged"),
        (F.round(F.avg("tok_dup"), 4) + F.lit(0.0)).alias("avg_tok_dup"),
        (F.round(F.avg("gram2_dup"), 4) + F.lit(0.0)).alias("avg_gram2_dup"),
    )


# ---------------------------------------------------------------------------
# Fuzzy entity matching (edit-distance pairs with blocking)
# ---------------------------------------------------------------------------

_FUZZY_LEV = 2

_FUZZY_ORACLE = f"""
WITH p AS (SELECT p_partkey, p_name, p_brand FROM part)
SELECT a.p_brand,
       a.p_partkey AS key_a, b.p_partkey AS key_b,
       a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name)::BIGINT AS edit_dist
FROM p a JOIN p b
  ON a.p_brand = b.p_brand
 AND a.p_partkey < b.p_partkey
 AND abs(length(a.p_name) - length(b.p_name)) <= {_FUZZY_LEV}
 AND levenshtein(a.p_name, b.p_name) <= {_FUZZY_LEV}
"""


@register(
    "fuzzy_part_name_pairs",
    oracle=_FUZZY_ORACLE,
    tags=("cleaning", "fuzzy", "entity-matching"),
)
def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching: near-identical part names (edit distance
    ≤ 2) within a brand — the catalog-dedup / record-linkage operator.
    Same blocking discipline as the n-gram Jaccard verifier: the
    quadratic candidate space is bounded to a block (brand), a cheap
    length-difference prefilter runs BEFORE the O(len²) levenshtein, and
    the half-matrix condition (key_a < key_b) halves the pairs. At
    100 TB blocks come from a blocking key with bounded cardinality per
    value (brand, sorted-token fingerprint, phonetic bucket) — never the
    whole corpus; the engine-level guard is the same max-block-size rule
    documented for ngram_jaccard_pairs."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand"
    )
    a = p.alias("a")
    b = p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey"))
            & (
                F.abs(
                    F.length("a.p_name") - F.length("b.p_name")
                )
                <= _FUZZY_LEV
            )
            & (
                F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
                <= _FUZZY_LEV
            ),
        )
        .select(
            F.col("a.p_brand").alias("p_brand"),
            F.col("a.p_partkey").alias("key_a"),
            F.col("b.p_partkey").alias("key_b"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
            .cast("long")
            .alias("edit_dist"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split assignment
# ---------------------------------------------------------------------------

_SPLIT_ORACLE = """
WITH assigned AS (
    SELECT doc_id, lang,
           ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 15))::BIGINT
               % 100 AS bucket
    FROM documents
),
labeled AS (
    SELECT doc_id, lang,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM assigned
)
SELECT split, lang, count(*)::BIGINT AS n_docs
FROM labeled GROUP BY split, lang
"""


@register(
    "dataset_split_assignment",
    oracle=_SPLIT_ORACLE,
    tags=("cleaning", "split", "sampling"),
)
def dataset_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment from a salted
    md5 bucket of the document id — reproducible across engines, runs,
    and (critically) corpus growth: a doc's split never changes when new
    docs arrive, unlike randomSplit. The salt ('split:') decorrelates
    this hash from every other md5-bucket use of doc_id (sampling,
    reservoir) so the splits are independent of those decisions. Pure
    scan-time expression, zero shuffle before the tiny count."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Weighted reservoir sampling (A-ES): probability proportional to weight
# ---------------------------------------------------------------------------

_WRES_K = 5
_WRES_BUCKETS = 10_000

_WRES_ORACLE = f"""
WITH keyed AS (
    SELECT source, doc_id, n_chars,
           ln((('0x' || substr(md5('wres:' || doc_id::VARCHAR), 1, 15))::BIGINT
               % {_WRES_BUCKETS} + 0.5) / {_WRES_BUCKETS}.0)
           / n_chars AS k
    FROM documents
),
ranked AS (
    SELECT source, doc_id, n_chars, k,
           row_number() OVER (
               PARTITION BY source ORDER BY k DESC, doc_id ASC
           ) AS rn
    FROM keyed
)
SELECT source, doc_id, n_chars,
       round(k * 1000, 6) AS sample_key
FROM ranked WHERE rn <= {_WRES_K}
"""


@register(
    "weighted_reservoir_sample",
    oracle=_WRES_ORACLE,
    tags=("cleaning", "sampling", "weighted"),
)
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sampling via the A-ES key (Efraimidis &
    Spirakis 2006): each document draws a deterministic uniform u from
    the salted-md5 bucket and competes on ``ln(u)/w`` (equivalent to
    u^(1/w)); the per-source top-k is then a sample where selection
    probability is proportional to the weight (n_chars here — longer
    documents sampled more often), the importance-sampling primitive
    uniform reservoirs can't express. Fully deterministic, so the DuckDB
    oracle replays key generation and ranking exactly.

    Scale shape: key generation is a scan-time expression; one shuffle
    on the stratum key and a window row_number truncates — identical
    plan to per_group_reservoir, just a weighted key. Mergeable: the
    top-k-by-key form makes partial reservoirs combinable (keep the k
    largest keys from any union of partials)."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("wres:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % _WRES_BUCKETS
    )
    u = (bucket + F.lit(0.5)) / F.lit(float(_WRES_BUCKETS))
    k = F.log(u) / F.col("n_chars")
    from pyspark.sql import Window as W

    w = W.partitionBy("source").orderBy(F.col("k").desc(), F.col("doc_id").asc())
    return (
        d.select("source", "doc_id", "n_chars", k.alias("k"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _WRES_K)
        .select(
            "source",
            "doc_id",
            "n_chars",
            F.round(F.col("k") * 1000, 6).alias("sample_key"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR-style importance resampling weights (Xie et al. 2023, "Data
# Selection for Language Models via Importance Resampling")
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 64
_DSIR_ALPHA = 0.5  # add-alpha smoothing so unseen buckets stay finite
_DSIR_SALT = "dsir:"
_DSIR_TARGET_LANG = "en"
_DSIR_TOP = 20

_DSIR_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, lang,
           ('0x' || substr(md5('{_DSIR_SALT}' || tok), 1, 15))::BIGINT
               % {_DSIR_BUCKETS} AS bucket
    FROM (SELECT doc_id, lang, unnest({_TOKENS_SQL}) AS tok FROM documents)
),
tgt AS (
    SELECT bucket, count(*)::DOUBLE AS ct FROM toks
    WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY bucket
),
raw AS (
    SELECT bucket, count(*)::DOUBLE AS cr FROM toks GROUP BY bucket
),
ratios AS (
    SELECT r.bucket,
           ln(((coalesce(t.ct, 0) + {_DSIR_ALPHA})
               / ((SELECT sum(ct) FROM tgt)
                  + {_DSIR_ALPHA} * {_DSIR_BUCKETS}))
              / ((r.cr + {_DSIR_ALPHA})
                 / ((SELECT sum(cr) FROM raw)
                    + {_DSIR_ALPHA} * {_DSIR_BUCKETS}))) AS log_ratio
    FROM raw r LEFT JOIN tgt t USING (bucket)
),
perdoc AS (
    SELECT k.doc_id, k.lang,
           count(*)::BIGINT AS n_tokens,
           sum(k.n_b * ratios.log_ratio) AS logw
    FROM (
        SELECT doc_id, lang, bucket, count(*)::DOUBLE AS n_b
        FROM toks GROUP BY doc_id, lang, bucket
    ) k JOIN ratios USING (bucket)
    GROUP BY k.doc_id, k.lang
)
SELECT doc_id, lang,
       (SELECT count(*)::BIGINT FROM toks t2 WHERE t2.doc_id = perdoc.doc_id)
           AS n_tokens,
       round(logw, 6) + 0.0 AS importance_logw
FROM perdoc
WHERE lang <> '{_DSIR_TARGET_LANG}'
ORDER BY round(logw, 6) DESC, doc_id ASC
LIMIT {_DSIR_TOP}
"""


@register(
    "dsir_importance_weights",
    oracle=_DSIR_ORACLE,
    tags=("cleaning", "dsir", "importance-sampling", "training-data"),
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): score every raw document
    by how target-like its hashed-unigram distribution is. Unigrams hash
    into 64 buckets (salted md5 — the paper's hashed n-gram features);
    the target (lang='{en}') and raw corpora each yield add-alpha
    bucket probabilities; a document's importance log-weight is
    sum_b n_b(doc) * ln(p_target(b) / p_raw(b)). The top-20 non-target
    docs by weight are the ones importance resampling would pull into
    the training mix first.

    Plan shape at 100 TB: the token stream is scanned ONCE into per-
    (doc, bucket) counts (map-side combinable); the two corpus bucket
    histograms are 64-row aggregates; the log-ratio table is 64 rows and
    BROADCAST onto the per-doc counts — the corpus itself shuffles only
    doc-keyed count rows, never raw text. No Python, no driver loop;
    the final top-20 is TakeOrderedAndProject. Reference has no notion
    of data selection (it ingests its CSV wholesale, rag.py:40-50)."""
    from pyspark import StorageLevel

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.explode(TX.tokens("text")).alias("tok"),
    ).withColumn(
        "bucket", TX.md5_long("tok", salt=_DSIR_SALT) % _DSIR_BUCKETS
    )
    # The ONLY pass over raw text: per-(doc, bucket) counts, map-side
    # combinable, ≤64 rows per document. Persisted because histograms,
    # totals AND the per-doc scoring all derive from it — without the
    # persist each consumer would re-scan the corpus.
    per_doc_bucket = (
        toks.groupBy("doc_id", "lang", "bucket")
        .agg(F.count(F.lit(1)).cast("double").alias("n_b"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tgt = (
        per_doc_bucket.where(F.col("lang") == _DSIR_TARGET_LANG)
        .groupBy("bucket")
        .agg(F.sum("n_b").alias("ct"))
    )
    raw = per_doc_bucket.groupBy("bucket").agg(
        F.sum("n_b").alias("cr")
    )
    # corpus totals stay IN the plan (a 1-row broadcast cross join) —
    # no driver-side .first() job at plan-build time
    totals = F.broadcast(
        tgt.agg(F.sum("ct").alias("t_total")).crossJoin(
            raw.agg(F.sum("cr").alias("r_total"))
        )
    )
    a = F.lit(_DSIR_ALPHA)
    ab = F.lit(_DSIR_ALPHA * _DSIR_BUCKETS)
    ratios = (
        raw.join(F.broadcast(tgt), "bucket", "left")
        .crossJoin(totals)
        .select(
            "bucket",
            F.log(
                ((F.coalesce(F.col("ct"), F.lit(0.0)) + a)
                 / (F.col("t_total") + ab))
                / ((F.col("cr") + a) / (F.col("r_total") + ab))
            ).alias("log_ratio"),
        )
    )
    scored = (
        per_doc_bucket.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(F.col("n_b")).cast("long").alias("n_tokens"),
            F.round(
                F.sum(F.col("n_b") * F.col("log_ratio")), 6
            ).alias("importance_logw"),
        )
    )
    return (
        scored.where(F.col("lang") != _DSIR_TARGET_LANG)
        .orderBy(F.col("importance_logw").desc(), F.col("doc_id").asc())
        .limit(_DSIR_TOP)
    )


_QUOTA_PER_LANG = 30
_QUOTA_SALT = "quota-v1"

_QUOTA_ORACLE = f"""
WITH keyed AS (
    SELECT doc_id, lang,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY ('0x' || substr(md5('{_QUOTA_SALT}|' || doc_id), 1, 15))::BIGINT,
                        doc_id
           ) AS rn
    FROM documents
),
sampled AS (SELECT doc_id, lang FROM keyed WHERE rn <= {_QUOTA_PER_LANG})
SELECT lang,
       count(*)::BIGINT AS n_sampled,
       min(doc_id)::BIGINT AS min_doc,
       sum(doc_id)::BIGINT AS doc_checksum
FROM sampled GROUP BY lang
"""


@register(
    "exact_quota_stratified_sample",
    oracle=_QUOTA_ORACLE,
    tags=("cleaning", "sampling", "window"),
)
def exact_quota_stratified_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT-count stratified sampling: exactly {n} documents per
    language, chosen by ranking each stratum on a salted-md5 key (a
    deterministic uniform permutation) and cutting at the quota — the
    complement of the RATE-based stratified_sample above, for when the
    contract is a count, not a probability (eval-set construction,
    per-language budget caps). Deterministic: same salt ⇒ same sample,
    and unlike rate-sampling the output size never drifts with corpus
    growth — only membership does.

    Plan: one row_number window per stratum (lang-partitioned — small
    bounded key space here; at corpus-cardinality strata the same
    contract comes from a per-stratum rank threshold computed off a
    quantile of the hash key, avoiding full-stratum sorts). Emitted as
    per-stratum counts + id checksum so the whole membership is
    hash-pinned without returning every row.
    """
    docs = load_table(spark, sf_dir, "documents")
    key = TX.md5_long(
        F.concat(F.lit(f"{_QUOTA_SALT}|"), F.col("doc_id"))
    )
    w = Window.partitionBy("lang").orderBy(key.asc(), F.col("doc_id").asc())
    sampled = (
        docs.select("doc_id", "lang")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _QUOTA_PER_LANG)
    )
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.min("doc_id").alias("min_doc"),
        F.sum("doc_id").alias("doc_checksum"),
    )


# ---------------------------------------------------------------------------
# Differential privacy: Laplace-mechanism noisy release of per-source counts
# ---------------------------------------------------------------------------

_DP_EPS = 0.5
_DP_SPACE = 1152921504606846976.0  # 2^60, the portable md5-hash range

_DP_ORACLE = f"""
WITH counts AS (
    SELECT source, count(*)::DOUBLE AS n FROM documents GROUP BY source
),
noised AS (
    SELECT source, n,
           ('0x' || substr(md5('dp:' || source), 1, 15))::BIGINT
               / {_DP_SPACE} - 0.5 AS u
    FROM counts
)
SELECT source,
       {_DP_EPS}::DOUBLE AS epsilon,
       round(greatest(0.0,
           n - (1.0 / {_DP_EPS}) * sign(u)
               * ln(greatest(1e-15, 1.0 - 2.0 * abs(u)))), 2)
           AS noisy_n_docs
FROM noised
"""


@register(
    "dp_noisy_source_counts",
    oracle=_DP_ORACLE,
    tags=("privacy", "dp", "release"),
)
def dp_noisy_source_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism differentially-private release of per-source
    document counts (Dwork et al. 2006): count queries have L1
    sensitivity 1, so adding Laplace(1/epsilon) noise gives an
    epsilon-DP release — the MECHANISM leg of the privacy lane, beside
    the k-anonymity / l-diversity / t-closeness AUDITS (those measure
    re-identification risk of a release; this actually produces a
    protected one). Noise is inverse-CDF sampled from the same salted
    60-bit md5 uniform every deterministic sampler in this engine uses
    (u -> -b*sign(u-.5)*ln(1-2|u-.5|)), which is what makes the
    release itself oracle-checkable; swap the salt input for a true
    RNG in production — the plan is identical. Negative releases clamp
    at 0 (post-processing preserves DP).

    Plan shape: one map-side-combinable count aggregate; the noise is
    a scan-time expression on the SOURCE-cardinality result. Zero
    extra shuffles at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    u = (
        TX.md5_long(F.concat(F.lit("dp:"), F.col("source"))).cast("double")
        / _DP_SPACE
        - 0.5
    )
    lap = (
        (1.0 / _DP_EPS)
        * F.signum(u)
        * F.log(F.greatest(F.lit(1e-15), 1.0 - 2.0 * F.abs(u)))
    )
    return counts.select(
        "source",
        F.lit(_DP_EPS).alias("epsilon"),
        F.round(
            F.greatest(F.lit(0.0), F.col("n") - lap), 2
        ).alias("noisy_n_docs"),
    )


# ---------------------------------------------------------------------------
# Cross-split contamination matrix (shingle overlap between train/val/test)
# ---------------------------------------------------------------------------

_XSPLIT_N = 5  # shingle width in tokens

_XSPLIT_ORACLE = f"""
WITH assigned AS (
    SELECT doc_id, text,
           CASE WHEN ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 15))::BIGINT
                     % 100 < 80 THEN 'train'
                WHEN ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 15))::BIGINT
                     % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
),
grams AS (
    SELECT DISTINCT split, gram
    FROM (
        SELECT split,
               unnest(CASE WHEN len({_TOKENS_SQL}) < {_XSPLIT_N} THEN []::VARCHAR[]
                   ELSE list_transform(
                       generate_series(1, len({_TOKENS_SQL}) - {_XSPLIT_N - 1}),
                       i -> array_to_string(({_TOKENS_SQL})[i:i+{_XSPLIT_N - 1}], ' '))
                   END) AS gram
        FROM assigned
    )
),
flags AS (
    SELECT gram,
           max(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS in_train,
           max(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS in_val,
           max(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS in_test
    FROM grams GROUP BY gram
),
m AS (
    SELECT sum(in_train)::BIGINT AS n_train, sum(in_val)::BIGINT AS n_val,
           sum(in_test)::BIGINT AS n_test,
           sum(in_train * in_val)::BIGINT AS tv,
           sum(in_train * in_test)::BIGINT AS tt,
           sum(in_val * in_test)::BIGINT AS vt
    FROM flags
)
SELECT * FROM (
    SELECT 'train' AS split_a, 'val' AS split_b, tv AS n_shared_grams,
           round(tv / (n_train + n_val - tv)::DOUBLE, 6) AS jaccard,
           round(tv / least(n_train, n_val)::DOUBLE, 6)
               AS smaller_side_hit_rate
    FROM m
    UNION ALL
    SELECT 'train', 'test', tt,
           round(tt / (n_train + n_test - tt)::DOUBLE, 6),
           round(tt / least(n_train, n_test)::DOUBLE, 6)
    FROM m
    UNION ALL
    SELECT 'val', 'test', vt,
           round(vt / (n_val + n_test - vt)::DOUBLE, 6),
           round(vt / least(n_val, n_test)::DOUBLE, 6)
    FROM m
)
ORDER BY split_a, split_b
"""


@register(
    "split_contamination_matrix",
    oracle=_XSPLIT_ORACLE,
    tags=("cleaning", "contamination", "split", "ngram"),
    bench=True,
)
def split_contamination_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-split contamination matrix: {_XSPLIT_N}-token shingle
    overlap between the train/val/test assignments (the SAME salted-md5
    split as dataset_split_assignment, so this audits the split the
    engine actually produces). benchmark_decontamination checks the
    corpus against an EXTERNAL eval set; this checks the corpus against
    ITSELF — near-duplicate documents landing on opposite sides of a
    random split silently inflate held-out metrics, and the
    smaller-side hit rate is the number that predicts the inflation.

    Plan shape: one tokenize+shingle census into DISTINCT (split, gram)
    (the corpus shuffle, map-side combinable), one gram-grain flag
    aggregate, one 1-row matrix fold emitted as 3 rows. No pair join
    anywhere — the matrix is sums of flag products."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("split:"), F.col("doc_id").cast("string"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    grams = (
        d.select(
            split.alias("split"),
            F.explode(
                TX.shingles(TX.tokens("text"), n=_XSPLIT_N)
            ).alias("gram"),
        )
        .distinct()
    )
    flags = grams.groupBy("gram").agg(
        F.max(F.when(F.col("split") == "train", 1).otherwise(0)).alias(
            "in_train"
        ),
        F.max(F.when(F.col("split") == "val", 1).otherwise(0)).alias(
            "in_val"
        ),
        F.max(F.when(F.col("split") == "test", 1).otherwise(0)).alias(
            "in_test"
        ),
    )
    m = flags.agg(
        F.sum("in_train").alias("n_train"),
        F.sum("in_val").alias("n_val"),
        F.sum("in_test").alias("n_test"),
        F.sum(F.col("in_train") * F.col("in_val")).alias("tv"),
        F.sum(F.col("in_train") * F.col("in_test")).alias("tt"),
        F.sum(F.col("in_val") * F.col("in_test")).alias("vt"),
    )

    # the 3 matrix rows explode out of the ONE 1-row aggregate — a
    # union of three selects over m would re-run the census per branch
    def cell(a, b, shared, na, nb):
        return F.struct(
            F.lit(a).alias("split_a"),
            F.lit(b).alias("split_b"),
            F.col(shared).alias("n_shared_grams"),
            F.col(na).alias("na"),
            F.col(nb).alias("nb"),
        )

    return (
        m.select(
            F.explode(
                F.array(
                    cell("train", "val", "tv", "n_train", "n_val"),
                    cell("train", "test", "tt", "n_train", "n_test"),
                    cell("val", "test", "vt", "n_val", "n_test"),
                )
            ).alias("c")
        )
        .select(
            F.col("c.split_a").alias("split_a"),
            F.col("c.split_b").alias("split_b"),
            F.col("c.n_shared_grams").alias("n_shared_grams"),
            F.round(
                F.col("c.n_shared_grams")
                / (
                    F.col("c.na") + F.col("c.nb") - F.col("c.n_shared_grams")
                ).cast("double"),
                6,
            ).alias("jaccard"),
            F.round(
                F.col("c.n_shared_grams")
                / F.least(F.col("c.na"), F.col("c.nb")).cast("double"),
                6,
            ).alias("smaller_side_hit_rate"),
        )
        .orderBy("split_a", "split_b")
    )


# ---------------------------------------------------------------------------
# Split-leakage audit: quantify cross-split duplicate leakage per policy
# ---------------------------------------------------------------------------

_SPLIT_BUCKETS = 10  # bucket 0 -> test, 1 -> val, 2..9 -> train (80/10/10)

_LEAK_AUDIT_ORACLE = f"""
WITH docs AS ({{exact_sql}}),
keyed AS (
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM docs
),
assigned AS (
    SELECT 'doc_id_hash' AS policy, fp,
           ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
               % {_SPLIT_BUCKETS} AS bucket
    FROM keyed
    UNION ALL
    SELECT 'cluster_hash' AS policy, fp,
           ('0x' || substr(fp, 1, 8))::BIGINT % {_SPLIT_BUCKETS} AS bucket
    FROM keyed
),
split_of AS (
    SELECT policy, fp,
           CASE bucket WHEN 0 THEN 'test' WHEN 1 THEN 'val'
                ELSE 'train' END AS split
    FROM assigned
),
cl AS (
    SELECT policy, fp,
           count(*) AS n_docs,
           count(DISTINCT split) AS n_splits
    FROM split_of GROUP BY policy, fp
)
SELECT policy,
       count(*)::BIGINT AS n_clusters,
       sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END)::BIGINT
           AS straddle_clusters,
       sum(CASE WHEN n_splits > 1 THEN n_docs ELSE 0 END)::BIGINT
           AS leaked_docs
FROM cl
GROUP BY policy
ORDER BY policy
"""


@register(
    "split_leakage_audit",
    oracle=None,  # bound below once the fixture SQL is imported
    tags=("cleaning", "splits", "leakage", "dedup", "audit"),
    bench=True,
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantify cross-split duplicate leakage as DATA, per assignment
    policy: assign every document to train/val/test twice — once by the
    raw doc-id hash (the leaky policy ``dataset_split_assignment``
    uses) and once by the exact-dedup cluster key (the normalized-text
    md5, so all copies share a bucket) — then report, per policy, how
    many duplicate clusters straddle ≥2 splits and how many documents
    sit in a straddling cluster. The cluster-keyed row is provably
    (0, 0); the doc-id row PRICES the leakage that policy would cause
    on this corpus. Complements ``leakage_safe_split`` (which builds
    the safe near-dup-keyed assignment): this one measures, engine-side,
    what the safe variant buys — the audit you run BEFORE trusting any
    externally-supplied split column.

    100 TB story: both assignments are scan-local md5 expressions (no
    shuffle); the audit is one cluster-grain groupBy per policy —
    map-side combinable, hot clusters collapse before the shuffle —
    and a 2-row final aggregate. No joins, no windows.
    """
    from emails_to_vector_db_spark.plans.dedup import _docs_with_exact_dups

    docs = _docs_with_exact_dups(spark, sf_dir)
    keyed = docs.select(
        "doc_id", TX.fingerprint("text").alias("fp")
    )

    def _bucket(col):
        return F.conv(F.substring(col, 1, 8), 16, 10).cast(
            "long"
        ) % _SPLIT_BUCKETS

    def _split(bucket):
        return (
            F.when(bucket == 0, F.lit("test"))
            .when(bucket == 1, F.lit("val"))
            .otherwise(F.lit("train"))
        )

    by_id = keyed.select(
        F.lit("doc_id_hash").alias("policy"),
        "fp",
        _split(_bucket(F.md5(F.col("doc_id").cast("string")))).alias("split"),
    )
    by_cluster = keyed.select(
        F.lit("cluster_hash").alias("policy"),
        "fp",
        _split(_bucket(F.col("fp"))).alias("split"),
    )
    cl = (
        by_id.unionByName(by_cluster)
        .groupBy("policy", "fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("split").alias("n_splits"),
        )
    )
    straddling = F.col("n_splits") > 1
    return (
        cl.groupBy("policy")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum(straddling.cast("long")).alias("straddle_clusters"),
            F.sum(F.when(straddling, F.col("n_docs")).otherwise(F.lit(0)))
            .cast("long")
            .alias("leaked_docs"),
        )
        .orderBy("policy")
    )


def _bind_leak_audit_oracle() -> None:
    """Late-bind the oracle (the fixture SQL lives in dedup.py; binding
    at import time here avoids a module-level circular import)."""
    from dataclasses import replace

    from emails_to_vector_db_spark.plans.dedup import _DOCS_EXACT_SQL
    from emails_to_vector_db_spark.plans.registry import REGISTRY

    spec = REGISTRY["split_leakage_audit"]
    REGISTRY["split_leakage_audit"] = replace(
        spec, oracle=_LEAK_AUDIT_ORACLE.format(exact_sql=_DOCS_EXACT_SQL)
    )


_bind_leak_audit_oracle()


# ---------------------------------------------------------------------------
# Epoch-seeded training-order shuffle: reproducibility + decorrelation
# ---------------------------------------------------------------------------

# md5_long yields 60-bit uniforms; decile = key / 2^60 * 10
_SHUF_SCALE = 2**60
_SHUF_DECILES = 10

_SHUFFLE_ORACLE = f"""
WITH keys AS (
    SELECT doc_id,
           ('0x' || substr(md5('epoch:0:' || doc_id::VARCHAR), 1, 15))::BIGINT
               AS k0,
           ('0x' || substr(md5('epoch:1:' || doc_id::VARCHAR), 1, 15))::BIGINT
               AS k1
    FROM documents
),
cells AS (
    SELECT CAST(floor(k0 * {_SHUF_DECILES}.0 / {_SHUF_SCALE}) AS BIGINT)
               AS decile_e0,
           CAST(floor(k1 * {_SHUF_DECILES}.0 / {_SHUF_SCALE}) AS BIGINT)
               AS decile_e1,
           count(*) AS n
    FROM keys GROUP BY 1, 2
),
tot AS (SELECT sum(n) AS total FROM cells)
SELECT decile_e0, decile_e1, n::BIGINT AS n,
       round(total / {_SHUF_DECILES * _SHUF_DECILES}.0, 6) + 0.0
           AS expected,
       round(pow(n - total / {_SHUF_DECILES * _SHUF_DECILES}.0, 2)
             / (total / {_SHUF_DECILES * _SHUF_DECILES}.0), 6) + 0.0
           AS chi2_term
FROM cells, tot
ORDER BY decile_e0, decile_e1
"""


@register(
    "epoch_shuffle_decorrelation",
    oracle=_SHUFFLE_ORACLE,
    tags=("cleaning", "shuffle", "training-order", "reproducibility"),
    bench=True,
)
def epoch_shuffle_decorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-seeded training-order shuffle, audited: training loaders
    order each epoch by a seeded content hash (md5("epoch:e:" || id)) —
    reproducible across runs and engines with NO materialized
    permutation — and this query verifies the property the seed must
    buy: epoch orders are statistically INDEPENDENT. Both epochs' sort
    keys map scan-locally to position deciles (the keys are uniform
    60-bit integers, so the decile is pure arithmetic — no rank, no
    window, no shuffle of the corpus); the 10×10 joint census should be
    uniform, and each cell's chi² term is emitted so the consumer can
    sum them against the χ²₉₉ critical value. A failed audit (mass on
    the diagonal) means epochs replay the same order — the silent
    curriculum bug this catches before a 100 TB training run.

    100 TB story: two md5s + arithmetic per row at scan time, one
    100-cell groupBy (map-side combinable), a broadcast 1-row total.
    Nothing corpus-sized ever shuffles or sorts.
    """
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")

    def _decile(salt: str):
        k = TX.md5_long(did, salt=salt)
        return F.floor(
            k * F.lit(float(_SHUF_DECILES)) / F.lit(float(_SHUF_SCALE))
        ).cast("long")

    cells = (
        d.select(
            _decile("epoch:0:").alias("decile_e0"),
            _decile("epoch:1:").alias("decile_e1"),
        )
        .groupBy("decile_e0", "decile_e1")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cells.agg(F.sum("n").alias("total"))
    n_cells = float(_SHUF_DECILES * _SHUF_DECILES)
    exp = F.col("total") / F.lit(n_cells)
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "decile_e0",
            "decile_e1",
            F.col("n").cast("long").alias("n"),
            (F.round(exp, 6) + F.lit(0.0)).alias("expected"),
            (
                F.round(F.pow(F.col("n") - exp, 2) / exp, 6) + F.lit(0.0)
            ).alias("chi2_term"),
        )
        .orderBy("decile_e0", "decile_e1")
    )
