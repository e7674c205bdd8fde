"""Data valuation & curation-QA audits for a training-data pipeline.

Operators a corpus team runs AFTER dedup/quality filtering to decide
*what the data is worth* and *whether the filters agree with each
other* (none exist in the reference, which ingests its 1,000-row CSV
wholesale — ``rag.py:40-50``):

- ``loo_source_valuation`` — leave-one-source-out data valuation: how
  much does each candidate source contribute to held-out classifier
  accuracy? The key scale move is that NO retraining happens: the
  Naive-Bayes token census is computed ONCE and every leave-one-out
  model is derived by count subtraction, with the per-source score
  correction joined SPARSELY (only tokens the excluded source actually
  contains ever enter the correction join).
- ``nb_self_influence`` — memorization proxy: score every training doc
  under the model WITH vs WITHOUT its own counts (exact doc-grain
  exclusion, again pure count algebra — the classic self-influence
  audit for spotting memorized/atypical examples).
- ``classifier_agreement_kappa`` — Cohen's kappa between two
  independent quality gates (length-based vs lexical-diversity-based):
  the inter-rater reliability number a curation team watches before
  trusting a single filter.
- ``coreset_sensitivity_sample`` — sensitivity-sampled weighted coreset
  over the embedding table (Bachem/Lucic/Krause style): one pass to
  cost every point against k broadcast seed centroids, one bounded
  sample whose weighted cost estimates the full corpus cost.
- ``template_dups_cross_lang`` — Type-2 (template) duplicate mining:
  canonicalize every document to its token-occurrence pattern (each
  token instance → position of the token's FIRST occurrence), which is
  invariant under any vocabulary substitution — the boilerplate /
  machine-translated-contamination detector that exact and MinHash
  dedup both miss by construction.
- ``dup_rate_by_source_ci`` — per-source exact-duplication rate with a
  Wilson 95% interval: the monitoring view that decides which sources
  get a dedup pass first.

Scale notes (100 TB)
--------------------
- Every operator is a constant number of token/embedding-grain
  aggregations; no pair space anywhere. The LOO valuation's only
  expansion is test-tokens × |langs| × (1 + sparse corrections) — the
  candidate set is BOUNDED (top-5 sources) and the correction join
  is inner on the excluded source's vocabulary, so the full-corpus
  token stream is scanned exactly once.
- The template canonicalization is O(L log L) per document (explode +
  doc-local min-position + ordered re-assembly), the same shape the
  repetition cutover uses — never the O(L²) array_position expression.
- The coreset costs are one BLAS Arrow pass against k driver-collected
  seed literals and the sample predicate is a deterministic md5
  uniform, so both engines and any two cluster runs pick the identical
  coreset.
- Persisted intermediates (loo's base rows, the coreset costs) follow
  the repo convention: callers own cache lifecycle — bench.py and the
  driver clearCache() between queries.
- Planted twins/canaries ride DERIVED id offsets (max(doc_id) + 1,
  broadcast 1-row aggregate): fixed offsets collide with real ids once
  the corpus outgrows them (the round-7 snapshot-diff lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from emails_to_vector_db_spark.functions import text as TX
from emails_to_vector_db_spark.plans.registry import register
from emails_to_vector_db_spark.sources.tables import load_table

_TOKENS_SQL = "regexp_split_to_array(trim(text), '\\s+')"

# ---------------------------------------------------------------------------
# Leave-one-source-out valuation
# ---------------------------------------------------------------------------

_LOO_K = 5  # candidate sources to value (top by train doc count)

_LOO_SPLIT_SQL = (
    "('0x' || substr(md5('loo|' || doc_id), 1, 15))::BIGINT % 5"
)

_LOO_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, lang, source, unnest({_TOKENS_SQL}) AS tok,
           {_LOO_SPLIT_SQL} AS split FROM documents
),
train AS (SELECT * FROM toks WHERE split <> 0),
train_docs AS (
    SELECT * FROM documents WHERE {_LOO_SPLIT_SQL} <> 0
),
cand AS (
    SELECT source, count(*)::BIGINT AS nd_s
    FROM train_docs GROUP BY source
    ORDER BY count(*) DESC, source ASC LIMIT {_LOO_K}
),
models AS (
    SELECT source AS msrc FROM cand
    UNION ALL SELECT '__full__'
),
prior AS (
    SELECT lang, count(*)::DOUBLE AS nd FROM train_docs GROUP BY lang
),
prior_s AS (
    SELECT lang, source, count(*)::DOUBLE AS nd_ls
    FROM train_docs WHERE source IN (SELECT source FROM cand)
    GROUP BY lang, source
),
td AS (SELECT count(*)::DOUBLE AS td FROM train_docs),
tot AS (SELECT lang, count(*)::DOUBLE AS tot_l FROM train GROUP BY lang),
tot_s AS (
    SELECT lang, source, count(*)::DOUBLE AS tot_ls
    FROM train WHERE source IN (SELECT source FROM cand)
    GROUP BY lang, source
),
vocab AS (SELECT count(DISTINCT tok)::DOUBLE AS v FROM train),
gt AS (SELECT tok, count(*)::BIGINT AS g FROM train GROUP BY tok),
gs AS (
    SELECT tok, source, count(*)::BIGINT AS gsum
    FROM train WHERE source IN (SELECT source FROM cand)
    GROUP BY tok, source
),
uniq_s AS (
    SELECT s.source, count(*)::DOUBLE AS u_s
    FROM gs s JOIN gt t ON t.tok = s.tok
    WHERE s.gsum = t.g GROUP BY s.source
),
cnt_g AS (
    SELECT lang, tok, count(*)::BIGINT AS c FROM train GROUP BY lang, tok
),
cnt_s AS (
    SELECT lang, source, tok, count(*)::BIGINT AS c_s
    FROM train WHERE source IN (SELECT source FROM cand)
    GROUP BY lang, source, tok
),
test_toks AS (
    SELECT doc_id, lang AS actual_lang, tok FROM toks WHERE split = 0
),
scored AS (
    SELECT t.doc_id, t.actual_lang, l.lang, m.msrc,
           sum(ln(coalesce(c.c, 0) - coalesce(cs.c_s, 0) + 1)) AS sum_ln,
           count(*)::DOUBLE AS n_inst
    FROM test_toks t
    CROSS JOIN tot l
    CROSS JOIN models m
    LEFT JOIN cnt_g c ON c.lang = l.lang AND c.tok = t.tok
    LEFT JOIN cnt_s cs
      ON cs.lang = l.lang AND cs.tok = t.tok AND cs.source = m.msrc
    GROUP BY t.doc_id, t.actual_lang, l.lang, m.msrc
),
post AS (
    SELECT s.doc_id, s.actual_lang, s.lang, s.msrc,
           s.sum_ln
             - s.n_inst * ln(l.tot_l - coalesce(ts.tot_ls, 0)
                             + v.v - coalesce(u.u_s, 0))
             + ln((p.nd - coalesce(ps.nd_ls, 0))
                  / (t.td - coalesce(cd.nd_s, 0))) AS score
    FROM scored s
    JOIN tot l ON l.lang = s.lang
    JOIN prior p ON p.lang = s.lang
    CROSS JOIN vocab v
    CROSS JOIN td t
    LEFT JOIN tot_s ts ON ts.lang = s.lang AND ts.source = s.msrc
    LEFT JOIN prior_s ps ON ps.lang = s.lang AND ps.source = s.msrc
    LEFT JOIN uniq_s u ON u.source = s.msrc
    LEFT JOIN cand cd ON cd.source = s.msrc
),
pred AS (
    SELECT doc_id, actual_lang, msrc, lang AS predicted,
           row_number() OVER (
               PARTITION BY doc_id, msrc
               ORDER BY round(score, 6) DESC, lang ASC
           ) AS rn
    FROM post
),
acc AS (
    SELECT msrc,
           avg(CASE WHEN predicted = actual_lang THEN 1.0 ELSE 0.0 END)
               AS acc
    FROM pred WHERE rn = 1 GROUP BY msrc
)
SELECT c.source, c.nd_s AS n_train_docs,
       round(af.acc, 4) AS acc_full,
       round(al.acc, 4) AS acc_loo,
       round((al.acc - af.acc) * 100, 2) AS delta_pp
FROM cand c
JOIN acc al ON al.msrc = c.source
CROSS JOIN (SELECT acc FROM acc WHERE msrc = '__full__') af
"""


@register(
    "loo_source_valuation",
    oracle=_LOO_ORACLE,
    tags=("valuation", "training-data", "nb", "loo"),
    bench=True,
)
def loo_source_valuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out data valuation WITHOUT retraining: the NB
    token census is computed once over the train split and every LOO
    model is pure count subtraction — c_loo = c - c_source,
    tot_loo = tot - tot_source, V_loo = V - |vocab unique to source| —
    so valuing S candidate sources costs one corpus scan plus S
    vocabulary-sized aggregates, never S retrains.

    Plan shape at 100 TB: the held-out score for the FULL model is one
    (doc, lang) aggregation of ln(c+1) terms; each LOO score is the
    full score plus a SPARSE correction joined inner on (lang, tok)
    against the excluded source's token counts — only test tokens that
    the excluded source actually contains enter the correction, so the
    expansion is bounded by the per-source vocabulary overlap, not by
    |test| x |sources|. Candidates are bounded (top-5 by train doc
    count); the per-(lang, source) denominators and priors are
    broadcast scalars. Precondition (documented, holds by fixture
    construction): every (lang, candidate source) pair leaves >= 1
    training doc after exclusion — LOO priors stay finite."""
    docs = load_table(spark, sf_dir, "documents")
    # Hash split, NOT doc_id % 5: the fixture derives source from
    # doc_id % 20, so a modular split starves sources = 0 mod 5 of
    # training docs entirely (see _EL_SPLIT_SQL note below).
    split = (
        TX.md5_long(F.concat(F.lit("loo|"), F.col("doc_id").cast("string")))
        % 5
    )
    toks = docs.select(
        "doc_id",
        "lang",
        "source",
        F.explode(TX.tokens("text")).alias("tok"),
        split.alias("split"),
    )
    train = toks.where(F.col("split") != 0)
    train_docs = docs.where(split != 0)
    # ONE corpus-grain shuffle: the (lang, source, tok) token census.
    # Every model table below (global counts, per-source counts, class
    # totals, vocab sizes, unique-to-source vocab) derives from this
    # cached vocabulary-grain frame — without it each derived table
    # re-scanned and re-shuffled the exploded token stream (measured 57
    # exchanges at sf0.01, most of them corpus-grain; now the corpus
    # shuffles once and only census-grain re-aggregates remain).
    from pyspark import StorageLevel

    census = (
        train.groupBy("lang", "source", "tok")
        .agg(F.count(F.lit(1)).alias("n_lst"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dcen = (
        train_docs.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_docs_ls"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cand = (
        dcen.groupBy("source")
        .agg(F.sum("n_docs_ls").alias("nd_s"))
        .orderBy(F.col("nd_s").desc(), F.col("source").asc())
        .limit(_LOO_K)
    )
    census_c = census.join(F.broadcast(cand.select("source")), "source")

    prior = dcen.groupBy("lang").agg(
        F.sum("n_docs_ls").cast("double").alias("nd")
    )
    prior_s = (
        dcen.join(F.broadcast(cand.select("source")), "source")
        .groupBy("lang", "source")
        .agg(F.sum("n_docs_ls").cast("double").alias("nd_ls"))
    )
    td = dcen.agg(F.sum("n_docs_ls").cast("double").alias("td"))
    # ROUND-11 (r10 verdict task 6): every model table derives from ONE
    # census-grain re-aggregate instead of five independent ones —
    # cnt_g (lang, tok) is the single full-census shuffle; tot rolls up
    # from cnt_g, gt rolls up from cnt_g at vocab grain, vocab is
    # |gt| (countDistinct(tok) over the census == gt's row count), and
    # cnt_s needs NO aggregation at all: the census is already unique
    # at (lang, source, tok), so the candidate slice is a rename.
    cnt_g = (
        census.groupBy("lang", "tok")
        .agg(F.sum("n_lst").alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tot = cnt_g.groupBy("lang").agg(
        F.sum("c").cast("double").alias("tot_l")
    )
    gt = cnt_g.groupBy("tok").agg(F.sum("c").alias("g"))
    vocab = gt.agg(F.count(F.lit(1)).cast("double").alias("v"))
    tot_s = census_c.groupBy("lang", "source").agg(
        F.sum("n_lst").cast("double").alias("tot_ls")
    )
    gs = census_c.groupBy("tok", "source").agg(
        F.sum("n_lst").alias("gsum")
    )
    uniq_s = (
        gs.join(gt, "tok")
        .where(F.col("gsum") == F.col("g"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("double").alias("u_s"))
    )
    cnt_s = census_c.select(
        "lang", "source", "tok", F.col("n_lst").alias("c_s")
    )

    test_toks = toks.where(F.col("split") == 0).select(
        "doc_id", F.col("lang").alias("actual_lang"), "tok"
    )
    # Base rows: one per (test token instance, lang) — the ONLY
    # corpus-grain expansion; everything LOO rides on top of it.
    base = (
        test_toks.crossJoin(F.broadcast(tot.select("lang")))
        .join(F.broadcast(cnt_g), ["lang", "tok"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
    )
    from pyspark import StorageLevel

    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    full_ll = base.groupBy("doc_id", "actual_lang", "lang").agg(
        F.sum(F.log(F.col("c") + 1)).alias("sum_ln"),
        F.count(F.lit(1)).cast("double").alias("n_inst"),
    )
    # Sparse LOO corrections: inner join on the excluded source's token
    # counts — tokens the source never saw contribute exactly 0.
    corr = (
        base.join(F.broadcast(cnt_s), ["lang", "tok"])
        .groupBy("doc_id", "actual_lang", "lang", "source")
        .agg(
            F.sum(
                F.log(F.col("c") - F.col("c_s") + 1)
                - F.log(F.col("c") + 1)
            ).alias("corr_ln")
        )
    )

    full_scored = (
        full_ll.join(F.broadcast(tot), "lang")
        .join(F.broadcast(prior), "lang")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(td))
        .select(
            "doc_id",
            "actual_lang",
            "lang",
            F.lit("__full__").alias("msrc"),
            (
                F.col("sum_ln")
                - F.col("n_inst") * F.log(F.col("tot_l") + F.col("v"))
                + F.log(F.col("nd") / F.col("td"))
            ).alias("score"),
        )
    )
    loo_scored = (
        full_ll.crossJoin(F.broadcast(cand.select("source", "nd_s")))
        .join(corr, ["doc_id", "actual_lang", "lang", "source"], "left")
        .join(F.broadcast(tot), "lang")
        .join(F.broadcast(prior), "lang")
        .join(F.broadcast(tot_s), ["lang", "source"], "left")
        .join(F.broadcast(prior_s), ["lang", "source"], "left")
        .join(F.broadcast(uniq_s), "source", "left")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(td))
        .select(
            "doc_id",
            "actual_lang",
            "lang",
            F.col("source").alias("msrc"),
            (
                F.col("sum_ln")
                + F.coalesce(F.col("corr_ln"), F.lit(0.0))
                - F.col("n_inst")
                * F.log(
                    F.col("tot_l")
                    - F.coalesce(F.col("tot_ls"), F.lit(0.0))
                    + F.col("v")
                    - F.coalesce(F.col("u_s"), F.lit(0.0))
                )
                + F.log(
                    (F.col("nd") - F.coalesce(F.col("nd_ls"), F.lit(0.0)))
                    / (F.col("td") - F.col("nd_s").cast("double"))
                )
            ).alias("score"),
        )
    )
    post = full_scored.unionByName(loo_scored)
    w = Window.partitionBy("doc_id", "msrc").orderBy(
        F.round(F.col("score"), 6).desc(), F.col("lang").asc()
    )
    pred = post.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    acc = pred.groupBy("msrc").agg(
        F.avg(
            F.when(F.col("lang") == F.col("actual_lang"), 1.0).otherwise(0.0)
        ).alias("acc")
    )
    acc_full = F.broadcast(
        acc.where(F.col("msrc") == "__full__").select(
            F.col("acc").alias("accf")
        )
    )
    return (
        cand.join(acc, cand["source"] == acc["msrc"])
        .crossJoin(acc_full)
        .select(
            "source",
            F.col("nd_s").cast("long").alias("n_train_docs"),
            F.round(F.col("accf"), 4).alias("acc_full"),
            F.round(F.col("acc"), 4).alias("acc_loo"),
            F.round((F.col("acc") - F.col("accf")) * 100, 2).alias(
                "delta_pp"
            ),
        )
    )


# ---------------------------------------------------------------------------
# NB self-influence (memorization proxy)
# ---------------------------------------------------------------------------

_SI_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, lang, unnest({_TOKENS_SQL}) AS tok FROM documents
    WHERE doc_id % 5 <> 0
),
ndt AS (
    SELECT doc_id, lang, tok, count(*)::BIGINT AS n_dt
    FROM toks GROUP BY doc_id, lang, tok
),
cnt AS (SELECT lang, tok, sum(n_dt)::BIGINT AS c FROM ndt GROUP BY lang, tok),
gt AS (SELECT tok, sum(n_dt)::BIGINT AS g FROM ndt GROUP BY tok),
tot AS (SELECT lang, sum(n_dt)::DOUBLE AS tot_l FROM ndt GROUP BY lang),
vocab AS (SELECT count(DISTINCT tok)::DOUBLE AS v FROM ndt),
prior AS (
    SELECT lang, count(*)::DOUBLE AS nd FROM documents
    WHERE doc_id % 5 <> 0 GROUP BY lang
),
td AS (
    SELECT count(*)::DOUBLE AS td FROM documents WHERE doc_id % 5 <> 0
),
per_doc AS (
    SELECT n.doc_id, n.lang,
           sum(n.n_dt)::DOUBLE AS n_d,
           sum(n.n_dt * ln(c.c + 1)) AS incl_sum,
           sum(n.n_dt * ln(c.c - n.n_dt + 1)) AS excl_sum,
           sum(CASE WHEN g.g = n.n_dt THEN 1.0 ELSE 0.0 END) AS u_d
    FROM ndt n
    JOIN cnt c ON c.lang = n.lang AND c.tok = n.tok
    JOIN gt g ON g.tok = n.tok
    GROUP BY n.doc_id, n.lang
),
scored AS (
    SELECT d.doc_id, d.lang,
           d.n_d::BIGINT AS n_toks, d.u_d::BIGINT AS n_unique_toks,
           round(
               (d.incl_sum - d.n_d * ln(t.tot_l + v.v) + ln(p.nd / x.td))
               - (d.excl_sum
                  - d.n_d * ln(t.tot_l - d.n_d + v.v - d.u_d)
                  + ln((p.nd - 1) / (x.td - 1))),
               6
           ) AS self_influence
    FROM per_doc d
    JOIN tot t ON t.lang = d.lang
    JOIN prior p ON p.lang = d.lang
    CROSS JOIN vocab v
    CROSS JOIN td x
)
SELECT doc_id, lang, n_toks, n_unique_toks, self_influence
FROM scored
ORDER BY self_influence DESC, doc_id ASC
LIMIT 20
"""


@register(
    "nb_self_influence",
    oracle=_SI_ORACLE,
    tags=("valuation", "memorization", "nb", "training-data"),
)
def nb_self_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memorization proxy via exact self-influence: every training doc
    scored under the NB model WITH vs WITHOUT its own token counts —
    the leave-THIS-doc-out model again derived by count subtraction
    (c - n_dt per token, tot - n_d per class, vocab minus the doc's
    corpus-unique tokens), so the audit is one token census plus one
    (doc, tok)-grain join, not |corpus| retrains. Docs whose own
    presence inflates their likelihood most (top-20) are the
    atypical/memorized ones a curation pass inspects first.

    Plan shape at 100 TB: ndt (per-doc token counts) is the single
    corpus scan, map-side combinable; cnt/gt/tot are vocabulary-grain
    aggregates joined back at (doc, tok) grain — doc-keyed shuffles
    only, never a pair space; the final top-20 is
    TakeOrderedAndProject on the rounded score."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.where(F.col("doc_id") % 5 != 0).select(
        "doc_id", "lang", F.explode(TX.tokens("text")).alias("tok")
    )
    ndt = toks.groupBy("doc_id", "lang", "tok").agg(
        F.count(F.lit(1)).alias("n_dt")
    )
    cnt = ndt.groupBy("lang", "tok").agg(F.sum("n_dt").alias("c"))
    gt = ndt.groupBy("tok").agg(F.sum("n_dt").alias("g"))
    tot = ndt.groupBy("lang").agg(
        F.sum("n_dt").cast("double").alias("tot_l")
    )
    vocab = ndt.agg(F.countDistinct("tok").cast("double").alias("v"))
    train_docs = docs.where(F.col("doc_id") % 5 != 0)
    prior = train_docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("double").alias("nd")
    )
    td = train_docs.agg(F.count(F.lit(1)).cast("double").alias("td"))

    per_doc = (
        ndt.join(cnt, ["lang", "tok"])
        .join(gt, "tok")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("n_dt").cast("double").alias("n_d"),
            F.sum(F.col("n_dt") * F.log(F.col("c") + 1)).alias("incl_sum"),
            F.sum(
                F.col("n_dt") * F.log(F.col("c") - F.col("n_dt") + 1)
            ).alias("excl_sum"),
            F.sum(
                F.when(F.col("g") == F.col("n_dt"), 1.0).otherwise(0.0)
            ).alias("u_d"),
        )
    )
    scored = (
        per_doc.join(F.broadcast(tot), "lang")
        .join(F.broadcast(prior), "lang")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(td))
        .select(
            "doc_id",
            "lang",
            F.col("n_d").cast("long").alias("n_toks"),
            F.col("u_d").cast("long").alias("n_unique_toks"),
            F.round(
                (
                    F.col("incl_sum")
                    - F.col("n_d") * F.log(F.col("tot_l") + F.col("v"))
                    + F.log(F.col("nd") / F.col("td"))
                )
                - (
                    F.col("excl_sum")
                    - F.col("n_d")
                    * F.log(
                        F.col("tot_l")
                        - F.col("n_d")
                        + F.col("v")
                        - F.col("u_d")
                    )
                    + F.log((F.col("nd") - 1) / (F.col("td") - 1))
                ),
                6,
            ).alias("self_influence"),
        )
    )
    return scored.orderBy(
        F.col("self_influence").desc(), F.col("doc_id").asc()
    ).limit(20)


# ---------------------------------------------------------------------------
# Classifier agreement (Cohen's kappa)
# ---------------------------------------------------------------------------

_KAPPA_ORACLE = f"""
WITH feat AS (
    SELECT doc_id,
           len({_TOKENS_SQL}) AS tokcnt,
           len(list_distinct({_TOKENS_SQL}))::DOUBLE
               / len({_TOKENS_SQL}) AS div_ratio
    FROM documents
),
gated AS (
    SELECT doc_id,
           CASE WHEN tokcnt >= 40 THEN 1 ELSE 0 END AS keep_a,
           CASE WHEN div_ratio >= 0.45 AND tokcnt >= 25 THEN 1 ELSE 0 END
               AS keep_b
    FROM feat
),
cells AS (
    SELECT count(*)::DOUBLE AS n,
           sum(CASE WHEN keep_a = 1 AND keep_b = 1 THEN 1 ELSE 0 END)
               ::BIGINT AS both_keep,
           sum(CASE WHEN keep_a = 1 AND keep_b = 0 THEN 1 ELSE 0 END)
               ::BIGINT AS a_only,
           sum(CASE WHEN keep_a = 0 AND keep_b = 1 THEN 1 ELSE 0 END)
               ::BIGINT AS b_only,
           sum(CASE WHEN keep_a = 0 AND keep_b = 0 THEN 1 ELSE 0 END)
               ::BIGINT AS both_drop
    FROM gated
)
SELECT n::BIGINT AS n_docs, both_keep, a_only, b_only, both_drop,
       round((both_keep + both_drop) / n, 4) AS po,
       round(((both_keep + a_only) / n) * ((both_keep + b_only) / n)
             + ((b_only + both_drop) / n) * ((a_only + both_drop) / n),
             4) AS pe,
       CASE
           WHEN ((both_keep + a_only) / n) * ((both_keep + b_only) / n)
                + ((b_only + both_drop) / n) * ((a_only + both_drop) / n)
                >= 1.0 THEN 1.0
           ELSE round(
               ((both_keep + both_drop) / n
                - (((both_keep + a_only) / n) * ((both_keep + b_only) / n)
                   + ((b_only + both_drop) / n)
                     * ((a_only + both_drop) / n)))
               / (1.0
                  - (((both_keep + a_only) / n) * ((both_keep + b_only) / n)
                     + ((b_only + both_drop) / n)
                       * ((a_only + both_drop) / n))),
               4)
       END AS kappa
FROM cells
"""


@register(
    "classifier_agreement_kappa",
    oracle=_KAPPA_ORACLE,
    tags=("valuation", "quality", "eval", "agreement"),
)
def classifier_agreement_kappa(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cohen's kappa between two independent keep/drop quality gates —
    gate A keeps long docs (>= 40 tokens), gate B keeps lexically
    diverse docs (distinct/total token ratio >= 0.45 with a minimal
    length floor). Since length and diversity anti-correlate in any
    vocabulary-bounded corpus, the gates genuinely disagree and kappa
    measures how much of their agreement is beyond chance — the
    inter-rater reliability check a curation team runs before trusting
    a single filter's keep set.

    Plan shape at 100 TB: two scan-local boolean features, one 4-cell
    census (map-side combinable), a 1-row output — no shuffle beyond
    the final single-row aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    arr = TX.tokens("text")
    feat = docs.select(
        F.size(arr).alias("tokcnt"),
        (
            F.size(F.array_distinct(arr)).cast("double") / F.size(arr)
        ).alias("div_ratio"),
    )
    gated = feat.select(
        F.when(F.col("tokcnt") >= 40, 1).otherwise(0).alias("keep_a"),
        F.when(
            (F.col("div_ratio") >= 0.45) & (F.col("tokcnt") >= 25), 1
        )
        .otherwise(0)
        .alias("keep_b"),
    )
    cells = gated.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(
            F.when((F.col("keep_a") == 1) & (F.col("keep_b") == 1), 1)
            .otherwise(0)
        ).alias("both_keep"),
        F.sum(
            F.when((F.col("keep_a") == 1) & (F.col("keep_b") == 0), 1)
            .otherwise(0)
        ).alias("a_only"),
        F.sum(
            F.when((F.col("keep_a") == 0) & (F.col("keep_b") == 1), 1)
            .otherwise(0)
        ).alias("b_only"),
        F.sum(
            F.when((F.col("keep_a") == 0) & (F.col("keep_b") == 0), 1)
            .otherwise(0)
        ).alias("both_drop"),
    )
    po = (F.col("both_keep") + F.col("both_drop")) / F.col("n")
    pe = (
        (F.col("both_keep") + F.col("a_only"))
        / F.col("n")
        * ((F.col("both_keep") + F.col("b_only")) / F.col("n"))
    ) + (
        (F.col("b_only") + F.col("both_drop"))
        / F.col("n")
        * ((F.col("a_only") + F.col("both_drop")) / F.col("n"))
    )
    return cells.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("both_keep").cast("long").alias("both_keep"),
        F.col("a_only").cast("long").alias("a_only"),
        F.col("b_only").cast("long").alias("b_only"),
        F.col("both_drop").cast("long").alias("both_drop"),
        F.round(po, 4).alias("po"),
        F.round(pe, 4).alias("pe"),
        F.when(pe >= 1.0, F.lit(1.0))
        .otherwise(F.round((po - pe) / (1.0 - pe), 4))
        .alias("kappa"),
    )


# ---------------------------------------------------------------------------
# Coreset sensitivity sample
# ---------------------------------------------------------------------------

_CS_K = 8  # seed centroids
_CS_M = 64  # expected coreset size
_CS_SPACE = 1152921504606846976.0  # 2^60, the portable md5-hash range

_CS_ORACLE = f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
seeds AS (
    SELECT v AS s FROM e ORDER BY vec_id ASC LIMIT {_CS_K}
),
costs AS (
    SELECT e.vec_id,
           round(min(list_distance(e.v, s.s) * list_distance(e.v, s.s)),
                 6) AS cost
    FROM e CROSS JOIN seeds s GROUP BY e.vec_id
),
tot AS (SELECT sum(cost) AS sc, count(*)::DOUBLE AS n FROM costs),
scored AS (
    SELECT c.vec_id, c.cost,
           least(1.0, {_CS_M} * (0.5 * c.cost / t.sc + 0.5 / t.n)) AS p,
           ('0x' || substr(md5('coreset|' || c.vec_id), 1, 15))::BIGINT
               / {_CS_SPACE} AS u
    FROM costs c CROSS JOIN tot t
),
kept AS (
    SELECT vec_id, cost, 1.0 / p AS w
    FROM scored WHERE round(u, 7) < round(p, 7)
)
SELECT t.n::BIGINT AS n_points,
       (SELECT count(*) FROM kept)::BIGINT AS coreset_n,
       round((SELECT sum(w) FROM kept), 2) AS est_mass,
       round((SELECT sum(w * cost) FROM kept) / t.sc, 3) AS cost_ratio
FROM tot t
"""


@register(
    "coreset_sensitivity_sample",
    oracle=_CS_ORACLE,
    tags=("valuation", "coreset", "sampling", "vector"),
)
def coreset_sensitivity_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sensitivity-sampled weighted coreset over the embedding table
    (Bachem/Lucic/Krause): cost every point against k seed centroids,
    sample point i with probability min(1, m*(cost_i/2*sum + 1/2n)) via
    a deterministic md5 uniform, weight it 1/p_i. The output checks the
    coreset CONTRACT: the weighted mass estimates n and the weighted
    cost reproduces the corpus cost (cost_ratio ~ 1) — the unbiasedness
    any downstream weighted-kmeans consumer relies on.

    Plan shape at 100 TB: seeds are k driver-collected literals (the
    bounded kmeans-centroid precedent); costing is ONE scan through the
    BLAS Arrow lane (operators/ivf.py::min_cost_arrow — a dgemm per
    batch, not an interpreted per-element fold); the sample predicate
    is scan-local off a 1-row broadcast total — the corpus never
    shuffles. Costs are rounded to 6dp BEFORE the sums and the
    membership comparison rounds both sides to 7dp, so the sampled set
    is bit-identical across engines and cluster topologies."""
    from emails_to_vector_db_spark.operators.ivf import min_cost_arrow

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    # k-row driver collect (the kmeans.py:55 precedent): seeds become
    # numpy literals so costing runs through the BLAS Arrow lane — the
    # interpreted zip_with/aggregate fold took 12.9s at sf1 where one
    # dgemm takes milliseconds (the assign_centroids_arrow lesson).
    seed_rows = (
        e.orderBy(F.col("vec_id").asc()).limit(_CS_K).collect()
    )
    seeds = [list(map(float, r["embedding"])) for r in seed_rows]
    costs = min_cost_arrow(e, seeds)
    # Persisted: consumed by BOTH the totals aggregate and the sample
    # predicate — unpersisted, the costing pass runs twice.
    from pyspark import StorageLevel

    costs = costs.persist(StorageLevel.MEMORY_AND_DISK)
    tot = costs.agg(
        F.sum("cost").alias("sc"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    scored = costs.crossJoin(F.broadcast(tot)).select(
        "vec_id",
        "cost",
        "sc",
        "n",
        F.least(
            F.lit(1.0),
            _CS_M * (0.5 * F.col("cost") / F.col("sc") + 0.5 / F.col("n")),
        ).alias("p"),
        (
            TX.md5_long(
                F.concat(F.lit("coreset|"), F.col("vec_id").cast("string"))
            ).cast("double")
            / F.lit(_CS_SPACE)
        ).alias("u"),
    )
    kept = scored.where(
        F.round(F.col("u"), 7) < F.round(F.col("p"), 7)
    ).select("cost", (F.lit(1.0) / F.col("p")).alias("w"))
    # Aggregate kept WITHOUT a groupBy and join the (possibly NULL)
    # sums onto the 1-row totals frame: an empty coreset must still
    # yield one (n_points, 0, NULL, NULL) row, mirroring the oracle's
    # scalar subqueries (unreachable at _CS_M=64 on current fixtures,
    # but the degenerate shapes must agree).
    ks = kept.agg(
        F.count(F.lit(1)).alias("coreset_n"),
        F.sum("w").alias("w_sum"),
        F.sum(F.col("w") * F.col("cost")).alias("wc_sum"),
    )
    return tot.crossJoin(F.broadcast(ks)).select(
        F.col("n").cast("long").alias("n_points"),
        F.col("coreset_n").cast("long").alias("coreset_n"),
        F.round(F.col("w_sum"), 2).alias("est_mass"),
        F.round(F.col("wc_sum") / F.col("sc"), 3).alias("cost_ratio"),
    )


# ---------------------------------------------------------------------------
# Template (Type-2) duplicate mining, cross-language
# ---------------------------------------------------------------------------

# Twin ids ride a DERIVED offset (max(doc_id) + 1) — a fixed offset
# collides with real ids once the corpus outgrows it (the round-7
# derived-offset lesson, applied fleet-wide to the planted twins).
_TPL_DOCS_SQL = f"""
    SELECT doc_id, lang, text FROM documents
    UNION ALL
    SELECT doc_id + o.off AS doc_id,
           't_' || lang AS lang,
           array_to_string(
               list_transform({_TOKENS_SQL},
                              t -> 'x' || substr(md5(t), 1, 8)),
               ' ') AS text
    FROM documents, (SELECT max(doc_id) + 1 AS off FROM documents) o
    WHERE doc_id % 7 = 3
"""

_TPL_ORACLE = f"""
WITH docs2 AS ({_TPL_DOCS_SQL}),
arr AS (
    SELECT doc_id, lang, {_TOKENS_SQL} AS a FROM docs2
),
fp AS (
    SELECT doc_id, lang, len(a)::BIGINT AS n_toks,
           md5(array_to_string(
               list_transform(a, x -> list_position(a, x)::VARCHAR),
               ',')) AS tfp
    FROM arr
)
SELECT tfp AS template_fp, count(*)::BIGINT AS n_docs,
       count(DISTINCT lang)::BIGINT AS n_langs,
       min(doc_id) AS rep_doc_id,
       min(n_toks) AS template_len
FROM fp
GROUP BY tfp
HAVING count(*) >= 2 AND count(DISTINCT lang) >= 2
"""


@register(
    "template_dups_cross_lang",
    oracle=_TPL_ORACLE,
    tags=("dedup", "template", "cross-lingual", "type-2"),
    bench=True,
)
def template_dups_cross_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Type-2 (template) duplicate mining: every document is
    canonicalized to its token-OCCURRENCE pattern — each token instance
    maps to the 1-based position of that token's FIRST occurrence — so
    two documents that are word-level bijections of each other (the
    machine-translated / templated / boilerplate contamination that
    exact dedup AND MinHash both miss by construction) share a
    fingerprint. The fixture corpus has no natural cross-lingual twins,
    so the query plants them deterministically (a UNION ALL both
    engines run: an md5 word-bijection of every doc_id % 7 == 3 doc
    under a 't_'-prefixed lang), then reports template classes spanning
    >= 2 languages.

    Plan shape at 100 TB: canonicalization is O(L log L) per document —
    posexplode, doc-local min-position, ordered re-assembly (the
    repetition-cutover shape, NEVER the O(L^2) array_position
    expression); grouping is a fingerprint groupBy with no pair space.
    Cited parity: the reference's dedup story is a pgvector exact-match
    upsert (rag.py:52-58) — template-grain contamination is invisible
    to it."""
    d = load_table(spark, sf_dir, "documents")
    off = d.agg((F.max("doc_id") + 1).alias("off"))
    planted = d.crossJoin(F.broadcast(off)).where(
        F.col("doc_id") % 7 == 3
    ).select(
        (F.col("doc_id") + F.col("off")).alias("doc_id"),
        F.concat(F.lit("t_"), F.col("lang")).alias("lang"),
        F.array_join(
            F.transform(
                TX.tokens("text"),
                lambda t: F.concat(F.lit("x"), F.substring(F.md5(t), 1, 8)),
            ),
            " ",
        ).alias("text"),
    )
    docs2 = d.select("doc_id", "lang", "text").unionByName(planted)
    inst = docs2.select(
        "doc_id",
        "lang",
        F.posexplode(TX.tokens("text")).alias("pos", "tok"),
    )
    # Fused canonicalization: ONE (doc, tok) aggregate carries both the
    # first-occurrence position and the token's full position list, so
    # the instance stream is never shuffled a second time for a
    # join-back (measured 44.0s -> the fused shape at sf1; the explode
    # re-expands to instance grain map-side, already co-partitioned for
    # the doc-grain aggregate that follows).
    fo = inst.groupBy("doc_id", "lang", "tok").agg(
        F.min("pos").alias("fpos"),
        F.collect_list("pos").alias("poss"),
    )
    expanded = fo.select(
        "doc_id",
        "lang",
        "fpos",
        F.explode("poss").alias("pos"),
    )
    fp = expanded.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_toks"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "fpos"))),
                    lambda s: (s["fpos"] + 1).cast("string"),
                ),
                ",",
            )
        ).alias("tfp"),
    )
    return (
        fp.groupBy("tfp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("doc_id").alias("rep_doc_id"),
            F.min("n_toks").alias("template_len"),
        )
        .where((F.col("n_docs") >= 2) & (F.col("n_langs") >= 2))
        .select(
            F.col("tfp").alias("template_fp"),
            "n_docs",
            "n_langs",
            "rep_doc_id",
            "template_len",
        )
    )


# ---------------------------------------------------------------------------
# Per-source duplication rate with Wilson CI
# ---------------------------------------------------------------------------

_DR_N_PLANT = 50
_DR_Z = 1.96

# ---------------------------------------------------------------------------
# Canary extraction audit (secret-sharer, data-side)
# ---------------------------------------------------------------------------

_CAN_N = 30  # canaries; copies class = id % 3 -> 1 / 8 / 64 copies

# Canary ids ride a DERIVED base (max(doc_id) + 1), never a fixed
# constant — a fixed 300k base collides with real ids once the corpus
# outgrows it and the `doc_id >= base` canary selector would sweep in
# real documents (the round-7 derived-offset lesson).
_CAN_DOCS_SQL = f"""
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT o.off + i * 1000 + c AS doc_id,
           'zzcanary' || i || ' secret' || i || ' '
               || trim(repeat('pad ', 20 + (i % 4) * 20)) AS text
    FROM (SELECT unnest(range({_CAN_N})) AS i),
         (SELECT unnest(range(64)) AS c),
         (SELECT max(doc_id) + 1 AS off FROM documents) o
    WHERE c < CASE i % 3 WHEN 0 THEN 1 WHEN 1 THEN 8 ELSE 64 END
"""

_CAN_ORACLE = f"""
WITH docs2 AS ({_CAN_DOCS_SQL}),
off AS (SELECT max(doc_id) + 1 AS off FROM documents),
canaries AS (
    SELECT doc_id, text,
           (doc_id - o.off) // 1000 AS cid,
           CASE ((doc_id - o.off) // 1000) % 3
               WHEN 0 THEN 1 WHEN 1 THEN 8 ELSE 64 END AS copies_class,
           len({_TOKENS_SQL}) >= 40 AS pass_quality
    FROM docs2, off o WHERE doc_id >= o.off
),
dedup AS (
    SELECT min(doc_id) AS keep_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM docs2 GROUP BY fp
),
flagged AS (
    SELECT c.cid, c.copies_class, c.pass_quality,
           (d.keep_id IS NOT NULL) AS survives_dedup
    FROM canaries c
    LEFT JOIN dedup d ON d.keep_id = c.doc_id
)
SELECT copies_class,
       count(DISTINCT cid)::BIGINT AS n_canaries,
       count(*)::BIGINT AS n_planted_copies,
       sum(CASE WHEN pass_quality THEN 1 ELSE 0 END)::BIGINT
           AS post_quality_no_dedup,
       sum(CASE WHEN survives_dedup THEN 1 ELSE 0 END)::BIGINT
           AS post_dedup,
       sum(CASE WHEN survives_dedup AND pass_quality THEN 1 ELSE 0 END)
           ::BIGINT AS post_dedup_quality
FROM flagged
GROUP BY copies_class
"""


@register(
    "canary_extraction_audit",
    oracle=_CAN_ORACLE,
    tags=("valuation", "privacy", "memorization", "canary"),
)
def canary_extraction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secret-sharer canary audit, data-side: plant 30 canary
    documents at three replication rates (1 / 8 / 64 byte-identical
    copies) and half-straddling the length quality gate, then measure
    how many COPIES survive (a) the quality gate alone and (b) exact
    dedup + quality. The point the numbers make: without dedup a
    64-copy canary keeps all its copies (memorization risk scales with
    replication), with dedup every canary collapses to at most one
    surviving copy — the quantitative argument for dedup as a
    memorization defence (Lee et al. 2022; Carlini et al.
    secret-sharer, applied to the data pipeline instead of the model).

    Plan shape at 100 TB: canary generation is a literal 100-ish-row
    range product; the audit is the exact-dedup fingerprint groupBy
    (map-side combinable) plus a canary-grain left join — no pair
    space, output is 3 rows."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    off = d.agg((F.max("doc_id") + 1).alias("off"))
    ids = spark.range(_CAN_N).select(F.col("id").alias("i"))
    copies = spark.range(64).select(F.col("id").alias("c"))
    want = (
        F.when(F.col("i") % 3 == 0, 1)
        .when(F.col("i") % 3 == 1, 8)
        .otherwise(64)
    )
    canary_docs = (
        ids.crossJoin(copies)
        .where(F.col("c") < want)
        .crossJoin(F.broadcast(off))
        .select(
            (F.col("off") + F.col("i") * 1000 + F.col("c")).alias("doc_id"),
            F.concat(
                F.lit("zzcanary"),
                F.col("i").cast("string"),
                F.lit(" secret"),
                F.col("i").cast("string"),
                F.lit(" "),
                F.trim(
                    F.repeat(
                        F.lit("pad "),
                        (20 + (F.col("i") % 4) * 20).cast("int"),
                    )
                ),
            ).alias("text"),
        )
    )
    docs2 = d.unionByName(canary_docs)
    dedup_keep = (
        docs2.groupBy(TX.fingerprint("text").alias("fp"))
        .agg(F.min("doc_id").alias("keep_id"))
        .select("keep_id")
    )
    cid = ((F.col("doc_id") - F.col("off")) / 1000).cast("long")
    canaries = (
        docs2.crossJoin(F.broadcast(off))
        .where(F.col("doc_id") >= F.col("off"))
        .select(
            "doc_id",
            cid.alias("cid"),
            F.when(cid % 3 == 0, 1)
            .when(cid % 3 == 1, 8)
            .otherwise(64)
            .alias("copies_class"),
            (F.size(TX.tokens("text")) >= 40).alias("pass_quality"),
        )
    )
    flagged = canaries.join(
        dedup_keep,
        canaries["doc_id"] == dedup_keep["keep_id"],
        "left",
    ).select(
        "cid",
        "copies_class",
        "pass_quality",
        F.col("keep_id").isNotNull().alias("survives_dedup"),
    )
    return flagged.groupBy("copies_class").agg(
        F.countDistinct("cid").alias("n_canaries"),
        F.count(F.lit(1)).alias("n_planted_copies"),
        F.sum(F.when(F.col("pass_quality"), 1).otherwise(0)).alias(
            "post_quality_no_dedup"
        ),
        F.sum(F.when(F.col("survives_dedup"), 1).otherwise(0)).alias(
            "post_dedup"
        ),
        F.sum(
            F.when(
                F.col("survives_dedup") & F.col("pass_quality"), 1
            ).otherwise(0)
        ).alias("post_dedup_quality"),
    )


# ---------------------------------------------------------------------------
# Excess-loss mixture (DoReMi-style one-step reweighting)
# ---------------------------------------------------------------------------

_EL_ETA = 1.0

# The held/train split MUST be hash-based, not doc_id % 5: the fixture
# assigns source from doc_id % 20, so a modular split is perfectly
# correlated with source (held-out would contain ONLY sources = 0 mod 5
# and those sources would have zero training tokens).
_EL_SPLIT_SQL = (
    "('0x' || substr(md5('els|' || doc_id), 1, 15))::BIGINT % 5"
)

_EL_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, source, unnest({_TOKENS_SQL}) AS tok,
           {_EL_SPLIT_SQL} AS split FROM documents
),
train AS (SELECT * FROM toks WHERE split <> 0),
held AS (SELECT * FROM toks WHERE split = 0),
vocab AS (SELECT count(DISTINCT tok)::DOUBLE AS v FROM train),
cg AS (SELECT tok, count(*)::BIGINT AS c FROM train GROUP BY tok),
tg AS (SELECT count(*)::DOUBLE AS t FROM train),
cs AS (
    SELECT source, tok, count(*)::BIGINT AS c
    FROM train GROUP BY source, tok
),
ts AS (SELECT source, count(*)::DOUBLE AS t FROM train GROUP BY source),
ce AS (
    SELECT h.source,
           count(*)::DOUBLE AS n_held,
           -avg(ln((coalesce(g.c, 0) + 1) / (tg.t + v.v))) AS ce_global,
           -avg(ln((coalesce(s.c, 0) + 1)
                   / (coalesce(ts.t, 0) + v.v))) AS ce_own
    FROM held h
    CROSS JOIN tg CROSS JOIN vocab v
    LEFT JOIN cg g ON g.tok = h.tok
    LEFT JOIN cs s ON s.tok = h.tok AND s.source = h.source
    LEFT JOIN ts ON ts.source = h.source
    GROUP BY h.source
),
share AS (
    SELECT source, count(*)::DOUBLE AS n_train_toks
    FROM train GROUP BY source
),
wts AS (
    SELECT c.source, c.n_held, c.ce_global, c.ce_own,
           s.n_train_toks / (SELECT sum(n_train_toks) FROM share) AS p,
           exp({_EL_ETA} * round(c.ce_global - c.ce_own, 6)) AS boost
    FROM ce c JOIN share s ON s.source = c.source
)
SELECT source,
       n_held::BIGINT AS n_held_toks,
       round(ce_global, 6) AS ce_global,
       round(ce_own, 6) AS ce_own,
       round(ce_global - ce_own, 6) AS excess,
       round(p * boost / (SELECT sum(p * boost) FROM wts), 6)
           AS mix_weight
FROM wts
"""


@register(
    "excess_loss_mixture",
    oracle=_EL_ORACLE,
    tags=("valuation", "mixing", "doremi", "training-data"),
    bench=True,
)
def excess_loss_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style one-step domain reweighting: each source's
    held-out excess loss — cross-entropy under the GLOBAL unigram LM
    minus under its OWN-source LM (how much a shared model underserves
    the domain) — drives a multiplicative-weights update
    w ∝ share · exp(eta · excess), normalized into the next epoch's
    mixture. The third mixing policy beside source_mixing_weights'
    uniform-target capping and alpha_mixing_weights' temperature
    flattening: this one is LOSS-driven, the DoReMi core signal,
    computed in closed form from two token censuses instead of a proxy
    model training run.

    Plan shape at 100 TB: one train census at (tok) and (source, tok)
    grain (map-side combinable), one held-out scan joined against the
    two LM tables at token grain — doc text never crosses a shuffle;
    the weight normalization is a |sources|-row aggregate. The excess
    is rounded to 6dp BEFORE exp() so both engines exponentiate the
    identical argument."""
    docs = load_table(spark, sf_dir, "documents")
    split = (
        TX.md5_long(F.concat(F.lit("els|"), F.col("doc_id").cast("string")))
        % 5
    )
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(TX.tokens("text")).alias("tok"),
        split.alias("split"),
    )
    train = toks.where(F.col("split") != 0)
    held = toks.where(F.col("split") == 0)
    # ONE corpus-grain shuffle: the (source, tok) census; the global LM,
    # totals, vocab and shares all derive from this cached frame (the
    # loo_source_valuation discipline).
    from pyspark import StorageLevel

    census = (
        train.groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("n_st"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    vocab = census.agg(F.countDistinct("tok").cast("double").alias("v"))
    cg = census.groupBy("tok").agg(F.sum("n_st").alias("c_g"))
    tg = census.agg(F.sum("n_st").cast("double").alias("t_g"))
    cs = census.select(
        "source", "tok", F.col("n_st").alias("c_s")
    )
    ts = census.groupBy("source").agg(
        F.sum("n_st").cast("double").alias("t_s")
    )
    ce = (
        held.join(F.broadcast(cg), "tok", "left")
        .join(F.broadcast(cs), ["source", "tok"], "left")
        .join(F.broadcast(ts), "source", "left")
        .crossJoin(F.broadcast(tg))
        .crossJoin(F.broadcast(vocab))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_held"),
            (
                -F.avg(
                    F.log(
                        (F.coalesce(F.col("c_g"), F.lit(0)) + 1)
                        / (F.col("t_g") + F.col("v"))
                    )
                )
            ).alias("ce_global"),
            (
                -F.avg(
                    F.log(
                        (F.coalesce(F.col("c_s"), F.lit(0)) + 1)
                        / (F.coalesce(F.col("t_s"), F.lit(0.0)) + F.col("v"))
                    )
                )
            ).alias("ce_own"),
        )
    )
    share = census.groupBy("source").agg(
        F.sum("n_st").cast("double").alias("n_train_toks")
    )
    share_tot = share.agg(F.sum("n_train_toks").alias("tot_toks"))
    wts = (
        ce.join(share, "source")
        .crossJoin(F.broadcast(share_tot))
        .withColumn("p", F.col("n_train_toks") / F.col("tot_toks"))
        .withColumn(
            "boost",
            F.exp(
                _EL_ETA * F.round(F.col("ce_global") - F.col("ce_own"), 6)
            ),
        )
    )
    norm = wts.agg(F.sum(F.col("p") * F.col("boost")).alias("z"))
    return (
        wts.crossJoin(F.broadcast(norm))
        .select(
            "source",
            F.col("n_held").cast("long").alias("n_held_toks"),
            F.round(F.col("ce_global"), 6).alias("ce_global"),
            F.round(F.col("ce_own"), 6).alias("ce_own"),
            F.round(F.col("ce_global") - F.col("ce_own"), 6).alias(
                "excess"
            ),
            F.round(
                F.col("p") * F.col("boost") / F.col("z"), 6
            ).alias("mix_weight"),
        )
    )

_DR_ORACLE = f"""
WITH docs2 AS (
    SELECT doc_id, source, text FROM documents
    UNION ALL
    SELECT doc_id + o.off AS doc_id, source, text
    FROM documents, (SELECT max(doc_id) + 1 AS off FROM documents) o
    WHERE doc_id < {_DR_N_PLANT}
),
fp AS (
    SELECT source,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS f
    FROM docs2
),
per_src AS (
    SELECT source, count(*)::DOUBLE AS n,
           count(DISTINCT f)::DOUBLE AS d
    FROM fp GROUP BY source
)
SELECT source, n::BIGINT AS n_docs, d::BIGINT AS n_distinct,
       round((n - d) / n, 4) AS dup_rate,
       round(greatest(0.0,
           ((n - d) / n + {_DR_Z} * {_DR_Z} / (2 * n)
            - {_DR_Z} * sqrt(((n - d) / n) * (1 - (n - d) / n) / n
                             + {_DR_Z} * {_DR_Z} / (4 * n * n)))
           / (1 + {_DR_Z} * {_DR_Z} / n)), 4) AS ci_lo,
       round(least(1.0,
           ((n - d) / n + {_DR_Z} * {_DR_Z} / (2 * n)
            + {_DR_Z} * sqrt(((n - d) / n) * (1 - (n - d) / n) / n
                             + {_DR_Z} * {_DR_Z} / (4 * n * n)))
           / (1 + {_DR_Z} * {_DR_Z} / n)), 4) AS ci_hi
FROM per_src
"""


@register(
    "dup_rate_by_source_ci",
    oracle=_DR_ORACLE,
    tags=("dedup", "monitoring", "wilson", "source"),
)
def dup_rate_by_source_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplication rate with a Wilson 95% interval —
    the curation-ops monitoring view that ranks sources for the next
    dedup pass, interval-aware so a 3-doc source with one twin doesn't
    outrank a million-doc source at 2%. Duplicates are planted (the
    plans/dedup.py convention: the fixture corpus is dup-free, so a
    UNION ALL both engines run re-inserts the first {_DR_N_PLANT} docs
    under shifted ids).

    Plan shape at 100 TB: fingerprint is scan-local; the whole query is
    one (source, fp)-grain distinct-count aggregate (partial-aggregated
    map-side) and a source-grain census — output is |sources| rows, no
    pair space, no sort."""
    d = load_table(spark, sf_dir, "documents")
    off = d.agg((F.max("doc_id") + 1).alias("off"))
    docs2 = d.select("doc_id", "source", "text").unionByName(
        d.crossJoin(F.broadcast(off))
        .where(F.col("doc_id") < _DR_N_PLANT)
        .select(
            (F.col("doc_id") + F.col("off")).alias("doc_id"),
            "source",
            "text",
        )
    )
    per_src = (
        docs2.select("source", TX.fingerprint("text").alias("f"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.countDistinct("f").cast("double").alias("d"),
        )
    )
    p = (F.col("n") - F.col("d")) / F.col("n")
    z2 = _DR_Z * _DR_Z
    center = p + z2 / (2 * F.col("n"))
    half = _DR_Z * F.sqrt(
        p * (1 - p) / F.col("n") + z2 / (4 * F.col("n") * F.col("n"))
    )
    denom = 1 + z2 / F.col("n")
    return per_src.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.col("d").cast("long").alias("n_distinct"),
        F.round(p, 4).alias("dup_rate"),
        F.round(F.greatest(F.lit(0.0), (center - half) / denom), 4).alias(
            "ci_lo"
        ),
        F.round(F.least(F.lit(1.0), (center + half) / denom), 4).alias(
            "ci_hi"
        ),
    )


# ---------------------------------------------------------------------------
# Filter Shapley attribution
# ---------------------------------------------------------------------------

# Gate thresholds calibrated so the 2^3 coalition lattice is
# non-degenerate on the fixture (each gate keeps 37-66% of docs).
_FS_CPT_LO = 5.36
_FS_CPT_HI = 5.61

_FS_GATES_SQL = f"""
    SELECT len({_TOKENS_SQL})::BIGINT AS tokcnt,
           len({_TOKENS_SQL}) >= 40 AS ga,
           (len(list_distinct({_TOKENS_SQL}))::DOUBLE
              / len({_TOKENS_SQL}) >= 0.45
            AND len({_TOKENS_SQL}) >= 25) AS gb,
           (n_chars::DOUBLE / len({_TOKENS_SQL})
              BETWEEN {_FS_CPT_LO} AND {_FS_CPT_HI}) AS gc
    FROM documents
"""

_FS_ORACLE = f"""
WITH g AS ({_FS_GATES_SQL}),
c AS (
    SELECT sum(tokcnt)::DOUBLE AS t,
           sum(CASE WHEN ga THEN tokcnt ELSE 0 END)::DOUBLE AS ka,
           sum(CASE WHEN gb THEN tokcnt ELSE 0 END)::DOUBLE AS kb,
           sum(CASE WHEN gc THEN tokcnt ELSE 0 END)::DOUBLE AS kc,
           sum(CASE WHEN ga AND gb THEN tokcnt ELSE 0 END)::DOUBLE AS kab,
           sum(CASE WHEN ga AND gc THEN tokcnt ELSE 0 END)::DOUBLE AS kac,
           sum(CASE WHEN gb AND gc THEN tokcnt ELSE 0 END)::DOUBLE AS kbc,
           sum(CASE WHEN ga AND gb AND gc THEN tokcnt ELSE 0 END)::DOUBLE
               AS kabc
    FROM g
)
SELECT t::BIGINT AS total_tokens,
       (t - kabc)::BIGINT AS removed_total,
       round((2 * (t - ka) + (kb - kab) + (kc - kac)
              + 2 * (kbc - kabc)) / 6.0, 4) AS phi_len,
       round((2 * (t - kb) + (ka - kab) + (kc - kbc)
              + 2 * (kac - kabc)) / 6.0, 4) AS phi_div,
       round((2 * (t - kc) + (ka - kac) + (kb - kbc)
              + 2 * (kab - kabc)) / 6.0, 4) AS phi_cpt
FROM c
"""


@register(
    "filter_shapley_attribution",
    oracle=_FS_ORACLE,
    tags=("valuation", "shapley", "quality", "attribution"),
)
def filter_shapley_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT Shapley attribution of removed token mass across three
    quality gates (length, lexical diversity, chars-per-token): with 3
    players the coalition lattice has 2^3 = 8 cells, so the Shapley
    value — each gate's fair share of the jointly-removed tokens,
    accounting for overlap (a doc failing two gates is not
    double-counted to either) — is computable in closed form from ONE
    8-cell census. phi_len + phi_div + phi_cpt = removed_total exactly
    (the Shapley efficiency axiom, which per-gate removal counts
    violate). Completes the valuation family's attribution ladder:
    sources (loo_source_valuation), documents (nb_self_influence),
    filters (this).

    Plan shape at 100 TB: three scan-local boolean gates, one
    map-side-combinable 8-conditional-sum aggregate, a 1-row output —
    no shuffle beyond the single-row agg."""
    docs = load_table(spark, sf_dir, "documents")
    arr = TX.tokens("text")
    tokcnt = F.size(arr)
    g = docs.select(
        tokcnt.cast("long").alias("tokcnt"),
        (tokcnt >= 40).alias("ga"),
        (
            (F.size(F.array_distinct(arr)).cast("double") / tokcnt >= 0.45)
            & (tokcnt >= 25)
        ).alias("gb"),
        (F.col("n_chars").cast("double") / tokcnt).between(
            _FS_CPT_LO, _FS_CPT_HI
        ).alias("gc"),
    )

    def _mass(cond):
        return F.sum(F.when(cond, F.col("tokcnt")).otherwise(0)).cast(
            "double"
        )

    c = g.agg(
        F.sum("tokcnt").cast("double").alias("t"),
        _mass(F.col("ga")).alias("ka"),
        _mass(F.col("gb")).alias("kb"),
        _mass(F.col("gc")).alias("kc"),
        _mass(F.col("ga") & F.col("gb")).alias("kab"),
        _mass(F.col("ga") & F.col("gc")).alias("kac"),
        _mass(F.col("gb") & F.col("gc")).alias("kbc"),
        _mass(F.col("ga") & F.col("gb") & F.col("gc")).alias("kabc"),
    )
    t, ka, kb, kc = F.col("t"), F.col("ka"), F.col("kb"), F.col("kc")
    kab, kac, kbc, kabc = (
        F.col("kab"),
        F.col("kac"),
        F.col("kbc"),
        F.col("kabc"),
    )
    return c.select(
        t.cast("long").alias("total_tokens"),
        (t - kabc).cast("long").alias("removed_total"),
        F.round(
            (2 * (t - ka) + (kb - kab) + (kc - kac) + 2 * (kbc - kabc))
            / 6.0,
            4,
        ).alias("phi_len"),
        F.round(
            (2 * (t - kb) + (ka - kab) + (kc - kbc) + 2 * (kac - kabc))
            / 6.0,
            4,
        ).alias("phi_div"),
        F.round(
            (2 * (t - kc) + (ka - kac) + (kb - kbc) + 2 * (kab - kabc))
            / 6.0,
            4,
        ).alias("phi_cpt"),
    )
