"""Lexical + hybrid retrieval: BM25 keyword top-k and reciprocal-rank
fusion of keyword and vector rankings.

The reference retrieves by vector similarity only (``rag.py:77-82``);
production RAG systems pair that with a lexical ranker (BM25) and fuse
the two rankings (RRF — Cormack et al., "Reciprocal Rank Fusion
outperforms Condorcet", SIGIR 2009: score(d) = Σ_r 1/(k0 + rank_r(d))).
Both are expressed as pure DataFrame plans with DuckDB twins.

Scale notes
-----------
- BM25 prunes each document's token array to the query terms *before*
  exploding (``F.filter`` on the array), so the explode is narrow and
  emits at most |terms| rows per document, not |tokens|.
- Corpus statistics (N, avgdl) and per-term document frequencies are
  tiny aggregates broadcast back onto the per-doc scores — no large
  shuffle except the one (doc_id, term) tf aggregation, which is
  map-side combinable.
- RRF joins two k-row rankings (k ≤ 20): driver-scale inputs, a
  broadcast full-outer join, no wide shuffle at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from emails_to_vector_db_spark.functions import text as TX
from emails_to_vector_db_spark.functions.vector import cosine_similarity
from emails_to_vector_db_spark.plans.registry import register
from emails_to_vector_db_spark.sources.tables import load_table

_TOKENS_SQL = "regexp_split_to_array(trim(text), '\\s+')"

QUERY_TERMS = ("spark", "window", "merge")
_K1 = 1.2
_B = 0.75
TOP_N = 10
_RRF_K0 = 60
_RRF_DEPTH = 20
_PROBE_ID = 7  # same stored-probe convention as plans/vector.py

_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)


def _bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BM25 score for the literal QUERY_TERMS."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select(
        "doc_id",
        F.size(TX.tokens("text")).alias("dl"),
        F.filter(
            TX.tokens("text"), lambda x: x.isin(*QUERY_TERMS)
        ).alias("qtoks"),
    )
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.select("doc_id", "dl", F.explode("qtoks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    # tf is consumed twice (document frequencies + scoring) and Spark does
    # not reuse subplans across branches — without this the whole
    # tokenize→explode→agg lineage (a full corpus scan) runs twice. The
    # persisted payload is tiny: only (doc, query-term) hits survive the
    # term pruning. Corpus stats remain the one other full scan.
    from pyspark import StorageLevel

    tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1.0
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (_K1 + 1))
            / (
                F.col("tf")
                + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("term_score").alias("bm25_raw")
    )


_BM25_CTE = f"""
toks AS (
    SELECT doc_id,
           len({_TOKENS_SQL}) AS dl,
           list_filter({_TOKENS_SQL}, x -> x IN ({_TERMS_SQL})) AS qtoks
    FROM documents
),
stats AS (
    SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM toks
),
tf AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf, min(dl) AS dl
    FROM (SELECT doc_id, dl, unnest(qtoks) AS term FROM toks)
    GROUP BY doc_id, term
),
df_t AS (
    SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
),
bm25 AS (
    SELECT t.doc_id,
           sum(
               ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
               * (t.tf * ({_K1} + 1))
               / (t.tf + {_K1} * (1 - {_B} + {_B} * t.dl / s.avgdl))
           ) AS bm25_raw
    FROM tf t JOIN df_t d USING (term) CROSS JOIN stats s
    GROUP BY t.doc_id
)
"""

_BM25_ORACLE = f"""
WITH {_BM25_CTE}
SELECT doc_id, round(bm25_raw, 6) AS bm25
FROM bm25
ORDER BY bm25_raw DESC, doc_id ASC
LIMIT {TOP_N}
"""


@register("bm25_topk", oracle=_BM25_ORACLE, tags=("text", "retrieval", "bm25"), bench=True)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) keyword top-10 for a 3-term query — the
    lexical ranker the reference's vector-only retrieval lacks. Token
    arrays are pruned to query terms before exploding; corpus stats and
    document frequencies broadcast onto the tf aggregation."""
    scored = _bm25_scores(spark, sf_dir)
    return (
        scored.orderBy(F.col("bm25_raw").desc(), F.col("doc_id").asc())
        .limit(TOP_N)
        .select("doc_id", F.round("bm25_raw", 6).alias("bm25"))
    )


_HYBRID_ORACLE = f"""
WITH {_BM25_CTE},
kw_ranked AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY bm25_raw DESC, doc_id ASC) AS kw_rank
    FROM bm25
    ORDER BY bm25_raw DESC, doc_id ASC
    LIMIT {_RRF_DEPTH}
),
probe AS (
    SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = {_PROBE_ID}
),
vec_scored AS (
    SELECT e.vec_id AS doc_id,
           list_dot_product(e.embedding::DOUBLE[], p.q)
             / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                * sqrt(list_dot_product(p.q, p.q))) AS sim
    FROM embeddings e CROSS JOIN probe p
    WHERE e.vec_id <> {_PROBE_ID}
),
vec_ranked AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY sim DESC, doc_id ASC) AS vec_rank
    FROM vec_scored
    ORDER BY sim DESC, doc_id ASC
    LIMIT {_RRF_DEPTH}
),
fused AS (
    SELECT coalesce(k.doc_id, v.doc_id) AS doc_id,
           coalesce(1.0 / ({_RRF_K0} + k.kw_rank), 0.0)
           + coalesce(1.0 / ({_RRF_K0} + v.vec_rank), 0.0) AS rrf_raw
    FROM kw_ranked k FULL OUTER JOIN vec_ranked v ON k.doc_id = v.doc_id
)
SELECT doc_id, round(rrf_raw, 6) AS rrf_score
FROM fused
ORDER BY rrf_raw DESC, doc_id ASC
LIMIT {TOP_N}
"""


@register(
    "hybrid_rrf_topk",
    oracle=_HYBRID_ORACLE,
    tags=("retrieval", "hybrid", "rrf", "vector", "bm25"),
)
def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (k0=60) of the BM25
    top-20 and the cosine-KNN top-20 for the stored probe — the
    production upgrade of the reference's single-channel retrieval
    (``rag.py:77-90``). Both rankings are ≤20 rows when fused, so the
    full-outer join is broadcast-trivial at any corpus size."""
    kw = (
        _bm25_scores(spark, sf_dir)
        .orderBy(F.col("bm25_raw").desc(), F.col("doc_id").asc())
        .limit(_RRF_DEPTH)
        .withColumn(
            "kw_rank",
            F.row_number().over(
                Window.orderBy(F.col("bm25_raw").desc(), F.col("doc_id").asc())
            ),
        )
        .select("doc_id", "kw_rank")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    probe = F.broadcast(
        emb.where(F.col("vec_id") == _PROBE_ID).select(
            F.col("embedding").alias("q")
        )
    )
    vec = (
        emb.where(F.col("vec_id") != _PROBE_ID)
        .crossJoin(probe)
        .withColumn("sim", cosine_similarity("embedding", "q"))
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(_RRF_DEPTH)
        .withColumn(
            "vec_rank",
            F.row_number().over(
                Window.orderBy(F.col("sim").desc(), F.col("vec_id").asc())
            ),
        )
        .select(F.col("vec_id").alias("doc_id"), "vec_rank")
    )
    fused = (
        kw.join(vec, "doc_id", "full_outer")
        .withColumn(
            "rrf_raw",
            F.coalesce(1.0 / (_RRF_K0 + F.col("kw_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K0 + F.col("vec_rank")), F.lit(0.0)),
        )
    )
    return (
        fused.orderBy(F.col("rrf_raw").desc(), F.col("doc_id").asc())
        .limit(TOP_N)
        .select("doc_id", F.round("rrf_raw", 6).alias("rrf_score"))
    )


_BUDGET = 120
_CAND_K = 20

_CONTEXT_BUDGET_ORACLE = f"""
WITH probe AS (
    SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = {_PROBE_ID}
),
ranked AS (
    SELECT e.vec_id, d.text,
           round(list_distance(e.embedding::DOUBLE[], p.q), 6) AS distance
    FROM embeddings e
    CROSS JOIN probe p
    JOIN documents d ON d.doc_id = e.vec_id
    WHERE e.vec_id <> {_PROBE_ID}
    ORDER BY list_distance(e.embedding::DOUBLE[], p.q) ASC, e.vec_id ASC
    LIMIT {_CAND_K}
),
budgeted AS (
    SELECT vec_id, distance,
           len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok,
           sum(len(regexp_split_to_array(trim(text), '\\s+')))
               OVER (ORDER BY distance ASC, vec_id ASC
                     ROWS UNBOUNDED PRECEDING) AS cum_tok
    FROM ranked
)
SELECT vec_id, distance, n_tok::INT AS n_tok, cum_tok::BIGINT AS cum_tok
FROM budgeted
WHERE cum_tok - n_tok < {_BUDGET}
"""


@register(
    "context_token_budget",
    oracle=_CONTEXT_BUDGET_ORACLE,
    tags=("retrieval", "rag", "window"),
)
def context_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted context assembly: KNN top-20 candidates in distance
    order, admitted greedily while the running token total is under a
    120-token budget (the last admitted document may straddle it) — the
    production version of the reference's unbounded ``"\\n\\n".join``
    (``rag.py:189``), which overflows the LLM context window as soon as
    retrieved documents are long. The window runs over ≤20 rows, so the
    global ordering is driver-trivial at any corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    from emails_to_vector_db_spark.functions.vector import l2_distance

    probe = F.broadcast(
        emb.where(F.col("vec_id") == _PROBE_ID).select(
            F.col("embedding").alias("q")
        )
    )
    ranked = (
        emb.where(F.col("vec_id") != _PROBE_ID)
        .join(docs, F.col("vec_id") == F.col("doc_id"))
        .crossJoin(probe)
        .withColumn("dist_raw", l2_distance("embedding", "q"))
        .orderBy(F.col("dist_raw").asc(), F.col("vec_id").asc())
        .limit(_CAND_K)
        .select(
            "vec_id",
            F.round("dist_raw", 6).alias("distance"),
            F.size(TX.tokens("text")).alias("n_tok"),
        )
    )
    w = (
        Window.orderBy(F.col("distance").asc(), F.col("vec_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budgeted = ranked.withColumn("cum_tok", F.sum("n_tok").over(w))
    return budgeted.where(
        (F.col("cum_tok") - F.col("n_tok")) < _BUDGET
    ).select(
        "vec_id",
        "distance",
        F.col("n_tok").cast("int").alias("n_tok"),
        F.col("cum_tok").cast("long").alias("cum_tok"),
    )


_MMR_LAM = 0.7
_MMR_K = 5
_MMR_POOL = 15


def _mmr_oracle() -> str:
    """The SAME k-step greedy MMR selection unrolled as chained CTEs —
    one (score → argmax → pool-shrink) stage per selection step, max-sim
    against the accumulated selected set via a grouped cross join.
    Relevance and pairwise similarity are rounded to 6dp in BOTH engines
    BEFORE any argmax, so every greedy decision is made on identical
    doubles (the same discipline as the distance oracles)."""
    cos = (
        "round(list_dot_product({a}, {b})"
        " / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b}))), 6)"
    )
    rel = cos.format(a="e.embedding::DOUBLE[]", b="p.q")
    pair = cos.format(a="p.v", b="s.v")
    one_minus = repr(1.0 - _MMR_LAM)  # same double literal as the plan
    parts = [
        f"""WITH probe AS (
    SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = {_PROBE_ID}
),
cand AS (
    SELECT e.vec_id, e.embedding::DOUBLE[] AS v, {rel} AS rel
    FROM embeddings e CROSS JOIN probe p
    WHERE e.vec_id <> {_PROBE_ID}
    ORDER BY rel DESC, e.vec_id ASC LIMIT {_MMR_POOL}
),
sel1 AS (
    SELECT vec_id, v, rel, 1 AS sel_rank
    FROM cand ORDER BY rel DESC, vec_id ASC LIMIT 1
),
selected1 AS (SELECT * FROM sel1),
pool1 AS (
    SELECT c.* FROM cand c
    WHERE c.vec_id NOT IN (SELECT vec_id FROM sel1)
)"""
    ]
    for i in range(2, _MMR_K + 1):
        parts.append(
            f""",
ms{i} AS (
    SELECT p.vec_id, max({pair}) AS max_sim
    FROM pool{i - 1} p CROSS JOIN selected{i - 1} s
    GROUP BY p.vec_id
),
sel{i} AS (
    SELECT p.vec_id, p.v, p.rel, {i} AS sel_rank
    FROM pool{i - 1} p JOIN ms{i} m ON p.vec_id = m.vec_id
    ORDER BY {_MMR_LAM} * p.rel - {one_minus} * m.max_sim DESC,
             p.vec_id ASC
    LIMIT 1
),
selected{i} AS (SELECT * FROM selected{i - 1} UNION ALL SELECT * FROM sel{i}),
pool{i} AS (
    SELECT p.* FROM pool{i - 1} p
    WHERE p.vec_id NOT IN (SELECT vec_id FROM sel{i})
)"""
        )
    parts.append(
        f"""
SELECT vec_id, sel_rank, rel FROM selected{_MMR_K}"""
    )
    return "".join(parts)


@register(
    "mmr_rerank",
    oracle=_mmr_oracle(),
    tags=("retrieval", "rag", "mmr", "vector"),
)
def mmr_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance diversity re-rank (Carbonell & Goldstein
    1998): from the 15 most-probe-similar embeddings, greedily select 5
    maximizing ``lam*rel − (1−lam)·max cos to already-selected`` — the
    DataFrame twin of the driver-side ``pipeline.rag.mmr_rerank`` (the
    reference's retrieval returns raw distance order only,
    ``rag.py:77-90``). The greedy loop is unrolled into k plan stages;
    every stage operates on the ≤15-row candidate relation (broadcast-
    scale at any corpus size — the corpus-sized work is only the initial
    top-N, a TakeOrderedAndProject). The candidate top-N is collected
    ONCE at the API edge (15 rows — the documented P8 boundary) and the
    greedy stages run over the resulting LocalRelation: leaving them as
    derivations of the corpus plan re-executes the full scan once per
    plan branch, O(2^k) scans at 10× scale (measured 19s vs <1s,
    docs/SCALE_NOTES.md). Rel/sim are rounded to 6dp before every
    argmax so the DuckDB oracle's greedy decisions are bit-identical;
    equivalence with pipeline.rag.mmr_rerank is asserted in
    tests/test_pipeline.py::test_mmr_registered_query_matches_driver_mmr."""
    emb = load_table(spark, sf_dir, "embeddings")
    probe = F.broadcast(
        emb.where(F.col("vec_id") == _PROBE_ID).select(
            F.col("embedding").alias("q")
        )
    )
    cand_plan = (
        emb.where(F.col("vec_id") != _PROBE_ID)
        .crossJoin(probe)
        .select(
            "vec_id",
            F.col("embedding").alias("v"),
            F.round(cosine_similarity("embedding", "q"), 6).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), F.col("vec_id").asc())
        .limit(_MMR_POOL)
    )
    # One corpus scan total: 15 rows cross the API edge, exact doubles
    # preserved. The greedy loop itself runs in plain Python over those
    # 15 rows — expressing it as k unrolled DataFrame stages doubles the
    # plan tree per stage (each pool/selected embeds every prior stage),
    # and Catalyst spends ~20s ANALYZING the 2^k-subtree plan even on a
    # LocalRelation. The arithmetic mirrors the oracle exactly:
    # sequential-fold dot products in double (no numpy blocked
    # summation), 6dp rounding before every argmax, (rel desc, vec_id
    # asc) tiebreaks.
    import math

    rows = cand_plan.collect()

    def seq_dot(a: list, b: list) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def cos6(a: list, b: list) -> float:
        return round(
            seq_dot(a, b) / (math.sqrt(seq_dot(a, a)) * math.sqrt(seq_dot(b, b))),
            6,
        )

    pool = sorted(rows, key=lambda r: (-r["rel"], r["vec_id"]))
    selected: list = []
    out: list[tuple] = []
    one_minus = 1.0 - _MMR_LAM  # same double literal as the oracle SQL
    for rank in range(1, _MMR_K + 1):
        if rank == 1:
            best = pool[0]  # highest rel, vec_id tiebreak (pre-sorted)
        else:
            best, best_key = None, None
            for c in pool:
                max_sim = max(cos6(c["v"], s["v"]) for s in selected)
                key = (
                    -(_MMR_LAM * c["rel"] - one_minus * max_sim),
                    c["vec_id"],
                )
                if best_key is None or key < best_key:
                    best, best_key = c, key
        selected.append(best)
        pool = [c for c in pool if c["vec_id"] != best["vec_id"]]
        out.append((best["vec_id"], rank, best["rel"]))
    return spark.createDataFrame(
        out, "vec_id long, sel_rank int, rel double"
    )


_AND_TERMS = ("vector", "merge", "window")

_BOOLEAN_AND_ORACLE = f"""
WITH postings AS (
    SELECT DISTINCT doc_id,
           unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
    FROM documents
),
hits AS (
    SELECT doc_id, count(*)::BIGINT AS n_matched
    FROM postings
    WHERE term IN ({', '.join(f"'{t}'" for t in _AND_TERMS)})
    GROUP BY doc_id
    HAVING count(*) = {len(_AND_TERMS)}
)
SELECT h.doc_id, d.lang, d.n_chars
FROM hits h JOIN documents d ON d.doc_id = h.doc_id
"""


@register(
    "boolean_and_retrieval",
    oracle=_BOOLEAN_AND_ORACLE,
    tags=("retrieval", "postings", "boolean"),
)
def boolean_and_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (AND) boolean retrieval via posting-list
    intersection: documents containing ALL query terms, computed as a
    term-filtered postings groupBy whose count must equal the query
    arity — the classic inverted-index intersection expressed as one
    map-side-combinable aggregation (no self-join per term pair).

    The postings build is the same explode that feeds BM25 above; the
    IN-list prunes the postings stream to query terms BEFORE any
    shuffle, so corpus-scale work is a filtered scan. Scale note: a
    real index persists the postings table bucketed by term; this plan
    is the query-time shape over it.
    """
    docs = load_table(spark, sf_dir, "documents")
    postings = docs.select(
        "doc_id",
        F.explode(F.array_distinct(TX.tokens("text"))).alias("term"),
    )
    hits = (
        postings.where(F.col("term").isin(*_AND_TERMS))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
        .where(F.col("n_matched") == len(_AND_TERMS))
    )
    return hits.join(docs, "doc_id").select("doc_id", "lang", "n_chars")


_NDCG_K = 10

_NDCG_ORACLE = f"""
WITH q AS (
    SELECT e.embedding::DOUBLE[] AS qv, d.source AS qsrc, d.lang AS qlang
    FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
    WHERE e.vec_id = {_PROBE_ID}
),
scored AS (
    SELECT e.vec_id,
           list_dot_product(e.embedding::DOUBLE[], q.qv)
             / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                * sqrt(list_dot_product(q.qv, q.qv))) AS sim,
           CASE WHEN d.source = q.qsrc THEN 2
                WHEN d.lang = q.qlang THEN 1 ELSE 0 END AS rel
    FROM embeddings e
    JOIN documents d ON d.doc_id = e.vec_id
    CROSS JOIN q
    WHERE e.vec_id <> {_PROBE_ID}
),
ranked AS (
    SELECT rel, row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS pos
    FROM scored
),
ideal AS (
    SELECT rel, row_number() OVER (ORDER BY rel DESC, vec_id ASC) AS pos
    FROM scored
),
dcg AS (
    SELECT sum((pow(2, rel) - 1) / log2(pos + 1)) AS dcg
    FROM ranked WHERE pos <= {_NDCG_K}
),
idcg AS (
    SELECT sum((pow(2, rel) - 1) / log2(pos + 1)) AS idcg
    FROM ideal WHERE pos <= {_NDCG_K}
)
SELECT {_PROBE_ID}::BIGINT AS query_id,
       round(dcg.dcg, 6) AS dcg_at_k,
       round(idcg.idcg, 6) AS idcg_at_k,
       round(dcg.dcg / idcg.idcg, 6) AS ndcg_at_k
FROM dcg CROSS JOIN idcg
"""


@register(
    "ndcg_retrieval_eval",
    oracle=_NDCG_ORACLE,
    tags=("retrieval", "eval", "ml"),
)
def ndcg_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of the embedding-cosine ranking against a graded
    relevance oracle (2 = same source as the query doc, 1 = same
    language, 0 = neither) — the third leg of the in-engine evaluation
    suite beside recall@k (ANN audits) and AUC (score_auc_eval):
    RANKING quality with graded gains, hash-checked.

    Plan: one broadcast of the 1-row query (vector + metadata), one
    corpus scan scoring sim and relevance together, two window
    rankings (real and ideal) that aggregate to scalars at k=10 — the
    global windows run AFTER TakeOrdered-sized truncation is
    impossible, so they are the documented scale ceiling; at 100 TB the
    real ranking becomes top-k-first (TakeOrderedAndProject) and the
    ideal ranking a relevance-histogram closed form.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    base = emb.join(docs, emb["vec_id"] == docs["doc_id"]).select(
        "vec_id", "embedding", "source", "lang"
    )
    q = F.broadcast(
        base.where(F.col("vec_id") == _PROBE_ID).select(
            F.col("embedding").alias("qv"),
            F.col("source").alias("qsrc"),
            F.col("lang").alias("qlang"),
        )
    )
    scored = (
        base.where(F.col("vec_id") != _PROBE_ID)
        .crossJoin(q)
        .select(
            "vec_id",
            cosine_similarity("embedding", "qv").alias("sim"),
            F.when(F.col("source") == F.col("qsrc"), 2)
            .when(F.col("lang") == F.col("qlang"), 1)
            .otherwise(0)
            .alias("rel"),
        )
    )
    gain = (F.pow(F.lit(2.0), F.col("rel")) - 1) / F.log2(F.col("pos") + 1)
    w_real = Window.orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    w_ideal = Window.orderBy(F.col("rel").desc(), F.col("vec_id").asc())
    dcg = (
        scored.withColumn("pos", F.row_number().over(w_real))
        .where(F.col("pos") <= _NDCG_K)
        .agg(F.sum(gain).alias("dcg"))
    )
    idcg = (
        scored.withColumn("pos", F.row_number().over(w_ideal))
        .where(F.col("pos") <= _NDCG_K)
        .agg(F.sum(gain).alias("idcg"))
    )
    return dcg.crossJoin(idcg).select(
        F.lit(_PROBE_ID).cast("long").alias("query_id"),
        F.round("dcg", 6).alias("dcg_at_k"),
        F.round("idcg", 6).alias("idcg_at_k"),
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg_at_k"),
    )


# stored alert queries: (query_id, conjunctive terms) — the literal
# "subscription" table a percolator matches every incoming doc against
_STORED_QUERIES = (
    (1, ("vector", "merge")),
    (2, ("window", "spark", "join")),
    (3, ("zzduptoken",)),  # never matches the base corpus
    (4, ("customer", "table")),
)

_PERCOLATOR_ORACLE = f"""
WITH queries(query_id, term) AS (
    VALUES {", ".join(f"({qid}, '{t}')" for qid, terms in _STORED_QUERIES for t in terms)}
),
qsize AS (
    SELECT query_id, count(*)::BIGINT AS n_terms FROM queries GROUP BY 1
),
postings AS (
    SELECT DISTINCT doc_id,
           unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
    FROM documents
),
hits AS (
    SELECT q.query_id, p.doc_id, count(*)::BIGINT AS matched
    FROM queries q JOIN postings p ON p.term = q.term
    GROUP BY 1, 2
)
SELECT s.query_id,
       coalesce(sum(CASE WHEN h.matched = s.n_terms THEN 1 ELSE 0 END), 0)::BIGINT
           AS n_matching_docs,
       coalesce(min(CASE WHEN h.matched = s.n_terms THEN h.doc_id END), -1)::BIGINT
           AS first_doc
FROM qsize s LEFT JOIN hits h ON h.query_id = s.query_id
GROUP BY s.query_id
"""


@register(
    "percolator_stored_queries",
    oracle=_PERCOLATOR_ORACLE,
    tags=("retrieval", "percolator", "alerting"),
)
def percolator_stored_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REVERSE retrieval (the percolator / alerting shape): a stored
    table of conjunctive term queries is matched against every document
    — which subscriptions fire, on how many docs. The inversion of
    boolean_and_retrieval: there the query is one and docs are many;
    here the corpus streams past a standing query set. A query with no
    possible match (planted) proves the LEFT-join zero lane.

    Plan: the query table broadcasts onto the postings stream (it IS
    tiny — that's the percolator premise); matching is one (query, doc)
    count aggregation compared against the query's arity. Per incoming
    micro-batch at 100 TB this costs a filtered scan + one
    map-side-combined groupBy — no per-query rescans.
    """
    rows = [
        (qid, t) for qid, terms in _STORED_QUERIES for t in terms
    ]
    queries = spark.createDataFrame(rows, "query_id int, term string")
    qsize = queries.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_terms")
    )
    docs = load_table(spark, sf_dir, "documents")
    postings = docs.select(
        "doc_id",
        F.explode(F.array_distinct(TX.tokens("text"))).alias("term"),
    )
    hits = (
        postings.join(F.broadcast(queries), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("matched"))
    )
    return (
        qsize.join(hits, "query_id", "left")
        .groupBy("query_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("matched") == F.col("n_terms"), 1
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_matching_docs"),
            F.coalesce(
                F.min(
                    F.when(
                        F.col("matched") == F.col("n_terms"),
                        F.col("doc_id"),
                    )
                ),
                F.lit(-1),
            )
            .cast("long")
            .alias("first_doc"),
        )
    )


# ---------------------------------------------------------------------------
# RM3 pseudo-relevance-feedback query expansion
# ---------------------------------------------------------------------------

_RM3_ALPHA = 0.5
_RM3_FB_DOCS = 10
_RM3_EXP_TERMS = 10

_RM3_ORACLE = f"""
WITH docs AS (
    SELECT doc_id, len({_TOKENS_SQL}) AS dl FROM documents
),
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM docs),
tf_all AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf, min(dl) AS dl
    FROM (
        SELECT doc_id, len({_TOKENS_SQL}) AS dl,
               unnest({_TOKENS_SQL}) AS term
        FROM documents
    )
    GROUP BY doc_id, term
),
df_all AS (SELECT term, count(*)::BIGINT AS df FROM tf_all GROUP BY term),
bm25_0 AS (
    SELECT t.doc_id,
           sum(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
               * (t.tf * ({_K1} + 1))
               / (t.tf + {_K1} * (1 - {_B} + {_B} * t.dl / s.avgdl))
           ) AS sc
    FROM tf_all t JOIN df_all d USING (term) CROSS JOIN stats s
    WHERE t.term IN ({_TERMS_SQL})
    GROUP BY t.doc_id
),
fb AS (
    SELECT doc_id, sc FROM bm25_0
    ORDER BY sc DESC, doc_id ASC LIMIT {_RM3_FB_DOCS}
),
fbsum AS (SELECT sum(sc) AS s FROM fb),
rm1 AS (
    SELECT t.term, sum((f.sc / fs.s) * t.tf / t.dl) AS p
    FROM tf_all t JOIN fb f USING (doc_id) CROSS JOIN fbsum fs
    GROUP BY t.term
),
exp_t AS (
    SELECT term, p FROM rm1
    ORDER BY round(p, 9) DESC, term ASC LIMIT {_RM3_EXP_TERMS}
),
esum AS (SELECT sum(p) AS s FROM exp_t),
qw AS (
    SELECT coalesce(o.term, e.term) AS term,
           coalesce(o.w, 0) + coalesce(e.we, 0) AS w
    FROM (
        SELECT unnest([{_TERMS_SQL}]) AS term,
               {_RM3_ALPHA} / {len(QUERY_TERMS)} AS w
    ) o
    FULL OUTER JOIN (
        SELECT term, (1 - {_RM3_ALPHA}) * p / (SELECT s FROM esum) AS we
        FROM exp_t
    ) e ON e.term = o.term
),
scored AS (
    SELECT t.doc_id,
           sum(q.w
               * ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
               * (t.tf * ({_K1} + 1))
               / (t.tf + {_K1} * (1 - {_B} + {_B} * t.dl / s.avgdl))
           ) AS rm3_raw
    FROM tf_all t
    JOIN qw q USING (term)
    JOIN df_all d USING (term)
    CROSS JOIN stats s
    GROUP BY t.doc_id
)
SELECT doc_id, round(rm3_raw, 6) AS rm3_score
FROM scored
ORDER BY round(rm3_raw, 6) DESC, doc_id ASC
LIMIT {TOP_N}
"""


@register(
    "rm3_query_expansion",
    oracle=_RM3_ORACLE,
    tags=("text", "retrieval", "bm25", "prf"),
    bench=True,
)
def rm3_query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RM3 pseudo-relevance feedback (Lavrenko & Croft 2001; the Abdul-
    Jaleel et al. 2004 interpolation): BM25 retrieves {_RM3_FB_DOCS}
    feedback docs for the literal query; their score-weighted term
    distribution (RM1, p(w|d)=tf/dl) yields {_RM3_EXP_TERMS} expansion
    terms; the original query (weight alpha={_RM3_ALPHA}, uniform) and
    the normalized expansion model interpolate into a WEIGHTED query
    that re-scores the corpus — the classic recall-boosting second
    pass every lexical retrieval stack ships.

    Plan shape: three corpus passes, each pruned to what it needs —
    pass 1 is the existing term-pruned BM25 (only query-term hits
    survive the scan); pass 2 explodes tokens ONLY for the
    {_RM3_FB_DOCS} feedback docs (broadcast left-semi prune before the
    per-term aggregate); pass 3 joins the scan against the ~13-row
    broadcast weight table, so again only weighted-term hits leave the
    scan. Corpus stats and document frequencies broadcast; the
    expansion-term cutoff ranks on the ROUNDED RM1 probability so
    float association noise cannot change the term set."""
    from pyspark import StorageLevel

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = d.select(
        "doc_id",
        F.size(TX.tokens("text")).alias("dl"),
        TX.tokens("text").alias("toks"),
    )
    stats = F.broadcast(
        base.agg(
            F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
        )
    )
    fb = F.broadcast(
        _bm25_scores(spark, sf_dir)
        .orderBy(F.col("bm25_raw").desc(), F.col("doc_id").asc())
        .limit(_RM3_FB_DOCS)
        .select("doc_id", F.col("bm25_raw").alias("sc"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    fbsum = F.broadcast(fb.agg(F.sum("sc").alias("s")))
    fb_tf = (
        base.join(fb.select("doc_id"), "doc_id", "left_semi")
        .select("doc_id", "dl", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    rm1 = (
        fb_tf.join(fb, "doc_id")
        .crossJoin(fbsum)
        .groupBy("term")
        .agg(
            F.sum(
                (F.col("sc") / F.col("s")) * F.col("tf") / F.col("dl")
            ).alias("p")
        )
    )
    exp_t = (
        rm1.orderBy(F.round("p", 9).desc(), F.col("term").asc())
        .limit(_RM3_EXP_TERMS)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    esum = F.broadcast(exp_t.agg(F.sum("p").alias("s")))
    orig = spark.createDataFrame(
        [(t, _RM3_ALPHA / len(QUERY_TERMS)) for t in QUERY_TERMS],
        "term string, w_orig double",
    )
    qw = F.broadcast(
        orig.join(
            exp_t.crossJoin(esum).select(
                "term",
                ((1 - _RM3_ALPHA) * F.col("p") / F.col("s")).alias("w_exp"),
            ),
            "term",
            "full_outer",
        ).select(
            "term",
            (
                F.coalesce("w_orig", F.lit(0.0))
                + F.coalesce("w_exp", F.lit(0.0))
            ).alias("w"),
        )
    )
    tf2 = (
        base.select("doc_id", "dl", F.explode("toks").alias("term"))
        .join(qw, "term")
        .groupBy("doc_id", "term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.first("dl").alias("dl"),
            F.first("w").alias("w"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    df2 = tf2.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    sat = (F.col("tf") * (_K1 + 1)) / (
        F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf2.join(F.broadcast(df2), "term")
        .crossJoin(stats)
        .groupBy("doc_id")
        .agg(F.sum(F.col("w") * idf * sat).alias("rm3_raw"))
        .orderBy(F.round("rm3_raw", 6).desc(), F.col("doc_id").asc())
        .limit(TOP_N)
        .select("doc_id", F.round("rm3_raw", 6).alias("rm3_score"))
    )


# ---------------------------------------------------------------------------
# MRR / recall@k / precision@k retrieval evaluation
# ---------------------------------------------------------------------------

_MRR_K = 10

_MRR_ORACLE = f"""
WITH q AS (
    SELECT e.embedding::DOUBLE[] AS qv, d.source AS qsrc
    FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
    WHERE e.vec_id = {_PROBE_ID}
),
scored AS (
    SELECT e.vec_id,
           list_dot_product(e.embedding::DOUBLE[], q.qv)
             / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                * sqrt(list_dot_product(q.qv, q.qv))) AS sim,
           CASE WHEN d.source = q.qsrc THEN 1 ELSE 0 END AS rel
    FROM embeddings e
    JOIN documents d ON d.doc_id = e.vec_id
    CROSS JOIN q
    WHERE e.vec_id <> {_PROBE_ID}
),
ranked AS (
    SELECT rel, row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS pos
    FROM scored
)
SELECT {_PROBE_ID}::BIGINT AS query_id,
       min(pos) FILTER (rel = 1)::BIGINT AS first_rel_rank,
       round(1.0 / min(pos) FILTER (rel = 1), 6) AS mrr,
       round(count(*) FILTER (rel = 1 AND pos <= {_MRR_K})::DOUBLE
             / count(*) FILTER (rel = 1), 6) AS recall_at_k,
       round(count(*) FILTER (rel = 1 AND pos <= {_MRR_K})::DOUBLE
             / {_MRR_K}, 6) AS precision_at_k
FROM ranked
"""


@register(
    "mrr_recall_retrieval_eval",
    oracle=_MRR_ORACLE,
    tags=("retrieval", "eval", "ml"),
)
def mrr_recall_retrieval_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Binary-relevance retrieval metrics for the embedding-cosine
    ranking: reciprocal rank of the first relevant hit (MRR), recall@10
    and precision@10, with same-source-as-query as the relevance oracle
    — the set-based evaluation legs beside the graded nDCG. One
    broadcast 1-row query, one corpus scan scoring similarity and
    relevance together — and NO global ranking window: the first
    relevant hit comes from a TakeOrderedAndProject(1) over the
    relevant rows, its global rank from one count of the rows that
    sort strictly before it (broadcast the 1-row champion back), the
    top-{_MRR_K} hits from TakeOrderedAndProject({_MRR_K}), and the
    recall denominator from the same counting aggregate. Every stage
    is a bounded top-k or a 1-row aggregate at any corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    base = emb.join(docs, emb["vec_id"] == docs["doc_id"]).select(
        "vec_id", "embedding", "source"
    )
    q = F.broadcast(
        base.where(F.col("vec_id") == _PROBE_ID).select(
            F.col("embedding").alias("qv"), F.col("source").alias("qsrc")
        )
    )
    scored = (
        base.where(F.col("vec_id") != _PROBE_ID)
        .crossJoin(q)
        .select(
            "vec_id",
            cosine_similarity("embedding", "qv").alias("sim"),
            F.when(F.col("source") == F.col("qsrc"), 1)
            .otherwise(0)
            .alias("rel"),
        )
    )
    from pyspark import StorageLevel

    scored = scored.persist(StorageLevel.MEMORY_AND_DISK)
    rel1 = F.col("rel") == 1
    # the first relevant hit: TakeOrdered(1) over the relevant rows,
    # then its global rank = 1 + |rows sorting strictly before it|
    # champion = TakeOrdered(1) over the relevant rows — but attached
    # via a left join onto a literal 1-row frame so an EMPTY relevant
    # set still yields one (NULL, NULL) champion row: a bare crossJoin
    # against the empty limit(1) frame would drop every scored row and
    # silently report rank 1 instead of the oracle's NULL metrics
    champ_top = (
        scored.where(rel1)
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(1)
        .select(F.col("sim").alias("bs"), F.col("vec_id").alias("bv"))
    )
    champ = F.broadcast(
        spark.range(1).join(champ_top, F.lit(True), "left").drop("id")
    )
    before = (F.col("sim") > F.col("bs")) | (
        (F.col("sim") == F.col("bs")) & (F.col("vec_id") < F.col("bv"))
    )
    counts = scored.crossJoin(champ).agg(
        F.when(
            F.max("bv").isNotNull(),
            1 + F.count(F.when(before, 1)),
        ).alias("first_rel_rank"),
        F.count(F.when(rel1, 1)).alias("n_rel"),
    )
    topk = F.broadcast(
        scored.orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(_MRR_K)
        .agg(F.sum("rel").alias("n_hits"))
    )
    return counts.crossJoin(topk).select(
        F.lit(_PROBE_ID).cast("long").alias("query_id"),
        F.col("first_rel_rank"),
        F.round(1.0 / F.col("first_rel_rank"), 6).alias("mrr"),
        F.round(
            F.col("n_hits").cast("double") / F.col("n_rel"), 6
        ).alias("recall_at_k"),
        F.round(
            F.col("n_hits").cast("double") / _MRR_K, 6
        ).alias("precision_at_k"),
    )


@register(
    "ndcg_retrieval_eval_topk",
    oracle=_NDCG_ORACLE,
    tags=("retrieval", "eval", "ml", "scale-twin"),
)
def ndcg_retrieval_eval_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB plan ndcg_retrieval_eval's docstring names, actually
    built: the REAL ranking truncates to k=10 via
    TakeOrderedAndProject BEFORE any window (the global ranking window
    of the exact form — its documented scale ceiling — never runs over
    the corpus), and the IDEAL ranking is the closed form over the
    relevance HISTOGRAM (one 3-cell aggregate: the top positions are
    filled by rel=2 docs, then rel=1, by definition — no sort at all).
    Checked against the SAME oracle as the exact form, so the hash
    match is a cross-ALGORITHM differential proving the scalable plan
    computes the identical statistic."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    base = emb.join(docs, emb["vec_id"] == docs["doc_id"]).select(
        "vec_id", "embedding", "source", "lang"
    )
    q = F.broadcast(
        base.where(F.col("vec_id") == _PROBE_ID).select(
            F.col("embedding").alias("qv"),
            F.col("source").alias("qsrc"),
            F.col("lang").alias("qlang"),
        )
    )
    scored = (
        base.where(F.col("vec_id") != _PROBE_ID)
        .crossJoin(q)
        .select(
            "vec_id",
            cosine_similarity("embedding", "qv").alias("sim"),
            F.when(F.col("source") == F.col("qsrc"), 2)
            .when(F.col("lang") == F.col("qlang"), 1)
            .otherwise(0)
            .alias("rel"),
        )
    )
    top = (
        scored.orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(_NDCG_K)
    )
    gain = (F.pow(F.lit(2.0), F.col("rel")) - 1) / F.log2(F.col("pos") + 1)
    w10 = Window.orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    dcg = top.withColumn("pos", F.row_number().over(w10)).agg(
        F.sum(gain).alias("dcg")
    )
    hist = F.broadcast(
        scored.agg(
            F.count(F.when(F.col("rel") == 2, 1)).alias("n2"),
            F.count(F.when(F.col("rel") == 1, 1)).alias("n1"),
        )
    )
    pos_rel = (
        F.when(F.col("id") <= F.col("n2"), 2)
        .when(F.col("id") <= F.col("n2") + F.col("n1"), 1)
        .otherwise(0)
    )
    ideal_gain = (F.pow(F.lit(2.0), pos_rel) - 1) / F.log2(F.col("id") + 1)
    idcg = (
        spark.range(1, _NDCG_K + 1)
        .crossJoin(hist)
        .agg(F.sum(ideal_gain).alias("idcg"))
    )
    return dcg.crossJoin(idcg).select(
        F.lit(_PROBE_ID).cast("long").alias("query_id"),
        F.round("dcg", 6).alias("dcg_at_k"),
        F.round("idcg", 6).alias("idcg_at_k"),
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg_at_k"),
    )


# ---------------------------------------------------------------------------
# Snippet generation: best query-term window for the top BM25 docs
# ---------------------------------------------------------------------------

_SNIP_DOCS = 3
_SNIP_W = 10

_SNIPPET_ORACLE = f"""
WITH docs AS (
    SELECT doc_id, len({_TOKENS_SQL}) AS dl,
           list_filter({_TOKENS_SQL}, x -> x IN ({_TERMS_SQL})) AS qtoks
    FROM documents
),
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM docs),
tf AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf, min(dl) AS dl
    FROM (SELECT doc_id, dl, unnest(qtoks) AS term FROM docs)
    GROUP BY doc_id, term
),
df_t AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
bm25 AS (
    SELECT t.doc_id,
           sum(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
               * (t.tf * ({_K1} + 1))
               / (t.tf + {_K1} * (1 - {_B} + {_B} * t.dl / s.avgdl))
           ) AS sc
    FROM tf t JOIN df_t d USING (term) CROSS JOIN stats s
    GROUP BY t.doc_id
),
top3 AS (
    SELECT doc_id FROM bm25 ORDER BY sc DESC, doc_id ASC LIMIT {_SNIP_DOCS}
),
toks AS (
    SELECT d.doc_id, {_TOKENS_SQL} AS w
    FROM documents d JOIN top3 USING (doc_id)
),
wins AS (
    SELECT doc_id, i AS start_pos,
           len(list_filter(w[i:i + {_SNIP_W - 1}],
                           x -> x IN ({_TERMS_SQL}))) AS n_hits,
           array_to_string(w[i:i + {_SNIP_W - 1}], ' ') AS snippet
    FROM toks,
         unnest(generate_series(1, len(w) - {_SNIP_W - 1})) AS gs(i)
),
best AS (
    SELECT doc_id, start_pos, n_hits, snippet,
           row_number() OVER (
               PARTITION BY doc_id
               ORDER BY n_hits DESC, start_pos ASC
           ) AS rn
    FROM wins
)
SELECT doc_id, start_pos::BIGINT AS start_pos,
       n_hits::BIGINT AS n_hits, snippet
FROM best WHERE rn = 1
"""


@register(
    "snippet_best_window",
    oracle=_SNIPPET_ORACLE,
    tags=("text", "retrieval", "snippet"),
)
def snippet_best_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-result snippet generation: for each of the top-{_SNIP_DOCS}
    BM25 documents, the {_SNIP_W}-token window containing the most
    query-term hits (earliest window on ties) — the highlight/preview
    stage every retrieval stack runs between ranking and rendering,
    here as a first-class engine operator instead of application code.

    Plan shape: ranking reuses the term-pruned BM25 lane; window
    scoring then touches ONLY the {_SNIP_DOCS} winning documents
    (broadcast semi-join before tokenization), where per-window hit
    counts are scan-local slice/filter array expressions and the
    argmax is a bounded per-doc window — the corpus is never scanned
    for snippets at all."""
    top3 = F.broadcast(
        _bm25_scores(spark, sf_dir)
        .orderBy(F.col("bm25_raw").desc(), F.col("doc_id").asc())
        .limit(_SNIP_DOCS)
        .select("doc_id")
    )
    d = load_table(spark, sf_dir, "documents").join(
        top3, "doc_id", "left_semi"
    )
    toks = TX.tokens("text")
    wins = d.select(
        "doc_id",
        toks.alias("w"),
        F.explode(
            F.sequence(F.lit(1), F.size(toks) - (_SNIP_W - 1))
        ).alias("i"),
    ).select(
        "doc_id",
        F.col("i").alias("start_pos"),
        F.size(
            F.filter(
                F.slice("w", F.col("i"), _SNIP_W),
                lambda x: x.isin(*QUERY_TERMS),
            )
        ).alias("n_hits"),
        F.array_join(F.slice("w", F.col("i"), _SNIP_W), " ").alias(
            "snippet"
        ),
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(
            F.col("n_hits").desc(), F.col("start_pos").asc()
        )
    )
    return (
        wins.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("start_pos").cast("long").alias("start_pos"),
            F.col("n_hits").cast("long").alias("n_hits"),
            "snippet",
        )
    )


# ---------------------------------------------------------------------------
# Typo-tolerant retrieval: edit-distance query correction against the vocab
# ---------------------------------------------------------------------------

_TYPO_TERMS = ("sparkk", "windw", "merge")  # two typos + one exact
_TYPO_MAX_DIST = 1

_TYPO_ORACLE = f"""
WITH vocab AS (
    SELECT DISTINCT tok
    FROM (SELECT unnest({_TOKENS_SQL}) AS tok FROM documents)
),
q AS (SELECT unnest(['{"', '".join(_TYPO_TERMS)}']) AS qterm),
cand AS (
    SELECT q.qterm, v.tok,
           levenshtein(q.qterm, v.tok) AS d,
           row_number() OVER (
               PARTITION BY q.qterm
               ORDER BY levenshtein(q.qterm, v.tok) ASC, v.tok ASC
           ) AS rn
    FROM q CROSS JOIN vocab v
    WHERE levenshtein(q.qterm, v.tok) <= {_TYPO_MAX_DIST}
),
corrected AS (SELECT qterm, tok, d FROM cand WHERE rn = 1),
hits AS (
    SELECT c.qterm, c.tok, c.d, count(DISTINCT t.doc_id)::BIGINT AS n_docs
    FROM corrected c
    JOIN (SELECT doc_id, unnest({_TOKENS_SQL}) AS tok FROM documents) t
      ON t.tok = c.tok
    GROUP BY c.qterm, c.tok, c.d
)
SELECT qterm, tok AS corrected_term, d::BIGINT AS edit_dist, n_docs
FROM hits
"""


@register(
    "typo_tolerant_correction",
    oracle=_TYPO_ORACLE,
    tags=("text", "retrieval", "fuzzy"),
)
def typo_tolerant_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Did you mean': each query term maps to its nearest vocabulary
    token within Levenshtein {_TYPO_MAX_DIST} (smallest distance, then
    lexicographic — so 'sparkk'→'spark', 'windw'→'window', and the
    already-correct term maps to itself at distance 0), with the
    corrected term's document frequency — the query-correction stage in
    front of BM25 that turns zero-hit typo queries into real ones.

    Plan shape: the vocabulary census is the corpus-scale pass (shared
    with every lexical lane); candidate correction is a
    |terms| × |vocab| comparison — terms are a handful, so this is a
    broadcast flatMap over the vocab table, never a corpus scan; the
    per-term argmin is a bounded window; the DF lookup joins the ≤
    |terms|-row corrected table back against the token stream."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(TX.tokens("text")).alias("tok")
    )
    vocab = toks.select("tok").distinct()
    q = spark.createDataFrame(
        [(t,) for t in _TYPO_TERMS], "qterm string"
    )
    dist = F.levenshtein(F.col("qterm"), F.col("tok"))
    rn = F.row_number().over(
        Window.partitionBy("qterm").orderBy(
            dist.asc(), F.col("tok").asc()
        )
    )
    corrected = (
        vocab.crossJoin(F.broadcast(q))
        .where(dist <= _TYPO_MAX_DIST)
        .withColumn("d", dist)
        .withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select("qterm", "tok", "d")
    )
    return (
        toks.join(F.broadcast(corrected), "tok")
        .groupBy("qterm", "tok", "d")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .select(
            "qterm",
            F.col("tok").alias("corrected_term"),
            F.col("d").cast("long").alias("edit_dist"),
            "n_docs",
        )
    )


# ---------------------------------------------------------------------------
# TF-IDF cosine similarity join (sparse lexical vectors, df-pruned)
# ---------------------------------------------------------------------------

_TC_DF_FRAC = 0.05  # prune terms appearing in > 5% of docs
# absolute postings ceiling: the FRACTIONAL cap scales with corpus size,
# so at 100x a 5% term carries 100x the postings and its local pair
# space grows 10^4x (measured to destruction on the replicated .scale/
# sf10 corpus — every doc there has 100 identical twins, the dup-heavy
# worst case). A fixed ceiling bounds per-term candidate pairs at
# CAP^2 regardless of corpus size — the production knob; fixture-scale
# results are unchanged (fractional cap binds below 20k docs).
_TC_DF_ABS_CAP = 1000
_TC_TOP = 20

_TC_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, unnest({_TOKENS_SQL}) AS tok FROM documents
),
tf AS (
    SELECT doc_id, tok, count(*)::DOUBLE AS tf
    FROM toks GROUP BY doc_id, tok
),
nd AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM tf),
df AS (
    SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok
),
w AS (
    SELECT t.doc_id, t.tok, t.tf * ln(nd.n / d.df) AS w
    FROM tf t
    JOIN df d ON d.tok = t.tok
    CROSS JOIN nd
    WHERE d.df <= least(floor({_TC_DF_FRAC} * nd.n), {_TC_DF_ABS_CAP})
      AND d.df >= 2
),
nrm AS (
    SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id
),
dots AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           count(*)::BIGINT AS n_shared_terms,
           sum(a.w * b.w) AS dot
    FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT d.doc_a, d.doc_b, d.n_shared_terms,
       round(d.dot / (na.nrm * nb.nrm), 6) AS cosine
FROM dots d
JOIN nrm na ON na.doc_id = d.doc_a
JOIN nrm nb ON nb.doc_id = d.doc_b
ORDER BY cosine DESC, doc_a ASC, doc_b ASC
LIMIT {_TC_TOP}
"""


@register(
    "tfidf_cosine_topk_pairs",
    oracle=_TC_ORACLE,
    tags=("retrieval", "similarity", "tfidf", "join"),
    bench=True,
)
def tfidf_cosine_topk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine similarity join — the LEXICAL vector lane
    beside the dense-embedding KNN family and the set-based
    Jaccard/containment joins: each document becomes an idf-weighted
    sparse vector over its DF-PRUNED vocabulary (terms in >5% of docs
    or in a single doc are dropped — so norms and dots are defined
    over the SAME pruned representation, the stopword-pruned form IR
    systems actually index), and the top-20 most-similar pairs come
    out of the postings self-join. This is the inverted-index
    similarity join (the DIMSUM/all-pairs-similarity shape): pairs
    materialize ONLY through shared informative terms.

    Plan shape: one (doc, term) tf aggregation (map-side combinable,
    the only corpus shuffle); df and N are term-table re-aggs; the df
    cap is the candidate-pair bound — a term with df <= 0.05N emits
    <= (0.05N)² local pairs and hot stop terms emit NONE, which is
    what keeps the join sub-quadratic at corpus scale (raise the cut
    and the pair space, not the algorithm, is what grows). Dot
    products group by the pair key. Norms RIDE IN THE POSTINGS ROWS
    (one doc-partitioned window before the self-join), so cosine is
    computed inside the pair aggregation itself — the pair-grain table
    never joins a doc-grain table, broadcast or otherwise; at 100 TB
    there is no doc-grain broadcast to OOM on."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    )
    tf = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    from pyspark import StorageLevel

    tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
    nd = F.broadcast(
        tf.agg(F.count_distinct("doc_id").cast("double").alias("n"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("df"))
    w = (
        tf.join(df, "tok")
        .crossJoin(nd)
        .where(
            (
                F.col("df")
                <= F.least(
                    F.floor(_TC_DF_FRAC * F.col("n")),
                    F.lit(_TC_DF_ABS_CAP),
                )
            )
            & (F.col("df") >= 2)
        )
        .select(
            "doc_id",
            "tok",
            (F.col("tf") * F.log(F.col("n") / F.col("df"))).alias("w"),
        )
    )
    # norms ride along in the postings rows: one doc-partitioned window
    # (bounded per-doc grain) instead of a doc-grain norm table joined
    # onto the pair-grain dots table later
    wn = w.withColumn(
        "nrm",
        F.sqrt(
            F.sum(F.col("w") * F.col("w")).over(
                Window.partitionBy("doc_id")
            )
        ),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a, b = wn.alias("a"), wn.alias("b")
    return (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_shared_terms"),
            F.round(
                F.sum(F.col("a.w") * F.col("b.w"))
                / (F.max("a.nrm") * F.max("b.nrm")),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "doc_a", "doc_b")
        .limit(_TC_TOP)
    )


# ---------------------------------------------------------------------------
# Average precision @ k (the PR-curve summary beside ROC-AUC and nDCG)
# ---------------------------------------------------------------------------

_AP_K = 20

_AP_ORACLE = f"""
WITH q AS (
    SELECT e.embedding::DOUBLE[] AS qv, d.source AS qsrc
    FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
    WHERE e.vec_id = {_PROBE_ID}
),
scored AS (
    SELECT e.vec_id,
           list_dot_product(e.embedding::DOUBLE[], q.qv)
             / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[]))
                * sqrt(list_dot_product(q.qv, q.qv))) AS sim,
           CASE WHEN d.source = q.qsrc THEN 1 ELSE 0 END AS rel
    FROM embeddings e
    JOIN documents d ON d.doc_id = e.vec_id
    CROSS JOIN q
    WHERE e.vec_id <> {_PROBE_ID}
),
r AS (SELECT sum(rel)::BIGINT AS n_rel_total FROM scored),
topk AS (
    SELECT rel, row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS pos
    FROM scored
    ORDER BY sim DESC, vec_id ASC
    LIMIT {_AP_K}
),
cum AS (
    SELECT rel, pos,
           sum(rel) OVER (ORDER BY pos ROWS UNBOUNDED PRECEDING) AS cr
    FROM topk
)
SELECT {_PROBE_ID}::BIGINT AS query_id,
       r.n_rel_total,
       sum(c.rel)::BIGINT AS n_rel_at_k,
       round(sum(CASE WHEN c.rel = 1 THEN c.cr / c.pos ELSE 0 END)
             / least(r.n_rel_total, {_AP_K}), 6) AS ap_at_k
FROM cum c CROSS JOIN r
GROUP BY r.n_rel_total
"""


@register(
    "average_precision_eval",
    oracle=_AP_ORACLE,
    tags=("retrieval", "eval", "ml"),
)
def average_precision_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision @ 20 for the embedding-cosine ranking with
    same-source relevance — the precision-recall-curve summary that
    completes the eval suite (ROC-AUC ranks globally, nDCG grades,
    MRR finds the first hit, calibration checks probabilities; AP is
    the metric that punishes relevant docs buried mid-list): AP@K =
    Σ_{{k relevant}} P@k / min(R, K).

    Plan shape: the scale form, not the textbook one — the ranking is
    cut to the top-K FIRST (TakeOrderedAndProject, no global window
    ever materializes the full ranking), the cumulative-precision
    window then runs over K=20 rows (bounded by construction), and the
    recall denominator R comes from a 1-row aggregate on the same
    scored scan, broadcast back. Same probe/relevance conventions as
    mrr_recall_retrieval_eval."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    base = emb.join(docs, emb["vec_id"] == docs["doc_id"]).select(
        "vec_id", "embedding", "source"
    )
    q = F.broadcast(
        base.where(F.col("vec_id") == _PROBE_ID).select(
            F.col("embedding").alias("qv"), F.col("source").alias("qsrc")
        )
    )
    scored = (
        base.where(F.col("vec_id") != _PROBE_ID)
        .crossJoin(q)
        .select(
            "vec_id",
            cosine_similarity("embedding", "qv").alias("sim"),
            F.when(F.col("source") == F.col("qsrc"), 1)
            .otherwise(0)
            .alias("rel"),
        )
    )
    from pyspark import StorageLevel

    scored = scored.persist(StorageLevel.MEMORY_AND_DISK)
    r = F.broadcast(scored.agg(F.sum("rel").alias("n_rel_total")))
    topk = (
        scored.orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(_AP_K)
        .select("rel", "sim", "vec_id")
    )
    w_pos = Window.orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    cum = topk.select(
        "rel",
        F.row_number().over(w_pos).alias("pos"),
        F.sum("rel")
        .over(w_pos.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cr"),
    )
    return (
        cum.crossJoin(r)
        .groupBy("n_rel_total")
        .agg(
            F.sum("rel").cast("long").alias("n_rel_at_k"),
            F.round(
                F.sum(
                    F.when(
                        F.col("rel") == 1,
                        F.col("cr") / F.col("pos"),
                    ).otherwise(0.0)
                )
                / F.least(F.col("n_rel_total"), F.lit(_AP_K)),
                6,
            ).alias("ap_at_k"),
        )
        .select(
            F.lit(_PROBE_ID).cast("long").alias("query_id"),
            F.col("n_rel_total").cast("long").alias("n_rel_total"),
            "n_rel_at_k",
            "ap_at_k",
        )
    )


# ---------------------------------------------------------------------------
# Paired-bootstrap system comparison (BM25 vs dense retrieval)
# ---------------------------------------------------------------------------

_PB_Q = 20  # query probes (doc_ids 0..Q-1)
_PB_K = 10  # AP cutoff
_PB_B = 200  # bootstrap replicas
# Impact-ordered postings pruning: the candidate join keeps only each
# term's top-M docs by (tf desc, doc_id asc). Without it, a dense
# shared vocabulary makes EVERY doc a candidate for every query —
# measured 163s at sf10 (10M (qid, doc) groups); with the cap the
# candidate space is bounded by |terms| x M per query at ANY corpus
# size. df/idf/avgdl stay exact (computed on the UNPRUNED census);
# the pruning is part of the operator contract and the oracle applies
# the identical cap.
_PB_POSTINGS_CAP = 256

def _pb_base_q(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(base, q) for the paired-bootstrap eval: the doc+embedding join
    and the first-{_PB_Q}-docs query frame. Shared by the inline-census
    registered form and the postings-index twin (plans/postings.py)."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    base = docs.join(emb, docs["doc_id"] == emb["vec_id"]).select(
        "doc_id", "text", "source", "embedding"
    )
    q = base.where(F.col("doc_id") < _PB_Q).select(
        F.col("doc_id").alias("qid"),
        F.col("source").alias("qsrc"),
        F.col("embedding").alias("qv"),
        F.col("text").alias("qtext"),
    )
    return base, q


def _pb_qterm_list(q: DataFrame) -> list[str]:
    """Union of the Q queries' distinct terms — a bounded collect
    (Q x max doc length) that drives the query-term pushdown."""
    return sorted(
        {
            t
            for r in q.select(
                F.array_distinct(TX.tokens("qtext")).alias("ts")
            ).collect()
            for t in r["ts"]
        }
    )


def _pb_w_sql() -> str:
    from emails_to_vector_db_spark.plans.stats import _POIS_CDF

    return (
        "CASE "
        + " ".join(
            f"WHEN u < {p!r} THEN {k}" for k, p in enumerate(_POIS_CDF)
        )
        + f" ELSE {len(_POIS_CDF)} END"
    )


_PB_ORACLE = f"""
WITH base AS (
    SELECT d.doc_id, d.text, d.source, e.embedding::DOUBLE[] AS v
    FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
),
q AS (
    SELECT doc_id AS qid, source AS qsrc, v AS qv, text AS qtext
    FROM base WHERE doc_id < {_PB_Q}
),
toks AS (
    SELECT doc_id, len({_TOKENS_SQL}) AS dl, unnest({_TOKENS_SQL}) AS term
    FROM documents
),
stats AS (
    SELECT count(*)::BIGINT AS n_docs,
           avg(len({_TOKENS_SQL})) AS avgdl
    FROM documents
),
tf AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf, min(dl) AS dl
    FROM toks GROUP BY doc_id, term
),
df_t AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
tfp AS (
    SELECT doc_id, term, tf, dl
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY term ORDER BY tf DESC, doc_id ASC
        ) AS rnk FROM tf
    ) WHERE rnk <= {_PB_POSTINGS_CAP}
),
qterms AS (
    SELECT qid,
           unnest(list_distinct(regexp_split_to_array(trim(qtext),
                                                      '\\s+'))) AS term
    FROM q
),
bm AS (
    SELECT qt.qid, t.doc_id,
           sum(
               ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
               * (t.tf * ({_K1} + 1))
               / (t.tf + {_K1} * (1 - {_B} + {_B} * t.dl / s.avgdl))
           ) AS score
    FROM qterms qt
    JOIN tfp t ON t.term = qt.term AND t.doc_id <> qt.qid
    JOIN df_t d ON d.term = qt.term
    CROSS JOIN stats s
    GROUP BY qt.qid, t.doc_id
),
ra AS (
    SELECT qid, doc_id,
           row_number() OVER (
               PARTITION BY qid
               ORDER BY round(score, 6) DESC, doc_id ASC
           ) AS rn
    FROM bm
),
rel_a AS (
    SELECT r.qid, r.rn,
           CASE WHEN b.source = q.qsrc THEN 1 ELSE 0 END AS rel
    FROM ra r
    JOIN base b ON b.doc_id = r.doc_id
    JOIN q ON q.qid = r.qid
    WHERE r.rn <= {_PB_K}
),
rel_a_cum AS (
    SELECT qid, rn, rel,
           sum(rel) OVER (PARTITION BY qid ORDER BY rn
                          ROWS UNBOUNDED PRECEDING) AS cum
    FROM rel_a
),
ap_a2 AS (
    SELECT qid, sum(rel * cum / rn) / {_PB_K} AS ap
    FROM rel_a_cum GROUP BY qid
),
cos AS (
    SELECT q.qid, b.doc_id,
           list_dot_product(b.v, q.qv)
             / (sqrt(list_dot_product(b.v, b.v))
                * sqrt(list_dot_product(q.qv, q.qv))) AS sim,
           CASE WHEN b.source = q.qsrc THEN 1 ELSE 0 END AS rel
    FROM base b CROSS JOIN q
    WHERE b.doc_id <> q.qid
),
rb AS (
    SELECT qid, rel,
           row_number() OVER (
               PARTITION BY qid
               ORDER BY round(sim, 6) DESC, doc_id ASC
           ) AS rn
    FROM cos
),
rel_b AS (SELECT qid, rn, rel FROM rb WHERE rn <= {_PB_K}),
rel_b_cum AS (
    SELECT qid, rn, rel,
           sum(rel) OVER (PARTITION BY qid ORDER BY rn
                          ROWS UNBOUNDED PRECEDING) AS cum
    FROM rel_b
),
ap_b2 AS (
    SELECT qid, sum(rel * cum / rn) / {_PB_K} AS ap
    FROM rel_b_cum GROUP BY qid
),
pairs AS (
    SELECT q.qid,
           coalesce(a.ap, 0.0) AS apa,
           coalesce(b.ap, 0.0) AS apb
    FROM q
    LEFT JOIN ap_a2 a ON a.qid = q.qid
    LEFT JOIN ap_b2 b ON b.qid = q.qid
),
reps AS (
    SELECT p.qid, p.apa, p.apb, b.b,
           (('0x' || substr(md5('pb|' || p.qid || ':' || b.b), 1, 8))
               ::BIGINT) / 4294967296.0 AS u
    FROM pairs p
    CROSS JOIN (SELECT unnest(generate_series(0, {_PB_B - 1})) AS b) b
),
deltas AS (
    SELECT b,
           CASE WHEN sum(w) = 0 THEN 0.0
                ELSE sum(w * (apa - apb)) / sum(w) END AS delta
    FROM (SELECT qid, apa, apb, b, {{W_SQL}} AS w FROM reps)
    GROUP BY b
),
pt AS (
    SELECT count(*)::BIGINT AS n_queries,
           avg(apa) AS ma, avg(apb) AS mb
    FROM pairs
)
SELECT pt.n_queries,
       round(pt.ma, 4) AS mean_ap_bm25,
       round(pt.mb, 4) AS mean_ap_cosine,
       round(pt.ma - pt.mb, 4) AS delta,
       round(quantile_cont(d.delta, 0.025), 4) AS ci_lo,
       round(quantile_cont(d.delta, 0.975), 4) AS ci_hi,
       round(avg(CASE WHEN d.delta <= 0 THEN 1.0 ELSE 0.0 END), 4)
           AS frac_delta_le0
FROM deltas d CROSS JOIN pt
GROUP BY pt.n_queries, pt.ma, pt.mb
"""


def _pb_oracle() -> str:
    return _PB_ORACLE.replace("{W_SQL}", _pb_w_sql())


@register(
    "paired_bootstrap_system_eval",
    oracle=_pb_oracle(),
    tags=("retrieval", "eval", "bootstrap", "significance"),
)
def paired_bootstrap_system_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Paired-bootstrap significance test between two retrieval systems
    — BM25 (each probe doc's own tokens as the query) vs dense cosine —
    on AP@{_PB_K} over {_PB_Q} queries with same-source relevance: the
    system-comparison leg the eval suite lacked (per-system MRR/nDCG
    exist; this answers "is A actually better than B, or is the gap
    within query-resampling noise?"). {_PB_B} deterministic Poisson(1)
    replicas reweight the QUERY set (pairs stay paired — the correct
    unit of resampling for system comparison), the delta distribution
    yields a 95% CI and the fraction of replicas where the sign flips.

    Plan shape at 100 TB: the postings census (doc, term) is the one
    corpus-grain shuffle (the tfidf family's ceiling discipline
    applies); per-query candidate generation is an inverted-index join
    against a broadcast {_PB_Q}-query term list; AP is a {_PB_K}-row
    window per query; the bootstrap unrolls |queries| x {_PB_B} tiny
    rows. Queries, not documents, bound the expensive dimension."""
    from pyspark import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    base, q = _pb_base_q(spark, sf_dir)
    # Query-term pushdown (the bm25_topk design): collect the union of
    # the Q queries' distinct terms (bounded by Q x max doc length) and
    # prune every document's token array to it BEFORE exploding — on a
    # real vocabulary only query-term postings are ever built; df/idf
    # stay exact because pruning is BY TERM (every doc containing a
    # query term survives for that term). The fixture's degenerate
    # 31-word vocabulary makes this a no-op there (documented in
    # SCALE_NOTES).
    qterm_list = _pb_qterm_list(q)
    toks = docs.select(
        "doc_id",
        F.size(TX.tokens("text")).alias("dl"),
        F.explode(
            F.filter(TX.tokens("text"), lambda x: x.isin(*qterm_list))
        ).alias("term"),
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(TX.tokens("text"))).alias("avgdl"),
    )
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w_imp = Window.partitionBy("term").orderBy(
        F.col("tf").desc(), F.col("doc_id").asc()
    )
    tfp = (
        tf.withColumn("rnk", F.row_number().over(w_imp))
        .where(F.col("rnk") <= _PB_POSTINGS_CAP)
        .drop("rnk")
    )
    enriched = tfp.join(F.broadcast(df_t), "term").crossJoin(
        F.broadcast(stats)
    )
    return _pb_tail(spark, base, q, enriched)


def _pb_tail(
    spark: SparkSession, base: DataFrame, q: DataFrame, enriched: DataFrame
) -> DataFrame:
    """Shared paired-bootstrap tail, parameterized over the LEXICAL
    postings source: ``enriched`` carries (term, doc_id, tf, dl, df,
    n_docs, avgdl) — built inline from the corpus census (the
    oracle-replayable registered form) or read from the persisted
    postings index (plans/postings.py, the production form). Everything
    downstream — BM25 scoring, AP@k, the dense BLAS arm, the Poisson
    replica deltas — is identical, so the two forms are row-identical
    by construction."""
    from pyspark import StorageLevel

    from emails_to_vector_db_spark.plans.stats import _POIS_CDF

    qterms = q.select(
        "qid", F.explode(F.array_distinct(TX.tokens("qtext"))).alias("term")
    )
    bm = (
        enriched.join(F.broadcast(qterms), "term")
        .where(F.col("doc_id") != F.col("qid"))
        .groupBy("qid", "doc_id")
        .agg(
            F.sum(
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                )
                * (F.col("tf") * (_K1 + 1))
                / (
                    F.col("tf")
                    + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("score")
        )
    )
    w_a = Window.partitionBy("qid").orderBy(
        F.round(F.col("score"), 6).desc(), F.col("doc_id").asc()
    )
    ra = (
        bm.withColumn("rn", F.row_number().over(w_a))
        .where(F.col("rn") <= _PB_K)
        .join(base.select("doc_id", "source"), "doc_id")
        .join(F.broadcast(q.select("qid", "qsrc")), "qid")
        .select(
            "qid",
            "rn",
            F.when(F.col("source") == F.col("qsrc"), 1)
            .otherwise(0)
            .alias("rel"),
        )
    )
    w_cum = (
        Window.partitionBy("qid")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ap_a = (
        ra.withColumn("cum", F.sum("rel").over(w_cum))
        .groupBy("qid")
        .agg(
            (F.sum(F.col("rel") * F.col("cum") / F.col("rn")) / _PB_K)
            .alias("apa")
        )
    )
    # Dense arm through the BLAS Arrow lane with MAP-SIDE top-k: each
    # Arrow batch emits its local top-{_PB_K} per query under the exact
    # global comparator (round(sim, 6) desc, doc_id asc) — top-k is
    # closed under that total order, so the global top-k over batch
    # champions is exact. This replaces a |corpus| x |queries|
    # interpreted cosine fold AND its corpus-grain shuffle with one
    # dgemm per batch and ~batches x Q x k champion rows (sf10: 60.7s
    # -> the lane; the fold was the profile).
    import numpy as np
    import pandas as pd

    from emails_to_vector_db_spark.operators.ivf import round_half_away

    q_rows = sorted(
        q.select("qid", "qv").collect(), key=lambda r: r["qid"]
    )  # bounded: Q rows (the kmeans-seed collect precedent)
    qids_np = np.asarray([r["qid"] for r in q_rows], dtype=np.int64)
    Qm = np.asarray(
        [list(map(float, r["qv"])) for r in q_rows], dtype=np.float64
    )
    qn = np.sqrt((Qm * Qm).sum(axis=1))

    def _topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            ids = pdf["doc_id"].values.astype(np.int64)
            xn = np.sqrt((X * X).sum(axis=1))
            # half-away rounding matches SQL round (np.round is
            # half-to-even — a boundary value would flip the hash)
            sims = round_half_away(
                (X @ Qm.T) / (xn[:, None] * qn[None, :]), 6
            )
            out_q, out_d, out_s = [], [], []
            for j in range(len(qids_np)):
                # DROP the self row (boolean mask) rather than -inf it:
                # if a query's finite pool ever fell below k, a -inf
                # sentinel row could reach the global top-k and diverge
                # from the oracle's doc_id <> qid filter.
                keep = ids != qids_np[j]
                cids = ids[keep]
                col = sims[keep, j]
                order = np.lexsort((cids, -col))[: _PB_K]
                out_q.extend([qids_np[j]] * len(order))
                out_d.extend(cids[order])
                out_s.extend(col[order])
            yield pd.DataFrame(
                {"qid": out_q, "doc_id": out_d, "sim": out_s}
            )

    lane = base.select("doc_id", "embedding").mapInPandas(
        _topk, schema="qid bigint, doc_id bigint, sim double"
    )
    w_b = Window.partitionBy("qid").orderBy(
        F.col("sim").desc(), F.col("doc_id").asc()
    )
    rb = (
        lane.withColumn("rn", F.row_number().over(w_b))
        .where(F.col("rn") <= _PB_K)
        .join(base.select("doc_id", "source"), "doc_id")
        .join(F.broadcast(q.select("qid", "qsrc")), "qid")
        .select(
            "qid",
            "rn",
            F.when(F.col("source") == F.col("qsrc"), 1)
            .otherwise(0)
            .alias("rel"),
        )
    )
    ap_b = (
        rb.withColumn("cum", F.sum("rel").over(w_cum))
        .groupBy("qid")
        .agg(
            (F.sum(F.col("rel") * F.col("cum") / F.col("rn")) / _PB_K)
            .alias("apb")
        )
    )
    pairs = (
        q.select("qid")
        .join(ap_a, "qid", "left")
        .join(ap_b, "qid", "left")
        .select(
            "qid",
            F.coalesce(F.col("apa"), F.lit(0.0)).alias("apa"),
            F.coalesce(F.col("apb"), F.lit(0.0)).alias("apb"),
        )
    )
    pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    reps = pairs.crossJoin(
        F.broadcast(spark.range(_PB_B).select(F.col("id").alias("b")))
    ).withColumn(
        "u",
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "",
                        F.lit("pb|"),
                        F.col("qid").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0),
    )
    wexpr = F.lit(len(_POIS_CDF))
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        wexpr = F.when(F.col("u") < _POIS_CDF[k], k).otherwise(wexpr)
    deltas = (
        reps.withColumn("w", wexpr)
        .groupBy("b")
        .agg(
            F.when(F.sum("w") == 0, 0.0)
            .otherwise(
                F.sum(F.col("w") * (F.col("apa") - F.col("apb")))
                / F.sum("w")
            )
            .alias("delta")
        )
    )
    pt = F.broadcast(
        pairs.agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.avg("apa").alias("ma"),
            F.avg("apb").alias("mb"),
        )
    )
    return deltas.crossJoin(pt).groupBy("n_queries", "ma", "mb").agg(
        F.round(F.percentile(F.col("delta"), F.lit(0.025)), 4).alias(
            "ci_lo"
        ),
        F.round(F.percentile(F.col("delta"), F.lit(0.975)), 4).alias(
            "ci_hi"
        ),
        F.round(
            F.avg(F.when(F.col("delta") <= 0, 1.0).otherwise(0.0)), 4
        ).alias("frac_delta_le0"),
    ).select(
        "n_queries",
        F.round(F.col("ma"), 4).alias("mean_ap_bm25"),
        F.round(F.col("mb"), 4).alias("mean_ap_cosine"),
        F.round(F.col("ma") - F.col("mb"), 4).alias("delta"),
        "ci_lo",
        "ci_hi",
        "frac_delta_le0",
    )


# ---------------------------------------------------------------------------
# Cross-encoder-style reranking: retrieve (bi-encoder) -> rerank (CE)
# ---------------------------------------------------------------------------

_CE_DEPTH = 50  # bi-encoder candidate depth fed to the reranker

_CE_ORACLE = f"""
WITH q AS (
    SELECT e.embedding::DOUBLE[] AS qv,
           list_distinct(regexp_split_to_array(trim(d.text), '\\s+')) AS qs,
           len(regexp_split_to_array(trim(d.text), '\\s+')) AS qdl
    FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
    WHERE e.vec_id = {_PROBE_ID}
),
scored AS (
    SELECT e.vec_id AS doc_id,
           list_dot_product(e.embedding::DOUBLE[], q.qv)
             / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[]))
                * sqrt(list_dot_product(q.qv, q.qv))) AS sim
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> {_PROBE_ID}
),
cand AS (
    SELECT doc_id,
           row_number() OVER (
               ORDER BY round(sim, 6) DESC, doc_id ASC
           ) AS bi_rank
    FROM scored
    ORDER BY round(sim, 6) DESC, doc_id ASC
    LIMIT {_CE_DEPTH}
),
feat AS (
    SELECT c.doc_id, c.bi_rank, q.qs, q.qdl,
           regexp_split_to_array(trim(d.text), '\\s+') AS dt
    FROM cand c
    JOIN documents d ON d.doc_id = c.doc_id
    CROSS JOIN q
),
sc AS (
    SELECT doc_id, bi_rank,
           len(list_filter(list_distinct(dt),
                           t -> list_contains(qs, t)))::DOUBLE AS inter,
           len(qs)::DOUBLE AS nq,
           len(list_distinct(dt))::DOUBLE AS ndist,
           coalesce(
               nullif(list_position(
                   list_transform(dt, t -> list_contains(qs, t)),
                   true), 0),
               len(dt) + 1
           )::DOUBLE AS first_pos,
           least(qdl, len(dt))::DOUBLE
               / greatest(qdl, len(dt)) AS len_ratio
    FROM feat
),
ce AS (
    SELECT doc_id, bi_rank,
           2.0 * inter / (nq + ndist - inter)
           + 1.0 * inter / nq
           + 0.5 / first_pos
           + 0.25 * len_ratio AS ce_raw
    FROM sc
)
SELECT doc_id, bi_rank,
       row_number() OVER (
           ORDER BY round(ce_raw, 6) DESC, doc_id ASC
       )::BIGINT AS ce_rank,
       round(ce_raw, 6) AS ce_score
FROM ce
ORDER BY round(ce_raw, 6) DESC, doc_id ASC
LIMIT {TOP_N}
"""


@register(
    "cross_encoder_rerank_topk",
    oracle=_CE_ORACLE,
    tags=("retrieval", "rerank", "cross-encoder", "hybrid"),
    bench=True,
)
def cross_encoder_rerank_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Retrieve -> rerank, the two-stage ranking stack production RAG
    systems run on top of the reference's single-stage vector search
    (``rag.py:77-90``): a cheap bi-encoder pass (cosine top-50 for the
    stored probe — the index-served stage) feeds a cross-encoder-style
    reranker that scores each (query, candidate) PAIR with interaction
    features a bi-encoder cannot express — distinct-token Jaccard,
    query-coverage fraction, earliest-query-term position in the
    candidate, length ratio — combined with fixed weights as the
    deterministic stand-in for a learned cross-attention scorer (the
    SURVEY §5.3 stand-in discipline: real model swaps in behind the
    same shape). Emits the top-10 with BOTH ranks so rank movement
    (bi_rank vs ce_rank) is visible — the reranker's value-add.

    Plan shape at 100 TB: stage 1 is the existing TakeOrdered KNN scan
    (never materializes the corpus ranking); stage 2 touches exactly
    depth=50 candidate texts — a broadcast semi-join prunes the
    documents scan to 50 rows, every interaction feature is a
    scan-local array expression, and the rerank window orders 50 rows.
    Reranker cost is bounded by the candidate depth at ANY corpus
    size — which is the entire point of the retrieve->rerank split."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    q = F.broadcast(
        emb.where(F.col("vec_id") == _PROBE_ID)
        .join(docs, F.col("doc_id") == F.col("vec_id"))
        .select(
            F.col("embedding").alias("qv"),
            F.array_distinct(TX.tokens("text")).alias("qs"),
            F.size(TX.tokens("text")).alias("qdl"),
        )
    )
    scored = (
        emb.where(F.col("vec_id") != _PROBE_ID)
        .crossJoin(q)
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine_similarity(F.col("embedding"), F.col("qv")).alias("sim"),
        )
    )
    w_bi = Window.orderBy(F.round("sim", 6).desc(), F.col("doc_id").asc())
    cand = (
        scored.orderBy(F.round("sim", 6).desc(), F.col("doc_id").asc())
        .limit(_CE_DEPTH)
        .withColumn("bi_rank", F.row_number().over(w_bi))
        .select("doc_id", "bi_rank")
    )
    feat = (
        docs.join(F.broadcast(cand), "doc_id")
        .crossJoin(q)
        .select(
            "doc_id",
            "bi_rank",
            "qs",
            "qdl",
            TX.tokens("text").alias("dt"),
        )
    )
    ds = F.array_distinct(F.col("dt"))
    inter = F.size(
        F.filter(ds, lambda t: F.array_contains(F.col("qs"), t))
    ).cast("double")
    nq = F.size("qs").cast("double")
    ndist = F.size(ds).cast("double")
    fp_raw = F.array_position(
        F.transform(
            F.col("dt"), lambda t: F.array_contains(F.col("qs"), t)
        ),
        F.lit(True),
    )
    first_pos = F.when(fp_raw == 0, F.size("dt") + 1).otherwise(
        fp_raw
    ).cast("double")
    len_ratio = F.least(F.col("qdl"), F.size("dt")).cast(
        "double"
    ) / F.greatest(F.col("qdl"), F.size("dt"))
    ce_raw = (
        2.0 * inter / (nq + ndist - inter)
        + 1.0 * inter / nq
        + 0.5 / first_pos
        + 0.25 * len_ratio
    )
    sc = feat.select("doc_id", "bi_rank", ce_raw.alias("ce_raw"))
    w_ce = Window.orderBy(
        F.round("ce_raw", 6).desc(), F.col("doc_id").asc()
    )
    return (
        sc.orderBy(F.round("ce_raw", 6).desc(), F.col("doc_id").asc())
        .limit(TOP_N)
        .select(
            "doc_id",
            "bi_rank",
            F.row_number().over(w_ce).cast("long").alias("ce_rank"),
            F.round("ce_raw", 6).alias("ce_score"),
        )
    )


# ---------------------------------------------------------------------------
# Phrase (positional) retrieval: adjacency matching — the positional-index
# query class beside the bag-of-words lanes
# ---------------------------------------------------------------------------

_PHRASE = ("vector", "merge")
_PHRASE_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, lang, {_TOKENS_SQL} AS t FROM documents
),
m AS (
    SELECT doc_id, lang,
           len(list_filter(range(1, len(t)), i ->
               t[i] = '{_PHRASE[0]}' AND t[i + 1] = '{_PHRASE[1]}'))
               ::BIGINT AS n_occurrences
    FROM toks
)
SELECT lang,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN n_occurrences > 0 THEN 1 ELSE 0 END)::BIGINT
           AS n_matching,
       sum(n_occurrences)::BIGINT AS total_occurrences
FROM m
GROUP BY lang
"""


@register(
    "phrase_match_stats",
    oracle=_PHRASE_ORACLE,
    tags=("retrieval", "phrase", "positional", "text"),
)
def phrase_match_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PHRASE retrieval — exact token adjacency ("vector merge" as
    consecutive tokens), the query class a positional index serves and
    the bag-of-words lanes (BM25/TF-IDF/boolean AND) cannot express:
    AND-retrieval finds documents containing both terms anywhere;
    phrase match requires position i and i+1. Per-language doc counts,
    match counts, and total occurrences.

    Plan: adjacency is evaluated INSIDE the scan projection as a
    higher-order filter over the token array — no posexplode (which
    would shuffle corpus_tokens rows to reassemble positions), no
    self-join of a positional postings table on (doc, pos+1). The
    whole query is one corpus scan + one lang-grain aggregate; at
    100 TB the production form stores positional postings beside the
    term-bucketed store (term, doc, positions[]) and intersects
    position lists for the rare-term side only — the same rare-first
    discipline as the set-similarity joins (operators/setsim.py)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", TX.tokens("text").alias("t")
    )
    # guard: Spark's sequence(1, 0) DESCENDS through index 0 (DuckDB's
    # range(1, 1) is empty), so a 1-token doc must short-circuit
    occ = F.when(
        F.size("t") >= 2,
        F.size(
            F.filter(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: (F.element_at("t", i) == _PHRASE[0])
                & (F.element_at("t", i + 1) == _PHRASE[1]),
            )
        ),
    ).otherwise(F.lit(0)).cast("long")
    m = docs.select("lang", occ.alias("n_occurrences"))
    return m.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("n_occurrences") > 0, 1).otherwise(0)
        ).alias("n_matching"),
        F.sum("n_occurrences").alias("total_occurrences"),
    )
