"""In-engine model training / evaluation: a distributed logistic-
regression quality classifier and a rank-based AUC evaluator.

The reference outsources every learned component to external services
(sentence-transformers encode ``rag.py:58-63``, LLM calls
``rag.py:94-140``); a 100 TB curation pipeline also needs CHEAP learned
filters trained *inside* the engine — the fastText-style quality
classifier of CCNet/RefinedWeb-class pipelines. Full-batch gradient
descent is exactly an aggregation loop: each step is one map-side-
combinable pass computing a d+1-dimensional gradient, so the corpus
never moves — only the tiny weight vector does (same shape as
operators/pagerank.py and operators/kmeans.py: static data, moving
vector).

Determinism / oracle strategy: the weight vector is QUANTIZED (round
6dp) at every iteration boundary on BOTH sides, so the oracle replays
the identical trajectory — float-association noise in the gradient sums
(~1e-13) sits far below the 1e-6 quantum and cannot drift the
trajectory. The whole 3-step training run unrolls into chained 1-row
CTEs, one per iteration (the PageRank construction, plans/graph.py),
making TRAINING itself a hash-checked query, not a rows-only claim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from emails_to_vector_db_spark.plans.registry import register
from emails_to_vector_db_spark.sources.tables import load_table

N_ITERS = 3
LR = 0.5
_ROUND = 6  # weight quantum per iteration — the determinism contract

# Feature spec shared verbatim (in semantics) by the Spark plan and the
# DuckDB oracle: bias + 4 cheap quality signals, all scale-free or
# corpus-size-independent so the same weights transfer across SFs.
_N_FEATURES = 5  # bias, chars/1k, tokens/100, punct frac, digit frac


def _sql_features() -> str:
    return """
    SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
           1.0 AS x0,
           n_chars / 1000.0 AS x1,
           len(string_split(text, ' ')) / 100.0 AS x2,
           length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
               / length(text)::DOUBLE AS x3,
           length(regexp_replace(text, '[^0-9]', '', 'g'))
               / length(text)::DOUBLE AS x4
    FROM documents"""


def _spark_features(
    spark: SparkSession, sf_dir: str, extra: tuple[str, ...] = ()
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    text_len = F.length("text").cast("double")
    return docs.select(
        *[F.col(c) for c in extra],
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        F.lit(1.0).alias("x0"),
        (F.col("n_chars") / 1000.0).alias("x1"),
        (F.size(F.split("text", " ", -1)) / 100.0).alias("x2"),
        (
            F.length(F.regexp_replace("text", r"[^.,!?;:]", "")) / text_len
        ).alias("x3"),
        (F.length(F.regexp_replace("text", r"[^0-9]", "")) / text_len).alias(
            "x4"
        ),
    )


def _training_ctes(features_sql: str | None = None) -> tuple[str, str]:
    """(WITH-prefix SQL containing features + the unrolled GD
    trajectory, name of the final weight CTE) — shared by the training,
    calibration, and fairness queries so all replay the identical
    trajectory. ``features_sql`` may carry extra passthrough columns
    (e.g. the protected attribute); the trajectory reads only y/x*."""
    if features_sql is None:
        features_sql = _sql_features()
    xs = [f"x{j}" for j in range(_N_FEATURES)]
    prev = "w0_cte"
    iters = []
    for i in range(1, N_ITERS + 1):
        margin = " + ".join(f"w.w{j} * f.{x}" for j, x in enumerate(xs))
        grads = ",\n           ".join(
            f"round(w.w{j} - {LR} * sum((1.0 / (1.0 + exp(-({margin}))) - f.y)"
            f" * f.{x}) / count(*), {_ROUND}) AS w{j}"
            for j, x in enumerate(xs)
        )
        iters.append(
            f"""w{i} AS (
    SELECT {grads}
    FROM features f CROSS JOIN {prev} w
    GROUP BY {', '.join(f'w.w{j}' for j in range(_N_FEATURES))}
)"""
        )
        prev = f"w{i}"
    iter_sql = ",\n".join(iters)
    prefix = f"""
WITH features AS ({features_sql}),
w0_cte AS (SELECT {', '.join(f'0.0 AS w{j}' for j in range(_N_FEATURES))}),
{iter_sql}"""
    return prefix, prev


def _logreg_oracle() -> str:
    prefix, prev = _training_ctes()
    final_margin = " + ".join(f"w.w{j} * f.x{j}" for j in range(_N_FEATURES))
    w_cols = ", ".join(f"w.w{j}" for j in range(_N_FEATURES))
    return f"""{prefix}
SELECT {w_cols},
       count(*)::BIGINT AS n_train,
       round(avg(CASE WHEN (({final_margin}) > 0) = (f.y = 1.0)
                      THEN 1.0 ELSE 0.0 END), 6) AS train_accuracy
FROM features f CROSS JOIN {prev} w
GROUP BY {w_cols}
"""


def _train_weights(feats: DataFrame) -> DataFrame:
    """The lazy unrolled GD trajectory over a features frame — shared
    by training, calibration, and fairness queries so every consumer
    replays the IDENTICAL 6dp-quantized weight sequence (the oracle's
    _training_ctes twin). Returns the 1-row final weight frame."""
    spark = feats.sparkSession
    xs = [f"x{j}" for j in range(_N_FEATURES)]
    w = spark.range(1).select(
        *[F.lit(0.0).alias(f"w{j}") for j in range(_N_FEATURES)]
    )
    for _ in range(N_ITERS):
        joined = feats.crossJoin(F.broadcast(w))
        margin = sum(
            (F.col(f"w{j}") * F.col(x) for j, x in enumerate(xs)),
            F.lit(0.0),
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
        w = joined.groupBy(*[f"w{j}" for j in range(_N_FEATURES)]).agg(
            *[
                F.sum((p - F.col("y")) * F.col(x)).alias(f"g{j}")
                for j, x in enumerate(xs)
            ],
            F.count(F.lit(1)).alias("n"),
        ).select(
            *[
                F.round(
                    F.col(f"w{j}") - LR * F.col(f"g{j}") / F.col("n"),
                    _ROUND,
                ).alias(f"w{j}")
                for j in range(_N_FEATURES)
            ]
        )
    return w


@register(
    "logreg_quality_classifier",
    oracle=_logreg_oracle(),
    tags=("ml", "iterative", "classifier", "cleaning"),
    bench=True,
)
def logreg_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-batch logistic regression (3 GD steps, lr=0.5) predicting
    lang='en' from 4 cheap text-quality features — the in-engine learned
    filter of a curation pipeline, trained WITHOUT the corpus ever
    leaving the executors.

    Plan: the feature projection is cached once; each iteration is one
    aggregation producing the 5 gradient components (map-side combined,
    5 doubles per partition cross the wire), cross-joined back as the
    next 1-row weight vector — fully lazy, no driver-side sync, Catalyst
    sees the whole unrolled trajectory. Weights are 6dp-quantized per
    step so the DuckDB replay is exact. Returns the trained weights,
    the training row count, and training accuracy at threshold 0.5.
    """
    feats = _spark_features(spark, sf_dir).cache()
    xs = [f"x{j}" for j in range(_N_FEATURES)]
    w = _train_weights(feats)
    scored = feats.crossJoin(F.broadcast(w))
    final_margin = sum(
        (F.col(f"w{j}") * F.col(x) for j, x in enumerate(xs)), F.lit(0.0)
    )
    correct = F.when(
        (final_margin > 0) == (F.col("y") == 1.0), 1.0
    ).otherwise(0.0)
    return scored.groupBy(*[f"w{j}" for j in range(_N_FEATURES)]).agg(
        F.count(F.lit(1)).alias("n_train"),
        F.round(F.avg(correct), 6).alias("train_accuracy"),
    )


_AUC_ORACLE = """
WITH scored AS (
    SELECT 'n_chars' AS scorer, n_chars::DOUBLE AS score,
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
    FROM documents
    UNION ALL
    SELECT 'n_tokens' AS scorer,
           len(string_split(text, ' '))::DOUBLE AS score,
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
    FROM documents
),
hist AS (
    SELECT scorer, score,
           count(*)::DOUBLE AS n, sum(y)::DOUBLE AS npos
    FROM scored GROUP BY scorer, score
),
ranked AS (
    SELECT scorer, score, n, npos,
           coalesce(sum(n) OVER (
               PARTITION BY scorer ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS cum_less
    FROM hist
),
agg AS (
    SELECT scorer,
           sum(npos * (cum_less + (n + 1) / 2.0)) AS pos_ranksum,
           sum(npos) AS p, sum(n - npos) AS q
    FROM ranked GROUP BY scorer
)
SELECT scorer,
       p::BIGINT AS n_pos, q::BIGINT AS n_neg,
       round((pos_ranksum - p * (p + 1) / 2.0) / (p * q), 6) AS auc
FROM agg
"""


@register(
    "score_auc_eval",
    oracle=_AUC_ORACLE,
    tags=("ml", "eval", "window"),
)
def score_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of two cheap document scorers against the lang='en'
    label, via the tie-aware Mann-Whitney rank-sum identity — the
    evaluation half of the in-engine classifier story (model quality as
    a hash-checked query, like the ANN recall audits).

    Plan: scores collapse to a per-(scorer, distinct-score) HISTOGRAM
    first, so the global-order window (the classic AUC scalability
    trap) runs over |distinct scores| rows, not corpus rows — average
    ranks for ties come from the histogram counts exactly. Corpus-scale
    work is one map-side-combinable groupBy.
    """
    docs = load_table(spark, sf_dir, "documents")
    y = F.when(F.col("lang") == "en", 1).otherwise(0)
    scored = docs.select(
        F.lit("n_chars").alias("scorer"),
        F.col("n_chars").cast("double").alias("score"),
        y.alias("y"),
    ).unionAll(
        docs.select(
            F.lit("n_tokens").alias("scorer"),
            F.size(F.split("text", " ", -1)).cast("double").alias("score"),
            y.alias("y"),
        )
    )
    hist = scored.groupBy("scorer", "score").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("y").cast("double").alias("npos"),
    )
    w = (
        Window.partitionBy("scorer")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = hist.withColumn(
        "cum_less", F.coalesce(F.sum("n").over(w), F.lit(0.0))
    )
    agg = ranked.groupBy("scorer").agg(
        F.sum(
            F.col("npos") * (F.col("cum_less") + (F.col("n") + 1) / 2.0)
        ).alias("pos_ranksum"),
        F.sum("npos").alias("p"),
        F.sum(F.col("n") - F.col("npos")).alias("q"),
    )
    return agg.select(
        "scorer",
        F.col("p").cast("long").alias("n_pos"),
        F.col("q").cast("long").alias("n_neg"),
        F.round(
            (F.col("pos_ranksum") - F.col("p") * (F.col("p") + 1) / 2.0)
            / (F.col("p") * F.col("q")),
            6,
        ).alias("auc"),
    )


def _calibration_oracle() -> str:
    prefix, prev = _training_ctes()
    margin = " + ".join(f"w.w{j} * f.x{j}" for j in range(_N_FEATURES))
    return f"""{prefix},
scored AS (
    SELECT f.y, 1.0 / (1.0 + exp(-({margin}))) AS p
    FROM features f CROSS JOIN {prev} w
)
SELECT least(floor(p * 10), 9)::INT AS bucket,
       count(*)::BIGINT AS n_docs,
       round(avg(p), 6) AS avg_predicted,
       round(avg(y), 6) AS frac_positive
FROM scored
GROUP BY 1
"""


def _trained_weights_df(spark: SparkSession, sf_dir: str, feats: DataFrame):
    """The lazy 1-row weight DataFrame after the unrolled GD loop —
    shared by the training query and the calibration query."""
    xs = [f"x{j}" for j in range(_N_FEATURES)]
    w = spark.range(1).select(
        *[F.lit(0.0).alias(f"w{j}") for j in range(_N_FEATURES)]
    )
    for _ in range(N_ITERS):
        joined = feats.crossJoin(F.broadcast(w))
        margin = sum(
            (F.col(f"w{j}") * F.col(x) for j, x in enumerate(xs)),
            F.lit(0.0),
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
        w = joined.groupBy(*[f"w{j}" for j in range(_N_FEATURES)]).agg(
            *[
                F.sum((p - F.col("y")) * F.col(x)).alias(f"g{j}")
                for j, x in enumerate(xs)
            ],
            F.count(F.lit(1)).alias("n"),
        ).select(
            *[
                F.round(
                    F.col(f"w{j}") - LR * F.col(f"g{j}") / F.col("n"),
                    _ROUND,
                ).alias(f"w{j}")
                for j in range(_N_FEATURES)
            ]
        )
    return w


@register(
    "logreg_calibration_curve",
    oracle=_calibration_oracle(),
    tags=("ml", "eval", "calibration"),
)
def logreg_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the in-engine classifier: predicted
    probabilities from the SAME 3-step GD trajectory as
    logreg_quality_classifier, bucketed into fixed-width probability
    deciles, each bucket reporting mean predicted p vs the empirical
    positive rate — the calibration check that completes the eval
    suite (AUC ranks, nDCG grades, this measures probability honesty).

    Plan: fixed-width buckets mean NO window and no sort anywhere —
    scoring is a broadcast of the 5-double weight row onto the cached
    feature projection, and the curve is one 10-group map-side
    aggregate. Fully scale-free.
    """
    feats = _spark_features(spark, sf_dir).cache()
    w = _trained_weights_df(spark, sf_dir, feats)
    xs = [f"x{j}" for j in range(_N_FEATURES)]
    margin = sum(
        (F.col(f"w{j}") * F.col(x) for j, x in enumerate(xs)), F.lit(0.0)
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    scored = feats.crossJoin(F.broadcast(w)).select(
        F.col("y"), p.alias("p")
    )
    bucket = F.least(F.floor(F.col("p") * 10), F.lit(9)).cast("int")
    return scored.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("p"), 6).alias("avg_predicted"),
        F.round(F.avg("y"), 6).alias("frac_positive"),
    )


_CLASSES = ("de", "en", "es", "fr", "zh")  # sorted; index = class id


def _softmax_oracle() -> str:
    """Unrolled 3-step softmax-regression GD over the same quantized-
    trajectory construction as the binary classifier: 25 weights
    (5 classes × 5 features) carried through chained 1-row CTEs."""
    nc, nf = len(_CLASSES), _N_FEATURES
    wcols = [f"w_{c}_{j}" for c in range(nc) for j in range(nf)]

    def margins(w: str) -> list[str]:
        return [
            " + ".join(f"{w}.w_{c}_{j} * f.x{j}" for j in range(nf))
            for c in range(nc)
        ]

    prev = "w0_cte"
    iters = []
    for i in range(1, N_ITERS + 1):
        ms = margins("w")
        z = " + ".join(f"exp({m})" for m in ms)
        grads = ",\n           ".join(
            f"round(w.w_{c}_{j} - {LR} * sum((exp({ms[c]}) / ({z})"
            f" - (CASE WHEN f.lang = '{_CLASSES[c]}' THEN 1.0 ELSE 0.0 END))"
            f" * f.x{j}) / count(*), {_ROUND}) AS w_{c}_{j}"
            for c in range(nc)
            for j in range(nf)
        )
        iters.append(
            f"""w{i} AS (
    SELECT {grads}
    FROM features f CROSS JOIN {prev} w
    GROUP BY {', '.join('w.' + wc for wc in wcols)}
)"""
        )
        prev = f"w{i}"
    iter_sql = ",\n".join(iters)
    ms = margins("w")
    per_class = []
    for c in range(nc):
        # winner = first class attaining the max margin
        cond = " AND ".join(
            [f"({ms[c]}) > ({ms[o]})" for o in range(c)]
            + [f"({ms[c]}) >= ({ms[o]})" for o in range(nc) if o > c]
        )
        wsel = ", ".join(f"w.w_{c}_{j} AS w{j}" for j in range(nf))
        per_class.append(
            f"""SELECT '{_CLASSES[c]}' AS lang_class, {wsel},
       sum(CASE WHEN f.lang = '{_CLASSES[c]}' THEN 1 ELSE 0 END)::BIGINT
           AS n_class,
       round(sum(CASE WHEN f.lang = '{_CLASSES[c]}' AND ({cond})
                      THEN 1.0 ELSE 0.0 END)
             / sum(CASE WHEN f.lang = '{_CLASSES[c]}' THEN 1.0
                        ELSE 0.0 END), 6) AS class_recall
FROM features f CROSS JOIN {prev} w
GROUP BY {', '.join('w.w_' + str(c) + '_' + str(j) for j in range(nf))}"""
        )
    union = "\nUNION ALL\n".join(per_class)
    return f"""
WITH features AS ({_sql_features_with_lang()}),
w0_cte AS (SELECT {', '.join('0.0 AS ' + wc for wc in wcols)}),
{iter_sql}
{union}
"""


def _sql_features_with_lang() -> str:
    return _sql_features().replace(
        "SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,",
        "SELECT lang, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,",
    )


@register(
    "softmax_lang_classifier",
    oracle=_softmax_oracle(),
    tags=("ml", "iterative", "classifier", "multiclass"),
    bench=True,
)
def softmax_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTICLASS softmax regression (5 languages, 3 GD steps) trained
    in-engine — the logistic classifier generalized: 25 weights move as
    one 1-row vector through the same lazy quantized trajectory, each
    step one aggregation of 25 map-side-combined gradient sums. Output
    is one row per class: its weight vector, support, and recall under
    the argmax decision rule (first class attaining the max margin —
    struct-max over (margin, -class) on the Spark side, explicit
    inequality chains in the oracle: same winner, two spellings, so
    the hash cross-checks the decision rule too).
    """
    nc, nf = len(_CLASSES), _N_FEATURES
    # same features as _spark_features, plus lang (the multiclass label)
    text_len = F.length("text").cast("double")
    feats = (
        load_table(spark, sf_dir, "documents")
        .select(
            "lang",
            F.lit(1.0).alias("x0"),
            (F.col("n_chars") / 1000.0).alias("x1"),
            (F.size(F.split("text", " ", -1)) / 100.0).alias("x2"),
            (
                F.length(F.regexp_replace("text", r"[^.,!?;:]", ""))
                / text_len
            ).alias("x3"),
            (
                F.length(F.regexp_replace("text", r"[^0-9]", "")) / text_len
            ).alias("x4"),
        )
        .cache()
    )
    wnames = [f"w_{c}_{j}" for c in range(nc) for j in range(nf)]
    w = spark.range(1).selectExpr(
        *[f"0.0D AS {n}" for n in wnames]
    )
    # expressions arrive as PARSED SQL strings, not composed Column
    # objects: the 25-weight trajectory built via pyspark operators
    # spent 4.0s in py4j call chatter before any job ran (rule 18,
    # docs/SCALE_NOTES.md — same lesson as the IVF literal); F.expr
    # parses each in microseconds. The per-row softmax is projected
    # ONCE per iteration (e_c, zz) so the 25 gradient sums reference
    # shared columns instead of re-deriving 5 exps each.
    m_sql = [
        " + ".join(f"w_{c}_{j} * x{j}" for j in range(nf))
        for c in range(nc)
    ]
    for _ in range(N_ITERS):
        joined = feats.crossJoin(F.broadcast(w))
        proj = joined.selectExpr(
            "*", *[f"exp({m_sql[c]}) AS e_{c}" for c in range(nc)]
        ).selectExpr(
            "*",
            "(" + " + ".join(f"e_{c}" for c in range(nc)) + ") AS zz",
        )
        w = (
            proj.groupBy(*wnames)
            .agg(
                *[
                    F.expr(
                        f"sum((e_{c} / zz - (CASE WHEN lang = "
                        f"'{_CLASSES[c]}' THEN 1.0 ELSE 0.0 END))"
                        f" * x{j})"
                    ).alias(f"g_{c}_{j}")
                    for c in range(nc)
                    for j in range(nf)
                ],
                F.expr("count(*)").alias("n"),
            )
            .selectExpr(
                *[
                    f"round(w_{c}_{j} - {LR} * g_{c}_{j} / n, {_ROUND})"
                    f" AS w_{c}_{j}"
                    for c in range(nc)
                    for j in range(nf)
                ]
            )
        )
    scored = feats.crossJoin(F.broadcast(w))
    entries = ", ".join(
        f"struct({m_sql[c]} AS m, {-c} AS nci)" for c in range(nc)
    )
    pred = F.expr(f"-array_max(array({entries})).nci").cast("int")
    aggs = []
    for c in range(nc):
        is_c = (F.col("lang") == _CLASSES[c]).cast("double")
        aggs += [
            F.sum(is_c).alias(f"n_{c}"),
            F.sum(is_c * (pred == c).cast("double")).alias(f"hit_{c}"),
        ]
    wide = scored.groupBy(*wnames).agg(*aggs)
    per_class = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(_CLASSES[c]).alias("lang_class"),
                    *[
                        F.col(f"w_{c}_{j}").alias(f"w{j}")
                        for j in range(nf)
                    ],
                    F.col(f"n_{c}").cast("long").alias("n_class"),
                    F.round(F.col(f"hit_{c}") / F.col(f"n_{c}"), 6).alias(
                        "class_recall"
                    ),
                )
                for c in range(nc)
            ]
        )
    ).alias("r")
    return wide.select(per_class).select("r.*")


# ---------------------------------------------------------------------------
# AdaBoost decision stumps — the ensemble-tree lane beside the GD classifiers
# ---------------------------------------------------------------------------

_ADA_ROUNDS = 3
_ADA_FEATURES = (1, 2, 3, 4)  # embedding dims (1-based, both engines)
_ADA_THRESHOLDS = (-0.4, -0.2, 0.0, 0.2, 0.4)
_ADA_EPS = 1e-12


def _ada_candidates() -> list[tuple[int, int, float, float]]:
    """(cand_id, feature_idx, threshold, polarity) — the fixed literal
    stump grid, identical in the Spark plan and the DuckDB oracle."""
    out = []
    cid = 0
    for f in _ADA_FEATURES:
        for thr in _ADA_THRESHOLDS:
            for pol in (1.0, -1.0):
                out.append((cid, f, thr, pol))
                cid += 1
    return out


def _ada_oracle() -> str:
    cand_values = ", ".join(
        f"({cid}, {f}, {thr}::DOUBLE, {pol}::DOUBLE)"
        for cid, f, thr, pol in _ada_candidates()
    )

    def h(alias: str) -> str:
        return (
            f"{alias}.pol * (CASE WHEN b.v[{alias}.f] > {alias}.thr "
            "THEN 1.0 ELSE -1.0 END)"
        )

    def round_cte(t: int, weight_sql: str) -> str:
        return f"""
r{t}err AS (
    SELECT c.cand_id, c.f, c.thr, c.pol,
           round(sum(({weight_sql})
                     * (CASE WHEN c.pol * (CASE WHEN b.v[c.f] > c.thr
                                           THEN 1.0 ELSE -1.0 END) * b.y < 0
                        THEN 1.0 ELSE 0.0 END))
                 / sum({weight_sql}), 6) AS err
    FROM base b CROSS JOIN cands c
    {"CROSS JOIN r1 CROSS JOIN r2" if t == 3 else ("CROSS JOIN r1" if t == 2 else "")}
    GROUP BY 1, 2, 3, 4
),
r{t} AS (
    SELECT cand_id, f, thr, pol, err,
           round(0.5 * ln((1 - err + {_ADA_EPS}) / (err + {_ADA_EPS})), 6)
               AS alpha
    FROM r{t}err ORDER BY err ASC, cand_id ASC LIMIT 1
)"""

    w1 = "1.0"
    w2 = f"exp(-b.y * r1.alpha * ({h('r1')}))"
    w3 = (
        f"exp(-b.y * (r1.alpha * ({h('r1')}) + r2.alpha * ({h('r2')})))"
    )
    return f"""
WITH cands AS (
    SELECT * FROM (VALUES {cand_values}) AS t(cand_id, f, thr, pol)
),
base AS (
    SELECT embedding::DOUBLE[] AS v,
           CASE WHEN label = 0 THEN 1.0 ELSE -1.0 END AS y
    FROM embeddings
),{round_cte(1, w1)},{round_cte(2, w2)},{round_cte(3, w3)}
SELECT 1::BIGINT AS round, f::BIGINT AS feature_idx, thr AS threshold,
       pol AS polarity, alpha, err AS weighted_error FROM r1
UNION ALL
SELECT 2, f, thr, pol, alpha, err FROM r2
UNION ALL
SELECT 3, f, thr, pol, alpha, err FROM r3
"""


@register(
    "adaboost_stumps",
    oracle=_ada_oracle(),
    tags=("ml", "boosting", "iterative"),
    bench=True,
)
def adaboost_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AdaBoost over decision stumps (3 rounds, 40-candidate grid:
    4 embedding dims × 5 thresholds × 2 polarities; target label=0 vs
    rest) — the ensemble-tree member of the in-engine ML lane beside
    the GD classifiers, with the TRAINING TRAJECTORY itself
    hash-checked: each round's chosen (feature, threshold, polarity),
    its weighted error, and its vote weight alpha, errors and alphas
    6dp-quantized per round (the logreg determinism contract) so the
    DuckDB replay is exact.

    Plan (the logreg shape, no driver sync): each round is ONE corpus
    aggregation — the candidate grid broadcast-cross-joins the cached
    feature rows, so all 40 weighted errors ride one map-side-combined
    pass; the argmin is a min_by over the 40-row error table; the
    chosen stump cross-joins back as a 1-row model that the next
    round's weight expression exp(-y·Σ alpha·h) references. Rounds
    unroll lazily — Catalyst sees the whole trajectory; per-round
    shuffle traffic is 40 candidate cells, never rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        F.col("embedding").cast("array<double>").alias("v"),
        F.when(F.col("label") == 0, 1.0).otherwise(-1.0).alias("y"),
    ).cache()
    cands = F.broadcast(
        spark.createDataFrame(
            _ada_candidates(), "cand_id int, f int, thr double, pol double"
        )
    )

    def h(f_col, thr_col, pol_col):
        return pol_col * F.when(
            F.element_at("v", f_col) > thr_col, 1.0
        ).otherwise(-1.0)

    # model: 1-row DataFrame growing (f_t, thr_t, pol_t, alpha_t, err_t)
    model = spark.range(1).select(F.lit(0).alias("__m"))
    chosen_cols: list[str] = []
    for t in range(1, _ADA_ROUNDS + 1):
        joined = base.crossJoin(F.broadcast(model)).crossJoin(cands)
        margin = F.lit(0.0)
        for s in range(1, t):
            margin = margin + F.col(f"alpha_{s}") * h(
                F.col(f"f_{s}"), F.col(f"thr_{s}"), F.col(f"pol_{s}")
            )
        wgt = F.exp(-F.col("y") * margin)
        mismatch = (
            h(F.col("f"), F.col("thr"), F.col("pol")) * F.col("y") < 0
        ).cast("double")
        group_keys = ["__m"] + chosen_cols
        errs = (
            joined.groupBy(*group_keys, "cand_id", "f", "thr", "pol")
            .agg(
                F.round(
                    F.sum(wgt * mismatch) / F.sum(wgt), _ROUND
                ).alias("err")
            )
        )
        pick = F.min_by(
            F.struct("f", "thr", "pol", "err"),
            F.struct("err", "cand_id"),
        ).alias("pick")
        model = (
            errs.groupBy(*group_keys)
            .agg(pick)
            .select(
                *group_keys,
                F.col("pick.f").alias(f"f_{t}"),
                F.col("pick.thr").alias(f"thr_{t}"),
                F.col("pick.pol").alias(f"pol_{t}"),
                F.col("pick.err").alias(f"err_{t}"),
                F.round(
                    0.5
                    * F.log(
                        (1 - F.col("pick.err") + _ADA_EPS)
                        / (F.col("pick.err") + _ADA_EPS)
                    ),
                    _ROUND,
                ).alias(f"alpha_{t}"),
            )
        )
        chosen_cols += [f"f_{t}", f"thr_{t}", f"pol_{t}", f"err_{t}",
                        f"alpha_{t}"]
    rows = F.array(
        *[
            F.struct(
                F.lit(t).cast("long").alias("round"),
                F.col(f"f_{t}").cast("long").alias("feature_idx"),
                F.col(f"thr_{t}").alias("threshold"),
                F.col(f"pol_{t}").alias("polarity"),
                F.col(f"alpha_{t}").alias("alpha"),
                F.col(f"err_{t}").alias("weighted_error"),
            )
            for t in range(1, _ADA_ROUNDS + 1)
        ]
    )
    return model.select(F.explode(rows).alias("r")).select("r.*")


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes language classifier (closed-form training)
# ---------------------------------------------------------------------------

_NB_TOKENS_SQL = "regexp_split_to_array(trim(text), '\\s+')"

_NB_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, lang, unnest({_NB_TOKENS_SQL}) AS tok FROM documents
),
train AS (SELECT * FROM toks WHERE doc_id % 5 <> 0),
prior AS (
    SELECT lang, count(*)::DOUBLE AS nd
    FROM documents WHERE doc_id % 5 <> 0 GROUP BY lang
),
ptot AS (SELECT sum(nd) AS td FROM prior),
tot AS (SELECT lang, count(*)::DOUBLE AS tot_l FROM train GROUP BY lang),
vocab AS (SELECT count(DISTINCT tok)::DOUBLE AS v FROM train),
cnt AS (
    SELECT lang, tok, count(*)::BIGINT AS c FROM train GROUP BY lang, tok
),
test_toks AS (
    SELECT doc_id, lang AS actual_lang, tok FROM toks WHERE doc_id % 5 = 0
),
ll AS (
    SELECT t.doc_id, t.actual_lang, l.lang,
           sum(ln((coalesce(c.c, 0) + 1) / (l.tot_l + v.v))) AS loglik
    FROM test_toks t
    CROSS JOIN tot l
    CROSS JOIN vocab v
    LEFT JOIN cnt c ON c.lang = l.lang AND c.tok = t.tok
    GROUP BY t.doc_id, t.actual_lang, l.lang
),
post AS (
    SELECT x.doc_id, x.actual_lang, x.lang,
           x.loglik + ln(p.nd / pt.td) AS score
    FROM ll x JOIN prior p ON p.lang = x.lang CROSS JOIN ptot pt
),
pred AS (
    SELECT doc_id, actual_lang, lang AS predicted_lang,
           row_number() OVER (
               PARTITION BY doc_id
               ORDER BY round(score, 6) DESC, lang ASC
           ) AS rn
    FROM post
)
SELECT actual_lang, predicted_lang, count(*)::BIGINT AS n_docs
FROM pred WHERE rn = 1
GROUP BY actual_lang, predicted_lang
"""


@register(
    "naive_bayes_lang_classifier",
    oracle=_NB_ORACLE,
    tags=("ml", "text", "classifier"),
    bench=True,
)
def naive_bayes_lang_classifier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multinomial Naive Bayes language identification, trained and
    evaluated in-engine: add-one-smoothed per-class token likelihoods
    and document priors fit on the 80% train split (doc_id % 5 != 0),
    held-out confusion matrix on the 20% test split — the CLOSED-FORM
    learned classifier beside the iterative GD lanes (logreg/softmax/
    AdaBoost): training is exactly two groupBy aggregations, no loop,
    no driver round-trips, which is why NB remains the canonical
    first-pass text filter at corpus scale.

    Plan shape: one tokenize+explode pass feeds both splits; the model
    (per-class token counts, class totals, vocab size, priors) is a
    handful of vocabulary-sized-or-smaller aggregates broadcast onto
    the test-token stream (the plans/corpus.py::_scoring_join cutover
    applies verbatim when vocab x classes outgrows RAM); scoring is
    one (doc, class) aggregation and the argmax is a 5-row-per-doc
    window on the ROUNDED score, so float association noise cannot
    flip a prediction."""
    from emails_to_vector_db_spark.functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(TX.tokens("text")).alias("tok")
    )
    train = toks.where(F.col("doc_id") % 5 != 0)
    prior = (
        docs.where(F.col("doc_id") % 5 != 0)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("double").alias("nd"))
    )
    ptot = prior.agg(F.sum("nd").alias("td"))
    tot = train.groupBy("lang").agg(
        F.count(F.lit(1)).cast("double").alias("tot_l")
    )
    vocab = train.agg(
        F.countDistinct("tok").cast("double").alias("v")
    )
    cnt = train.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    test_toks = toks.where(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.col("lang").alias("actual_lang"), "tok"
    )
    ll = (
        test_toks.crossJoin(F.broadcast(tot.select("lang", "tot_l")))
        .crossJoin(F.broadcast(vocab))
        .join(F.broadcast(cnt), ["lang", "tok"], "left")
        .groupBy("doc_id", "actual_lang", "lang")
        .agg(
            F.sum(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1)
                    / (F.col("tot_l") + F.col("v"))
                )
            ).alias("loglik")
        )
    )
    post = (
        ll.join(F.broadcast(prior), "lang")
        .crossJoin(F.broadcast(ptot))
        .withColumn(
            "score", F.col("loglik") + F.log(F.col("nd") / F.col("td"))
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.round("score", 6).desc(), F.col("lang").asc()
    )
    return (
        post.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .groupBy(
            "actual_lang", F.col("lang").alias("predicted_lang")
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Closed-form OLS: two-predictor normal equations from one moment pass
# ---------------------------------------------------------------------------

# Shared algebra (identical text in both engines): 3x3 normal-equation
# solve by Cramer's rule over the raw moment sums, then the
# moment-identity SSE = Syy - b0*Sy - b1*S1y - b2*S2y (exact for the
# least-squares solution), so ONE aggregation pass yields coefficients
# AND goodness-of-fit with no residual re-scan.
_OLS_DET = (
    "(n * (s11 * s22 - s12 * s12)"
    " - s1 * (s1 * s22 - s12 * s2)"
    " + s2 * (s1 * s12 - s11 * s2))"
)
_OLS_B0 = (
    "(sy * (s11 * s22 - s12 * s12)"
    " - s1 * (s1y * s22 - s12 * s2y)"
    " + s2 * (s1y * s12 - s11 * s2y))"
)
_OLS_B1 = (
    "(n * (s1y * s22 - s12 * s2y)"
    " - sy * (s1 * s22 - s12 * s2)"
    " + s2 * (s1 * s2y - s1y * s2))"
)
_OLS_B2 = (
    "(n * (s11 * s2y - s1y * s12)"
    " - s1 * (s1 * s2y - s1y * s2)"
    " + sy * (s1 * s12 - s11 * s2))"
)

_OLS_ORACLE = f"""
WITH m AS (
    SELECT count(*)::DOUBLE AS n,
           sum(l_quantity) AS s1, sum(l_discount) AS s2,
           sum(l_extendedprice) AS sy,
           sum(l_quantity * l_quantity) AS s11,
           sum(l_discount * l_discount) AS s22,
           sum(l_quantity * l_discount) AS s12,
           sum(l_quantity * l_extendedprice) AS s1y,
           sum(l_discount * l_extendedprice) AS s2y,
           sum(l_extendedprice * l_extendedprice) AS syy
    FROM lineitem
),
b AS (
    SELECT n, sy, s1y, s2y, syy,
           {_OLS_B0} / {_OLS_DET} AS b0,
           {_OLS_B1} / {_OLS_DET} AS b1,
           {_OLS_B2} / {_OLS_DET} AS b2
    FROM m
)
SELECT round(b0, 4) AS intercept,
       round(b1, 4) AS coef_quantity,
       round(b2, 4) AS coef_discount,
       round(1 - (syy - b0 * sy - b1 * s1y - b2 * s2y)
                 / (syy - sy * sy / n), 6) AS r_squared,
       n::BIGINT AS n_rows
FROM b
"""


@register(
    "ols_price_model",
    oracle=_OLS_ORACLE,
    tags=("ml", "regression", "closed-form"),
)
def ols_price_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-predictor ordinary least squares (extendedprice ~ quantity +
    discount) solved in CLOSED FORM: one map-side-combinable pass
    accumulates the ten raw moments, Cramer's rule on the 3x3 normal
    equations yields the coefficients, and the moment identity
    SSE = Syy - b'X'y gives R² with NO residual re-scan — the
    regression twin of the closed-form Naive Bayes lane, and the
    pattern that replaces gradient descent whenever d is small enough
    that X'X fits in a row (d<=~100). The corpus never shuffles; only
    a 1-row moment vector moves. For numerically hostile data the
    centered-moment (QR/Cholesky) form applies — raw moments are fine
    at these magnitudes and make the oracle exactly replayable."""
    li = load_table(spark, sf_dir, "lineitem")
    x1, x2, y = F.col("l_quantity"), F.col("l_discount"), F.col(
        "l_extendedprice"
    )
    m = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x1).alias("s1"),
        F.sum(x2).alias("s2"),
        F.sum(y).alias("sy"),
        F.sum(x1 * x1).alias("s11"),
        F.sum(x2 * x2).alias("s22"),
        F.sum(x1 * x2).alias("s12"),
        F.sum(x1 * y).alias("s1y"),
        F.sum(x2 * y).alias("s2y"),
        F.sum(y * y).alias("syy"),
    )
    b = m.selectExpr(
        "n",
        "sy",
        "s1y",
        "s2y",
        "syy",
        f"{_OLS_B0} / {_OLS_DET} AS b0",
        f"{_OLS_B1} / {_OLS_DET} AS b1",
        f"{_OLS_B2} / {_OLS_DET} AS b2",
    )
    return b.select(
        F.round("b0", 4).alias("intercept"),
        F.round("b1", 4).alias("coef_quantity"),
        F.round("b2", 4).alias("coef_discount"),
        F.round(
            1
            - (
                F.col("syy")
                - F.col("b0") * F.col("sy")
                - F.col("b1") * F.col("s1y")
                - F.col("b2") * F.col("s2y")
            )
            / (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")),
            6,
        ).alias("r_squared"),
        F.col("n").cast("long").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# Split-conformal prediction intervals around the closed-form OLS model
# ---------------------------------------------------------------------------

_CONF_TARGET = 0.9

_CONFORMAL_ORACLE = f"""
WITH train AS (
    SELECT * FROM lineitem WHERE l_orderkey % 4 IN (0, 1)
),
m AS (
    SELECT count(*)::DOUBLE AS n,
           sum(l_quantity) AS s1, sum(l_discount) AS s2,
           sum(l_extendedprice) AS sy,
           sum(l_quantity * l_quantity) AS s11,
           sum(l_discount * l_discount) AS s22,
           sum(l_quantity * l_discount) AS s12,
           sum(l_quantity * l_extendedprice) AS s1y,
           sum(l_discount * l_extendedprice) AS s2y
    FROM train
),
b AS (
    SELECT round({_OLS_B0} / {_OLS_DET}, 6) AS b0,
           round({_OLS_B1} / {_OLS_DET}, 6) AS b1,
           round({_OLS_B2} / {_OLS_DET}, 6) AS b2
    FROM m
),
calib AS (
    SELECT abs(l_extendedprice
               - (b.b0 + b.b1 * l_quantity + b.b2 * l_discount)) AS r
    FROM lineitem CROSS JOIN b
    WHERE l_orderkey % 4 = 2
),
nc AS (SELECT count(*)::BIGINT AS n FROM calib),
q AS (
    SELECT r AS qhat
    FROM (SELECT r, row_number() OVER (ORDER BY r) AS rn FROM calib)
    CROSS JOIN nc
    WHERE rn = CAST(ceil((nc.n + 1) * {_CONF_TARGET}) AS BIGINT)
),
test AS (
    SELECT abs(l_extendedprice
               - (b.b0 + b.b1 * l_quantity + b.b2 * l_discount)) AS r
    FROM lineitem CROSS JOIN b
    WHERE l_orderkey % 4 = 3
)
SELECT (SELECT count(*) FROM train)::BIGINT AS n_train,
       nc.n AS n_calib,
       count(*)::BIGINT AS n_test,
       round(max(q.qhat), 2) AS qhat,
       {_CONF_TARGET}::DOUBLE AS target_coverage,
       round(avg(CASE WHEN test.r <= q.qhat THEN 1.0 ELSE 0.0 END), 6)
           AS coverage
FROM test CROSS JOIN q CROSS JOIN nc
GROUP BY nc.n
"""


@register(
    "conformal_price_intervals",
    oracle=_CONFORMAL_ORACLE,
    tags=("ml", "uncertainty", "conformal"),
)
def conformal_price_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals (Vovk et al.; Lei et al.
    2018) around the closed-form OLS price model: fit on the train
    split, take the ceil((n+1)·{_CONF_TARGET})-th smallest absolute
    residual on the CALIBRATION split as the interval half-width qhat,
    then verify the distribution-free coverage guarantee empirically
    on the held-out test split — the uncertainty lane the point-
    estimate models (OLS/logreg/softmax) need before their predictions
    gate anything in production.

    Plan shape: the model is the same ONE-moment-pass closed form as
    ols_price_model, quantized at 6dp on both sides so residual
    rankings can't drift; the order-statistic qhat runs through
    operators/ranking.py::distributed_row_number — range-partition the
    calibration residuals, rank locally, broadcast per-partition
    offsets — so the calibration split (25% of the fact table) never
    collapses into a single-partition Window.orderBy sort; coverage is
    one conditional aggregate over test. Ties in r don't threaten
    determinism: the VALUE at global sort position k is unique however
    equal residuals are ordered among themselves."""
    li = load_table(spark, sf_dir, "lineitem")
    x1, x2, y = (
        F.col("l_quantity"),
        F.col("l_discount"),
        F.col("l_extendedprice"),
    )
    train = li.where(F.col("l_orderkey") % 4 < 2)
    m = train.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x1).alias("s1"),
        F.sum(x2).alias("s2"),
        F.sum(y).alias("sy"),
        F.sum(x1 * x1).alias("s11"),
        F.sum(x2 * x2).alias("s22"),
        F.sum(x1 * x2).alias("s12"),
        F.sum(x1 * y).alias("s1y"),
        F.sum(x2 * y).alias("s2y"),
    )
    b = F.broadcast(
        m.selectExpr(
            f"round({_OLS_B0} / {_OLS_DET}, 6) AS b0",
            f"round({_OLS_B1} / {_OLS_DET}, 6) AS b1",
            f"round({_OLS_B2} / {_OLS_DET}, 6) AS b2",
        )
    )
    resid = F.abs(
        y - (F.col("b0") + F.col("b1") * x1 + F.col("b2") * x2)
    )
    calib = (
        li.where(F.col("l_orderkey") % 4 == 2)
        .crossJoin(b)
        .select(resid.alias("r"))
    )
    from emails_to_vector_db_spark.operators.ranking import (
        distributed_row_number,
    )

    nc = F.broadcast(calib.agg(F.count(F.lit(1)).alias("n")))
    ranked = distributed_row_number(calib, [F.col("r").asc()], "rn")
    q = F.broadcast(
        ranked.crossJoin(nc)
        .where(
            F.col("rn")
            == F.ceil((F.col("n") + 1) * _CONF_TARGET).cast("long")
        )
        .select(F.col("r").alias("qhat"))
    )
    n_train = F.broadcast(
        train.agg(F.count(F.lit(1)).alias("n_train"))
    )
    test = (
        li.where(F.col("l_orderkey") % 4 == 3)
        .crossJoin(b)
        .select(resid.alias("r"))
    )
    return (
        test.crossJoin(q)
        .crossJoin(nc)
        .crossJoin(n_train)
        .groupBy("n_train", F.col("n").alias("n_calib"))
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.round(F.max("qhat"), 2).alias("qhat"),
            F.round(
                F.avg(
                    F.when(F.col("r") <= F.col("qhat"), 1.0).otherwise(
                        0.0
                    )
                ),
                6,
            ).alias("coverage"),
        )
        .select(
            "n_train",
            "n_calib",
            "n_test",
            "qhat",
            F.lit(_CONF_TARGET).alias("target_coverage"),
            "coverage",
        )
    )


# ---------------------------------------------------------------------------
# Leakage-safe training-set assembly: features at T, label in (T, T+h]
# ---------------------------------------------------------------------------

_DS_SPLIT_Q = 0.7
_DS_HORIZON_US = 5 * 86400 * 1_000_000

_DATASET_ORACLE = f"""
WITH ev AS (
    SELECT user_id, event_type, value, epoch_us(ts) AS t FROM events
),
cut AS (SELECT quantile_cont(t, {_DS_SPLIT_Q}) AS c FROM ev),
feat AS (
    SELECT user_id,
           count(*)::DOUBLE AS n_events,
           sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::DOUBLE
               AS n_clicks,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::DOUBLE
               AS n_purchases,
           avg(value) AS avg_value,
           max(t) AS last_seen
    FROM ev CROSS JOIN cut WHERE t <= cut.c
    GROUP BY user_id
),
lab AS (
    SELECT DISTINCT user_id, 1 AS y
    FROM ev CROSS JOIN cut
    WHERE t > cut.c AND t <= cut.c + {_DS_HORIZON_US}
      AND event_type = 'purchase'
),
ds AS (
    SELECT f.user_id, f.n_events, f.n_clicks, f.n_purchases,
           f.avg_value, coalesce(l.y, 0) AS y,
           (SELECT c FROM cut) - f.last_seen AS recency_us
    FROM feat f LEFT JOIN lab l USING (user_id)
)
SELECT count(*)::BIGINT AS n_users,
       sum(y)::BIGINT AS n_positive,
       round(avg(y), 6) AS label_rate,
       round(avg(n_events), 4) AS mean_events,
       round(avg(n_purchases), 4) AS mean_past_purchases,
       round(avg(recency_us) / 86400000000.0, 4) AS mean_recency_days,
       round(corr(n_purchases, y), 6) AS past_future_corr
FROM ds
"""


@register(
    "leakage_safe_dataset_build",
    oracle=_DATASET_ORACLE,
    tags=("ml", "dataset", "feature-engineering"),
)
def leakage_safe_dataset_build(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Training-set ASSEMBLY with the temporal-leakage contract
    enforced by construction: features aggregate ONLY events at or
    before the cutoff (the {_DS_SPLIT_Q:.0%} timestamp quantile),
    labels come ONLY from the (cutoff, cutoff+5d] horizon — the
    point-in-time-correct snapshot every churn/propensity model needs,
    where the classic bug (a feature window that peeks past T) silently
    inflates offline metrics. Reported as the dataset's audit card:
    size, label rate, feature means, recency, and the
    past-purchases→future-purchase correlation (the sanity signal that
    the features carry any lift at all).

    Plan shape: one cut scalar broadcast; features and labels are two
    filtered aggregations of the same scan lineage joined per user —
    the corpus shuffles once on user_id; the audit card is a 1-row
    fold of the user-level dataset. The per-user dataset itself is the
    intermediate you'd persist for the logreg/NB training lanes."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", F.unix_micros("ts").alias("t")
    )
    cut = F.broadcast(
        ev.agg(F.percentile(F.col("t"), F.lit(_DS_SPLIT_Q)).alias("c"))
    )
    ev = ev.crossJoin(cut)
    feat = (
        ev.where(F.col("t") <= F.col("c"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_events"),
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            )
            .cast("double")
            .alias("n_clicks"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("double")
            .alias("n_purchases"),
            F.avg("value").alias("avg_value"),
            F.max("t").alias("last_seen"),
            F.max("c").alias("c"),
        )
    )
    lab = (
        ev.where(
            (F.col("t") > F.col("c"))
            & (F.col("t") <= F.col("c") + _DS_HORIZON_US)
            & (F.col("event_type") == "purchase")
        )
        .select("user_id")
        .distinct()
        .withColumn("y", F.lit(1))
    )
    ds = feat.join(lab, "user_id", "left").select(
        "n_events",
        "n_purchases",
        F.coalesce("y", F.lit(0)).alias("y"),
        (F.col("c") - F.col("last_seen")).alias("recency_us"),
    )
    return ds.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("y").cast("long").alias("n_positive"),
        F.round(F.avg("y"), 6).alias("label_rate"),
        F.round(F.avg("n_events"), 4).alias("mean_events"),
        F.round(F.avg("n_purchases"), 4).alias("mean_past_purchases"),
        F.round(F.avg("recency_us") / 86400000000.0, 4).alias(
            "mean_recency_days"
        ),
        # moment-form corr with an explicit zero-variance guard: at a
        # 10x-replicated SF every user converts in the horizon, y has
        # zero variance, and ANSI-mode F.corr raises DIVIDE_BY_ZERO
        # where DuckDB's corr returns NULL — the guard matches DuckDB
        F.round(
            F.when(
                (
                    F.sum(F.col("n_purchases") * F.col("n_purchases"))
                    - F.pow(F.sum("n_purchases"), 2) / F.count(F.lit(1))
                    > 0
                )
                & (
                    F.sum(F.col("y") * F.col("y"))
                    - F.pow(F.sum("y"), 2) / F.count(F.lit(1))
                    > 0
                ),
                (
                    F.sum(F.col("n_purchases") * F.col("y"))
                    - F.sum("n_purchases")
                    * F.sum("y")
                    / F.count(F.lit(1))
                )
                / F.sqrt(
                    (
                        F.sum(F.col("n_purchases") * F.col("n_purchases"))
                        - F.pow(F.sum("n_purchases"), 2)
                        / F.count(F.lit(1))
                    )
                    * (
                        F.sum(F.col("y") * F.col("y"))
                        - F.pow(F.sum("y"), 2) / F.count(F.lit(1))
                    )
                ),
            ),
            6,
        ).alias("past_future_corr"),
    )


# ---------------------------------------------------------------------------
# Classifier fairness audit: per-group disparity of the trained filter
# ---------------------------------------------------------------------------


def _sql_features_with_source() -> str:
    """The logreg feature projection plus the protected-group
    passthrough (document source — the stand-in for the provenance /
    domain attribute a curation pipeline must not skew against)."""
    return """
    SELECT source,
           CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
           1.0 AS x0,
           n_chars / 1000.0 AS x1,
           len(string_split(text, ' ')) / 100.0 AS x2,
           length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
               / length(text)::DOUBLE AS x3,
           length(regexp_replace(text, '[^0-9]', '', 'g'))
               / length(text)::DOUBLE AS x4
    FROM documents"""


def _fairness_oracle() -> str:
    prefix, prev = _training_ctes(_sql_features_with_source())
    margin = " + ".join(f"w.w{j} * f.x{j}" for j in range(_N_FEATURES))
    return f"""{prefix},
scored AS (
    SELECT f.source, f.y,
           CASE WHEN ({margin}) > 0 THEN 1.0 ELSE 0.0 END AS pred
    FROM features f CROSS JOIN {prev} w
),
grp AS (
    SELECT source,
           count(*)::BIGINT AS n_docs,
           avg(pred) AS pos_rate,
           avg(CASE WHEN y = 1.0 THEN pred END) AS tpr,
           avg(CASE WHEN y = 0.0 THEN pred END) AS fpr,
           avg(CASE WHEN pred = y THEN 1.0 ELSE 0.0 END) AS acc
    FROM scored GROUP BY source
),
gaps AS (
    SELECT max(pos_rate) - min(pos_rate) AS dp_gap,
           max(tpr) - min(tpr) AS eo_gap
    FROM grp
)
SELECT g.source, g.n_docs,
       round(g.pos_rate, 6) AS positive_rate,
       round(g.tpr, 6) AS tpr,
       round(g.fpr, 6) AS fpr,
       round(g.acc, 6) AS accuracy,
       round(x.dp_gap, 6) AS dp_gap,
       round(x.eo_gap, 6) AS eo_gap
FROM grp g CROSS JOIN gaps x
ORDER BY g.source
"""


@register(
    "classifier_fairness_audit",
    oracle=_fairness_oracle(),
    tags=("ml", "eval", "fairness", "audit"),
)
def classifier_fairness_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-group fairness audit of the in-engine quality classifier —
    the bias check a curation pipeline owes its corpus before a learned
    filter gates documents at scale: replay the EXACT logreg_quality_
    classifier GD trajectory, then report per-SOURCE (the protected /
    provenance attribute) selection rate, TPR, FPR and accuracy, plus
    the two standard disparity summaries — demographic-parity gap
    (max-min selection rate) and equalized-odds gap (max-min TPR). A
    filter whose dp_gap is large is silently re-weighting the corpus
    mix; this makes that drift a hash-checked number (the model-eval
    sibling of source_curation_health's raw-data view).

    Plan shape: identical economics to logreg_calibration_curve — the
    cached feature projection trains via three 5-double map-side
    gradient aggs; scoring broadcasts the 1-row weight vector; the
    audit is one groupBy(source) over scored rows plus a 1-row gap
    aggregate broadcast back onto the (|groups|-sized) metric table."""
    feats = _spark_features_with_source(spark, sf_dir).cache()
    w = _trained_weights_df(spark, sf_dir, feats)
    xs = [f"x{j}" for j in range(_N_FEATURES)]
    margin = sum(
        (F.col(f"w{j}") * F.col(x) for j, x in enumerate(xs)), F.lit(0.0)
    )
    pred = F.when(margin > 0, 1.0).otherwise(0.0)
    scored = feats.crossJoin(F.broadcast(w)).select(
        "source", "y", pred.alias("pred")
    )
    grp = scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("pred").alias("pos_rate"),
        F.avg(F.when(F.col("y") == 1.0, F.col("pred"))).alias("tpr"),
        F.avg(F.when(F.col("y") == 0.0, F.col("pred"))).alias("fpr"),
        F.avg(
            F.when(F.col("pred") == F.col("y"), 1.0).otherwise(0.0)
        ).alias("acc"),
    )
    gaps = F.broadcast(
        grp.agg(
            (F.max("pos_rate") - F.min("pos_rate")).alias("dp_gap"),
            (F.max("tpr") - F.min("tpr")).alias("eo_gap"),
        )
    )
    return (
        grp.crossJoin(gaps)
        .select(
            "source",
            "n_docs",
            F.round("pos_rate", 6).alias("positive_rate"),
            F.round("tpr", 6).alias("tpr"),
            F.round("fpr", 6).alias("fpr"),
            F.round("acc", 6).alias("accuracy"),
            F.round("dp_gap", 6).alias("dp_gap"),
            F.round("eo_gap", 6).alias("eo_gap"),
        )
        .orderBy("source")
    )


def _spark_features_with_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    text_len = F.length("text").cast("double")
    return docs.select(
        "source",
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        F.lit(1.0).alias("x0"),
        (F.col("n_chars") / 1000.0).alias("x1"),
        (F.size(F.split("text", " ", -1)) / 100.0).alias("x2"),
        (
            F.length(F.regexp_replace("text", r"[^.,!?;:]", "")) / text_len
        ).alias("x3"),
        (F.length(F.regexp_replace("text", r"[^0-9]", "")) / text_len).alias(
            "x4"
        ),
    )


# ---------------------------------------------------------------------------
# Propensity-score stratification ATT (observational causal inference)
# ---------------------------------------------------------------------------

_PSM_STRATA = 10
_PSM_XS = ("x0", "x1", "x2")


def _psm_features_sql() -> str:
    return """
    SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1.0 ELSE 0.0 END AS y,
           1.0 AS x0,
           c.c_acctbal / 1000.0 AS x1,
           coalesce(o.n, 0) / 10.0 AS x2,
           coalesce(o.spend, 0.0) AS outcome
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, count(*) AS n, sum(o_totalprice) AS spend
        FROM orders GROUP BY o_custkey
    ) o ON o.o_custkey = c.c_custkey"""


def _psm_oracle() -> str:
    nf = len(_PSM_XS)
    prev = "w0_cte"
    iters = []
    for i in range(1, N_ITERS + 1):
        margin = " + ".join(f"w.w{j} * f.x{j}" for j in range(nf))
        grads = ",\n           ".join(
            f"round(w.w{j} - {LR} * sum((1.0 / (1.0 + exp(-({margin}))) - f.y)"
            f" * f.x{j}) / count(*), {_ROUND}) AS w{j}"
            for j in range(nf)
        )
        iters.append(
            f"""w{i} AS (
    SELECT {grads}
    FROM features f CROSS JOIN {prev} w
    GROUP BY {', '.join(f'w.w{j}' for j in range(nf))}
)"""
        )
        prev = f"w{i}"
    iter_sql = ",\n".join(iters)
    margin = " + ".join(f"w.w{j} * f.x{j}" for j in range(nf))
    return f"""
WITH features AS ({_psm_features_sql()}),
w0_cte AS (SELECT {', '.join(f'0.0 AS w{j}' for j in range(nf))}),
{iter_sql},
scored AS (
    SELECT f.y, f.outcome,
           least(floor((1.0 / (1.0 + exp(-({margin})))) * {_PSM_STRATA}),
                 {_PSM_STRATA - 1})::INT AS stratum
    FROM features f CROSS JOIN {prev} w
),
cells AS (
    SELECT stratum,
           count(*) FILTER (y = 1.0)::DOUBLE AS n_t,
           count(*) FILTER (y = 0.0)::DOUBLE AS n_c,
           avg(outcome) FILTER (y = 1.0) AS m_t,
           avg(outcome) FILTER (y = 0.0) AS m_c
    FROM scored GROUP BY stratum
),
used AS (SELECT * FROM cells WHERE n_t > 0 AND n_c > 0),
naive AS (
    SELECT avg(outcome) FILTER (y = 1.0)
             - avg(outcome) FILTER (y = 0.0) AS d
    FROM scored
)
SELECT sum(u.n_t)::BIGINT AS n_treated_matched,
       sum(u.n_c)::BIGINT AS n_control_matched,
       count(*)::BIGINT AS n_strata_used,
       round(sum(u.n_t * (u.m_t - u.m_c)) / sum(u.n_t), 4) AS att,
       round(max(nv.d), 4) AS naive_diff
FROM used u CROSS JOIN naive nv
"""


@register(
    "propensity_stratified_att",
    oracle=_psm_oracle(),
    tags=("ml", "causal", "experimentation"),
)
def propensity_stratified_att(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Propensity-score stratification (Rosenbaum & Rubin 1983/1984) —
    the observational-causal estimator beside DiD: fit an in-engine
    logistic propensity model P(treated | covariates) (treatment =
    BUILDING market segment; covariates = account balance and order
    count; the SAME 3-step quantized GD trajectory discipline as the
    quality classifier), subclassify into 10 fixed-width propensity
    strata, and estimate ATT as the treated-weighted within-stratum
    outcome difference over COMMON-SUPPORT strata (both arms present;
    off-support strata drop out — the trimming step pair-matching
    papers fight about, made explicit and countable here). The naive
    unadjusted difference rides along to show what the adjustment
    removed.

    Plan shape: subclassification IS aggregation — unlike 1-NN
    matching (a data-sized nearest-join), the whole estimator after
    the propensity scan is one 10-cell conditional groupBy, which is
    why it's the form that survives 100 TB unchanged. Training: three
    map-side 3-double gradient aggs over the cached customer-grain
    feature table; scoring broadcasts the 1-row weights."""
    from pyspark import StorageLevel

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    ostats = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("spend")
    )
    feats = (
        c.join(ostats, c["c_custkey"] == ostats["o_custkey"], "left")
        .select(
            F.when(F.col("c_mktsegment") == "BUILDING", 1.0)
            .otherwise(0.0)
            .alias("y"),
            F.lit(1.0).alias("x0"),
            (F.col("c_acctbal") / 1000.0).alias("x1"),
            (F.coalesce(F.col("n"), F.lit(0)) / 10.0).alias("x2"),
            F.coalesce(F.col("spend"), F.lit(0.0)).alias("outcome"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nf = len(_PSM_XS)
    w = spark.range(1).select(
        *[F.lit(0.0).alias(f"w{j}") for j in range(nf)]
    )
    for _ in range(N_ITERS):
        joined = feats.crossJoin(F.broadcast(w))
        margin = sum(
            (F.col(f"w{j}") * F.col(f"x{j}") for j in range(nf)),
            F.lit(0.0),
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
        w = joined.groupBy(*[f"w{j}" for j in range(nf)]).agg(
            *[
                F.sum((p - F.col("y")) * F.col(f"x{j}")).alias(f"g{j}")
                for j in range(nf)
            ],
            F.count(F.lit(1)).alias("n"),
        ).select(
            *[
                F.round(
                    F.col(f"w{j}") - LR * F.col(f"g{j}") / F.col("n"),
                    _ROUND,
                ).alias(f"w{j}")
                for j in range(nf)
            ]
        )
    margin = sum(
        (F.col(f"w{j}") * F.col(f"x{j}") for j in range(nf)), F.lit(0.0)
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    scored = feats.crossJoin(F.broadcast(w)).select(
        "y",
        "outcome",
        F.least(
            F.floor(p * _PSM_STRATA), F.lit(_PSM_STRATA - 1)
        ).cast("int").alias("stratum"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    cells = scored.groupBy("stratum").agg(
        F.count(F.when(F.col("y") == 1.0, 1)).cast("double").alias("n_t"),
        F.count(F.when(F.col("y") == 0.0, 1)).cast("double").alias("n_c"),
        F.avg(F.when(F.col("y") == 1.0, F.col("outcome"))).alias("m_t"),
        F.avg(F.when(F.col("y") == 0.0, F.col("outcome"))).alias("m_c"),
    )
    naive = F.broadcast(
        scored.agg(
            (
                F.avg(F.when(F.col("y") == 1.0, F.col("outcome")))
                - F.avg(F.when(F.col("y") == 0.0, F.col("outcome")))
            ).alias("d")
        )
    )
    used = cells.where((F.col("n_t") > 0) & (F.col("n_c") > 0))
    return used.crossJoin(naive).agg(
        F.sum("n_t").cast("long").alias("n_treated_matched"),
        F.sum("n_c").cast("long").alias("n_control_matched"),
        F.count(F.lit(1)).alias("n_strata_used"),
        F.round(
            F.sum(F.col("n_t") * (F.col("m_t") - F.col("m_c")))
            / F.sum("n_t"),
            4,
        ).alias("att"),
        F.round(F.max("d"), 4).alias("naive_diff"),
    )


# ---------------------------------------------------------------------------
# Bradley-Terry pairwise-strength fit (the preference-model lane)
# ---------------------------------------------------------------------------

_BT_ITERS = 3
_BT_ROUND = 6
_BT_TOP = 20
# Basket cap: orders with more lineitem rows than this are EXCLUDED from
# comparison generation. The order-blocked self-join emits C(n_lines, 2)
# pairs per order — without a cap a single mega-basket (a skewed order
# key at 100 TB) turns the "bounded" per-order quadratic into a straggler
# task. The cap bounds per-order work at C(cap, 2) = 15 pairs, making the
# comparison stage linear in orders; the bound is part of the output
# schema (basket_cap column) so consumers see the sampling frame — the
# minhash_scurve_audit precedent of recording audit parameters in-row.
_BT_BASKET_CAP = 6


def _bt_oracle() -> str:
    iters = []
    prev = "p0"
    for t in range(1, _BT_ITERS + 1):
        iters.append(
            f"""d{t} AS (
    SELECT g.i, sum(g.nij / (pi.p + pj.p)) AS den
    FROM games g
    JOIN {prev} pi ON pi.i = g.i
    JOIN {prev} pj ON pj.i = g.j
    GROUP BY g.i
),
r{t} AS (
    SELECT d.i, coalesce(w.w, 0) / d.den AS raw
    FROM d{t} d LEFT JOIN wins w ON w.i = d.i
),
s{t} AS (SELECT sum(raw) AS s FROM r{t}),
p{t} AS MATERIALIZED (
    SELECT r.i, round(r.raw * np.n / s.s, {_BT_ROUND}) AS p
    FROM r{t} r CROSS JOIN s{t} s CROSS JOIN np
)"""
        )
        prev = f"p{t}"
    iter_sql = ",\n".join(iters)
    return f"""
WITH capped AS MATERIALIZED (
    SELECT l_orderkey, l_suppkey, l_shipdate
    FROM (
        SELECT l_orderkey, l_suppkey, l_shipdate,
               count(*) OVER (PARTITION BY l_orderkey) AS n_lines
        FROM lineitem
    ) WHERE n_lines <= {_BT_BASKET_CAP}
),
comps AS MATERIALIZED (
    SELECT CASE WHEN a.l_shipdate < b.l_shipdate
                THEN a.l_suppkey ELSE b.l_suppkey END AS winner,
           CASE WHEN a.l_shipdate < b.l_shipdate
                THEN b.l_suppkey ELSE a.l_suppkey END AS loser
    FROM capped a JOIN capped b
      ON a.l_orderkey = b.l_orderkey
     AND a.l_suppkey < b.l_suppkey
     AND a.l_shipdate <> b.l_shipdate
),
wins AS (SELECT winner AS i, count(*)::DOUBLE AS w FROM comps GROUP BY 1),
und AS (
    SELECT winner AS i, loser AS j FROM comps
    UNION ALL
    SELECT loser AS i, winner AS j FROM comps
),
games AS MATERIALIZED (
    SELECT i, j, count(*)::DOUBLE AS nij FROM und GROUP BY 1, 2
),
np AS (SELECT count(DISTINCT i)::DOUBLE AS n FROM games),
p0 AS MATERIALIZED (SELECT DISTINCT i, 1.0 AS p FROM games),
{iter_sql},
tot AS (SELECT i, sum(nij)::BIGINT AS n_games FROM games GROUP BY i)
SELECT p.i AS supp_key,
       coalesce(w.w, 0)::BIGINT AS n_wins,
       t.n_games,
       p.p AS strength,
       {_BT_BASKET_CAP}::BIGINT AS basket_cap
FROM {prev} p
LEFT JOIN wins w ON w.i = p.i
JOIN tot t ON t.i = p.i
ORDER BY p.p DESC, p.i ASC
LIMIT {_BT_TOP}
"""


@register(
    "bradley_terry_strengths",
    oracle=_bt_oracle(),
    tags=("ml", "iterative", "ranking", "preference"),
)
def bradley_terry_strengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry pairwise-strength model (1952) fit by Zermelo's MM
    iteration — THE model behind preference data: reward-model
    training pairs, chatbot-arena leaderboards, and learning-to-rank
    all reduce to P(i beats j) = π_i/(π_i+π_j). Here the comparisons
    are deterministic by construction: within each order, the supplier
    shipping EARLIER beats the slower one (ties skipped), and three MM
    updates π_i ← W_i / Σ_j n_ij/(π_i+π_j) — normalized to mean 1 and
    6dp-quantized per step, the logreg trajectory discipline — produce
    the top-20 fastest-shipping suppliers with their fitted strengths.

    Plan shape: comparisons come from the BASKET-ARRAY form of the
    market-basket lane, BOUNDED by the basket cap — a per-order line
    count (map-side combinable) names the orders with at most
    _BT_BASKET_CAP lineitem rows, the kept lines re-group into per-order
    arrays on the SAME l_orderkey partitioning (exchange-reused), and
    the ≤C(cap, 2) within-order pairs expand SCAN-LOCALLY from each
    ≤cap-element array — no self-join, no window sort, and a skewed
    mega-order can never produce a quadratic straggler or an unbounded
    collect (the cap is enforced BEFORE the array build). The cap rides
    the output as the basket_cap column so the sampling frame is
    visible. Everything iterative runs on the PLAYER-PAIR table
    (|players|² ceiling, cached once). Each MM step joins the broadcast
    π vector twice (both endpoints), aggregates a player-grain
    denominator, and renormalizes via a 1-row sum — ship the vector,
    not the pairs. The π vector is localCheckpointed per step (each
    step broadcasts it twice; the execution tree would otherwise double
    per iteration — the kcore lesson, measured 4x at sf1)."""
    from pyspark import StorageLevel

    li_raw = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    keep = (
        li_raw.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") <= _BT_BASKET_CAP)
        .select("l_orderkey")
    )
    baskets = (
        li_raw.join(keep, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("l_suppkey").alias("s"),
                    F.col("l_shipdate").alias("d"),
                )
            ).alias("items")
        )
    )
    # unordered within-order line pairs, expanded scan-locally: element
    # i against every later element (position pairs i<j enumerate each
    # unordered pair exactly once — the a.supp<b.supp join predicate's
    # role); same-supplier and same-date pairs drop as in the join form
    pair_structs = F.filter(
        F.flatten(
            F.transform(
                F.col("items"),
                lambda x, i: F.transform(
                    F.slice(
                        F.col("items"), i + 2, F.size(F.col("items"))
                    ),
                    lambda y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        ),
        lambda p: (p["a"]["s"] != p["b"]["s"])
        & (p["a"]["d"] != p["b"]["d"]),
    )
    pr = baskets.select(F.explode(pair_structs).alias("p"))
    comps = pr.select(
        F.when(
            F.col("p.a.d") < F.col("p.b.d"), F.col("p.a.s")
        )
        .otherwise(F.col("p.b.s"))
        .alias("winner"),
        F.when(
            F.col("p.a.d") < F.col("p.b.d"), F.col("p.b.s")
        )
        .otherwise(F.col("p.a.s"))
        .alias("loser"),
    )
    # condense the corpus to the directed (winner, loser) win-count
    # table in ONE pass — wins and the symmetric game counts both
    # derive from it; a union-of-comps-with-swap would re-execute the
    # order-blocked self-join once per branch (the kcore lesson)
    dirw = (
        comps.groupBy("winner", "loser")
        .agg(F.count(F.lit(1)).cast("double").alias("nw"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    wins = (
        dirw.groupBy(F.col("winner").alias("i"))
        .agg(F.sum("nw").alias("w"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    games = (
        dirw.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("winner").alias("i"),
                        F.col("loser").alias("j"),
                        F.col("nw"),
                    ),
                    F.struct(
                        F.col("loser").alias("i"),
                        F.col("winner").alias("j"),
                        F.col("nw"),
                    ),
                )
            ).alias("e")
        )
        .groupBy("e.i", "e.j")
        .agg(F.sum("e.nw").alias("nij"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    np_ = F.broadcast(
        games.agg(F.count_distinct("i").cast("double").alias("n"))
    )
    # each MM step references pi AND pj (two broadcasts of the same
    # vector) — without lineage truncation the execution tree doubles
    # per iteration (the kcore lesson); the vector is |players| rows
    p = (
        games.select("i")
        .distinct()
        .withColumn("p", F.lit(1.0))
        .localCheckpoint()
    )
    for _ in range(_BT_ITERS):
        pi = F.broadcast(p.select(F.col("i"), F.col("p").alias("p_i")))
        pj = F.broadcast(
            p.select(F.col("i").alias("j"), F.col("p").alias("p_j"))
        )
        den = (
            games.join(pi, "i")
            .join(pj, "j")
            .groupBy("i")
            .agg(
                F.sum(
                    F.col("nij") / (F.col("p_i") + F.col("p_j"))
                ).alias("den")
            )
        )
        raw = den.join(wins, "i", "left").select(
            "i",
            (F.coalesce(F.col("w"), F.lit(0.0)) / F.col("den")).alias(
                "raw"
            ),
        )
        s = F.broadcast(raw.agg(F.sum("raw").alias("s")))
        p = (
            raw.crossJoin(s)
            .crossJoin(np_)
            .select(
                "i",
                F.round(
                    F.col("raw") * F.col("n") / F.col("s"), _BT_ROUND
                ).alias("p"),
            )
            .localCheckpoint()
        )
    tot = games.groupBy("i").agg(
        F.sum("nij").cast("long").alias("n_games")
    )
    return (
        p.join(wins, "i", "left")
        .join(tot, "i")
        .select(
            F.col("i").alias("supp_key"),
            F.coalesce(F.col("w"), F.lit(0.0)).cast("long").alias("n_wins"),
            "n_games",
            F.col("p").alias("strength"),
            F.lit(_BT_BASKET_CAP).cast("long").alias("basket_cap"),
        )
        .orderBy(F.col("strength").desc(), F.col("supp_key").asc())
        .limit(_BT_TOP)
    )


# ---------------------------------------------------------------------------
# Learning curve: the quality classifier trained on growing subsets
# ---------------------------------------------------------------------------

_LC_FRACS = ((1, "25pct"), (2, "50pct"), (4, "100pct"))  # doc_id % 4 < k


def _lc_features_sql() -> str:
    return """
    SELECT doc_id,
           CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
           1.0 AS x0,
           n_chars / 1000.0 AS x1,
           len(string_split(text, ' ')) / 100.0 AS x2,
           length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
               / length(text)::DOUBLE AS x3,
           length(regexp_replace(text, '[^0-9]', '', 'g'))
               / length(text)::DOUBLE AS x4
    FROM documents"""


def _lc_oracle() -> str:
    xs = [f"x{j}" for j in range(_N_FEATURES)]
    blocks, rows = [], []
    for mod, label in _LC_FRACS:
        sfx = f"m{mod}"
        prev = f"w0_{sfx}"
        blocks.append(
            f"""tr_{sfx} AS (
    SELECT * FROM features WHERE doc_id % 4 < {mod}
),
w0_{sfx} AS (SELECT {', '.join(f'0.0 AS w{j}' for j in range(_N_FEATURES))})"""
        )
        for i in range(1, N_ITERS + 1):
            margin = " + ".join(
                f"w.w{j} * f.{x}" for j, x in enumerate(xs)
            )
            grads = ",\n           ".join(
                f"round(w.w{j} - {LR} * sum((1.0 / (1.0 + exp(-({margin})))"
                f" - f.y) * f.{x}) / count(*), {_ROUND}) AS w{j}"
                for j, x in enumerate(xs)
            )
            blocks.append(
                f"""w{i}_{sfx} AS (
    SELECT {grads}
    FROM tr_{sfx} f CROSS JOIN {prev} w
    GROUP BY {', '.join(f'w.w{j}' for j in range(_N_FEATURES))}
)"""
            )
            prev = f"w{i}_{sfx}"
        margin = " + ".join(f"w.w{j} * f.x{j}" for j in range(_N_FEATURES))
        rows.append(
            f"""SELECT '{label}' AS subset,
       (SELECT count(*) FROM tr_{sfx})::BIGINT AS n_train,
       round(avg(CASE WHEN (({margin}) > 0) = (f.y = 1.0)
                      THEN 1.0 ELSE 0.0 END), 6) AS full_corpus_accuracy
FROM features f CROSS JOIN {prev} w"""
        )
    return (
        "WITH features AS ({feat}),\n".format(feat=_lc_features_sql())
        + ",\n".join(blocks)
        + "\nSELECT * FROM (\n"
        + "\nUNION ALL\n".join(rows)
        + "\n) ORDER BY n_train"
    )


@register(
    "learning_curve_logreg",
    oracle=_lc_oracle(),
    tags=("ml", "iterative", "eval", "diagnostics"),
)
def learning_curve_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learning curve of the in-engine quality classifier: the SAME
    3-step quantized GD trajectory trained on deterministic 25% / 50%
    / 100% subsets (doc_id mod 4 buckets — reproducible, disjointly
    nested) and evaluated on the FULL corpus — the "would more data
    help" diagnostic every data-acquisition decision should start
    from (a flat curve says buy better labels or features, a steep one
    says buy data). Subset trajectories are fully hash-checked like
    the parent classifier's.

    Plan shape: the feature projection is cached once and shared by
    all three trainings AND the shared evaluation scan; each training
    iteration stays a 5-double map-side gradient agg (now over the
    subset filter, which Catalyst pushes into the cached scan). Nine
    gradient aggs + three eval folds total, corpus never shuffles."""
    feats_df = load_table(spark, sf_dir, "documents")
    text_len = F.length("text").cast("double")
    feats = feats_df.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        F.lit(1.0).alias("x0"),
        (F.col("n_chars") / 1000.0).alias("x1"),
        (F.size(F.split("text", " ", -1)) / 100.0).alias("x2"),
        (
            F.length(F.regexp_replace("text", r"[^.,!?;:]", "")) / text_len
        ).alias("x3"),
        (F.length(F.regexp_replace("text", r"[^0-9]", "")) / text_len).alias(
            "x4"
        ),
    ).cache()
    xs = [f"x{j}" for j in range(_N_FEATURES)]
    out = None
    for mod, label in _LC_FRACS:
        tr = feats.where(F.col("doc_id") % 4 < mod)
        w = spark.range(1).select(
            *[F.lit(0.0).alias(f"w{j}") for j in range(_N_FEATURES)]
        )
        for _ in range(N_ITERS):
            joined = tr.crossJoin(F.broadcast(w))
            margin = sum(
                (F.col(f"w{j}") * F.col(x) for j, x in enumerate(xs)),
                F.lit(0.0),
            )
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
            w = joined.groupBy(
                *[f"w{j}" for j in range(_N_FEATURES)]
            ).agg(
                *[
                    F.sum((p - F.col("y")) * F.col(x)).alias(f"g{j}")
                    for j, x in enumerate(xs)
                ],
                F.count(F.lit(1)).alias("n"),
            ).select(
                *[
                    F.round(
                        F.col(f"w{j}") - LR * F.col(f"g{j}") / F.col("n"),
                        _ROUND,
                    ).alias(f"w{j}")
                    for j in range(_N_FEATURES)
                ]
            )
        n_train = F.broadcast(
            tr.agg(F.count(F.lit(1)).cast("long").alias("n_train"))
        )
        margin = sum(
            (F.col(f"w{j}") * F.col(x) for j, x in enumerate(xs)),
            F.lit(0.0),
        )
        correct = F.when(
            (margin > 0) == (F.col("y") == 1.0), 1.0
        ).otherwise(0.0)
        row = (
            feats.crossJoin(F.broadcast(w))
            .agg(F.round(F.avg(correct), 6).alias("full_corpus_accuracy"))
            .crossJoin(n_train)
            .select(
                F.lit(label).alias("subset"),
                "n_train",
                "full_corpus_accuracy",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("n_train")


# ---------------------------------------------------------------------------
# Drop-column feature importance for the quality classifier
# ---------------------------------------------------------------------------

_FI_FEATURES = (1, 2, 3, 4)  # x0 is the bias; never dropped
_FI_NAMES = {1: "chars_per_1k", 2: "tokens_per_100", 3: "punct_frac", 4: "digit_frac"}


def _fi_oracle() -> str:
    xs = [f"x{j}" for j in range(_N_FEATURES)]
    blocks, rows = [], []
    variants = [(0, "full")] + [(j, _FI_NAMES[j]) for j in _FI_FEATURES]
    for drop, label in variants:
        sfx = f"d{drop}"

        def col(j: int) -> str:
            return "0.0" if (drop != 0 and j == drop) else f"f.x{j}"

        prev = f"w0_{sfx}"
        blocks.append(
            f"w0_{sfx} AS (SELECT "
            + ", ".join(f"0.0 AS w{j}" for j in range(_N_FEATURES))
            + ")"
        )
        for i in range(1, N_ITERS + 1):
            margin = " + ".join(
                f"w.w{j} * {col(j)}" for j in range(_N_FEATURES)
            )
            grads = ",\n           ".join(
                f"round(w.w{j} - {LR} * sum((1.0 / (1.0 + exp(-({margin})))"
                f" - f.y) * {col(j)}) / count(*), {_ROUND}) AS w{j}"
                for j in range(_N_FEATURES)
            )
            blocks.append(
                f"""w{i}_{sfx} AS (
    SELECT {grads}
    FROM features f CROSS JOIN {prev} w
    GROUP BY {', '.join(f'w.w{j}' for j in range(_N_FEATURES))}
)"""
            )
            prev = f"w{i}_{sfx}"
        margin = " + ".join(
            f"w.w{j} * {col(j)}" for j in range(_N_FEATURES)
        )
        rows.append(
            f"""SELECT '{label}' AS variant,
       round(avg(CASE WHEN (({margin}) > 0) = (f.y = 1.0)
                      THEN 1.0 ELSE 0.0 END), 6) AS accuracy
FROM features f CROSS JOIN {prev} w"""
        )
    union = "\nUNION ALL\n".join(rows)
    block_sql = ",\n".join(blocks)
    return f"""
WITH features AS ({_sql_features()}),
{block_sql},
accs AS ({union}),
base AS (SELECT accuracy AS acc0 FROM accs WHERE variant = 'full')
SELECT a.variant, a.accuracy,
       round(b.acc0 - a.accuracy, 6) AS importance
FROM accs a CROSS JOIN base b
ORDER BY importance DESC, a.variant ASC
"""


@register(
    "drop_column_importance",
    oracle=_fi_oracle(),
    tags=("ml", "iterative", "eval", "diagnostics"),
)
def drop_column_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop-column (leave-one-covariate-out) feature importance for
    the quality classifier: RETRAIN the same 3-step quantized GD with
    each feature zeroed (zeroing kills its gradient, so the weight
    stays 0 — exactly feature removal) and report the full-corpus
    accuracy drop vs the full model — the honest importance measure
    (unlike weight magnitudes, it accounts for the remaining features
    COMPENSATING, which is what correlated features do). Five fully
    hash-checked trajectories.

    Plan shape: one cached feature projection feeds fifteen 5-double
    gradient aggs and five eval folds; every stage is map-side
    combinable and the corpus never shuffles."""
    feats = _spark_features(spark, sf_dir).cache()
    xs = [f"x{j}" for j in range(_N_FEATURES)]
    variants = [(0, "full")] + [(j, _FI_NAMES[j]) for j in _FI_FEATURES]
    accs = None
    for drop, label in variants:

        def col(j: int) -> F.Column:
            if drop != 0 and j == drop:
                return F.lit(0.0)
            return F.col(f"x{j}")

        w = spark.range(1).select(
            *[F.lit(0.0).alias(f"w{j}") for j in range(_N_FEATURES)]
        )
        for _ in range(N_ITERS):
            joined = feats.crossJoin(F.broadcast(w))
            margin = sum(
                (F.col(f"w{j}") * col(j) for j in range(_N_FEATURES)),
                F.lit(0.0),
            )
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
            w = joined.groupBy(
                *[f"w{j}" for j in range(_N_FEATURES)]
            ).agg(
                *[
                    F.sum((p - F.col("y")) * col(j)).alias(f"g{j}")
                    for j in range(_N_FEATURES)
                ],
                F.count(F.lit(1)).alias("n"),
            ).select(
                *[
                    F.round(
                        F.col(f"w{j}") - LR * F.col(f"g{j}") / F.col("n"),
                        _ROUND,
                    ).alias(f"w{j}")
                    for j in range(_N_FEATURES)
                ]
            )
        margin = sum(
            (F.col(f"w{j}") * col(j) for j in range(_N_FEATURES)),
            F.lit(0.0),
        )
        correct = F.when(
            (margin > 0) == (F.col("y") == 1.0), 1.0
        ).otherwise(0.0)
        row = (
            feats.crossJoin(F.broadcast(w))
            .agg(F.round(F.avg(correct), 6).alias("accuracy"))
            .select(F.lit(label).alias("variant"), "accuracy")
        )
        accs = row if accs is None else accs.unionByName(row)
    base = F.broadcast(
        accs.where(F.col("variant") == "full").select(
            F.col("accuracy").alias("acc0")
        )
    )
    return (
        accs.crossJoin(base)
        .select(
            "variant",
            "accuracy",
            F.round(F.col("acc0") - F.col("accuracy"), 6).alias(
                "importance"
            ),
        )
        .orderBy(F.col("importance").desc(), F.col("variant").asc())
    )


# ---------------------------------------------------------------------------
# Teacher -> student distillation agreement (the cheap-filter-at-scale story)
# ---------------------------------------------------------------------------


def _distill_features_sql() -> str:
    """Features CTE body for the distilled student: the SAME 4 cheap
    quality signals as _sql_features, but y = the TEACHER's prediction
    (binary token-NB, en-vs-other, trained on the 80% split, scoring
    EVERY doc) instead of the gold label — plus the source passthrough
    for the per-source agreement report."""
    return f"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN lang = 'en' THEN 'en' ELSE 'other' END AS c,
               unnest({_NB_TOKENS_SQL}) AS tok
        FROM documents
    ),
    train AS (SELECT * FROM toks WHERE doc_id % 5 <> 0),
    prior AS (
        SELECT CASE WHEN lang = 'en' THEN 'en' ELSE 'other' END AS c,
               count(*)::DOUBLE AS nd
        FROM documents WHERE doc_id % 5 <> 0 GROUP BY 1
    ),
    ptot AS (SELECT sum(nd) AS td FROM prior),
    tot AS (SELECT c, count(*)::DOUBLE AS tot_c FROM train GROUP BY c),
    vocab AS (SELECT count(DISTINCT tok)::DOUBLE AS v FROM train),
    cnt AS (
        SELECT c, tok, count(*)::BIGINT AS n FROM train GROUP BY c, tok
    ),
    ll AS (
        SELECT t.doc_id, l.c,
               sum(ln((coalesce(k.n, 0) + 1) / (l.tot_c + v.v))) AS loglik
        FROM toks t
        CROSS JOIN tot l
        CROSS JOIN vocab v
        LEFT JOIN cnt k ON k.c = l.c AND k.tok = t.tok
        GROUP BY t.doc_id, l.c
    ),
    post AS (
        SELECT x.doc_id, x.c, x.loglik + ln(p.nd / pt.td) AS score
        FROM ll x JOIN prior p ON p.c = x.c CROSS JOIN ptot pt
    ),
    teach AS (
        SELECT doc_id,
               CASE WHEN round(max(CASE WHEN c = 'en' THEN score END), 6)
                         >= round(max(CASE WHEN c = 'other' THEN score END), 6)
                    THEN 1.0 ELSE 0.0 END AS y
        FROM post GROUP BY doc_id
    )
    SELECT t.y,
           1.0 AS x0,
           d.n_chars / 1000.0 AS x1,
           len(string_split(d.text, ' ')) / 100.0 AS x2,
           length(regexp_replace(d.text, '[^.,!?;:]', '', 'g'))
               / length(d.text)::DOUBLE AS x3,
           length(regexp_replace(d.text, '[^0-9]', '', 'g'))
               / length(d.text)::DOUBLE AS x4,
           d.source AS source
    FROM documents d JOIN teach t ON t.doc_id = d.doc_id"""


def _distill_oracle() -> str:
    prefix, prev = _training_ctes(_distill_features_sql())
    margin = " + ".join(f"w.w{j} * f.x{j}" for j in range(_N_FEATURES))
    return f"""{prefix}
SELECT f.source,
       count(*)::BIGINT AS n_docs,
       round(avg(f.y), 6) AS teacher_pos_rate,
       round(avg(CASE WHEN ({margin}) > 0 THEN 1.0 ELSE 0.0 END), 6)
           AS student_pos_rate,
       round(avg(CASE WHEN (({margin}) > 0) = (f.y = 1.0)
                      THEN 1.0 ELSE 0.0 END), 6) AS agreement
FROM features f CROSS JOIN {prev} w
GROUP BY f.source
"""


@register(
    "distilled_filter_agreement",
    oracle=_distill_oracle(),
    tags=("ml", "distillation", "classifier", "cleaning"),
    bench=True,
)
def distilled_filter_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quality-classifier DISTILLATION with a per-source deployment
    audit — the cheap-filter-at-scale story every 100 TB curation
    pipeline runs: an expensive teacher (token-grain multinomial NB,
    en-vs-other, add-one smoothing, trained on the 80% split) labels
    the WHOLE corpus; a cheap student (the 5-feature logistic
    regression of logreg_quality_classifier, 3 quantized GD steps)
    trains on the TEACHER's labels, not gold; the report is per-source
    teacher/student positive rates and agreement — naming exactly the
    sources where the cheap filter can replace the expensive one and
    where it cannot (disagreement concentrates where the student's
    scalar features cannot express the teacher's token evidence).

    Determinism: the teacher argmax compares 6dp-ROUNDED class scores
    (the naive_bayes_lang_classifier rule — token-order float
    association cannot flip a label), and the student's weights are
    6dp-quantized per iteration (the _training_ctes contract), so the
    DuckDB oracle replays teacher AND student trajectories exactly.

    Plan shape: ONE tokenize+explode pass trains and scores the
    teacher (model tables are vocabulary-grain broadcasts, the
    _scoring_join cutover applies when vocab x classes outgrows RAM);
    teacher labels land in the cached student feature frame (doc-grain,
    5 doubles + source); each GD step is one map-side-combinable
    aggregate moving 5 doubles per partition; the report is one
    |sources|-grain aggregate. The corpus shuffles exactly once (the
    (c, tok) count census) — everything else is model-table traffic."""
    from emails_to_vector_db_spark.functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    c = F.when(F.col("lang") == "en", "en").otherwise("other")
    toks = docs.select(
        "doc_id", c.alias("c"), F.explode(TX.tokens("text")).alias("tok")
    )
    train = toks.where(F.col("doc_id") % 5 != 0)
    prior = (
        docs.where(F.col("doc_id") % 5 != 0)
        .groupBy(c.alias("c"))
        .agg(F.count(F.lit(1)).cast("double").alias("nd"))
    )
    ptot = prior.agg(F.sum("nd").alias("td"))
    tot = train.groupBy("c").agg(
        F.count(F.lit(1)).cast("double").alias("tot_c")
    )
    vocab = train.agg(F.countDistinct("tok").cast("double").alias("v"))
    cnt = train.groupBy("c", "tok").agg(F.count(F.lit(1)).alias("n"))
    ll = (
        toks.select("doc_id", "tok")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(vocab))
        .join(F.broadcast(cnt), ["c", "tok"], "left")
        .groupBy("doc_id", "c")
        .agg(
            F.sum(
                F.log(
                    (F.coalesce(F.col("n"), F.lit(0)) + 1)
                    / (F.col("tot_c") + F.col("v"))
                )
            ).alias("loglik")
        )
    )
    post = (
        ll.join(F.broadcast(prior), "c")
        .crossJoin(F.broadcast(ptot))
        .select(
            "doc_id",
            "c",
            (F.col("loglik") + F.log(F.col("nd") / F.col("td"))).alias(
                "score"
            ),
        )
    )
    teach = post.groupBy("doc_id").agg(
        F.when(
            F.round(
                F.max(F.when(F.col("c") == "en", F.col("score"))), 6
            )
            >= F.round(
                F.max(F.when(F.col("c") == "other", F.col("score"))), 6
            ),
            1.0,
        )
        .otherwise(0.0)
        .alias("y")
    )
    text_len = F.length("text").cast("double")
    feats = (
        docs.join(teach, "doc_id")
        .select(
            "y",
            F.lit(1.0).alias("x0"),
            (F.col("n_chars") / 1000.0).alias("x1"),
            (F.size(F.split("text", " ", -1)) / 100.0).alias("x2"),
            (
                F.length(F.regexp_replace("text", r"[^.,!?;:]", ""))
                / text_len
            ).alias("x3"),
            (
                F.length(F.regexp_replace("text", r"[^0-9]", ""))
                / text_len
            ).alias("x4"),
            "source",
        )
        .cache()
    )
    xs = [f"x{j}" for j in range(_N_FEATURES)]
    w = spark.range(1).select(
        *[F.lit(0.0).alias(f"w{j}") for j in range(_N_FEATURES)]
    )
    for _ in range(N_ITERS):
        joined = feats.crossJoin(F.broadcast(w))
        margin = sum(
            (F.col(f"w{j}") * F.col(x) for j, x in enumerate(xs)),
            F.lit(0.0),
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
        w = joined.groupBy(*[f"w{j}" for j in range(_N_FEATURES)]).agg(
            *[
                F.sum((p - F.col("y")) * F.col(x)).alias(f"g{j}")
                for j, x in enumerate(xs)
            ],
            F.count(F.lit(1)).alias("n"),
        ).select(
            *[
                F.round(
                    F.col(f"w{j}") - LR * F.col(f"g{j}") / F.col("n"),
                    _ROUND,
                ).alias(f"w{j}")
                for j in range(_N_FEATURES)
            ]
        )
    scored = feats.crossJoin(F.broadcast(w))
    final_margin = sum(
        (F.col(f"w{j}") * F.col(x) for j, x in enumerate(xs)), F.lit(0.0)
    )
    s_pos = F.when(final_margin > 0, 1.0).otherwise(0.0)
    agree = F.when(
        (final_margin > 0) == (F.col("y") == 1.0), 1.0
    ).otherwise(0.0)
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("y"), 6).alias("teacher_pos_rate"),
        F.round(F.avg(s_pos), 6).alias("student_pos_rate"),
        F.round(F.avg(agree), 6).alias("agreement"),
    )
