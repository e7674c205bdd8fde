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


# ---------------------------------------------------------------------------
# Incremental crawl: snapshot diff classification
# ---------------------------------------------------------------------------

_DIFF_ORACLE = """
WITH bounds AS (
    -- synthetic ids must clear the live id range at ANY corpus size;
    -- a fixed offset collides once the corpus outgrows it
    SELECT ((max(doc_id) // 10000000) + 1) * 10000000 AS ofs
    FROM documents
),
a AS (
    SELECT doc_id, source, text,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok
    FROM documents
),
buckets AS (
    SELECT *,
           ('0x' || substr(md5('snap:' || doc_id::VARCHAR), 1, 15))::BIGINT
               % 10 AS bk
    FROM documents
),
b_raw AS (
    SELECT doc_id, source,
           CASE WHEN bk = 1 THEN text || ' zzrevised'
                ELSE text END AS text
    FROM buckets WHERE bk <> 0
    UNION ALL
    SELECT doc_id + (SELECT ofs FROM bounds) AS doc_id, source,
           text || ' zznewdoc' AS text
    FROM buckets WHERE bk = 2
),
b AS (
    SELECT doc_id, source,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok
    FROM b_raw
),
j AS (
    SELECT COALESCE(b.source, a.source) AS source,
           CASE WHEN a.doc_id IS NULL THEN 'added'
                WHEN b.doc_id IS NULL THEN 'removed'
                WHEN a.fp <> b.fp THEN 'changed'
                ELSE 'unchanged' END AS status,
           COALESCE(b.n_tok, 0) - COALESCE(a.n_tok, 0) AS tok_delta
    FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
)
SELECT source,
       sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END)::BIGINT
           AS n_added,
       sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END)::BIGINT
           AS n_removed,
       sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END)::BIGINT
           AS n_changed,
       sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END)::BIGINT
           AS n_unchanged,
       sum(tok_delta)::BIGINT AS token_delta
FROM j
GROUP BY source
ORDER BY source
"""


@register(
    "corpus_snapshot_diff",
    oracle=_DIFF_ORACLE,
    tags=("curation", "incremental", "diff", "dedup"),
    bench=True,
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-crawl snapshot diff: classify every document across
    two corpus snapshots as added / removed / content-changed /
    unchanged (by normalized-text fingerprint, not raw text) and report
    per-source counts plus the token delta. This is the operator that
    makes a 100 TB re-crawl INCREMENTAL: downstream stages (embed,
    dedup, index) re-process only the added+changed slice the diff
    names, instead of the whole corpus. Snapshot B is derived
    deterministically from the fixture (every 10th doc removed, one in
    ten revised, one in ten spawning a brand-new doc) so the oracle
    replays the identical diff.

    100 TB story: one full-outer equi-join on doc_id — co-partitioned
    and exchange-free when both snapshots are bucketed by doc_id (the
    warehouse layout sources/warehouse.py::write_bucketed provides);
    only (id, source, 32-char fp, n_tok) ride the join, never text;
    classification is a scan-local CASE and the output is source-grain,
    map-side combinable. No windows, no broadcast of anything
    corpus-sized.
    """
    a = load_table(spark, sf_dir, "documents")
    bk = TX.md5_long(F.col("doc_id").cast("string"), salt="snap:") % 10
    # synthetic ids must clear the live id range at ANY corpus size —
    # a fixed offset collides once the corpus outgrows it
    ofs = F.broadcast(
        a.agg(
            F.expr(
                "((max(doc_id) div 10000000) + 1) * 10000000"
            ).alias("ofs")
        )
    )

    def _fp_side(df: DataFrame, suffix: str) -> DataFrame:
        # presence flag, NOT fp nullability: a NULL-text doc has a NULL
        # fp on both sides and must still classify by side presence
        # (mirrors the oracle's a.doc_id/b.doc_id IS NULL keys)
        return df.select(
            F.col("doc_id"),
            F.lit(True).alias(f"in_{suffix}"),
            F.col("source").alias(f"source_{suffix}"),
            TX.fingerprint("text").alias(f"fp_{suffix}"),
            TX.token_count("text").alias(f"n_tok_{suffix}"),
        )

    b_kept = a.where(bk != 0).select(
        "doc_id",
        "source",
        F.when(
            bk == 1,
            F.concat(F.col("text"), F.lit(" zzrevised")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    b_added = (
        a.where(bk == 2)
        .crossJoin(ofs)
        .select(
            (F.col("doc_id") + F.col("ofs")).alias("doc_id"),
            "source",
            F.concat(F.col("text"), F.lit(" zznewdoc")).alias("text"),
        )
    )
    fa = _fp_side(a, "a")
    fb = _fp_side(b_kept.unionByName(b_added), "b")
    j = fa.join(fb, "doc_id", "full_outer")
    status = (
        F.when(F.col("in_a").isNull(), F.lit("added"))
        .when(F.col("in_b").isNull(), F.lit("removed"))
        .when(F.col("fp_a") != F.col("fp_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    classified = j.select(
        F.coalesce(F.col("source_b"), F.col("source_a")).alias("source"),
        status.alias("status"),
        (
            F.coalesce(F.col("n_tok_b"), F.lit(0))
            - F.coalesce(F.col("n_tok_a"), F.lit(0))
        ).alias("tok_delta"),
    )
    return (
        classified.groupBy("source")
        .agg(
            F.sum((F.col("status") == "added").cast("long")).alias("n_added"),
            F.sum((F.col("status") == "removed").cast("long")).alias(
                "n_removed"
            ),
            F.sum((F.col("status") == "changed").cast("long")).alias(
                "n_changed"
            ),
            F.sum((F.col("status") == "unchanged").cast("long")).alias(
                "n_unchanged"
            ),
            F.sum("tok_delta").cast("long").alias("token_delta"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Incremental curation, end-to-end: diff -> incremental dedup -> store plan
# ---------------------------------------------------------------------------


def _e2e_oracle() -> str:
    """Replays the composed pipeline: snapshot-B delta (statuses are
    derived BY CONSTRUCTION here, which is provably identical to the
    Spark side's diff-join classification — an appended-token revision
    always changes the normalized-text fingerprint, and spawned ids
    exceed the live id range so they can only be 'added'; the
    independent derivation makes the oracle a stronger check than
    replaying the same join), then the full incremental-LSH routing
    chain from _INC_ORACLE, then the store-action census."""
    from emails_to_vector_db_spark.plans.dedup import (
        _INC_BASE_SQL,
        _INC_SIG_CHAIN,
        _INC_THRESH,
        _minhash_sql_sig,
    )

    soup = ", ".join(
        f"'nv' || substr(md5('n:' || doc_id::VARCHAR), {k}, 4)"
        for k in (1, 5, 9, 13, 17, 21)
    )
    return f"""
WITH buckets AS (
    SELECT doc_id, source, text,
           ('0x' || substr(md5('snap:' || doc_id::VARCHAR), 1, 15))::BIGINT
               % 10 AS bk
    FROM documents
),
delta AS (
    SELECT doc_id, source, text || ' zzrevised' AS text,
           'changed' AS status
    FROM buckets WHERE bk = 1
    UNION ALL
    SELECT doc_id + {_INC_BASE_SQL} AS doc_id, source,
           text || ' zznewdoc' AS text, 'added' AS status
    FROM buckets WHERE bk = 2
    UNION ALL
    SELECT doc_id + 2 * {_INC_BASE_SQL} AS doc_id, source,
           concat_ws(' ', {soup}) AS text, 'added' AS status
    FROM buckets WHERE bk = 3
),
tagged AS (
    SELECT 'i' AS side, doc_id, text FROM documents
    UNION ALL
    SELECT 'd' AS side, doc_id, text FROM delta
),
{_INC_SIG_CHAIN.format(sql_sig=_minhash_sql_sig(2))},
est_i AS (
    SELECT DISTINCT d.doc_id, i.doc_id AS matched_id,
           list_sum(list_transform(generate_series(1, 8),
                k -> CASE WHEN d.sig[k] = i.sig[k] THEN 1.0 ELSE 0.0 END))
               / 8.0 AS est
    FROM bands d JOIN bands i
      ON d.band_idx = i.band_idx AND d.band_hash = i.band_hash
    WHERE d.side = 'd' AND i.side = 'i'
),
m_i AS (
    SELECT doc_id, count(*) AS n_index_matches
    FROM est_i WHERE est >= {_INC_THRESH} GROUP BY doc_id
),
est_d AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           list_sum(list_transform(generate_series(1, 8),
                k -> CASE WHEN a.sig[k] = b.sig[k] THEN 1.0 ELSE 0.0 END))
               / 8.0 AS est
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
    WHERE a.side = 'd' AND b.side = 'd'
),
sym_d AS (
    SELECT id_a AS doc_id FROM est_d WHERE est >= {_INC_THRESH}
    UNION ALL
    SELECT id_b AS doc_id FROM est_d WHERE est >= {_INC_THRESH}
),
m_d AS (
    SELECT doc_id, count(*) AS n_delta_matches FROM sym_d GROUP BY doc_id
),
routed AS (
    SELECT d.source, d.status,
           (COALESCE(m_i.n_index_matches, 0)
            + COALESCE(m_d.n_delta_matches, 0) = 0) AS novel
    FROM delta d
    LEFT JOIN m_i ON d.doc_id = m_i.doc_id
    LEFT JOIN m_d ON d.doc_id = m_d.doc_id
),
acts AS (
    SELECT source,
           CASE WHEN status = 'added' AND novel THEN 'append'
                WHEN status = 'added' THEN 'skip_duplicate'
                WHEN novel THEN 'update_rewrite'
                ELSE 'update_touch' END AS action
    FROM routed
    UNION ALL
    SELECT source, 'delete' AS action FROM buckets WHERE bk = 0
)
SELECT source,
       sum(CASE WHEN action = 'delete' THEN 1 ELSE 0 END)::BIGINT
           AS n_deletes,
       sum(CASE WHEN action = 'append' THEN 1 ELSE 0 END)::BIGINT
           AS n_appends,
       sum(CASE WHEN action = 'skip_duplicate' THEN 1 ELSE 0 END)::BIGINT
           AS n_dup_skips,
       sum(CASE WHEN action = 'update_touch' THEN 1 ELSE 0 END)::BIGINT
           AS n_touch_updates,
       sum(CASE WHEN action = 'update_rewrite' THEN 1 ELSE 0 END)::BIGINT
           AS n_rewrite_updates
FROM acts GROUP BY source ORDER BY source
"""


@register(
    "incremental_curation_e2e",
    oracle=_e2e_oracle(),
    tags=("curation", "incremental", "dedup", "pipeline", "e2e"),
    bench=True,
)
def incremental_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The steady-state incremental pipeline as ONE composed lazy plan
    (the curation_pipeline_e2e discipline applied to the round-7
    incremental family): (1) snapshot DIFF classifies every doc across
    two crawls by presence + normalized-text fingerprint — only
    (id, presence, fp, source) cross the full-outer join, never text;
    (2) the added+changed DELTA (and only the delta) is fetched, signed,
    and routed by the signature-group incremental-LSH probe against the
    already-signed corpus (_incremental_lsh_routing — the
    incremental_lsh_dedup core); (3) the routing flags become the STORE
    maintenance manifest: removed docs → delete, novel additions →
    append, near-dup additions → skip_duplicate, revisions split into
    update_touch (still near their indexed version — re-embed in place)
    vs update_rewrite (novel content — full re-process). Output is the
    per-source action census a 100 TB ingest job would execute against
    pipeline/store.py (append/delete/compact).

    At 100 TB: the diff join is doc_id-bucketed and exchange-free under
    the warehouse layout, delta text crosses the wire exactly once
    (into the signing repartition, delta-sized), the index side
    re-signs nothing in production (persisted band store — the inline
    signing here is oracle-replay cost, see incremental_lsh_dedup), and
    every downstream stage runs at delta or source grain."""
    from emails_to_vector_db_spark.plans.dedup import (
        _incremental_lsh_routing,
    )

    from pyspark import StorageLevel

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    bk = TX.md5_long(F.col("doc_id").cast("string"), salt="snap:") % 10
    # r12 (verdict task 4): the derived-offset aggregate is persisted —
    # it feeds BOTH spawn branches of snap_b, and snap_b itself has two
    # consumers, so the unpersisted 1-row max(doc_id) subtree (a full
    # doc_id-column scan) appeared 4x in the plan and executed per
    # consumer; cached, it is one scan total (the loo cnt_g pattern).
    ofs = F.broadcast(
        d.agg(
            F.expr("((max(doc_id) div 10000000) + 1) * 10000000").alias(
                "ofs"
            )
        ).persist(StorageLevel.MEMORY_AND_DISK)
    )
    # snapshot B: bk=0 removed, bk=1 revised, bk=2 spawns a near-dup
    # doc, bk=3 spawns a genuinely novel doc (md5 token soup)
    b_kept = d.where(bk != 0).select(
        "doc_id",
        "source",
        F.when(bk == 1, F.concat("text", F.lit(" zzrevised")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    spawn_near = d.where(bk == 2).crossJoin(ofs).select(
        (F.col("doc_id") + F.col("ofs")).alias("doc_id"),
        "source",
        F.concat("text", F.lit(" zznewdoc")).alias("text"),
    )
    nmd5 = F.md5(F.concat(F.lit("n:"), F.col("doc_id").cast("string")))
    spawn_novel = d.where(bk == 3).crossJoin(ofs).select(
        (F.col("doc_id") + 2 * F.col("ofs")).alias("doc_id"),
        "source",
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit("nv"), F.substring(nmd5, k, 4))
                for k in (1, 5, 9, 13, 17, 21)
            ],
        ).alias("text"),
    )
    # NOT persisted (r12, measured): snap_b feeds two consumers (the
    # diff's fb side and the delta text-fetch join), but caching the
    # corpus-sized text union costs more than the recompute it saves —
    # isolated best-of-3 went 4.7s -> 6.6s with a persist here (the
    # guide §5 caching rule); each consumer's recompute is a pipelined
    # documents scan + cheap projections.
    snap_b = b_kept.unionByName(spawn_near).unionByName(spawn_novel)

    # stage 1 — diff: presence + fingerprint only ride the join
    fa = d.select(
        "doc_id",
        F.lit(True).alias("in_a"),
        F.col("source").alias("source_a"),
        TX.fingerprint("text").alias("fp_a"),
    )
    fb = snap_b.select(
        "doc_id",
        F.lit(True).alias("in_b"),
        TX.fingerprint("text").alias("fp_b"),
    )
    j = fa.join(fb, "doc_id", "full_outer")
    status = (
        F.when(F.col("in_a").isNull(), F.lit("added"))
        .when(F.col("in_b").isNull(), F.lit("removed"))
        .when(F.col("fp_a") != F.col("fp_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    # persisted: the classification feeds THREE consumers (removed,
    # delta, and — through delta — both the routing signatures and the
    # action join); unpersisted, the corpus-scale full-outer join would
    # re-execute per branch
    classified = j.select(
        "doc_id", "source_a", status.alias("status")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    removed = classified.where(F.col("status") == "removed").select(
        F.col("source_a").alias("source"), F.lit("delete").alias("action")
    )
    # the delta slice fetches its text via a second doc_id-local join —
    # text never crosses the full-outer exchange; persisted (delta-sized)
    # because it feeds both the signing stage and the action join
    delta = (
        classified.where(F.col("status").isin("added", "changed"))
        .select("doc_id", "status")
        .join(snap_b, "doc_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # stage 2 — incremental-LSH routing of the delta against the corpus
    routing = _incremental_lsh_routing(
        d.select("doc_id", "text"), delta.select("doc_id", "text")
    )

    # stage 3 — store-action manifest
    action = (
        F.when(
            (F.col("status") == "added") & F.col("is_novel"), "append"
        )
        .when(F.col("status") == "added", "skip_duplicate")
        .when(F.col("is_novel"), "update_rewrite")
        .otherwise("update_touch")
    )
    acts = (
        delta.select("doc_id", "status", "source")
        .join(routing.select("doc_id", "is_novel"), "doc_id")
        .select("source", action.alias("action"))
        .unionByName(removed)
    )
    return (
        acts.groupBy("source")
        .agg(
            F.sum((F.col("action") == "delete").cast("long")).alias(
                "n_deletes"
            ),
            F.sum((F.col("action") == "append").cast("long")).alias(
                "n_appends"
            ),
            F.sum((F.col("action") == "skip_duplicate").cast("long")).alias(
                "n_dup_skips"
            ),
            F.sum((F.col("action") == "update_touch").cast("long")).alias(
                "n_touch_updates"
            ),
            F.sum((F.col("action") == "update_rewrite").cast("long")).alias(
                "n_rewrite_updates"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# DSIR: data selection with importance resampling (Xie et al. 2023) —
# hashed-feature importance weights from the postings index
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 256  # hashed feature space (the paper hashes n-grams)
_DSIR_LAMBDA = 1.0  # add-λ smoothing on both feature LMs
_DSIR_TARGET_LANG = "en"  # the target distribution: English docs


def _dsir_oracle() -> str:
    b = (
        f"(('0x' || substr(md5(term), 1, 15))::BIGINT"
        f" % {_DSIR_BUCKETS})"
    )
    return f"""
WITH tf AS (
    SELECT term, doc_id, count(*)::BIGINT AS tf
    FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
        FROM documents
    )
    GROUP BY term, doc_id
),
bt AS (
    SELECT {b} AS b, t.doc_id, sum(t.tf)::BIGINT AS tf
    FROM tf t GROUP BY 1, 2
),
tgt AS (
    SELECT b.b, sum(b.tf)::BIGINT AS n
    FROM bt b JOIN documents d ON d.doc_id = b.doc_id
    WHERE d.lang = '{_DSIR_TARGET_LANG}'
    GROUP BY b.b
),
raw AS (SELECT b, sum(tf)::BIGINT AS n FROM bt GROUP BY b),
tot AS (
    SELECT (SELECT coalesce(sum(n), 0)::DOUBLE FROM tgt) AS tn,
           (SELECT sum(n)::DOUBLE FROM raw) AS rn
),
ratio AS (
    SELECT r.b,
           ln((coalesce(t.n, 0) + {_DSIR_LAMBDA})
              / (tot.tn + {_DSIR_LAMBDA} * {_DSIR_BUCKETS}))
           - ln((r.n + {_DSIR_LAMBDA})
                / (tot.rn + {_DSIR_LAMBDA} * {_DSIR_BUCKETS})) AS lr
    FROM raw r LEFT JOIN tgt t ON t.b = r.b, tot
),
docw AS (
    SELECT bt.doc_id, sum(bt.tf * ratio.lr) AS logw
    FROM bt JOIN ratio ON ratio.b = bt.b
    GROUP BY bt.doc_id
)
SELECT d.source,
       count(*)::BIGINT AS n_docs,
       round(avg(w.logw), 6) AS avg_logw,
       sum(CASE WHEN w.logw > 0 THEN 1 ELSE 0 END)::BIGINT AS n_selected
FROM docw w JOIN documents d ON d.doc_id = w.doc_id
GROUP BY d.source
"""


@register(
    "dsir_weights_from_index",
    oracle=_dsir_oracle(),
    tags=("curation", "selection", "dsir", "index", "store"),
    bench=True,
)
def dsir_weights_from_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """dsir_importance_weights' STORE-READING sibling at report grain
    (the inline form in plans/cleaning.py scores per-doc from a corpus
    tokenize; this one answers from the postings index and reports the
    per-source selection statistics the resampling step consumes) —
    DSIR, Data Selection with Importance Resampling (Xie et al. 2023): per-document importance log-weights under hashed-feature
    bag-of-ngrams language models, log w(d) = Σ_f c_d(f) ·
    log(p_target(f)/p_raw(f)), with add-λ smoothing on both LMs and a
    256-bucket hashed feature space (the paper's hashing trick — the
    md5 bucket is the portable hash the oracle replays). The target
    distribution is the English slice; the raw distribution is the
    whole corpus. Reported per source: mean log-weight and how many
    docs the w>1 rule would select — the statistic the paper's
    resampling step consumes.

    STORE-READING: token counts come from the persisted postings index
    (one scan, bucket-aggregated), never a corpus tokenize; the only
    documents reads are doc-grain (doc_id, lang) / (doc_id, source)
    column projections for the two metadata joins. Plan: postings →
    256-cell feature census (two bucket-grain aggregates, one filtered
    by the lang join) → a 256-row broadcast of log-ratios back onto
    the (bucket, doc) frame → doc-grain weight agg → source report.
    At 100 TB every corpus-grain stage is a map-side-combinable
    aggregate keyed by 256 buckets or by doc_id; the feature LMs are
    512 numbers."""
    from emails_to_vector_db_spark.plans.postings import (
        ensure_postings_index,
    )

    name, _, _ = ensure_postings_index(spark, sf_dir)
    pst = spark.table(name)
    bt = (
        pst.select(
            F.pmod(TX.md5_long("term"), F.lit(_DSIR_BUCKETS)).alias("b"),
            "doc_id",
            "tf",
        )
        .groupBy("b", "doc_id")
        .agg(F.sum("tf").alias("tf"))
    )
    docs = load_table(spark, sf_dir, "documents")
    lang = docs.select("doc_id", "lang")
    tgt = (
        bt.join(lang, "doc_id")
        .where(F.col("lang") == _DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.sum("tf").alias("tn"))
    )
    raw = bt.groupBy("b").agg(F.sum("tf").alias("rn"))
    tots = F.broadcast(
        raw.agg(F.sum("rn").cast("double").alias("rtot")).crossJoin(
            tgt.agg(
                F.coalesce(F.sum("tn"), F.lit(0))
                .cast("double")
                .alias("ttot")
            )
        )
    )
    ratio = (
        raw.join(tgt, "b", "left")
        .crossJoin(tots)
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("tn"), F.lit(0)) + _DSIR_LAMBDA)
                    / (
                        F.col("ttot")
                        + F.lit(_DSIR_LAMBDA * _DSIR_BUCKETS)
                    )
                )
                - F.log(
                    (F.col("rn") + _DSIR_LAMBDA)
                    / (
                        F.col("rtot")
                        + F.lit(_DSIR_LAMBDA * _DSIR_BUCKETS)
                    )
                )
            ).alias("lr"),
        )
    )
    docw = (
        bt.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("lr")).alias("logw"))
    )
    src = docs.select("doc_id", "source")
    return (
        docw.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("logw"), 6).alias("avg_logw"),
            F.sum(
                F.when(F.col("logw") > 0, 1).otherwise(0)
            ).alias("n_selected"),
        )
    )
