"""Registered query for the exact prefix-filter set-similarity join
(operators/setsim.py) over 3-gram shingle sets of the documents table,
with the same planted near-copies the MinHash/SimHash queries use
(plans/dedup.py:25-67) — so the three near-dup lanes are directly
comparable: probabilistic (MinHash-LSH), sketch-banded (SimHash), and
EXACT (prefix filter, this query).

Shingles, not unigrams: this corpus has a tiny shared vocabulary, so
unigram sets make half of all pairs "similar" (τ=0.6 keeps ~85k of
150k pairs — meaningless); 3-gram shingle sets are discriminative (81
pairs at the same τ), which is exactly why real near-dup pipelines
shingle before any set-similarity machinery.

Oracle: the RESULT CONTRACT is "every pair with shingle-Jaccard ≥ τ",
which the oracle computes directly by the brute shared-shingle pair
join — deliberately a different algorithm than the Spark side's prefix
filter, so the hash match doubles as a zero-miss proof of the prefix
theorem on this corpus (the differential-testing stance of the ANN
recall audits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emails_to_vector_db_spark.functions import text as TX
from emails_to_vector_db_spark.operators.dedup import spread
from emails_to_vector_db_spark.operators.setsim import (
    prefix_filter_jaccard_join,
)
from emails_to_vector_db_spark.plans.registry import register
from emails_to_vector_db_spark.sources.tables import load_table

_TAU = 0.6
_DUP_OFFSET = 100_000  # same planting convention as plans/dedup.py
_N_PLANT = 50

_TOKENS_SQL = "regexp_split_to_array(trim(text), '\\s+')"

_SETSIM_ORACLE = f"""
WITH docs AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {_DUP_OFFSET} AS doc_id, text || ' zzduptoken' AS text
    FROM documents WHERE doc_id < {_N_PLANT}
),
toks AS (
    SELECT doc_id, unnest(
        list_distinct(CASE WHEN len({_TOKENS_SQL}) < 3 THEN []::VARCHAR[]
            ELSE list_transform(generate_series(1, len({_TOKENS_SQL}) - 2),
                 i -> array_to_string(({_TOKENS_SQL})[i:i+2], ' ')) END)
    ) AS token
    FROM docs
),
sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM toks GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS inter
    FROM toks a JOIN toks b
      ON a.token = b.token AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.inter,
       (sa.sz + sb.sz - i.inter)::BIGINT AS union_sz,
       round(i.inter / (sa.sz + sb.sz - i.inter)::DOUBLE, 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE i.inter / (sa.sz + sb.sz - i.inter)::DOUBLE >= {_TAU}
"""


@register(
    "prefix_filter_jaccard_join",
    oracle=_SETSIM_ORACLE,
    tags=("dedup", "setsim", "join", "exact"),
    bench=True,
)
def prefix_filter_jaccard_join_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT all-pairs shingle-Jaccard ≥ 0.6 via prefix filtering —
    recall 1 by the AllPairs prefix theorem, never all-pairs in the
    plan. The candidate join buckets on rarest-first prefix shingles
    (a near-unique shingle routs its docs into a near-empty bucket);
    the oracle recomputes the answer by brute shared-shingle counting,
    so a hash match PROVES zero missed pairs on this corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    docs = d.select("doc_id", "text").unionByName(
        d.where(F.col("doc_id") < _N_PLANT).select(
            (F.col("doc_id") + _DUP_OFFSET).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzduptoken")).alias("text"),
        )
    )
    # the shingle explode is CPU-bound: spread() buys full-width
    # execution when the fixture parquet arrives as 1-2 splits
    # (operators/dedup.py:36 — measured 2.7s → 0.4s at sf0.1)
    doc_tokens = spread(docs).select(
        "doc_id",
        F.explode(
            F.array_distinct(TX.shingles(TX.tokens("text"), n=3))
        ).alias("token"),
    )
    res = prefix_filter_jaccard_join(doc_tokens, tau=_TAU)
    return res.select(
        "doc_a",
        "doc_b",
        "inter",
        "union_sz",
        F.round("jaccard", 6).alias("jaccard"),
    )


_CONTAIN_TAU = 0.9

_CONTAIN_ORACLE = f"""
WITH docs AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {_DUP_OFFSET} AS doc_id, text || ' zzduptoken' AS text
    FROM documents WHERE doc_id < {_N_PLANT}
),
toks AS (
    SELECT doc_id, unnest(
        list_distinct(CASE WHEN len({_TOKENS_SQL}) < 3 THEN []::VARCHAR[]
            ELSE list_transform(generate_series(1, len({_TOKENS_SQL}) - 2),
                 i -> array_to_string(({_TOKENS_SQL})[i:i+2], ' ')) END)
    ) AS token
    FROM docs
),
sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM toks GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS inter
    FROM toks a JOIN toks b
      ON a.token = b.token AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.inter,
       least(sa.sz, sb.sz) AS min_sz,
       round(i.inter / least(sa.sz, sb.sz)::DOUBLE, 6) AS containment
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE i.inter / least(sa.sz, sb.sz)::DOUBLE >= {_CONTAIN_TAU}
"""


@register(
    "containment_near_supersets",
    oracle=_CONTAIN_ORACLE,
    tags=("dedup", "setsim", "join", "containment", "exact"),
    bench=True,
)
def containment_near_supersets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT near-superset detection: all pairs whose shingle OVERLAP
    COEFFICIENT |A∩B| / min(|A|,|B|) ≥ 0.9 — the containment lane
    beside the Jaccard join (the planted dup chains are literal
    supersets: original + ' zzduptoken' ⇒ containment 1.0 even where
    the union-diluted Jaccard dips). Quotation and boilerplate-wrapped
    inclusion is what this catches at corpus scale and Jaccard
    structurally cannot.

    Recall 1 by the adapted prefix theorem (smaller side's rarest
    prefix must hit the larger side's postings —
    operators/setsim.py::prefix_filter_containment_join); the
    brute-force oracle makes a hash match a zero-miss proof on this
    corpus."""
    from emails_to_vector_db_spark.operators.setsim import (
        prefix_filter_containment_join,
    )

    d = load_table(spark, sf_dir, "documents")
    docs = d.select("doc_id", "text").unionByName(
        d.where(F.col("doc_id") < _N_PLANT).select(
            (F.col("doc_id") + _DUP_OFFSET).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzduptoken")).alias("text"),
        )
    )
    doc_tokens = spread(docs).select(
        "doc_id",
        F.explode(
            F.array_distinct(TX.shingles(TX.tokens("text"), n=3))
        ).alias("token"),
    )
    res = prefix_filter_containment_join(doc_tokens, tau=_CONTAIN_TAU)
    return res.select(
        "doc_a",
        "doc_b",
        "inter",
        "min_sz",
        F.round("containment", 6).alias("containment"),
    )


# ---------------------------------------------------------------------------
# Blocked fuzzy (edit-distance) entity-resolution join over part names
# ---------------------------------------------------------------------------

_FUZZY_MAX_DIST = 4

_FUZZY_ORACLE = f"""
WITH dict AS (
    SELECT p_name, split_part(p_name, ' ', 1) AS blk,
           count(*)::BIGINT AS n_rows
    FROM part
    GROUP BY p_name
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name)::BIGINT AS edit_dist,
       a.n_rows AS n_rows_a, b.n_rows AS n_rows_b
FROM dict a
JOIN dict b
  ON a.blk = b.blk AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {_FUZZY_MAX_DIST}
ORDER BY edit_dist ASC, name_a ASC, name_b ASC
"""


@register(
    "fuzzy_name_match_join",
    oracle=_FUZZY_ORACLE,
    tags=("join", "fuzzy", "entity-resolution"),
)
def fuzzy_name_match_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance entity-resolution join: candidate merge
    pairs among DISTINCT part names within first-token blocks at
    Levenshtein <= {_FUZZY_MAX_DIST}, each side carrying its row
    support — the fuzzy-matching lane beside the set-similarity joins
    (prefix-filter Jaccard/containment handle token SETS; edit
    distance handles character-level typos and morphology they can't).

    Plan shape — dictionary-first, the scale move: the corpus
    aggregates to its distinct-name dictionary BEFORE any pairing
    (name cardinality is vocabulary-sized, rows are corpus-sized), so
    the quadratic stage runs block-local over the tiny dictionary and
    row counts ride along from the same aggregation; matched pairs
    broadcast back against the corpus when a materialized merge is
    wanted. Blocking on the first token is the standard length/prefix
    band that keeps block sizes bounded; the O(block²) residue is the
    same guarded quadratic discipline as operators/dedup.py."""
    p = load_table(spark, sf_dir, "part")
    dict_df = (
        p.groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "p_name",
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("blk"),
            "n_rows",
        )
    )
    a = dict_df.alias("a")
    b = dict_df.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(dist <= _FUZZY_MAX_DIST)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.cast("long").alias("edit_dist"),
            F.col("a.n_rows").alias("n_rows_a"),
            F.col("b.n_rows").alias("n_rows_b"),
        )
        .orderBy("edit_dist", "name_a", "name_b")
    )


# ---------------------------------------------------------------------------
# Dedup-threshold calibration: pairwise shingle-Jaccard histogram (sampled)
# ---------------------------------------------------------------------------

_HIST_SAMPLE_MOD = 4  # doc_id % 4 == 0 -> 25% calibration sample

_JHIST_ORACLE = f"""
WITH docs AS (
    SELECT doc_id, text FROM documents WHERE doc_id % {_HIST_SAMPLE_MOD} = 0
),
toks AS (
    SELECT doc_id, unnest(
        list_distinct(CASE WHEN len({_TOKENS_SQL}) < 3 THEN []::VARCHAR[]
            ELSE list_transform(generate_series(1, len({_TOKENS_SQL}) - 2),
                 i -> array_to_string(({_TOKENS_SQL})[i:i+2], ' ')) END)
    ) AS token
    FROM docs
),
sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM toks GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::DOUBLE AS i
    FROM toks a JOIN toks b
      ON a.token = b.token AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
jac AS (
    SELECT least(9, CAST(floor(
               10.0 * x.i / (sa.sz + sb.sz - x.i)) AS INT)) AS bin
    FROM inter x
    JOIN sizes sa ON sa.doc_id = x.doc_a
    JOIN sizes sb ON sb.doc_id = x.doc_b
)
SELECT bin, count(*)::BIGINT AS n_pairs
FROM jac GROUP BY bin
"""


@register(
    "jaccard_similarity_histogram",
    oracle=_JHIST_ORACLE,
    tags=("dedup", "setsim", "calibration", "stats"),
)
def jaccard_similarity_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dedup-threshold CALIBRATION: the histogram of pairwise 3-gram
    shingle-Jaccard over a 25% document sample — the artifact you read
    before choosing tau for the MinHash/prefix-filter lanes (a bimodal
    histogram says where the near-dup cliff is; this fixture's planted
    chains put real mass in the top bin). Pairs at zero overlap never
    materialize: only co-shingle pairs exist.

    Plan shape: the all-pairs-above-zero contract is inherently
    quadratic in shingle co-occurrence, which is WHY it runs on a
    deterministic hash sample (doc_id mod {_HIST_SAMPLE_MOD}) — the
    sample IS the method for calibration at 100 TB, not a shortcut;
    within the sample it is the same shared-shingle join + size join
    the exact setsim oracle uses. Distinct shingles per doc are
    array-local; the join keys on shingles only."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % _HIST_SAMPLE_MOD == 0
    )
    toks3 = TX.shingles(TX.tokens("text"), n=3)
    sh = docs.select(
        "doc_id", F.explode(F.array_distinct(toks3)).alias("token")
    )
    from pyspark import StorageLevel

    sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "token")
    b = sh.select(F.col("doc_id").alias("doc_b"), "token")
    inter = (
        a.join(b, "token")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("double").alias("i"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb")
    )
    j = F.col("i") / (F.col("sza") + F.col("szb") - F.col("i"))
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            F.least(F.lit(9), F.floor(10.0 * j).cast("int")).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# End-to-end entity resolution: fuzzy pairs -> closure -> canonical ids
# ---------------------------------------------------------------------------

_ER_ORACLE = f"""
WITH dict AS (
    SELECT p_name, split_part(p_name, ' ', 1) AS blk,
           count(*)::BIGINT AS n_rows,
           min(p_partkey)::BIGINT AS name_id
    FROM part
    GROUP BY p_name
),
pairs AS (
    SELECT a.name_id AS src, b.name_id AS dst
    FROM dict a JOIN dict b
      ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {_FUZZY_MAX_DIST}
),
edges AS (
    SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs
),
closure AS (
    WITH RECURSIVE cc(id, comp) AS (
        SELECT name_id, name_id FROM dict
        UNION
        SELECT e.dst, cc.comp
        FROM cc JOIN edges e ON e.src = cc.id
        WHERE cc.comp < e.dst
    )
    SELECT id, min(comp) AS comp FROM cc GROUP BY id
),
labeled AS (
    SELECT d.p_name, d.n_rows, c.comp
    FROM dict d JOIN closure c ON c.id = d.name_id
)
SELECT min(p_name ORDER BY p_name) FILTER (
           l.comp = (SELECT min(x.comp) FROM labeled x
                     WHERE x.comp = l.comp)) AS canonical_name,
       count(*)::BIGINT AS n_names,
       sum(n_rows)::BIGINT AS total_rows,
       string_agg(p_name, ' | ' ORDER BY p_name) AS members
FROM labeled l
GROUP BY comp
"""


@register(
    "entity_canonical_groups",
    oracle=_ER_ORACLE,
    tags=("join", "entity-resolution", "components"),
)
def entity_canonical_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution END-TO-END: the blocked fuzzy match pairs
    (fuzzy_name_match_join's contract) fed through transitive closure
    so every spelling variant lands in ONE canonical group — match →
    cluster → canonicalize, the full ER pipeline ('hot gear' matching
    'hot bolt' matching 'hot ring' must merge into one group even
    though the ends don't match each other directly). Output: one row
    per canonical group with its member list and row support.

    Plan shape: dictionary-first (the corpus aggregates to distinct
    names with min-partkey as a deterministic dense id); pairs are the
    block-local Levenshtein join over the dictionary; closure runs
    through operators/components.py (the size-adaptive union-find /
    distributed min-label machinery every dedup lane shares); the
    per-group rollup is vocabulary-sized. The oracle replays closure
    as a recursive CTE — true transitive closure on both sides."""
    from emails_to_vector_db_spark.operators.components import (
        connected_components,
    )

    p = load_table(spark, sf_dir, "part")
    dict_df = (
        p.groupBy("p_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("p_partkey").alias("name_id"),
        )
        .select(
            "p_name",
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias(
                "blk"
            ),
            "n_rows",
            "name_id",
        )
    )
    from pyspark import StorageLevel

    dict_df = dict_df.persist(StorageLevel.MEMORY_AND_DISK)
    a = dict_df.alias("a")
    b = dict_df.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
            <= _FUZZY_MAX_DIST
        )
        .select(
            F.col("a.name_id").alias("src"),
            F.col("b.name_id").alias("dst"),
        )
    )
    comp = connected_components(pairs)
    labeled = dict_df.join(
        comp, dict_df["name_id"] == comp["id"], "left"
    ).select(
        "p_name",
        "n_rows",
        F.coalesce("component", F.col("name_id")).alias("comp"),
    )
    return labeled.groupBy("comp").agg(
        F.min("p_name").alias("canonical_name"),
        F.count(F.lit(1)).alias("n_names"),
        F.sum("n_rows").alias("total_rows"),
        F.array_join(
            F.array_sort(F.collect_list("p_name")), " | "
        ).alias("members"),
    ).drop("comp")
