"""Dedup queries, oracle-checked end-to-end.

The fixture corpus has no natural duplicates (the driver generator emits
unique word-soup), so each query *plants* duplicates deterministically —
exact copies or single-token-appended near-copies — inside the query
itself (a UNION ALL both engines run identically), then detects them.
This keeps the oracle meaningful: the expected pairs are known.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emails_to_vector_db_spark.functions import text as TX
from emails_to_vector_db_spark.functions.vector import cosine_similarity
from emails_to_vector_db_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from emails_to_vector_db_spark.plans.registry import register
from emails_to_vector_db_spark.sources.tables import load_table

_DUP_OFFSET = 100_000
_N_PLANT = 50

_TOKENS_SQL = "regexp_split_to_array(trim(text), '\\s+')"


def _docs_with_exact_dups(spark, sf_dir) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    dups = d.where(F.col("doc_id") < _N_PLANT).select(
        (F.col("doc_id") + _DUP_OFFSET).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    return d.unionByName(dups)


_DOCS_EXACT_SQL = f"""
    SELECT doc_id, text, source FROM documents
    UNION ALL
    SELECT doc_id + {_DUP_OFFSET} AS doc_id, text, source
    FROM documents WHERE doc_id < {_N_PLANT}
"""


def _docs_with_near_dups(spark, sf_dir) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    dups = d.where(F.col("doc_id") < _N_PLANT).select(
        (F.col("doc_id") + _DUP_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzduptoken")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return d.unionByName(dups)


_DOCS_NEAR_SQL = f"""
    SELECT doc_id, text, source FROM documents
    UNION ALL
    SELECT doc_id + {_DUP_OFFSET} AS doc_id, text || ' zzduptoken' AS text, source
    FROM documents WHERE doc_id < {_N_PLANT}
"""


_EXACT_ORACLE = f"""
WITH docs AS ({_DOCS_EXACT_SQL}),
fp AS (
    SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM docs
)
SELECT fp, min(doc_id) AS keep_id, count(*)::BIGINT AS n_copies
FROM fp
GROUP BY fp
HAVING count(*) > 1
"""


@register("exact_dedup_groups", oracle=_EXACT_ORACLE, tags=("dedup", "exact"), bench=True)
def exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the normalized-text fingerprint; one
    shuffle, map-side combinable. Returns the duplicate groups (the planted
    exact copies) with the id that survives."""
    docs = _docs_with_exact_dups(spark, sf_dir)
    return (
        docs.withColumn("fp", TX.fingerprint("text"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .where(F.col("n_copies") > 1)
    )


def _minhash_sql_sig(n_md5: int) -> str:
    mins = ", ".join(
        f"list_aggregate(list_transform(m{m}, h -> substr(h, {1 + 8 * i}, 8)), 'min')"
        for m in range(n_md5)
        for i in range(4)
    )
    return f"[{mins}]"


_MINHASH_ORACLE = f"""
WITH docs AS ({_DOCS_NEAR_SQL}),
sh AS (
    SELECT doc_id,
           list_distinct(CASE WHEN len({_TOKENS_SQL}) < 3 THEN []::VARCHAR[]
               ELSE list_transform(generate_series(1, len({_TOKENS_SQL}) - 2),
                    i -> array_to_string(({_TOKENS_SQL})[i:i+2], ' ')) END) AS sh
    FROM docs
),
m AS (
    SELECT doc_id,
           list_transform(sh, s -> md5(s)) AS m0,
           list_transform(sh, s -> md5('1|' || s)) AS m1
    FROM sh
),
sig AS (
    SELECT doc_id, {_minhash_sql_sig(2)} AS sig FROM m
),
bands AS (
    SELECT doc_id, sig, b.band_idx,
           md5(sig[b.band_idx * 2 + 1] || '|' || sig[b.band_idx * 2 + 2]) AS band_hash
    FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band_idx) b
),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           a.sig AS sig_a, b.sig AS sig_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       list_sum(list_transform(generate_series(1, 8),
            i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1.0 ELSE 0.0 END)) / 8.0
           AS est_jaccard
FROM cand
WHERE list_sum(list_transform(generate_series(1, 8),
        i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1.0 ELSE 0.0 END)) / 8.0 >= 0.5
"""


@register("minhash_lsh_near_dups", oracle=_MINHASH_ORACLE, tags=("dedup", "minhash", "lsh"), bench=True)
def minhash_lsh_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8) + LSH banding (4 bands × 2 rows): near-duplicate candidate
    pairs with estimated Jaccard ≥ 0.5. Detects the planted
    one-token-appended near-copies; the bucket-local self-join is the
    LSH shuffle pattern that scales (no full cross join)."""
    docs = _docs_with_near_dups(spark, sf_dir)
    pairs = minhash_lsh_pairs(
        docs, n_hashes=8, n_bands=4, shingle_n=3, threshold=0.5
    )
    return pairs.select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))


_MINHASH_GROUPS_ORACLE = f"""
WITH docs AS ({_DOCS_NEAR_SQL}),
sh AS (
    SELECT doc_id,
           list_distinct(CASE WHEN len({_TOKENS_SQL}) < 3 THEN []::VARCHAR[]
               ELSE list_transform(generate_series(1, len({_TOKENS_SQL}) - 2),
                    i -> array_to_string(({_TOKENS_SQL})[i:i+2], ' ')) END) AS sh
    FROM docs
),
m AS (
    SELECT doc_id,
           list_transform(sh, s -> md5(s)) AS m0,
           list_transform(sh, s -> md5('1|' || s)) AS m1
    FROM sh
),
sig AS (
    SELECT doc_id, {_minhash_sql_sig(2)} AS sig FROM m
),
g AS (
    SELECT sig, min(doc_id) AS rep, count(*)::BIGINT AS n
    FROM sig
    WHERE len(list_filter(sig, x -> x IS NULL)) = 0
    GROUP BY sig
),
rbands AS (
    SELECT g.rep, g.sig, g.n, b.band_idx,
           md5(g.sig[b.band_idx * 2 + 1] || '|' || g.sig[b.band_idx * 2 + 2])
               AS band_hash
    FROM g, (SELECT unnest([0, 1, 2, 3]) AS band_idx) b
),
cand AS (
    SELECT DISTINCT a.rep AS rep_a, b.rep AS rep_b,
           a.sig AS sig_a, b.sig AS sig_b, a.n AS n_a, b.n AS n_b
    FROM rbands a JOIN rbands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.rep < b.rep
),
crossed AS (
    SELECT rep_a, rep_b, (n_a * n_b)::BIGINT AS n_pairs,
           list_sum(list_transform(generate_series(1, 8),
                i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1.0 ELSE 0.0 END))
               / 8.0 AS est
    FROM cand
)
SELECT rep_a, rep_b, n_pairs, round(est, 6) AS est_jaccard
FROM crossed WHERE est >= 0.5
UNION ALL
SELECT rep AS rep_a, rep AS rep_b,
       ((n * (n - 1)) // 2)::BIGINT AS n_pairs,
       1.0 AS est_jaccard
FROM g WHERE n >= 2
"""


@register(
    "minhash_near_dup_groups",
    oracle=_MINHASH_GROUPS_ORACLE,
    tags=("dedup", "minhash", "lsh", "groups"),
    bench=True,
)
def minhash_near_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GROUP-GRAIN condensed twin of minhash_lsh_near_dups — the
    100-TB form of the near-dup relation. The pair form's within-bucket
    listing is quadratic per signature-identical group on
    duplicate-heavy corpora (the 100×-replicated sf10 stress: 260s);
    this twin collapses each signature group to its min-id
    representative and emits the SAME information losslessly condensed:
    one (rep, rep, C(n,2), 1.0) row per signature-identical group of n
    docs (identical signatures share every band and score est exactly
    1.0 — always candidates, always verified), and one
    (rep_a, rep_b, n_a·n_b, est) row per verified cross-signature group
    pair (candidacy and est are pure functions of the two signatures,
    so every member pair shares them — the proven
    near_dup_cross_source_matrix rewrite at doc grain). Consumers that
    genuinely need the doc-grain explosion join group membership back
    locally; count-shaped consumers never pay the quadratic.

    Plan shape: one signature pass, a map-side-combinable gid groupBy
    (multiplicity paid ONCE), and the banded self-join among
    REPRESENTATIVES only — per-bucket work scales with distinct
    signatures, not documents. Equivalence to the pair form is pinned
    in tests/test_dedup_star_edges.py."""
    from pyspark import StorageLevel

    from emails_to_vector_db_spark.operators.dedup import (
        _banded_verified_pairs,
        _minhash_signatures,
        signature_gid,
    )

    docs = _docs_with_near_dups(spark, sf_dir)
    sig = (
        _minhash_signatures(
            docs.select("doc_id", "text"), "doc_id", "text", 8, 4, 3
        )
        .withColumn("gid", signature_gid("sig"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # all-NULL signatures (no shingles) never pair in the doc-grain
    # form — exclude them from grouping (signature_gid yields NULL)
    grp = (
        sig.where(F.col("gid").isNotNull())
        .groupBy("gid")
        .agg(
            F.min("doc_id").alias("rep"),
            F.first("sig").alias("sig"),  # identical within the group
            F.first("bands").alias("bands"),
            F.count(F.lit(1)).alias("n"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    diag = grp.where(F.col("n") >= 2).select(
        F.col("rep").alias("rep_a"),
        F.col("rep").alias("rep_b"),
        (F.col("n") * (F.col("n") - 1) / 2).cast("long").alias("n_pairs"),
        F.lit(1.0).alias("est_jaccard"),
    )
    # the banded verify operator runs at REP grain — same code path as
    # the pair form, quadratic only in distinct signatures per bucket
    reps = grp.select("rep", "sig", "bands").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    rep_pairs = _banded_verified_pairs(reps, "rep", 8, 0.5)
    sizes_a = grp.select(F.col("rep").alias("id_a"), F.col("n").alias("n_a"))
    sizes_b = grp.select(F.col("rep").alias("id_b"), F.col("n").alias("n_b"))
    crossed = (
        rep_pairs.join(sizes_a, "id_a")
        .join(sizes_b, "id_b")
        .select(
            F.col("id_a").alias("rep_a"),
            F.col("id_b").alias("rep_b"),
            (F.col("n_a") * F.col("n_b")).cast("long").alias("n_pairs"),
            F.round("est_jaccard", 6).alias("est_jaccard"),
        )
    )
    return crossed.unionByName(diag)


_JACCARD_ORACLE = f"""
WITH docs AS ({_DOCS_NEAR_SQL}),
sh AS (
    SELECT source, doc_id,
           list_distinct(CASE WHEN len({_TOKENS_SQL}) < 3 THEN []::VARCHAR[]
               ELSE list_transform(generate_series(1, len({_TOKENS_SQL}) - 2),
                    i -> array_to_string(({_TOKENS_SQL})[i:i+2], ' ')) END) AS sh
    FROM docs
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.sh, b.sh))::DOUBLE
             / greatest(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 1), 6)
           AS jaccard
FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
      / greatest(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 1) >= 0.3
"""


@register("ngram_jaccard_near_dups", oracle=_JACCARD_ORACLE, tags=("dedup", "jaccard"))
def ngram_jaccard_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard ≥ 0.3 for pairs blocked by source (quadratic
    only within blocks). Finds the planted near-copies exactly."""
    docs = _docs_with_near_dups(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        docs, block_col="source", shingle_n=3, threshold=0.3
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def _simhash_sql(bits: int = 32) -> str:
    terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> {j}) & 1 = 1 "
        f"THEN 1 ELSE -1 END)) > 0 THEN {2**j}::BIGINT ELSE 0 END)"
        for j in range(bits)
    )
    return terms


_SIMHASH_ORACLE = f"""
WITH t AS (
    SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents WHERE doc_id < 200
),
h AS (
    SELECT doc_id,
           list_transform(toks, t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hs
    FROM t
)
SELECT doc_id, ({_simhash_sql(32)}) AS simhash32
FROM h
"""


@register("simhash_signatures", oracle=_SIMHASH_ORACLE, tags=("dedup", "simhash"))
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document (doc_id < 200) — near-dup clustering by
    Hamming distance operates on these signatures."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return d.select(
        "doc_id", simhash(TX.tokens("text"), bits=32).alias("simhash32")
    )


def _simhash_pairs_sql() -> str:
    """SimHash near-dup pairs oracle: band the 32-bit signature into 4
    bytes; hamming(a,b) <= 3 guarantees >= 1 identical byte (pigeonhole),
    so a 4-band bucket join loses no candidate."""
    return f"""
WITH docs AS ({_DOCS_NEAR_SQL}),
h AS (
    SELECT doc_id,
           list_transform({_TOKENS_SQL},
               t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hs
    FROM docs WHERE doc_id < 200 OR doc_id >= {_DUP_OFFSET}
),
s AS (
    SELECT doc_id, ({_simhash_sql(32)}) AS sh FROM h
),
banded AS (
    SELECT doc_id, sh, b.i AS band_idx, (sh >> (b.i * 8)) & 255 AS band_val
    FROM s, (SELECT unnest([0, 1, 2, 3]) AS i) b
),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sh_a, b.sh AS sh_b
    FROM banded a JOIN banded b
      ON a.band_idx = b.band_idx AND a.band_val = b.band_val
     AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, bit_count(xor(sh_a, sh_b))::INT AS hamming
FROM cand
WHERE bit_count(xor(sh_a, sh_b)) <= 3
"""


@register("simhash_near_dups", oracle=_simhash_pairs_sql(), tags=("dedup", "simhash", "lsh"), bench=True)
def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs: 32-bit signatures, 4×8-bit band
    bucketing (hamming ≤ 3 ⟹ some band matches — no candidate loss),
    exact hamming verification on candidates. Finds the planted
    one-token-appended near-copies without any quadratic pair space."""
    docs = _docs_with_near_dups(spark, sf_dir).where(
        (F.col("doc_id") < 200) | (F.col("doc_id") >= _DUP_OFFSET)
    )
    sig = docs.select("doc_id", simhash(TX.tokens("text"), bits=32).alias("sh"))
    banded = sig.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftright("sh", i * 8).bitwiseAND(F.lit(255)).alias(
                            "band_val"
                        ),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "sh", "b.band_idx", "b.band_val")
    a = banded.select(
        F.col("doc_id").alias("id_a"),
        F.col("sh").alias("sh_a"),
        "band_idx",
        "band_val",
    )
    b = banded.select(
        F.col("doc_id").alias("id_b"),
        F.col("sh").alias("sh_b"),
        "band_idx",
        "band_val",
    )
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int")
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
    )


_EMB_DUP_OFFSET = 100_000
_EMB_N_PLANT = 25


def _emb_planes(n_planes: int = 8, dim: int = 64, seed: int = 1234):
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def _emb_lsh_global_oracle() -> str:
    """Like _emb_lsh_oracle but with NO label blocking — buckets alone
    bound the pair space (the production shape when no natural blocking
    key exists). More planes than the blocked variant: without the label
    dimension the bucket count must carry all the selectivity (10 planes →
    1024 buckets; exact-direction duplicates still always collide)."""
    planes = _emb_planes(n_planes=10)
    bits = " + ".join(
        f"(CASE WHEN list_dot_product(v, {p}::DOUBLE[]) > 0 THEN {2**i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    probes = ", ".join(["bucket"] + [f"xor(bucket, {2**i})" for i in range(len(planes))])
    return f"""
WITH base AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    UNION ALL
    SELECT vec_id + {_EMB_DUP_OFFSET} AS vec_id,
           list_transform(embedding::DOUBLE[], x -> x * 2.0) AS v
    FROM embeddings WHERE vec_id < {_EMB_N_PLANT}
),
bucketed AS (
    SELECT vec_id, v, ({bits})::BIGINT AS bucket FROM base
),
probes AS (
    SELECT vec_id, v, unnest([{probes}]) AS probe_bucket FROM bucketed
),
cand AS (
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb
    FROM probes a JOIN bucketed b
      ON a.probe_bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT id_a, id_b,
       round(list_dot_product(va, vb)
             / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb))), 6)
           AS cos_sim
FROM cand
WHERE list_dot_product(va, vb)
      / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb))) >= 0.99
"""


@register(
    "embedding_near_dups_lsh_global",
    oracle=_emb_lsh_global_oracle(),
    tags=("dedup", "vector", "lsh", "cosine"),
)
def embedding_near_dups_lsh_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide embedding near-dup detection with NO blocking key:
    sign-bucket LSH + Hamming-1 multiprobe alone bound the pair space —
    the production shape for dedup over an unlabeled 100 TB corpus."""
    from emails_to_vector_db_spark.operators.similarity import lsh_bucket

    planes = _emb_planes(n_planes=10)
    emb = load_table(spark, sf_dir, "embeddings")
    planted = emb.where(F.col("vec_id") < _EMB_N_PLANT).select(
        (F.col("vec_id") + _EMB_DUP_OFFSET).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: x * 2.0
        ).alias("v"),
    )
    from emails_to_vector_db_spark.functions.vector import l2_norm

    base = (
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .unionByName(planted)
        .withColumn("bucket", lsh_bucket(F.col("v"), planes).cast("long"))
        # precompute the norm ONCE per vector: cosine on a pair then needs a
        # single dot fold instead of three (HOF lambdas are interpreted, so
        # per-pair folds dominate at millions of candidates)
        .withColumn("norm", l2_norm(F.col("v")))
    )
    from pyspark import StorageLevel

    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    probe_buckets = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(2**i)) for i in range(len(planes))],
    )
    a = base.select(
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("norm").alias("norm_a"),
        F.explode(probe_buckets).alias("probe_bucket"),
    )
    b = base.select(
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("norm").alias("norm_b"),
        F.col("bucket").alias("probe_bucket"),
    )
    # No dropDuplicates needed: the probe list holds DISTINCT buckets and
    # the right side carries exactly one bucket, so each (id_a, id_b) pair
    # can satisfy the equi-join at most once — skipping the dedup avoids
    # shuffling every candidate's vector pair a second time.
    cand = a.join(b, "probe_bucket").where(F.col("id_a") < F.col("id_b"))
    from emails_to_vector_db_spark.functions.vector import dot

    cos = dot("va", "vb") / (F.col("norm_a") * F.col("norm_b"))
    return (
        cand.withColumn("cos_raw", cos)
        .where(F.col("cos_raw") >= 0.99)
        .select("id_a", "id_b", F.round("cos_raw", 6).alias("cos_sim"))
    )


def _emb_lsh_oracle() -> str:
    """Sign-bucket LSH near-dup oracle: hyperplanes embedded as literals;
    candidates = pairs sharing (label, bucket) after Hamming-1 multiprobe;
    verify cosine >= 0.99. Deterministic, so it hash-matches Spark."""
    planes = _emb_planes()
    bits = " + ".join(
        f"(CASE WHEN list_dot_product(v, {p}::DOUBLE[]) > 0 THEN {2**i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    probes = ", ".join(["bucket"] + [f"xor(bucket, {2**i})" for i in range(len(planes))])
    return f"""
WITH base AS (
    SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    UNION ALL
    SELECT vec_id + {_EMB_DUP_OFFSET} AS vec_id, label,
           list_transform(embedding::DOUBLE[], x -> x * 2.0) AS v
    FROM embeddings WHERE vec_id < {_EMB_N_PLANT}
),
bucketed AS (
    SELECT vec_id, label, v, ({bits})::BIGINT AS bucket FROM base
),
probes AS (
    SELECT vec_id, label, v, unnest([{probes}]) AS probe_bucket FROM bucketed
),
cand AS (
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb
    FROM probes a JOIN bucketed b
      ON a.label = b.label AND a.probe_bucket = b.bucket
     AND a.vec_id < b.vec_id
)
SELECT id_a, id_b,
       round(list_dot_product(va, vb)
             / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb))), 6)
           AS cos_sim
FROM cand
WHERE list_dot_product(va, vb)
      / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb))) >= 0.99
"""


@register(
    "embedding_near_dups_lsh",
    oracle=_emb_lsh_oracle(),
    tags=("dedup", "vector", "lsh", "cosine"),
    bench=True,
)
def embedding_near_dups_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup detection at scale: sign-bucket LSH (8 seeded
    hyperplanes) WITHIN each label block + Hamming-1 multiprobe, exact
    cosine verify on candidates. Replaces the label-quadratic pair space
    of ``embedding_near_dups`` with bucket-local candidates — measured 60×
    fewer pairs at 20k vectors — while staying fully deterministic and
    oracle-checked (the hyperplanes are plan literals on both engines).
    Scale-doubled planted copies keep identical sign bits, so they are
    always found."""
    from emails_to_vector_db_spark.functions.vector import dot, l2_norm
    from emails_to_vector_db_spark.operators.similarity import lsh_bucket

    planes = _emb_planes()
    emb = load_table(spark, sf_dir, "embeddings")
    planted = emb.where(F.col("vec_id") < _EMB_N_PLANT).select(
        (F.col("vec_id") + _EMB_DUP_OFFSET).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: x * 2.0
        ).alias("v"),
        "label",
    )
    base = (
        emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
        )
        .unionByName(planted)
        .withColumn("bucket", lsh_bucket(F.col("v"), planes).cast("long"))
        .withColumn("norm", l2_norm(F.col("v")))
    )
    from pyspark import StorageLevel

    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    probe_buckets = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(2**i)) for i in range(len(planes))],
    )
    a = base.select(
        F.col("vec_id").alias("id_a"),
        F.col("label").alias("_lbl"),
        F.col("v").alias("va"),
        F.col("norm").alias("norm_a"),
        F.explode(probe_buckets).alias("probe_bucket"),
    )
    b = base.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("_lbl"),
        F.col("v").alias("vb"),
        F.col("norm").alias("norm_b"),
        F.col("bucket").alias("probe_bucket"),
    )
    # See embedding_near_dups_lsh_global: each pair matches at most once,
    # dropDuplicates would only add a full shuffle of the vector pairs.
    cand = a.join(b, ["_lbl", "probe_bucket"]).where(F.col("id_a") < F.col("id_b"))
    cos = dot("va", "vb") / (F.col("norm_a") * F.col("norm_b"))
    return (
        cand.withColumn("cos_raw", cos)
        .where(F.col("cos_raw") >= 0.99)
        .select("id_a", "id_b", F.round("cos_raw", 6).alias("cos_sim"))
    )

def _emb_groups_oracle() -> str:
    """Group-grain condensation of _emb_lsh_oracle: byte-identical
    (label, vector) groups collapse to their min-id representative
    before the bucket join."""
    planes = _emb_planes()
    bits = " + ".join(
        f"(CASE WHEN list_dot_product(v, {p}::DOUBLE[]) > 0 THEN {2**i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    probes = ", ".join(
        ["bucket"] + [f"xor(bucket, {2**i})" for i in range(len(planes))]
    )
    return f"""
WITH base AS (
    SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    UNION ALL
    SELECT vec_id + {_EMB_DUP_OFFSET} AS vec_id, label,
           list_transform(embedding::DOUBLE[], x -> x * 2.0) AS v
    FROM embeddings WHERE vec_id < {_EMB_N_PLANT}
),
g AS (
    SELECT label, v, min(vec_id) AS rep, count(*)::BIGINT AS n
    FROM base GROUP BY label, v
),
gb AS (
    SELECT label, v, rep, n, ({bits})::BIGINT AS bucket FROM g
),
probes AS (
    SELECT label, v, rep, n, unnest([{probes}]) AS probe_bucket FROM gb
),
cand AS (
    SELECT DISTINCT a.rep AS rep_a, b.rep AS rep_b,
           a.v AS va, b.v AS vb, a.n AS n_a, b.n AS n_b
    FROM probes a JOIN gb b
      ON a.label = b.label AND a.probe_bucket = b.bucket
     AND a.rep < b.rep
)
SELECT rep_a, rep_b, (n_a * n_b)::BIGINT AS n_pairs,
       round(list_dot_product(va, vb)
             / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb))), 6)
           AS cos_sim
FROM cand
WHERE list_dot_product(va, vb)
      / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb))) >= 0.99
UNION ALL
SELECT rep AS rep_a, rep AS rep_b,
       ((n * (n - 1)) // 2)::BIGINT AS n_pairs,
       1.0 AS cos_sim
FROM g WHERE n >= 2
"""


@register(
    "embedding_near_dup_groups",
    oracle=_emb_groups_oracle(),
    tags=("dedup", "vector", "lsh", "cosine", "groups"),
    bench=True,
)
def embedding_near_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GROUP-GRAIN condensed twin of embedding_near_dups_lsh — the
    100-TB form of the embedding near-dup relation. Byte-identical
    (label, vector) rows — exactly what replication, re-crawls, and
    exact-dup documents produce at scale (the 100×-replicated sf10
    stress: every vector has ~100 identical twins, 113s in the pair
    form) — collapse to their min-id representative BEFORE the bucket
    join: one (rep, rep, C(n,2), 1.0) row per identical group (cosine
    of identical vectors is exactly 1 ≥ 0.99, and identical vectors
    share every sign bucket — always candidates, always verified), and
    one (rep_a, rep_b, n_a·n_b, cos) row per verified cross-group
    candidate pair (bucket and cosine are pure functions of the two
    vectors, shared by every member pair). Count-shaped consumers never
    pay duplicate multiplicity squared; the doc-grain pair form remains
    registered as the pairs-are-the-deliverable contract.

    Plan shape: a map-side-combinable (label, vector) groupBy pays
    multiplicity once, the sign-bucket + Hamming-1 multiprobe join runs
    among REPRESENTATIVES only, vectors/norms computed once per group.
    Equivalence to the pair form is pinned in
    tests/test_dedup_star_edges.py."""
    from pyspark import StorageLevel

    from emails_to_vector_db_spark.functions.vector import dot, l2_norm
    from emails_to_vector_db_spark.operators.similarity import lsh_bucket

    planes = _emb_planes()
    emb = load_table(spark, sf_dir, "embeddings")
    planted = emb.where(F.col("vec_id") < _EMB_N_PLANT).select(
        (F.col("vec_id") + _EMB_DUP_OFFSET).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: x * 2.0
        ).alias("v"),
        "label",
    )
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    ).unionByName(planted)
    grp = (
        base.groupBy("label", "v")
        .agg(F.min("vec_id").alias("rep"), F.count(F.lit(1)).alias("n"))
        .withColumn("bucket", lsh_bucket(F.col("v"), planes).cast("long"))
        .withColumn("norm", l2_norm(F.col("v")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    diag = grp.where(F.col("n") >= 2).select(
        F.col("rep").alias("rep_a"),
        F.col("rep").alias("rep_b"),
        (F.col("n") * (F.col("n") - 1) / 2).cast("long").alias("n_pairs"),
        F.lit(1.0).alias("cos_sim"),
    )
    probe_buckets = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(2**i)) for i in range(len(planes))],
    )
    a = grp.select(
        F.col("rep").alias("rep_a"),
        F.col("label").alias("_lbl"),
        F.col("v").alias("va"),
        F.col("norm").alias("norm_a"),
        F.col("n").alias("n_a"),
        F.explode(probe_buckets).alias("probe_bucket"),
    )
    b = grp.select(
        F.col("rep").alias("rep_b"),
        F.col("label").alias("_lbl"),
        F.col("v").alias("vb"),
        F.col("norm").alias("norm_b"),
        F.col("n").alias("n_b"),
        F.col("bucket").alias("probe_bucket"),
    )
    # distinct probe list × single right-side bucket: each group pair
    # matches at most once (see embedding_near_dups_lsh_global)
    cand = a.join(b, ["_lbl", "probe_bucket"]).where(
        F.col("rep_a") < F.col("rep_b")
    )
    cos = dot("va", "vb") / (F.col("norm_a") * F.col("norm_b"))
    crossed = (
        cand.withColumn("cos_raw", cos)
        .where(F.col("cos_raw") >= 0.99)
        .select(
            "rep_a",
            "rep_b",
            (F.col("n_a") * F.col("n_b")).cast("long").alias("n_pairs"),
            F.round("cos_raw", 6).alias("cos_sim"),
        )
    )
    return crossed.unionByName(diag)


_EMB_NEAR_ORACLE = f"""
WITH base AS (
    SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    UNION ALL
    SELECT vec_id + {_EMB_DUP_OFFSET} AS vec_id, label,
           list_transform(embedding::DOUBLE[], x -> x * 2.0) AS v
    FROM embeddings WHERE vec_id < {_EMB_N_PLANT}
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
           AS cos_sim
FROM base a JOIN base b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.99
"""


@register("embedding_near_dups", oracle=_EMB_NEAR_ORACLE, tags=("dedup", "vector", "cosine"))
def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection (≥ 0.99), blocked by label so the
    pair space stays block-local (at scale the block is an LSH/IVF bucket).
    Planted scale-doubled copies are exact cosine-1 matches."""
    emb = load_table(spark, sf_dir, "embeddings")
    planted = emb.where(F.col("vec_id") < _EMB_N_PLANT).select(
        (F.col("vec_id") + _EMB_DUP_OFFSET).alias("vec_id"),
        F.transform(F.col("embedding").cast("array<double>"), lambda x: x * 2.0).alias(
            "embedding"
        ),
        "label",
    )
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"), "label"
    ).unionByName(planted)
    # Same loud guard as ngram_jaccard_pairs: a skewed label block would
    # turn this verification baseline corpus-quadratic silently.
    from emails_to_vector_db_spark.operators.dedup import guard_block_sizes

    guard_block_sizes(base, "label", 50_000)
    a = base.select(
        F.col("label").alias("_lbl"),
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
    )
    b = base.select(
        F.col("label").alias("_lbl"),
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
    )
    pairs = a.join(b, "_lbl").where(F.col("id_a") < F.col("id_b"))
    cos = cosine_similarity("va", "vb")
    return (
        pairs.withColumn("cos_raw", cos)
        .where(F.col("cos_raw") >= 0.99)
        .select("id_a", "id_b", F.round("cos_raw", 6).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# Duplicate-cluster canonicalization: LSH pairs -> connected components
# ---------------------------------------------------------------------------

_CHAIN_OFFSET_1 = 100_000
_CHAIN_OFFSET_2 = 200_000

_DOCS_CHAIN_SQL = f"""
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {_CHAIN_OFFSET_1} AS doc_id, text || ' zzduptoken' AS text
    FROM documents WHERE doc_id < {_N_PLANT}
    UNION ALL
    SELECT doc_id + {_CHAIN_OFFSET_2} AS doc_id,
           text || ' zzduptoken zzduptokenb' AS text
    FROM documents WHERE doc_id < {_N_PLANT}
"""


def _docs_with_chained_dups(spark, sf_dir) -> DataFrame:
    """orig -> near-dup (1 extra token) -> near-dup-of-the-dup (2 extra
    tokens): a 3-node chain per planted document, so transitive closure
    does real work (pairwise LSH alone cannot name the cluster)."""
    d = load_table(spark, sf_dir, "documents")
    dup1 = d.where(F.col("doc_id") < _N_PLANT).select(
        (F.col("doc_id") + _CHAIN_OFFSET_1).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzduptoken")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    dup2 = d.where(F.col("doc_id") < _N_PLANT).select(
        (F.col("doc_id") + _CHAIN_OFFSET_2).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzduptoken zzduptokenb")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return d.unionByName(dup1).unionByName(dup2)


_COMPONENTS_ORACLE = f"""
WITH RECURSIVE docs AS ({_DOCS_CHAIN_SQL}),
sh AS (
    SELECT doc_id,
           list_distinct(CASE WHEN len({_TOKENS_SQL}) < 3 THEN []::VARCHAR[]
               ELSE list_transform(generate_series(1, len({_TOKENS_SQL}) - 2),
                    i -> array_to_string(({_TOKENS_SQL})[i:i+2], ' ')) END) AS sh
    FROM docs
),
m AS (
    SELECT doc_id,
           list_transform(sh, s -> md5(s)) AS m0,
           list_transform(sh, s -> md5('1|' || s)) AS m1
    FROM sh
),
sig AS (
    SELECT doc_id, {_minhash_sql_sig(2)} AS sig FROM m
),
bands AS (
    SELECT doc_id, sig, b.band_idx,
           md5(sig[b.band_idx * 2 + 1] || '|' || sig[b.band_idx * 2 + 2]) AS band_hash
    FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band_idx) b
),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           a.sig AS sig_a, b.sig AS sig_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
),
pairs AS (
    SELECT id_a, id_b FROM cand
    WHERE list_sum(list_transform(generate_series(1, 8),
            i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1.0 ELSE 0.0 END)) / 8.0
          >= 0.5
),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION
    SELECT id_b AS src, id_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
walk(id, label) AS (
    SELECT id, id AS label FROM nodes
    UNION
    SELECT e.dst AS id, w.label FROM walk w JOIN edges e ON e.src = w.id
)
SELECT id AS doc_id, min(label)::BIGINT AS component_id
FROM walk GROUP BY id
"""


@register(
    "near_dup_components",
    oracle=_COMPONENTS_ORACLE,
    tags=("dedup", "components", "minhash"),
    bench=True,
)
def near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical duplicate clusters: MinHash-LSH candidate pairs (the same
    8-hash/4-band family as minhash_lsh_near_dups) fed through iterative
    min-label connected components (operators/components.py). Every node
    in the dup graph is labeled with its cluster's minimum doc_id — the
    keep-id; dedup is then `where(doc_id != component_id)`. The planted
    orig->dup->dup-of-dup chains require real transitive closure. The
    DuckDB oracle replays the identical signature family plus a recursive
    min-label closure, so the full pipeline is hash-checked.

    Scale shape: edges come from minhash_lsh_component_edges —
    signature-identical groups collapse to star edges around a min-id
    representative (O(n) per group, provably component-equivalent to
    the all-pairs form), so a duplicate-heavy corpus never pays
    quadratic within-bucket pair emission on the clustering path."""
    from emails_to_vector_db_spark.operators.components import (
        connected_components,
    )
    from emails_to_vector_db_spark.operators.dedup import (
        minhash_lsh_component_edges,
    )

    docs = _docs_with_chained_dups(spark, sf_dir)
    comp = connected_components(
        minhash_lsh_component_edges(
            docs, n_hashes=8, n_bands=4, shingle_n=3, threshold=0.5
        )
    )
    return comp.select(
        F.col("id").alias("doc_id"), F.col("component").alias("component_id")
    )


# ---------------------------------------------------------------------------
# Contrastive pair mining: positives from near-dups, deterministic negatives
# ---------------------------------------------------------------------------

_NEG_STRIDE = 7

_CONTRASTIVE_ORACLE = f"""
WITH docs AS ({_DOCS_NEAR_SQL}),
sh AS (
    SELECT doc_id,
           list_distinct(CASE WHEN len({_TOKENS_SQL}) < 3 THEN []::VARCHAR[]
               ELSE list_transform(generate_series(1, len({_TOKENS_SQL}) - 2),
                    i -> array_to_string(({_TOKENS_SQL})[i:i+2], ' ')) END) AS sh
    FROM docs
),
m AS (
    SELECT doc_id,
           list_transform(sh, s -> md5(s)) AS m0,
           list_transform(sh, s -> md5('1|' || s)) AS m1
    FROM sh
),
sig AS (
    SELECT doc_id, {_minhash_sql_sig(2)} AS sig FROM m
),
bands AS (
    SELECT doc_id, sig, b.band_idx,
           md5(sig[b.band_idx * 2 + 1] || '|' || sig[b.band_idx * 2 + 2]) AS band_hash
    FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band_idx) b
),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           a.sig AS sig_a, b.sig AS sig_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
),
pos AS (
    SELECT id_a, id_b FROM cand
    WHERE list_sum(list_transform(generate_series(1, 8),
            i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1.0 ELSE 0.0 END)) / 8.0
          >= 0.5
),
neg AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM docs a JOIN docs b ON b.doc_id = a.doc_id + {_NEG_STRIDE}
    WHERE NOT EXISTS (
        SELECT 1 FROM pos p WHERE p.id_a = a.doc_id AND p.id_b = b.doc_id
    )
)
SELECT id_a, id_b, 1::BIGINT AS label FROM pos
UNION ALL
SELECT id_a, id_b, 0::BIGINT AS label FROM neg
"""


@register(
    "contrastive_pair_mining",
    oracle=_CONTRASTIVE_ORACLE,
    tags=("dedup", "contrastive", "training-data"),
)
def contrastive_pair_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Labeled pair mining for contrastive embedding training: positives
    are the MinHash-LSH near-duplicate pairs (the same banded family as
    minhash_lsh_near_dups), negatives are a deterministic id-stride pair
    per document (b = a + 7, inner join keeps only existing
    partners — no global ordering, no RNG) with an anti-join guard so an
    accidental near-dup can never be labeled negative.

    Scale shape: positives come from the banded bucket-join (never
    all-pairs); the negative stride join is an ordinary equi-join on a
    computed key; the anti-join guard is semi-join sized. This is the
    data-prep stage for training the very embedding model the store
    serves — the engine feeding its own index's training loop."""
    from emails_to_vector_db_spark.operators.dedup import minhash_lsh_pairs

    docs = _docs_with_near_dups(spark, sf_dir)
    pos = minhash_lsh_pairs(
        docs, n_hashes=8, n_bands=4, shingle_n=3, threshold=0.5
    ).select("id_a", "id_b")
    a = docs.select(F.col("doc_id").alias("id_a"))
    b = docs.select(F.col("doc_id").alias("id_b"))
    neg = (
        a.join(b, F.col("id_b") == F.col("id_a") + _NEG_STRIDE)
        .join(pos, ["id_a", "id_b"], "left_anti")
    )
    return pos.select(
        "id_a", "id_b", F.lit(1).cast("long").alias("label")
    ).unionByName(
        neg.select("id_a", "id_b", F.lit(0).cast("long").alias("label"))
    )


_CLUSTER_HIST_ORACLE = f"""
SELECT cluster_size, count(*)::BIGINT AS n_clusters,
       (cluster_size * count(*))::BIGINT AS n_docs
FROM (
    SELECT component_id, count(*)::BIGINT AS cluster_size
    FROM ({_COMPONENTS_ORACLE}) comp
    GROUP BY component_id
) sizes
GROUP BY cluster_size
"""


@register(
    "dup_cluster_size_histogram",
    oracle=_CLUSTER_HIST_ORACLE,
    tags=("dedup", "components", "stats"),
)
def dup_cluster_size_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The duplicate-FAMILY size distribution: near-dup components
    rolled up to (cluster size → cluster count, doc count) — the
    single number-row that decides pair-listing vs cluster-labeling
    plans (rule 13: pair output is Σ size², cluster output is Σ size;
    this histogram says which regime a corpus is in BEFORE a dedup
    job commits to one), and the ops metric that catches a template
    explosion (one giant family appearing week-over-week).

    Plan shape: the same LSH→components pipeline as
    near_dup_components (shared lineage, nothing new at corpus
    scale), plus two component-table-sized aggregations."""
    comp = near_dup_components(spark, sf_dir)
    sizes = comp.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1)))
        .cast("long")
        .alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# Quality-aware survivor selection per near-dup cluster (keep-best, not first)
# ---------------------------------------------------------------------------

_SURV_EN_SQL = ", ".join(f"'{w}'" for w in TX.LANG_STOPWORDS["en"])

_SURVIVOR_ORACLE = f"""
WITH RECURSIVE docs AS ({_DOCS_CHAIN_SQL}),
sh AS (
    SELECT doc_id,
           list_distinct(CASE WHEN len({_TOKENS_SQL}) < 3 THEN []::VARCHAR[]
               ELSE list_transform(generate_series(1, len({_TOKENS_SQL}) - 2),
                    i -> array_to_string(({_TOKENS_SQL})[i:i+2], ' ')) END) AS sh
    FROM docs
),
m AS (
    SELECT doc_id,
           list_transform(sh, s -> md5(s)) AS m0,
           list_transform(sh, s -> md5('1|' || s)) AS m1
    FROM sh
),
sig AS (
    SELECT doc_id, {_minhash_sql_sig(2)} AS sig FROM m
),
bands AS (
    SELECT doc_id, sig, b.band_idx,
           md5(sig[b.band_idx * 2 + 1] || '|' || sig[b.band_idx * 2 + 2]) AS band_hash
    FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band_idx) b
),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           a.sig AS sig_a, b.sig AS sig_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
),
pairs AS (
    SELECT id_a, id_b FROM cand
    WHERE list_sum(list_transform(generate_series(1, 8),
            i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1.0 ELSE 0.0 END)) / 8.0
          >= 0.5
),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION
    SELECT id_b AS src, id_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
walk(id, label) AS (
    SELECT id, id AS label FROM nodes
    UNION
    SELECT e.dst AS id, w.label FROM walk w JOIN edges e ON e.src = w.id
),
comp AS (
    SELECT id AS doc_id, min(label)::BIGINT AS component_id
    FROM walk GROUP BY id
),
q AS (
    SELECT doc_id,
           round(least(len({_TOKENS_SQL}) / 100.0, 1.0) * 0.4
                 + least((len(list_filter({_TOKENS_SQL},
                       x -> x IN ({_SURV_EN_SQL})))::DOUBLE
                       / greatest(len({_TOKENS_SQL}), 1)) * 5.0, 1.0) * 0.4
                 + (1.0 - least((length(regexp_replace(text,
                       '[^.,!?;:''"()\\[\\]{{}}-]', '', 'g'))::DOUBLE
                       / greatest(length(text), 1)) * 4.0, 1.0)) * 0.2,
                 6) AS quality
    FROM docs
),
ranked AS (
    SELECT c.component_id, c.doc_id, q.quality,
           row_number() OVER (PARTITION BY c.component_id
                              ORDER BY q.quality DESC, c.doc_id ASC) AS rk
    FROM comp c JOIN q USING (doc_id)
)
SELECT component_id,
       count(*)::BIGINT AS n_members,
       max(CASE WHEN rk = 1 THEN doc_id END)::BIGINT AS survivor_doc,
       max(CASE WHEN rk = 1 THEN quality END) AS survivor_quality,
       round(min(quality), 6) AS min_quality
FROM ranked GROUP BY component_id
"""


@register(
    "dedup_quality_survivors",
    oracle=_SURVIVOR_ORACLE,
    tags=("dedup", "quality", "survivorship"),
    bench=True,
)
def dedup_quality_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship policy for near-dup clusters: keep the HIGHEST-
    QUALITY member, not the lowest id — per cluster (the same MinHash-
    LSH + connected-components family as near_dup_components), rank
    members by the composite quality score (doc_quality_scores'
    formula) and emit the survivor beside the cluster's quality floor.
    Min-id survivorship silently keeps whichever copy was crawled
    first; a curation pipeline wants the cleanest copy, and the
    (survivor_quality, min_quality) spread is the evidence the policy
    changes outcomes.

    Plan shape: the star-edge family (minhash_lsh_component_edges —
    signature-identical groups collapse before pairing, so the
    clustering path never pays quadratic within-bucket emission) and
    min-label closure are the priced-in near_dup_components stages;
    quality is a scan-time expression; survivor selection is a
    CLUSTER-partitioned rank (bounded by the largest dup cluster,
    never global) keyed on the 6dp-ROUNDED score so cross-engine
    float noise cannot flip survivors."""
    from pyspark.sql import Window

    from emails_to_vector_db_spark.operators.components import (
        connected_components,
    )
    from emails_to_vector_db_spark.operators.dedup import (
        minhash_lsh_component_edges,
    )

    docs = _docs_with_chained_dups(spark, sf_dir)
    comp = connected_components(
        minhash_lsh_component_edges(
            docs, n_hashes=8, n_bands=4, shingle_n=3, threshold=0.5
        )
    ).select(
        F.col("id").alias("doc_id"), F.col("component").alias("component_id")
    )
    tok = TX.tokens("text")
    quality = F.round(
        F.least(F.size(tok) / 100.0, F.lit(1.0)) * 0.4
        + F.least(
            TX.stopword_ratio(tok, TX.LANG_STOPWORDS["en"]) * 5.0,
            F.lit(1.0),
        )
        * 0.4
        + (1.0 - F.least(TX.punct_ratio("text") * 4.0, F.lit(1.0))) * 0.2,
        6,
    )
    q = docs.select("doc_id", quality.alias("quality"))
    w = Window.partitionBy("component_id").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    ranked = comp.join(q, "doc_id").withColumn(
        "rk", F.row_number().over(w)
    )
    return ranked.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max(F.when(F.col("rk") == 1, F.col("doc_id"))).alias(
            "survivor_doc"
        ),
        F.max(F.when(F.col("rk") == 1, F.col("quality"))).alias(
            "survivor_quality"
        ),
        F.round(F.min("quality"), 6).alias("min_quality"),
    )


# ---------------------------------------------------------------------------
# Content-defined chunking: gear-style boundaries + stability proof vs fixed
# ---------------------------------------------------------------------------

_CDC_DIV = 16  # boundary when gram-hash % DIV == 0 -> ~DIV-token chunks
_CDC_GRAM = 4  # rolling window width (token-level)
_CDC_FIXED_W = 16  # the fixed-window strawman's chunk width
_CDC_OFFSET = 300_000
_CDC_SPACE = 1152921504606846976  # 2^60, the portable md5-hash range

_CDC_ORACLE = f"""
WITH docs AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {_CDC_OFFSET}, 'zzprependtoken ' || text
    FROM documents WHERE doc_id < {_N_PLANT}
),
toks AS (
    SELECT doc_id, tok, pos
    FROM (
        SELECT doc_id, unnest({_TOKENS_SQL}) AS tok,
               generate_subscripts({_TOKENS_SQL}, 1) AS pos,
               {_TOKENS_SQL} AS arr
        FROM docs
    )
),
flagged AS (
    SELECT t.doc_id, t.tok, t.pos,
           CASE WHEN t.pos >= {_CDC_GRAM}
                 AND ('0x' || substr(md5(array_to_string(
                        a.arr[t.pos - {_CDC_GRAM - 1}:t.pos], ' ')), 1, 15))
                     ::BIGINT % {_CDC_DIV} = 0
                THEN 1 ELSE 0 END AS boundary
    FROM toks t
    JOIN (SELECT doc_id, {_TOKENS_SQL} AS arr FROM docs) a USING (doc_id)
),
chunked AS (
    SELECT doc_id, tok, pos,
           coalesce(sum(boundary) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cdc_chunk,
           (pos - 1) // {_CDC_FIXED_W} AS fixed_chunk
    FROM flagged
),
cdc_fps AS (
    SELECT doc_id, md5(string_agg(tok, ' ' ORDER BY pos)) AS fp,
           count(*)::BIGINT AS chunk_len
    FROM chunked GROUP BY doc_id, cdc_chunk
),
fixed_fps AS (
    SELECT doc_id, md5(string_agg(tok, ' ' ORDER BY pos)) AS fp
    FROM chunked GROUP BY doc_id, fixed_chunk
),
cdc_stab AS (
    SELECT a.doc_id,
           avg(CASE WHEN b.fp IS NOT NULL THEN 1.0 ELSE 0.0 END) AS frac
    FROM cdc_fps a
    LEFT JOIN cdc_fps b
      ON b.doc_id = a.doc_id + {_CDC_OFFSET} AND b.fp = a.fp
    WHERE a.doc_id < {_N_PLANT}
    GROUP BY a.doc_id
),
fixed_stab AS (
    SELECT a.doc_id,
           avg(CASE WHEN b.fp IS NOT NULL THEN 1.0 ELSE 0.0 END) AS frac
    FROM fixed_fps a
    LEFT JOIN fixed_fps b
      ON b.doc_id = a.doc_id + {_CDC_OFFSET} AND b.fp = a.fp
    WHERE a.doc_id < {_N_PLANT}
    GROUP BY a.doc_id
),
corpus AS (
    SELECT count(*)::BIGINT AS n_chunks,
           round(avg(chunk_len), 4) AS mean_chunk_len
    FROM cdc_fps WHERE doc_id < {_CDC_OFFSET}
)
SELECT c.n_chunks, c.mean_chunk_len,
       round((SELECT avg(frac) FROM cdc_stab), 6) AS cdc_shared_frac,
       round((SELECT avg(frac) FROM fixed_stab), 6) AS fixed_shared_frac,
       (SELECT avg(frac) FROM cdc_stab)
           > (SELECT avg(frac) FROM fixed_stab) AS cdc_more_stable
FROM corpus c
"""


@register(
    "cdc_chunk_stability",
    oracle=_CDC_ORACLE,
    tags=("dedup", "chunking", "cdc", "storage"),
    bench=True,
)
def cdc_chunk_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS/gear-hash family,
    token-level): a chunk boundary falls after token i whenever the
    hash of the {_CDC_GRAM}-gram ending at i is ≡ 0 mod {_CDC_DIV} —
    boundaries depend on CONTENT, not position. The query proves the
    property that makes CDC the storage-dedup standard IN-RESULT: for
    every planted document a token is PREPENDED (the worst case for
    positional chunking), and the shared-chunk-fingerprint fraction is
    computed under both schemes — fixed {_CDC_FIXED_W}-token windows
    shift every boundary (shared fraction ~0), CDC boundaries resync
    after the first cut (shared fraction stays high), and the
    cdc_more_stable column asserts the comparison inside the hash-
    checked result. document_chunking is the fixed-window RAG splitter;
    this is the dedup-friendly alternative for chunk-level storage
    and delta-sync.

    Plan shape: positions explode once per scheme-shared pass; the
    boundary flag is a scan-time expression over the per-position
    gram; chunk ids are a DOC-partitioned running sum (bounded by
    document length, never corpus grain); fingerprints are per-(doc,
    chunk) aggregates with order pinned by array_sort-inside-row; the
    stability joins are fingerprint-keyed equi-joins on the planted
    subset only."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = d.unionByName(
        d.where(F.col("doc_id") < _N_PLANT).select(
            (F.col("doc_id") + _CDC_OFFSET).alias("doc_id"),
            F.concat(F.lit("zzprependtoken "), F.col("text")).alias("text"),
        )
    )
    toks = docs.select(
        "doc_id",
        TX.tokens("text").alias("arr"),
    ).select(
        "doc_id",
        F.posexplode(F.col("arr")).alias("pos0", "tok"),
        F.col("arr"),
    )
    pos = F.col("pos0") + 1
    # clamp the slice start to 1: for the first _CDC_GRAM-1 tokens the
    # raw start would be 0 (slice throws) or negative (reads from the
    # array END) — those rows are discarded by the pos >= _CDC_GRAM
    # guard below, but the expression must be safe under ANY evaluation
    # order, not rely on the conjunction short-circuiting first
    gram = F.array_join(
        F.slice(
            F.col("arr"),
            F.greatest(F.lit(1), F.col("pos0") - (_CDC_GRAM - 2)),
            _CDC_GRAM,
        ),
        " ",
    )
    boundary = F.when(
        (pos >= _CDC_GRAM)
        & (TX.md5_long(gram) % _CDC_DIV == 0),
        1,
    ).otherwise(0)
    from pyspark.sql import Window

    flagged = toks.select(
        "doc_id", "tok", pos.alias("pos"), boundary.alias("boundary")
    )
    w_cum = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = flagged.select(
        "doc_id",
        "tok",
        "pos",
        F.coalesce(F.sum("boundary").over(w_cum), F.lit(0)).alias(
            "cdc_chunk"
        ),
        ((F.col("pos") - 1) / _CDC_FIXED_W).cast("long").alias(
            "fixed_chunk"
        ),
    )
    from pyspark import StorageLevel

    chunked = chunked.persist(StorageLevel.MEMORY_AND_DISK)

    def fps(chunk_col: str) -> DataFrame:
        return chunked.groupBy("doc_id", chunk_col).agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "tok"))
                        ),
                        lambda s: s["tok"],
                    ),
                    " ",
                )
            ).alias("fp"),
            F.count(F.lit(1)).alias("chunk_len"),
        )

    cdc_fps = fps("cdc_chunk").persist(StorageLevel.MEMORY_AND_DISK)
    fixed_fps = fps("fixed_chunk")

    def stability(fp_df: DataFrame) -> DataFrame:
        a = fp_df.where(F.col("doc_id") < _N_PLANT).alias("a")
        b = fp_df.where(F.col("doc_id") >= _CDC_OFFSET).select(
            (F.col("doc_id") - _CDC_OFFSET).alias("doc_id"),
            F.col("fp").alias("fp_b"),
        ).alias("b")
        return (
            a.join(
                b,
                (F.col("a.doc_id") == F.col("b.doc_id"))
                & (F.col("a.fp") == F.col("b.fp_b")),
                "left",
            )
            .groupBy("a.doc_id")
            .agg(
                F.avg(
                    F.when(F.col("fp_b").isNotNull(), 1.0).otherwise(0.0)
                ).alias("frac")
            )
            .agg(F.avg("frac").alias("mean_frac"))
        )
    corpus = cdc_fps.where(F.col("doc_id") < _CDC_OFFSET).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.round(F.avg("chunk_len"), 4).alias("mean_chunk_len"),
    )
    cdc_s = F.broadcast(
        stability(cdc_fps).withColumnRenamed("mean_frac", "cdc_f")
    )
    fixed_s = F.broadcast(
        stability(fixed_fps).withColumnRenamed("mean_frac", "fixed_f")
    )
    return (
        corpus.crossJoin(cdc_s)
        .crossJoin(fixed_s)
        .select(
            "n_chunks",
            "mean_chunk_len",
            F.round("cdc_f", 6).alias("cdc_shared_frac"),
            F.round("fixed_f", 6).alias("fixed_shared_frac"),
            (F.col("cdc_f") > F.col("fixed_f")).alias("cdc_more_stable"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-source near-dup matrix: which sources' crawls overlap
# ---------------------------------------------------------------------------

_XSRC_ORACLE = f"""
WITH docs AS ({_DOCS_NEAR_SQL}),
sh AS (
    SELECT doc_id,
           list_distinct(CASE WHEN len({_TOKENS_SQL}) < 3 THEN []::VARCHAR[]
               ELSE list_transform(generate_series(1, len({_TOKENS_SQL}) - 2),
                    i -> array_to_string(({_TOKENS_SQL})[i:i+2], ' ')) END) AS sh
    FROM docs
),
m AS (
    SELECT doc_id,
           list_transform(sh, s -> md5(s)) AS m0,
           list_transform(sh, s -> md5('1|' || s)) AS m1
    FROM sh
),
sig AS (
    SELECT doc_id, {_minhash_sql_sig(2)} AS sig FROM m
),
bands AS (
    SELECT doc_id, sig, b.band_idx,
           md5(sig[b.band_idx * 2 + 1] || '|' || sig[b.band_idx * 2 + 2]) AS band_hash
    FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band_idx) b
),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           a.sig AS sig_a, b.sig AS sig_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
),
pairs AS (
    SELECT id_a, id_b,
           list_sum(list_transform(generate_series(1, 8),
               i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1.0 ELSE 0.0 END))
               / 8.0 AS est
    FROM cand
    WHERE list_sum(list_transform(generate_series(1, 8),
            i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1.0 ELSE 0.0 END)) / 8.0
          >= 0.5
)
SELECT least(da.source, db.source) AS source_a,
       greatest(da.source, db.source) AS source_b,
       count(*)::BIGINT AS n_pairs,
       round(avg(p.est), 6) AS mean_est_jaccard
FROM pairs p
JOIN docs da ON da.doc_id = p.id_a
JOIN docs db ON db.doc_id = p.id_b
GROUP BY 1, 2
"""


@register(
    "near_dup_cross_source_matrix",
    oracle=_XSRC_ORACLE,
    tags=("dedup", "provenance", "matrix"),
)
def near_dup_cross_source_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Provenance view of the near-dup graph: the (source_a, source_b)
    matrix of MinHash-LSH duplicate pairs — the diagonal is each
    crawl's internal redundancy, the off-diagonal names which SOURCES
    re-crawl each other's content (the signal that decides whether to
    drop a whole overlapping source before paying per-document dedup
    at 100 TB). Same 8-hash/4-band family as minhash_lsh_near_dups;
    pair endpoints joined back to their sources and aggregated to the
    |sources|² grain.

    Plan shape — signature-GROUP counting, never pair listing: the
    deliverable is COUNTS (and an est mean), and both are exact at
    group grain because candidacy and est are pure functions of the two
    signatures — docs sharing a signature share every band and every
    est, so a verified group pair (A, B) contributes n_A × n_B doc
    pairs at one est, a signature-identical group contributes C(n, 2)
    internal pairs at est 1.0 (per-source split via a gid-grain
    self-join, bounded by sources-per-signature), and only group
    REPRESENTATIVES enter the band join. On duplicate-heavy corpora
    this pays multiplicity once (map-side groupBy) instead of squared
    (the pair join): 82s → see SCALE_NOTES at the 100×-replicated
    sf10 stress. The est mean is exact in both forms (est is k/8,
    binary-exact; the weighted mean is the same sum), so the sf0.01
    oracle — which replays the doc-grain pair form — hash-matches."""
    from pyspark import StorageLevel

    from emails_to_vector_db_spark.operators.dedup import (
        _banded_verified_pairs,
        _minhash_signatures,
        signature_gid,
    )

    docs = _docs_with_near_dups(spark, sf_dir)
    sig = (
        _minhash_signatures(
            docs.select("doc_id", "text"), "doc_id", "text", 8, 4, 3
        )
        .withColumn("gid", signature_gid("sig"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sgrp = (
        sig.where(F.col("gid").isNotNull())
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("gid", "source")
        .agg(
            F.first("sig").alias("sig"),  # identical within the group
            F.first("bands").alias("bands"),
            F.count(F.lit(1)).alias("n"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # same-signature contributions: est exactly 1.0
    diag = sgrp.where(F.col("n") >= 2).select(
        F.col("source").alias("source_a"),
        F.col("source").alias("source_b"),
        (F.col("n") * (F.col("n") - 1) / 2).cast("long").alias("contrib"),
        F.lit(1.0).alias("est"),
    )
    ga = sgrp.select("gid", F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    gb = sgrp.select("gid", F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    same_gid_cross = (
        ga.join(gb, "gid")
        .where(F.col("src_a") < F.col("src_b"))
        .select(
            F.col("src_a").alias("source_a"),
            F.col("src_b").alias("source_b"),
            (F.col("n_a") * F.col("n_b")).cast("long").alias("contrib"),
            F.lit(1.0).alias("est"),
        )
    )
    # cross-signature: band-join the gid representatives, verify est,
    # then expand each verified group pair by its per-source counts
    # persisted: _banded_verified_pairs consumes ggrp TWICE (both sides
    # of the banded self-join), and Spark does not reuse the exchange
    # across differently-aliased sides — unpersisted, the gid-grain
    # groupBy recomputes per side (it reads from the cached sgrp, so
    # this is perf-only, but it's the operator's stated contract)
    ggrp = (
        sgrp.groupBy("gid")
        .agg(F.first("sig").alias("sig"), F.first("bands").alias("bands"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # gid-grain verified pairs ride the SAME banding+verify operator the
    # doc-grain family uses (id_col is just the group key here)
    gp = _banded_verified_pairs(ggrp, "gid", 8, 0.5).select(
        F.col("id_a").alias("gid"),
        F.col("id_b").alias("gid_b"),
        F.col("est_jaccard").alias("est"),
    )
    cross_gid = (
        gp.join(ga, "gid")
        .join(gb.withColumnRenamed("gid", "gid_b"), "gid_b")
        .select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
            (F.col("n_a") * F.col("n_b")).cast("long").alias("contrib"),
            "est",
        )
    )
    contribs = diag.unionByName(same_gid_cross).unionByName(cross_gid)
    return contribs.groupBy("source_a", "source_b").agg(
        F.sum("contrib").alias("n_pairs"),
        F.round(
            F.sum(F.col("est") * F.col("contrib")) / F.sum("contrib"), 6
        ).alias("mean_est_jaccard"),
    )


# ---------------------------------------------------------------------------
# MinHash-LSH S-curve audit: empirical candidacy rate vs the banding theory
# ---------------------------------------------------------------------------

_SCURVE_SAMPLE = 200  # sample docs (plus their planted variants)
# graded-similarity plants: prefix truncations at these fractions give
# pairs all along the Jaccard axis, so every S-curve bin has mass
_SCURVE_FRACS = ((400_000, 0.75), (500_000, 0.5), (600_000, 0.25))

_SCURVE_VARIANTS_SQL = "\n    UNION ALL\n".join(
    f"""    SELECT doc_id + {off},
           array_to_string(({{toks}})[1:greatest(3,
               ceil(len({{toks}}) * {frac})::BIGINT)], ' ')
    FROM documents WHERE doc_id < {_N_PLANT}"""
    for off, frac in _SCURVE_FRACS
).format(toks=_TOKENS_SQL)

_SCURVE_ORACLE = f"""
WITH sample AS (
    SELECT doc_id, text FROM documents WHERE doc_id < {_SCURVE_SAMPLE}
    UNION ALL
    SELECT doc_id + {_DUP_OFFSET}, text || ' zzduptoken'
    FROM documents WHERE doc_id < {_N_PLANT}
    UNION ALL
{_SCURVE_VARIANTS_SQL}
),
sh AS (
    SELECT doc_id,
           list_distinct(CASE WHEN len({_TOKENS_SQL}) < 3 THEN []::VARCHAR[]
               ELSE list_transform(generate_series(1, len({_TOKENS_SQL}) - 2),
                    i -> array_to_string(({_TOKENS_SQL})[i:i+2], ' ')) END) AS sh
    FROM sample
),
toks AS (SELECT doc_id, unnest(sh) AS s FROM sh),
sizes AS (SELECT doc_id, count(*)::DOUBLE AS sz FROM toks GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::DOUBLE AS i
    FROM toks a JOIN toks b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
jac AS (
    SELECT i.id_a, i.id_b, i.i / (sa.sz + sb.sz - i.i) AS s
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
),
m AS (
    SELECT doc_id,
           list_transform(sh, s -> md5(s)) AS m0,
           list_transform(sh, s -> md5('1|' || s)) AS m1
    FROM sh
),
sig AS (
    SELECT doc_id, {_minhash_sql_sig(2)} AS sig FROM m
),
bands AS (
    SELECT doc_id, b.band_idx,
           md5(sig[b.band_idx * 2 + 1] || '|' || sig[b.band_idx * 2 + 2]) AS band_hash
    FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band_idx) b
),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
),
binned AS (
    SELECT least(9, floor(j.s * 10))::BIGINT AS sim_bin,
           CASE WHEN c.id_a IS NOT NULL THEN 1.0 ELSE 0.0 END AS is_cand
    FROM jac j
    LEFT JOIN cand c ON c.id_a = j.id_a AND c.id_b = j.id_b
)
SELECT sim_bin,
       count(*)::BIGINT AS n_pairs,
       round(avg(is_cand), 6) AS empirical_candidate_rate,
       round(1.0 - pow(1.0 - pow((sim_bin + 0.5) / 10.0, 2), 4), 6)
           AS theoretical_rate
FROM binned GROUP BY sim_bin
"""


@register(
    "minhash_scurve_audit",
    oracle=_SCURVE_ORACLE,
    tags=("dedup", "lsh", "audit", "minhash"),
)
def minhash_scurve_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameter audit for the MinHash-LSH banding scheme: over a
    deterministic {_SCURVE_SAMPLE}-doc sample (plus the planted dups,
    which populate the high-similarity bins), compute every pair's
    EXACT shingle Jaccard, mark which pairs the 4-band x 2-row scheme
    actually surfaces as candidates, and report the empirical candidacy
    rate per similarity bin beside the theoretical S-curve
    1-(1-s^r)^b. Reading the two columns together is how you pick
    (b, r) before a 100 TB dedup run: the crossover bin is the
    effective threshold, the low-bin empirical rate is the wasted-
    verification cost, the high-bin rate the recall. ann_lsh_recall_
    audit does this for the hyperplane family; this audits the set
    family with exact ground truth (pairs sharing zero shingles carry
    probability ~0 and are excluded by construction).

    Plan shape: the sample bound caps the exact all-pairs stage at
    sample² (the audit's own contract — ground truth is only ever
    computed on a sample); candidacy reuses the production banding;
    everything downstream is bin-grain."""
    from emails_to_vector_db_spark.operators.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sample = d.where(F.col("doc_id") < _SCURVE_SAMPLE).unionByName(
        d.where(F.col("doc_id") < _N_PLANT).select(
            (F.col("doc_id") + _DUP_OFFSET).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzduptoken")).alias("text"),
        )
    )
    arr = TX.tokens("text")
    for off, frac in _SCURVE_FRACS:
        sample = sample.unionByName(
            d.where(F.col("doc_id") < _N_PLANT).select(
                (F.col("doc_id") + off).alias("doc_id"),
                F.array_join(
                    F.slice(
                        arr,
                        1,
                        F.greatest(
                            F.lit(3),
                            F.ceil(F.size(arr) * frac).cast("int"),
                        ),
                    ),
                    " ",
                ).alias("text"),
            )
        )
    toks = sample.select(
        "doc_id",
        F.explode(
            F.array_distinct(TX.shingles(TX.tokens("text"), n=3))
        ).alias("s"),
    )
    from pyspark import StorageLevel

    toks = toks.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("sz")
    )
    a, b = toks.alias("a"), toks.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sa"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sb"))
    jac = (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("i") / (F.col("sa") + F.col("sb") - F.col("i"))).alias(
                "s"
            ),
        )
    )
    cand = minhash_lsh_pairs(
        sample, n_hashes=8, n_bands=4, shingle_n=3, threshold=0.0
    ).select("id_a", "id_b", F.lit(1.0).alias("is_cand"))
    binned = jac.join(cand, ["id_a", "id_b"], "left").select(
        F.least(F.lit(9), F.floor(F.col("s") * 10))
        .cast("long")
        .alias("sim_bin"),
        F.coalesce("is_cand", F.lit(0.0)).alias("is_cand"),
    )
    mid = (F.col("sim_bin") + 0.5) / 10.0
    return binned.groupBy("sim_bin").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("is_cand"), 6).alias("empirical_candidate_rate"),
        F.round(
            1.0 - F.pow(1.0 - F.pow(mid, F.lit(2.0)), F.lit(4.0)), 6
        ).alias("theoretical_rate"),
    )


# ---------------------------------------------------------------------------
# Incremental LSH dedup: delta docs vs a persisted band index
# ---------------------------------------------------------------------------

# synthetic delta ids ride multiples of a derived base that clears the
# live id range at any corpus size (a fixed offset collides once the
# corpus outgrows it — the sf10 stress corpus already did)
_INC_BASE_SQL = "(SELECT ((max(doc_id) // 10000000) + 1) * 10000000 FROM documents)"
_INC_THRESH = 0.5

_INC_DELTA_SQL = f"""
    SELECT doc_id, text || ' zzrevised' AS text
    FROM buckets WHERE bk = 1
    UNION ALL
    SELECT doc_id + {_INC_BASE_SQL} AS doc_id, text || ' zznewdoc' AS text
    FROM buckets WHERE bk = 2
    UNION ALL
    SELECT doc_id + 2 * {_INC_BASE_SQL} AS doc_id, text || ' zznewdoc zzx' AS text
    FROM buckets WHERE bk = 2
    UNION ALL
    SELECT doc_id + 3 * {_INC_BASE_SQL} AS doc_id,
           concat_ws(' ',
               'nv' || substr(md5('n:' || doc_id::VARCHAR), 1, 4),
               'nv' || substr(md5('n:' || doc_id::VARCHAR), 5, 4),
               'nv' || substr(md5('n:' || doc_id::VARCHAR), 9, 4),
               'nv' || substr(md5('n:' || doc_id::VARCHAR), 13, 4),
               'nv' || substr(md5('n:' || doc_id::VARCHAR), 17, 4),
               'nv' || substr(md5('n:' || doc_id::VARCHAR), 21, 4)) AS text
    FROM buckets WHERE bk = 3
"""

_INC_SIG_CHAIN = f"""
sh AS (
    SELECT side, doc_id,
           list_distinct(CASE WHEN len({_TOKENS_SQL}) < 3 THEN []::VARCHAR[]
               ELSE list_transform(generate_series(1, len({_TOKENS_SQL}) - 2),
                    i -> array_to_string(({_TOKENS_SQL})[i:i+2], ' ')) END) AS sh
    FROM tagged
),
m AS (
    SELECT side, doc_id,
           list_transform(sh, s -> md5(s)) AS m0,
           list_transform(sh, s -> md5('1|' || s)) AS m1
    FROM sh
),
sig AS (
    SELECT side, doc_id, {{sql_sig}} AS sig FROM m
),
bands AS (
    SELECT side, doc_id, sig, b.band_idx,
           md5(sig[b.band_idx * 2 + 1] || '|' || sig[b.band_idx * 2 + 2])
               AS band_hash
    FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band_idx) b
)
"""

_INC_ORACLE = f"""
WITH buckets AS (
    SELECT doc_id, text,
           ('0x' || substr(md5('snap:' || doc_id::VARCHAR), 1, 15))::BIGINT
               % 10 AS bk
    FROM documents
),
delta AS ({_INC_DELTA_SQL}),
tagged AS (
    SELECT 'i' AS side, doc_id, text FROM documents
    UNION ALL
    SELECT 'd' AS side, doc_id, text FROM delta
),
{_INC_SIG_CHAIN.format(sql_sig="{sql_sig}")},
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
    SELECT doc_id, count(*) AS n_index_matches, max(est) AS best_i
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
    SELECT id_a AS doc_id, est FROM est_d WHERE est >= {_INC_THRESH}
    UNION ALL
    SELECT id_b AS doc_id, est FROM est_d WHERE est >= {_INC_THRESH}
),
m_d AS (
    SELECT doc_id, count(*) AS n_delta_matches, max(est) AS best_d
    FROM sym_d GROUP BY doc_id
)
SELECT dd.doc_id,
       COALESCE(m_i.n_index_matches, 0)::BIGINT AS n_index_matches,
       COALESCE(m_d.n_delta_matches, 0)::BIGINT AS n_delta_matches,
       round(greatest(COALESCE(m_i.best_i, 0.0),
                      COALESCE(m_d.best_d, 0.0)), 6) + 0.0 AS best_est,
       (COALESCE(m_i.n_index_matches, 0) + COALESCE(m_d.n_delta_matches, 0)
            = 0) AS is_novel
FROM (SELECT doc_id FROM delta) dd
LEFT JOIN m_i ON dd.doc_id = m_i.doc_id
LEFT JOIN m_d ON dd.doc_id = m_d.doc_id
ORDER BY dd.doc_id
"""


def _delta_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental slice: the snapshot-diff fixture's changed docs
    (salted-md5 bucket 1, ' zzrevised' suffix) plus TWO spawned docs per
    bucket-2 doc — near-dups of their source AND of each other, so both
    match sides (vs-index and within-delta) are exercised."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bk = TX.md5_long(F.col("doc_id").cast("string"), salt="snap:") % 10
    ofs = F.broadcast(
        d.agg(
            F.expr("((max(doc_id) div 10000000) + 1) * 10000000").alias(
                "ofs"
            )
        )
    )
    changed = d.where(bk == 1).select(
        "doc_id", F.concat("text", F.lit(" zzrevised")).alias("text")
    )
    add1 = d.where(bk == 2).crossJoin(ofs).select(
        (F.col("doc_id") + F.col("ofs")).alias("doc_id"),
        F.concat("text", F.lit(" zznewdoc")).alias("text"),
    )
    add2 = d.where(bk == 2).crossJoin(ofs).select(
        (F.col("doc_id") + 2 * F.col("ofs")).alias("doc_id"),
        F.concat("text", F.lit(" zznewdoc zzx")).alias("text"),
    )
    # genuinely novel content (md5-derived token soup, vocab disjoint
    # from the corpus) so the is_novel routing flag fires both ways
    nmd5 = F.md5(F.concat(F.lit("n:"), F.col("doc_id").cast("string")))
    novel = d.where(bk == 3).crossJoin(ofs).select(
        (F.col("doc_id") + 3 * F.col("ofs")).alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit("nv"), F.substring(nmd5, k, 4))
                for k in (1, 5, 9, 13, 17, 21)
            ],
        ).alias("text"),
    )
    return changed.unionByName(add1).unionByName(add2).unionByName(novel)


@register(
    "incremental_lsh_dedup",
    oracle=_INC_ORACLE.format(sql_sig=_minhash_sql_sig(2)),
    tags=("dedup", "minhash", "lsh", "incremental"),
    bench=True,
)
def incremental_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup dedup: sign ONLY the delta (the snapshot
    diff's added+changed docs) and probe its band hashes against the
    corpus band index plus the delta itself — per delta doc: how many
    index near-dups, how many within-delta near-dups, the best estimated
    Jaccard, and the is_novel routing flag an ingest pipeline branches
    on. This is what dedup looks like at 100 TB steady state: the corpus
    was signed once, ingest re-signs nothing but the day's slice.

    Plan shape: the delta is shingled/signed once and persisted; both
    sides then collapse to SIGNATURE GROUPS (identical signatures share
    every band and every est, so match counts against a group are its
    cardinality — the star-edge argument applied to counting), and the
    band probes join group REPRESENTATIVES only. On duplicate-heavy
    corpora this is the difference between paying duplicate
    multiplicity once (in a map-side-combinable groupBy) and paying it
    squared (in the band join): 155.6s → 39.6s at the 100×-replicated
    sf10 stress (the remainder is the linear inline index-signing pass). The index signatures are recomputed inline here so the
    DuckDB oracle can replay everything from the raw table — the
    production path reads the persisted band store instead
    (pipeline/store.py), which changes the scan, not the join. Both
    probes carry only 8-component signatures — text never crosses a
    shuffle. Persisted intermediates (delta/index signature frames and
    their group condensations) back the returned lazy DataFrame;
    callers own cache cleanup (``spark.catalog.clearCache()`` after the
    consuming action — the bench.py / driver pattern).
    """
    index_docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    delta = _delta_docs(spark, sf_dir)
    return _incremental_lsh_routing(index_docs, delta).orderBy("doc_id")


def _incremental_lsh_routing(
    index_docs: DataFrame, delta: DataFrame
) -> DataFrame:
    """The routing core of incremental_lsh_dedup, reusable by composed
    pipelines (incremental_curation_e2e): per delta doc —
    (doc_id, n_index_matches, n_delta_matches, best_est, is_novel).
    Both inputs are (doc_id, text); see the registered query's docstring
    for the signature-group plan story."""
    from pyspark import StorageLevel

    from emails_to_vector_db_spark.operators.dedup import (
        _banded_verified_pairs,
        _minhash_signatures,
        signature_est,
        signature_gid,
    )

    # Signature-GROUP probing (the star-edge insight applied to match
    # counting): docs with identical signatures share every band and
    # every est, so probe one representative per group and multiply by
    # group size. On duplicate-heavy corpora (the 100×-replicated
    # stress fixture: every doc has ~100 signature-identical twins)
    # doc-grain probing pays multiplicity² in the band join
    # (measured 155.6s at sf10); group-grain pays multiplicity once, in
    # the groupBy (39.6s, remainder = linear index signing). Results provably identical — the sf0.01
    # oracle replays the doc-grain pair form.
    # all-NULL signatures (docs with no shingles) must NOT collapse to
    # a shared md5('') group — they never pair in the doc-grain form
    # (null band hashes never join); guard the fingerprint like
    # minhash_lsh_component_edges does, and filter the PERSISTED
    # relation (a filter below the persist would push the whole
    # signature tree into a scan-level filter — the star-edge lesson)
    sig_d = (
        _minhash_signatures(delta, "doc_id", "text", 8, 4, 3)
        .withColumn("gid", signature_gid("sig"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dgrp = (
        sig_d.where(F.col("gid").isNotNull())
        .groupBy("gid")
        .agg(
            F.first("sig").alias("sig"),  # identical within the group
            F.first("bands").alias("bands"),
            F.count(F.lit(1)).alias("n"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sig_i = (
        _minhash_signatures(index_docs, "doc_id", "text", 8, 4, 3)
        .withColumn("gid", signature_gid("sig"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    igrp = (
        sig_i.where(F.col("gid").isNotNull())
        .groupBy("gid")
        .agg(
            F.first("sig").alias("sig"),
            F.first("bands").alias("bands"),
            F.count(F.lit(1)).alias("n"),
        )
    )

    def _banded(grp: DataFrame, tag: str) -> DataFrame:
        return grp.select(
            F.col("gid").alias(f"gid_{tag}"),
            F.col("sig").alias(f"sig_{tag}"),
            F.col("n").alias(f"n_{tag}"),
            F.posexplode_outer("bands").alias("band_idx", "band_hash"),
        )

    # delta groups -> index groups (no id ordering: the id spaces
    # legitimately overlap — a changed doc vs its own indexed old
    # version IS a match); each verified group pair contributes the
    # whole index group's cardinality to every delta group member
    cand_i = (
        _banded(dgrp, "d")
        .join(_banded(igrp, "i"), ["band_idx", "band_hash"])
        .dropDuplicates(["gid_d", "gid_i"])
        .withColumn("est", signature_est("sig_d", "sig_i", 8))
        .where(F.col("est") >= _INC_THRESH)
    )
    m_i = cand_i.groupBy("gid_d").agg(
        F.sum("n_i").alias("n_index_matches"),
        F.max("est").alias("best_i"),
    )
    # within-delta, cross-group: verified representative pairs from the
    # SAME banding+verify operator the doc-grain family uses, each pair
    # contributing the OTHER group's cardinality to both sides
    sizes = dgrp.select("gid", "n")
    pairs_dd = _banded_verified_pairs(dgrp, "gid", 8, _INC_THRESH).select(
        F.col("id_a").alias("gid_a"),
        F.col("id_b").alias("gid_b"),
        F.col("est_jaccard").alias("est"),
    )
    sym_d = pairs_dd.join(
        sizes.select(F.col("gid").alias("gid_b"), F.col("n").alias("n_other")),
        "gid_b",
    ).select(F.col("gid_a").alias("gid_d"), "n_other", "est").unionByName(
        pairs_dd.join(
            sizes.select(
                F.col("gid").alias("gid_a"), F.col("n").alias("n_other")
            ),
            "gid_a",
        ).select(F.col("gid_b").alias("gid_d"), "n_other", "est")
    )
    m_d = sym_d.groupBy("gid_d").agg(
        F.sum("n_other").alias("n_cross"),
        F.max("est").alias("best_cross"),
    )
    grp_stats = (
        dgrp.select("gid", "n")
        .join(m_i.withColumnRenamed("gid_d", "gid"), "gid", "left")
        .join(m_d.withColumnRenamed("gid_d", "gid"), "gid", "left")
    )
    # own-group members are signature-identical delta twins: n-1
    # matches at est exactly 1.0
    n_i_ = F.coalesce(F.col("n_index_matches"), F.lit(0)).cast("long")
    n_d_ = (
        F.coalesce(F.col("n_cross"), F.lit(0)) + (F.col("n") - 1)
    ).cast("long")
    best = F.greatest(
        F.coalesce(F.col("best_i"), F.lit(0.0)),
        F.coalesce(F.col("best_cross"), F.lit(0.0)),
        F.when(F.col("n") >= 2, F.lit(1.0)).otherwise(F.lit(0.0)),
    )
    per_group = grp_stats.select(
        "gid",
        n_i_.alias("n_index_matches"),
        n_d_.alias("n_delta_matches"),
        (F.round(best, 6) + F.lit(0.0)).alias("best_est"),
    )
    # LEFT join: a null-gid delta doc (no shingles) still belongs in
    # the routing manifest — zero matches, novel by definition
    n_im = F.coalesce(F.col("n_index_matches"), F.lit(0)).cast("long")
    n_dm = F.coalesce(F.col("n_delta_matches"), F.lit(0)).cast("long")
    return (
        sig_d.select("doc_id", "gid")
        .join(per_group, "gid", "left")
        .select(
            "doc_id",
            n_im.alias("n_index_matches"),
            n_dm.alias("n_delta_matches"),
            (F.coalesce(F.col("best_est"), F.lit(0.0)) + F.lit(0.0)).alias(
                "best_est"
            ),
            ((n_im + n_dm) == 0).alias("is_novel"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash recall/precision audit vs exact Jaccard ground truth
# ---------------------------------------------------------------------------

_RPA_T = 0.5

# Three planted difficulty tiers: one appended token (J ~ 0.93, easy),
# fifteen appended tokens (J ~ 0.75, mid), and a 60%-prefix truncation
# (J ~ 0.55, hugging the 0.5 threshold) — the last tier is where an
# 8-hash MinHash estimate genuinely errs, so recall/precision are
# informative rather than trivially 1.0.
# Twin ids use a DERIVED offset (max(doc_id) + 1), never a fixed
# constant — the round-7 snapshot-diff lesson: a fixed offset collides
# with real ids once the corpus outgrows it.
_RPA_DOCS_SQL = f"""
    SELECT doc_id, source, text FROM documents
    UNION ALL
    SELECT doc_id + o.off AS doc_id, source,
           text || ' zzduptoken' AS text
    FROM documents, (SELECT max(doc_id) + 1 AS off FROM documents) o
    WHERE doc_id < 50
    UNION ALL
    SELECT doc_id + o.off AS doc_id, source,
           text || ' ' || trim(repeat('zzpad ', 15)) AS text
    FROM documents, (SELECT max(doc_id) + 1 AS off FROM documents) o
    WHERE doc_id >= 50 AND doc_id < 100
    UNION ALL
    SELECT doc_id + o.off AS doc_id, source,
           array_to_string(
               ({_TOKENS_SQL})[1:greatest(len({_TOKENS_SQL}) * 3 // 5, 3)],
               ' ') AS text
    FROM documents, (SELECT max(doc_id) + 1 AS off FROM documents) o
    WHERE doc_id >= 100 AND doc_id < 150
"""


def _rpa_docs(spark, sf_dir) -> tuple[DataFrame, DataFrame]:
    """Returns (docs_with_twins, off): twin ids ride a derived offset
    (max(doc_id) + 1 — broadcast 1-row aggregate, no collect)."""
    d = load_table(spark, sf_dir, "documents")
    off = d.agg((F.max("doc_id") + 1).alias("off"))
    db = d.crossJoin(F.broadcast(off))
    arr = TX.tokens("text")
    t1 = db.where(F.col("doc_id") < 50).select(
        (F.col("doc_id") + F.col("off")).alias("doc_id"),
        "source",
        F.concat(F.col("text"), F.lit(" zzduptoken")).alias("text"),
    )
    t2 = db.where((F.col("doc_id") >= 50) & (F.col("doc_id") < 100)).select(
        (F.col("doc_id") + F.col("off")).alias("doc_id"),
        "source",
        F.concat(
            F.col("text"), F.lit(" "), F.trim(F.repeat(F.lit("zzpad "), 15))
        ).alias("text"),
    )
    t3 = db.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 150)).select(
        (F.col("doc_id") + F.col("off")).alias("doc_id"),
        "source",
        F.array_join(
            F.slice(
                arr,
                1,
                F.greatest(
                    (F.size(arr) * 3 / 5).cast("int"), F.lit(3)
                ),
            ),
            " ",
        ).alias("text"),
    )
    docs = (
        d.select("doc_id", "source", "text")
        .unionByName(t1)
        .unionByName(t2)
        .unionByName(t3)
    )
    return docs, off


# The audit universe is a FIXED-SIZE sample (first {_RPA_SAMPLE}
# original docs + every planted twin): exact ground truth is
# block-quadratic, so the audit's work must stay constant as the
# corpus grows — recall/precision estimated on a sample is the only
# form that survives 100 TB (the dedup_quality_survivors pattern).
_RPA_SAMPLE = 10_000

_RPA_ORACLE = f"""
WITH docs0 AS ({_RPA_DOCS_SQL}),
docs AS (
    SELECT * FROM docs0
    WHERE doc_id < {_RPA_SAMPLE}
       OR doc_id >= (SELECT max(doc_id) + 1 FROM documents)
),
sh AS (
    SELECT source, doc_id,
           list_distinct(CASE WHEN len({_TOKENS_SQL}) < 3 THEN []::VARCHAR[]
               ELSE list_transform(generate_series(1, len({_TOKENS_SQL}) - 2),
                    i -> array_to_string(({_TOKENS_SQL})[i:i+2], ' ')) END) AS sh
    FROM docs
),
truth AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
          / greatest(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)),
                     1) >= {_RPA_T}
),
m AS (
    SELECT doc_id,
           list_transform(sh, s -> md5(s)) AS m0,
           list_transform(sh, s -> md5('1|' || s)) AS m1
    FROM sh
),
sig AS (
    SELECT doc_id, {_minhash_sql_sig(2)} AS sig FROM m
),
bands AS (
    SELECT doc_id, sig, b.band_idx,
           md5(sig[b.band_idx * 2 + 1] || '|' || sig[b.band_idx * 2 + 2])
               AS band_hash
    FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band_idx) b
),
det AS (
    SELECT id_a, id_b FROM (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               a.sig AS sig_a, b.sig AS sig_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
    )
    WHERE list_sum(list_transform(generate_series(1, 8),
            i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1.0 ELSE 0.0 END)) / 8.0
          >= {_RPA_T}
),
srcmap AS (SELECT doc_id, source FROM docs),
det_s AS (
    SELECT d.id_a, d.id_b,
           (sa.source = sb.source) AS in_block
    FROM det d
    JOIN srcmap sa ON sa.doc_id = d.id_a
    JOIN srcmap sb ON sb.doc_id = d.id_b
),
j AS (
    SELECT coalesce(t.t, 0) AS t, coalesce(d.d, 0) AS d
    FROM (SELECT id_a, id_b, 1 AS t FROM truth) t
    FULL JOIN (SELECT id_a, id_b, 1 AS d FROM det_s WHERE in_block) d
      USING (id_a, id_b)
),
cnt AS (
    SELECT sum(t)::BIGINT AS n_truth,
           sum(d)::BIGINT AS n_detected,
           sum(t * d)::BIGINT AS n_common
    FROM j
),
crossb AS (
    SELECT count(*)::BIGINT AS n_cross_block FROM det_s WHERE NOT in_block
)
SELECT c.n_truth, c.n_detected, c.n_common,
       round(c.n_common / c.n_truth::DOUBLE, 4) AS recall,
       round(c.n_common / c.n_detected::DOUBLE, 4) AS "precision",
       x.n_cross_block
FROM cnt c CROSS JOIN crossb x
"""


@register(
    "minhash_recall_precision_audit",
    oracle=_RPA_ORACLE,
    tags=("dedup", "eval", "recall", "minhash"),
    bench=True,
)
def minhash_recall_precision_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Empirical recall/precision of the MinHash(8)+LSH near-dup
    detector against EXACT 3-gram Jaccard ground truth at the same
    threshold ({_RPA_T}) — the dedup analog of ivf_recall_audit /
    ann_lsh_recall_audit: the analytic S-curve (minhash_scurve_audit)
    predicts the collision probability, this measures what the banded
    pipeline actually delivered on the planted corpus. The audit
    universe is the same-source block space (where exact ground truth
    is computable); detector hits that cross blocks are reported
    separately rather than silently dropped.

    Plan shape at 100 TB: ground truth is the blocked exact-Jaccard
    join (quadratic per block — the audit is priced for a SAMPLED
    block subset at scale, the dedup_quality_survivors pattern); the
    detector side is the banded LSH pipeline unchanged; the comparison
    is one full-outer join at pair grain, bounded by the two detector
    outputs, then a 1-row census."""
    docs, off = _rpa_docs(spark, sf_dir)
    docs = docs.crossJoin(F.broadcast(off)).where(
        (F.col("doc_id") < _RPA_SAMPLE) | (F.col("doc_id") >= F.col("off"))
    ).drop("off")
    truth = ngram_jaccard_pairs(
        docs, block_col="source", shingle_n=3, threshold=_RPA_T
    ).select("id_a", "id_b", F.lit(1).alias("t"))
    det = minhash_lsh_pairs(
        docs, n_hashes=8, n_bands=4, shingle_n=3, threshold=_RPA_T
    ).select("id_a", "id_b")
    src = docs.select("doc_id", "source")
    det_s = (
        det.join(
            src.select(
                F.col("doc_id").alias("id_a"),
                F.col("source").alias("src_a"),
            ),
            "id_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("id_b"),
                F.col("source").alias("src_b"),
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            (F.col("src_a") == F.col("src_b")).alias("in_block"),
        )
    )
    from pyspark import StorageLevel

    det_s = det_s.persist(StorageLevel.MEMORY_AND_DISK)
    det_in = det_s.where(F.col("in_block")).select(
        "id_a", "id_b", F.lit(1).alias("d")
    )
    j = truth.join(det_in, ["id_a", "id_b"], "full").select(
        F.coalesce(F.col("t"), F.lit(0)).alias("t"),
        F.coalesce(F.col("d"), F.lit(0)).alias("d"),
    )
    cnt = j.agg(
        F.sum("t").alias("n_truth"),
        F.sum("d").alias("n_detected"),
        F.sum(F.col("t") * F.col("d")).alias("n_common"),
    )
    crossb = det_s.where(~F.col("in_block")).agg(
        F.count(F.lit(1)).alias("n_cross_block")
    )
    return cnt.crossJoin(F.broadcast(crossb)).select(
        F.col("n_truth").cast("long").alias("n_truth"),
        F.col("n_detected").cast("long").alias("n_detected"),
        F.col("n_common").cast("long").alias("n_common"),
        F.round(
            F.col("n_common") / F.col("n_truth").cast("double"), 4
        ).alias("recall"),
        F.round(
            F.col("n_common") / F.col("n_detected").cast("double"), 4
        ).alias("precision"),
        F.col("n_cross_block").cast("long").alias("n_cross_block"),
    )


# ---------------------------------------------------------------------------
# Embedding-LSH recall/precision audit vs exact cosine ground truth
# ---------------------------------------------------------------------------

_ELA_T = 0.9
_ELA_SAMPLE = 2_000  # audit universe: first N originals + every twin
_ELA_N_PLANT = 99  # tier = vec_id % 3 -> alpha 0.2 / 0.45 / 0.7


def _ela_docs(spark, sf_dir):
    """Embeddings + three planted noise tiers: twin = v + alpha * w
    where w is the SUCCESSOR vector (deterministic in both engines) and
    alpha targets cos ~ 0.98 / 0.91 / 0.82 — above, straddling, and
    below the 0.9 audit threshold. Twin ids ride the derived offset."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("v"),
    )
    off = emb.agg((F.max("vec_id") + 1).alias("off"))
    succ = emb.select(
        (F.col("vec_id") - 1).alias("vec_id"), F.col("v").alias("w")
    )
    alpha = (
        F.when(F.col("vec_id") % 3 == 0, 0.2)
        .when(F.col("vec_id") % 3 == 1, 0.45)
        .otherwise(0.7)
    )
    # Two-step projection, deliberately: `alpha` references vec_id from
    # OUTSIDE the zip_with lambda, and Spark resolves such outer refs
    # against the projection's OUTPUT schema — in a single select that
    # also renames vec_id to the twin id, the lambda silently picked the
    # TWIN id's tier (caught by the oracle gate: every tier-0 twin got
    # alpha 0.7). Build the mixed vector while vec_id still means the
    # original id, rename after.
    mixed = (
        emb.where(F.col("vec_id") < _ELA_N_PLANT)
        .join(succ, "vec_id")
        .crossJoin(F.broadcast(off))
        .select(
            "vec_id",
            "label",
            "off",
            F.zip_with(
                "v", "w", lambda x, y: x + alpha * y
            ).alias("v"),
        )
    )
    planted = mixed.select(
        (F.col("vec_id") + F.col("off")).alias("vec_id"), "label", "v"
    )
    base = emb.unionByName(planted)
    return base.crossJoin(F.broadcast(off)).where(
        (F.col("vec_id") < _ELA_SAMPLE) | (F.col("vec_id") >= F.col("off"))
    ).drop("off")


def _ela_oracle() -> str:
    planes = _emb_planes()
    bits = " + ".join(
        f"(CASE WHEN list_dot_product(v, {p}::DOUBLE[]) > 0"
        f" THEN {2**i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    probes = ", ".join(
        ["bucket"] + [f"xor(bucket, {2**i})" for i in range(len(planes))]
    )
    return f"""
WITH emb AS (
    SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
),
off AS (SELECT max(vec_id) + 1 AS off FROM emb),
planted AS (
    SELECT a.vec_id + o.off AS vec_id, a.label,
           list_transform(range(1, len(a.v) + 1),
               i -> a.v[i] + (CASE a.vec_id % 3 WHEN 0 THEN 0.2
                              WHEN 1 THEN 0.45 ELSE 0.7 END) * s.v[i])
               AS v
    FROM emb a
    JOIN emb s ON s.vec_id = a.vec_id + 1
    CROSS JOIN off o
    WHERE a.vec_id < {_ELA_N_PLANT}
),
base AS (
    SELECT * FROM (
        SELECT * FROM emb UNION ALL SELECT * FROM planted
    ), off o
    WHERE vec_id < {_ELA_SAMPLE} OR vec_id >= o.off
),
truth AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM base a JOIN base b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v))
             * sqrt(list_dot_product(b.v, b.v))) >= {_ELA_T}
),
bucketed AS (
    SELECT vec_id, label, v, ({bits})::BIGINT AS bucket FROM base
),
probes AS (
    SELECT vec_id, label, v, unnest([{probes}]) AS probe_bucket
    FROM bucketed
),
det AS (
    SELECT id_a, id_b FROM (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
               a.v AS va, b.v AS vb
        FROM probes a JOIN bucketed b
          ON a.label = b.label AND a.probe_bucket = b.bucket
         AND a.vec_id < b.vec_id
    )
    WHERE list_dot_product(va, vb)
          / (sqrt(list_dot_product(va, va))
             * sqrt(list_dot_product(vb, vb))) >= {_ELA_T}
),
j AS (
    SELECT coalesce(t.t, 0) AS t, coalesce(d.d, 0) AS d
    FROM (SELECT id_a, id_b, 1 AS t FROM truth) t
    FULL JOIN (SELECT id_a, id_b, 1 AS d FROM det) d
      USING (id_a, id_b)
)
SELECT sum(t)::BIGINT AS n_truth,
       sum(d)::BIGINT AS n_detected,
       sum(t * d)::BIGINT AS n_common,
       round(sum(t * d) / sum(t)::DOUBLE, 4) AS recall,
       round(sum(t * d) / sum(d)::DOUBLE, 4) AS "precision"
FROM j
"""


@register(
    "embedding_lsh_recall_audit",
    oracle=_ela_oracle(),
    tags=("dedup", "vector", "eval", "recall"),
    bench=True,
)
def embedding_lsh_recall_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Empirical recall/precision of the Hamming-1 multiprobe sign-LSH
    near-dup detector against EXACT label-blocked cosine ground truth
    at threshold 0.9 — completing the audit symmetry with
    minhash_recall_precision_audit: the MinHash family is audited
    against exact Jaccard, the embedding family against exact cosine.
    Three planted noise tiers (cos ~ 0.98 / 0.91 / 0.82: above,
    straddling, below threshold) make the numbers informative — at
    cos ~ 0.91 a sign flips with probability theta/pi ~ 0.14 per
    plane, so ~1/3 of borderline pairs land at Hamming distance >= 2
    and the multiprobe provably misses them.

    Plan shape at 100 TB: the audit universe is a FIXED-SIZE sample
    (first 2,000 originals + all twins — exact ground truth is
    block-quadratic); twin ids ride the derived offset; the detector
    side is the standard bucketed multiprobe join; the comparison is
    one bounded pair-grain full-outer join + a 1-row census."""
    from emails_to_vector_db_spark.functions.vector import dot, l2_norm
    from emails_to_vector_db_spark.operators.dedup import guard_block_sizes
    from emails_to_vector_db_spark.operators.similarity import lsh_bucket

    base = _ela_docs(spark, sf_dir)
    guard_block_sizes(base, "label", 50_000)
    from pyspark import StorageLevel

    base = base.withColumn("norm", l2_norm("v")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cosab = dot("va", "vb") / (F.col("norm_a") * F.col("norm_b"))
    ta = base.select(
        F.col("label").alias("_l"),
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("norm").alias("norm_a"),
    )
    tb = base.select(
        F.col("label").alias("_l"),
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("norm").alias("norm_b"),
    )
    truth = (
        ta.join(tb, "_l")
        .where(F.col("id_a") < F.col("id_b"))
        .where(cosab >= _ELA_T)
        .select("id_a", "id_b", F.lit(1).alias("t"))
    )
    planes = _emb_planes()
    bucketed = base.withColumn(
        "bucket", lsh_bucket(F.col("v"), planes).cast("long")
    )
    probe_buckets = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(2**i))
            for i in range(len(planes))
        ],
    )
    pa = bucketed.select(
        F.col("label").alias("_l"),
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("norm").alias("norm_a"),
        F.explode(probe_buckets).alias("pb"),
    )
    pb = bucketed.select(
        F.col("label").alias("_l"),
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("norm").alias("norm_b"),
        F.col("bucket").alias("pb"),
    )
    det = (
        pa.join(pb, ["_l", "pb"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .where(cosab >= _ELA_T)
        .select("id_a", "id_b", F.lit(1).alias("d"))
    )
    j = truth.join(det, ["id_a", "id_b"], "full").select(
        F.coalesce(F.col("t"), F.lit(0)).alias("t"),
        F.coalesce(F.col("d"), F.lit(0)).alias("d"),
    )
    return j.agg(
        F.sum("t").cast("long").alias("n_truth"),
        F.sum("d").cast("long").alias("n_detected"),
        F.sum(F.col("t") * F.col("d")).cast("long").alias("n_common"),
        F.round(
            F.sum(F.col("t") * F.col("d")) / F.sum("t").cast("double"), 4
        ).alias("recall"),
        F.round(
            F.sum(F.col("t") * F.col("d")) / F.sum("d").cast("double"), 4
        ).alias("precision"),
    )
