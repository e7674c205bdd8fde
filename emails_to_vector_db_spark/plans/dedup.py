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
    min-label closure, so the full pipeline is hash-checked."""
    from emails_to_vector_db_spark.operators.components import (
        connected_components,
    )
    from emails_to_vector_db_spark.operators.dedup import minhash_lsh_pairs

    docs = _docs_with_chained_dups(spark, sf_dir)
    pairs = minhash_lsh_pairs(
        docs, n_hashes=8, n_bands=4, shingle_n=3, threshold=0.5
    )
    comp = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
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
    per document (b = a + {stride}, inner join keeps only existing
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

    Plan shape: the pair family and min-label closure are the priced-in
    near_dup_components stages; quality is a scan-time expression;
    survivor selection is a CLUSTER-partitioned rank (bounded by the
    largest dup cluster, never global) keyed on the 6dp-ROUNDED score
    so cross-engine float noise cannot flip survivors."""
    from pyspark.sql import Window

    from emails_to_vector_db_spark.operators.components import (
        connected_components,
    )
    from emails_to_vector_db_spark.operators.dedup import minhash_lsh_pairs

    docs = _docs_with_chained_dups(spark, sf_dir)
    pairs = minhash_lsh_pairs(
        docs, n_hashes=8, n_bands=4, shingle_n=3, threshold=0.5
    )
    comp = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
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
