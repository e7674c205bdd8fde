"""Exact set-similarity join via prefix filtering (AllPairs/PPJoin
family) — the scalable way to find ALL pairs with Jaccard ≥ τ without a
quadratic pair space and without the probabilistic miss of MinHash-LSH.

Why this exists beside operators/dedup.py: ngram_jaccard_pairs there is
the guarded block-quadratic verification baseline, and minhash_lsh_pairs
is the probabilistic scale path (recall < 1). Prefix filtering is the
third point of the triangle: EXACT (recall 1 by theorem) and still
bucket-join-shaped.

The theorem (Chaudhuri et al. SSJoin / Bayardo et al. AllPairs): order
all tokens by a global total order (here: ascending document frequency,
token string as tiebreak — rarest first, so prefixes land in the
emptiest buckets). If J(x, y) ≥ τ then the first
``|x| - ceil(τ·|x|) + 1`` tokens of x and the first
``|y| - ceil(τ·|y|) + 1`` tokens of y (under that order) share at least
one token. Proof sketch: J ≥ τ forces |x∩y| ≥ τ·max(|x|,|y|); if the
prefixes were disjoint, every shared token would sit in both suffixes,
but x's suffix has only ceil(τ·|x|) - 1 < τ·|x| elements.

Spark shape at 100 TB: token DF counts are one map-side-combinable agg;
the global token ranking is a DISTRIBUTED two-pass row_number over the
vocabulary (operators/ranking.py — range partition → local rank →
offset join; no single-partition window stage even at 10⁹ distinct
shingles); each document folds into ONE row carrying its sorted rank
array (set size is bounded by the tokenizer, not the corpus), so the
prefix is an array slice — no per-doc window — and VERIFICATION is a
native array_intersect per candidate pair (one row per candidate, never
an exploded postings join; together with spread() on the shingle stage
the registered query went 12.6s → ~4s at sf0.1). Candidate generation
is an equi-join on
prefix-token rank — a shuffle bucketed by rare tokens — with the
symmetric length filter min ≥ τ·max applied before the distinct.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from emails_to_vector_db_spark.operators.ranking import (
    distributed_row_number,
)


def _ranked_docsets(doc_tokens: DataFrame) -> DataFrame:
    """(doc_id, rs sorted-rank-array, sz) under the rarest-first global
    token order — the shared substrate of both prefix-filter joins."""
    toks = doc_tokens.select("doc_id", "token").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # ^ the (usually expensive) tokenize/shingle lineage feeds both the
    #   dictionary build and the docset fold — run it once
    # global token order: rarest-first document frequency. The rank is
    # a DISTRIBUTED two-pass row_number (range partition → local rank →
    # offset join, operators/ranking.py) — a plain
    # Window.orderBy(df, token) would move the whole vocabulary to one
    # partition, a real straggler at web-corpus shingle cardinality.
    pins: list = []
    ordered = distributed_row_number(
        toks.groupBy("token").agg(F.count(F.lit(1)).alias("df")),
        [F.col("df").asc(), F.col("token").asc()],
        pins=pins,
    ).select("token", "rank")
    # vocabulary-sized map side: broadcast the rank dictionary so the
    # corpus-scale postings stream is never shuffled for the dictionary
    # lookup (at web scale with an over-RAM vocab this becomes a
    # bucketed join on token instead); then fold each document into one
    # row holding its SORTED rank array — by construction sorted ranks
    # are sorted by rarity, so the prefix is a plain array slice.
    docsets = (
        toks.join(F.broadcast(ordered), "token")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("rank")).alias("rs"))
        .withColumn("sz", F.size("rs"))
        .persist(StorageLevel.MEMORY_AND_DISK)
        # ^ consumed 3× (prefix build + both verification sides); one
        #   narrow row per document
    )
    # materialize the docset table now, then release the upstream pins
    # deterministically: the (wide) tokenize/shingle cache and the rank
    # table's local pin would otherwise accumulate across calls in a
    # long-lived session with nothing but clearCache() to free them
    docsets.count()
    toks.unpersist()
    for p in pins:
        p.unpersist()
    return docsets


def prefix_filter_jaccard_join(
    doc_tokens: DataFrame, tau: float
) -> DataFrame:
    """All (doc_a < doc_b) pairs with exact Jaccard(token sets) ≥ tau.

    ``doc_tokens``: (doc_id, token) DISTINCT rows. Returns
    (doc_a, doc_b, inter, union_sz, jaccard) with jaccard unrounded.
    """
    if not 0.0 < tau <= 1.0:
        raise ValueError(f"tau must be in (0, 1], got {tau}")
    docsets = _ranked_docsets(doc_tokens)
    plen = F.col("sz") - F.ceil(F.lit(tau) * F.col("sz")) + 1
    prefix = docsets.select(
        "doc_id", "sz", F.explode(F.slice("rs", F.lit(1), plen)).alias("rank")
    )
    p1 = prefix.alias("p1")
    p2 = prefix.alias("p2")
    cand = (
        p1.join(p2, F.col("p1.rank") == F.col("p2.rank"))
        .where(F.col("p1.doc_id") < F.col("p2.doc_id"))
        # symmetric length filter: J ≥ τ ⇒ min(|x|,|y|) ≥ τ·max(|x|,|y|)
        .where(
            F.least("p1.sz", "p2.sz")
            >= F.lit(tau) * F.greatest("p1.sz", "p2.sz")
        )
        .select(
            F.col("p1.doc_id").alias("doc_a"),
            F.col("p2.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    a = docsets.select(
        F.col("doc_id").alias("doc_a"), F.col("rs").alias("rs_a"),
        F.col("sz").alias("sz_a"),
    )
    b = docsets.select(
        F.col("doc_id").alias("doc_b"), F.col("rs").alias("rs_b"),
        F.col("sz").alias("sz_b"),
    )
    verified = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn(
            "inter", F.size(F.array_intersect("rs_a", "rs_b")).cast("long")
        )
    )
    union_sz = (F.col("sz_a") + F.col("sz_b")).cast("long") - F.col("inter")
    return (
        verified.withColumn("union_sz", union_sz)
        .withColumn("jaccard", F.col("inter") / F.col("union_sz"))
        .where(F.col("jaccard") >= tau)
        .select("doc_a", "doc_b", "inter", "union_sz", "jaccard")
    )


def prefix_filter_containment_join(
    doc_tokens: DataFrame, tau: float
) -> DataFrame:
    """All (doc_a < doc_b) pairs with exact overlap coefficient
    |A∩B| / min(|A|, |B|) ≥ tau — the CONTAINMENT analogue of the
    Jaccard join above, catching near-supersets (quotation, inclusion,
    boilerplate wrapping) that Jaccard misses because a huge union
    drowns the shared core.

    The prefix theorem adapts: with x the SMALLER set, C ≥ τ forces
    |x∩y| ≥ τ·|x|, so the first |x| − ceil(τ·|x|) + 1 rarest tokens of
    x must hit y SOMEWHERE — the prefix comes from the smaller side but
    joins against the FULL postings of the larger side (no symmetric
    length filter exists for containment: a tiny set inside a huge one
    is exactly the match sought). Scale shape: prefixes are
    rarest-first, so the full-postings join keys on rare tokens whose
    posting lists are short — the candidate space is bounded by rare-
    token co-occurrence, never |docs|².

    ``doc_tokens``: (doc_id, token) DISTINCT rows. Returns
    (doc_a, doc_b, inter, min_sz, containment) with containment
    unrounded.
    """
    if not 0.0 < tau <= 1.0:
        raise ValueError(f"tau must be in (0, 1], got {tau}")
    docsets = _ranked_docsets(doc_tokens)
    plen = F.col("sz") - F.ceil(F.lit(tau) * F.col("sz")) + 1
    prefix = docsets.select(
        "doc_id", "sz", F.explode(F.slice("rs", F.lit(1), plen)).alias("rank")
    )
    full = docsets.select(
        "doc_id", "sz", F.explode("rs").alias("rank")
    )
    p = prefix.alias("p")  # the smaller side supplies the prefix
    q = full.alias("q")
    cand = (
        p.join(q, F.col("p.rank") == F.col("q.rank"))
        .where(F.col("p.doc_id") != F.col("q.doc_id"))
        .where(F.col("p.sz") <= F.col("q.sz"))
        .select(
            F.least("p.doc_id", "q.doc_id").alias("doc_a"),
            F.greatest("p.doc_id", "q.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    a = docsets.select(
        F.col("doc_id").alias("doc_a"), F.col("rs").alias("rs_a"),
        F.col("sz").alias("sz_a"),
    )
    b = docsets.select(
        F.col("doc_id").alias("doc_b"), F.col("rs").alias("rs_b"),
        F.col("sz").alias("sz_b"),
    )
    verified = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn(
            "inter", F.size(F.array_intersect("rs_a", "rs_b")).cast("long")
        )
        .withColumn("min_sz", F.least("sz_a", "sz_b").cast("long"))
    )
    return (
        verified.withColumn(
            "containment", F.col("inter") / F.col("min_sz")
        )
        .where(F.col("containment") >= tau)
        .select("doc_a", "doc_b", "inter", "min_sz", "containment")
    )
