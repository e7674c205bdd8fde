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
the global token ranking is a window over the VOCABULARY (not the
corpus); candidate generation is an equi-join on prefix-token rank —
i.e. a shuffle bucketed by rare tokens — followed by the symmetric
length filter min ≥ τ·max; verification joins candidates (already
near-final size) back to the token lists. Nothing is ever all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prefix_filter_jaccard_join(
    doc_tokens: DataFrame, tau: float
) -> DataFrame:
    """All (doc_a < doc_b) pairs with exact Jaccard(token sets) ≥ tau.

    ``doc_tokens``: (doc_id, token) DISTINCT rows. Returns
    (doc_a, doc_b, inter, union_sz, jaccard) with jaccard unrounded.
    """
    if not 0.0 < tau <= 1.0:
        raise ValueError(f"tau must be in (0, 1], got {tau}")
    toks = doc_tokens.select("doc_id", "token")
    # global token order: rarest-first document frequency
    rank_w = Window.orderBy(F.col("df").asc(), F.col("token").asc())
    ordered = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("rank", F.row_number().over(rank_w))
        .select("token", "rank")
    )
    dt = toks.join(ordered, "token").select("doc_id", "rank")
    sizes = dt.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    pos_w = Window.partitionBy("doc_id").orderBy("rank")
    prefix = (
        dt.withColumn("pos", F.row_number().over(pos_w))
        .join(sizes, "doc_id")
        .where(
            F.col("pos")
            <= F.col("sz") - F.ceil(F.lit(tau) * F.col("sz")) + 1
        )
        .select("doc_id", "rank", "sz")
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
            F.col("p1.sz").alias("sz_a"),
            F.col("p2.sz").alias("sz_b"),
        )
        .distinct()
    )
    a = dt.alias("a")
    b = dt.alias("b")
    inter = (
        cand.join(a, F.col("a.doc_id") == F.col("doc_a"))
        .join(
            b,
            (F.col("b.doc_id") == F.col("doc_b"))
            & (F.col("b.rank") == F.col("a.rank")),
        )
        .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    union_sz = F.col("sz_a") + F.col("sz_b") - F.col("inter")
    return (
        inter.withColumn("union_sz", union_sz)
        .withColumn("jaccard", F.col("inter") / F.col("union_sz"))
        .where(F.col("jaccard") >= tau)
        .select("doc_a", "doc_b", "inter", "union_sz", "jaccard")
    )
