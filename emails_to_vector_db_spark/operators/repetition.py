"""Bigram repetition statistics with a long-document cutover.

The Gopher-style repetition filters (Rae et al. 2021 §A1.1) need, per
document: the occurrence count of the most frequent 2-gram and the
number of 2-gram positions whose gram repeats within the document.
Two plans compute the identical statistics:

- **array form** (documents with ≤ ``REP_CUTOVER_TOKENS`` tokens):
  scan-local nested array expressions — zero shuffles, embarrassingly
  parallel, but O(L²) in tokens-per-document. Ideal for web-scale
  corpora of normal-length documents.
- **explode form** (longer documents): explode the 2-grams and take a
  ``groupBy(id, gram)`` census, then a per-document roll-up — linear
  in document length, one shuffle whose width is bounded by the
  long-document subset only. A single 500k-token document (real in
  web crawls before length filtering) would cost ~10¹¹ comparisons in
  the array form; here it costs one census pass.

The union of the two branches is the operator; routing is a plain
``size(toks)`` predicate, so Catalyst pushes each branch's filter to
its own scan. Cross-path equivalence is pinned by
tests/test_repetition_cutover.py, and the plan guard there fails if
the quadratic expression is ever evaluated without the cutover filter
above it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Documents above this token count take the linear explode census.
# 2048² ≈ 4.2M scan-local comparisons is the break-even neighbourhood
# vs one extra shuffle row per gram; anything megabyte-sized is far
# past it.
REP_CUTOVER_TOKENS = 2048


def _grams_expr(toks_col: str):
    """Adjacent-2-gram array over the token array (empty when <2 tokens)."""
    toks = F.col(toks_col)
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def bigram_repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    toks_col: str = "toks",
    carry: Sequence[str] = (),
    cutover_tokens: int = REP_CUTOVER_TOKENS,
) -> DataFrame:
    """Per-document 2-gram repetition statistics, cutover-routed.

    Input: one row per document with ``id_col``, a tokenized
    ``toks_col`` (``array<string>``), and optional ``carry`` columns
    passed through untouched. Output columns: ``id_col``, ``*carry``,
    ``n_tok``, ``n_bi`` (2-gram slots), ``max_gram_count`` (count of
    the most frequent 2-gram, 0 when no grams), ``dup_gram_slots``
    (number of 2-gram positions whose gram occurs ≥2 times) — all
    LongType so both branches union cleanly.
    """
    carry = list(carry)
    n_tok = F.size(F.col(toks_col))
    grams = _grams_expr(toks_col)

    # -- array branch: scan-local, O(L²), short documents only --------
    short = df.where(n_tok <= cutover_tokens)
    g = short.select(
        id_col, *carry, n_tok.alias("n_tok"), grams.alias("grams")
    )
    cpos = F.transform(
        F.col("grams"),
        lambda x: F.size(F.filter(F.col("grams"), lambda y: y == x)),
    )
    short_stats = g.select(
        id_col,
        *carry,
        F.col("n_tok").cast("long").alias("n_tok"),
        F.size("grams").cast("long").alias("n_bi"),
        F.coalesce(F.array_max(cpos), F.lit(0))
        .cast("long")
        .alias("max_gram_count"),
        F.size(F.filter(cpos, lambda c: c >= 2))
        .cast("long")
        .alias("dup_gram_slots"),
    )

    # -- explode branch: linear census, long documents only ------------
    long_docs = df.where(n_tok > cutover_tokens)
    meta = long_docs.select(
        id_col, *carry, n_tok.cast("long").alias("n_tok")
    )
    census = (
        long_docs.select(id_col, F.explode(grams).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = census.groupBy(id_col).agg(
        F.sum("c").alias("n_bi"),
        F.max("c").alias("max_gram_count"),
        F.coalesce(
            F.sum(F.when(F.col("c") >= 2, F.col("c"))), F.lit(0)
        ).alias("dup_gram_slots"),
    )
    long_stats = meta.join(per_doc, id_col, "left").select(
        id_col,
        *carry,
        "n_tok",
        F.coalesce(F.col("n_bi"), F.lit(0)).cast("long").alias("n_bi"),
        F.coalesce(F.col("max_gram_count"), F.lit(0))
        .cast("long")
        .alias("max_gram_count"),
        F.coalesce(F.col("dup_gram_slots"), F.lit(0))
        .cast("long")
        .alias("dup_gram_slots"),
    )
    return short_stats.unionByName(long_stats)
