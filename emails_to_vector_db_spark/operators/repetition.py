"""Bigram repetition statistics with a long-document cutover.

The Gopher-style repetition filters (Rae et al. 2021 §A1.1) need, per
document: the occurrence count of the most frequent 2-gram and the
number of 2-gram positions whose gram repeats within the document.
Two plans compute the identical statistics:

- **array form** (documents with ≤ ``REP_CUTOVER_TOKENS`` tokens):
  a scan-local ``F.aggregate`` fold over ``array_sort(grams)`` (run
  lengths = per-gram counts) — zero shuffles, embarrassingly
  parallel, O(L log L) in tokens-per-document. Ideal for web-scale
  corpora of normal-length documents.
- **explode form** (longer documents): explode the 2-grams and take a
  ``groupBy(id, gram)`` census, then a per-document roll-up — also
  linear, but the shuffle DISTRIBUTES one enormous document's grams
  across partitions and never materializes the multi-GB gram array in
  a single row, which is what the scan-local form cannot avoid. The
  shuffle width is bounded by the long-document subset only.

The union of the two branches is the operator; routing is a
``size(toks)`` predicate, optionally strengthened with a PUSHABLE
character-length guard (see ``chars_col``) so the long branch's
second corpus scan prunes to nothing via parquet row-group stats on
short-document corpora. Cross-path equivalence is pinned by
tests/test_repetition_cutover.py.
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
    chars_col: str | None = None,
) -> DataFrame:
    """Per-document 2-gram repetition statistics, cutover-routed.

    Input: one row per document with ``id_col``, a tokenized
    ``toks_col`` (``array<string>``), and optional ``carry`` columns
    passed through untouched. Output columns: ``id_col``, ``*carry``,
    ``n_tok``, ``n_bi`` (2-gram slots), ``max_gram_count`` (count of
    the most frequent 2-gram, 0 when no grams), ``dup_gram_slots``
    (number of 2-gram positions whose gram occurs ≥2 times) — all
    LongType so both branches union cleanly.

    ``chars_col`` (optional): a raw character-length column. Because
    whitespace-delimited tokens each cost ≥2 chars (token + separator),
    ``n_tok > cutover`` implies ``chars > 2*cutover`` — so conjoining
    the chars predicate onto the long-branch filter never changes the
    routing set, but UNLIKE ``size(split(text))`` it is a plain column
    comparison that pushes to the parquet scan (``PushedFilters``),
    letting row-group min/max stats prune the long branch's second
    corpus scan to nothing on short-document corpora. Null-safe (a
    NULL length falls back to token-count routing) and lie-safe: an
    understated length can only demote a long document to the array
    branch — identical results, never a lost row.
    """
    carry = list(carry)
    n_tok = F.size(F.col(toks_col))
    grams = _grams_expr(toks_col)

    is_long = n_tok > cutover_tokens
    if chars_col is not None:
        chars = F.col(chars_col)
        # keep the guard an Or of pushable leaves (IsNull | GreaterThan)
        is_long = (
            chars.isNull() | (chars > F.lit(2 * cutover_tokens))
        ) & is_long

    # -- array branch: scan-local sort + run-length census, O(L log L),
    # short documents only. Sorting the gram array groups equal grams
    # into runs; run lengths ARE the per-gram occurrence counts, so the
    # most-frequent-gram count is the longest run and the duplicated
    # slots are everything outside length-1 runs — same statistics as
    # the naive nested count-per-position scan at a log factor instead
    # of a quadratic one, still zero shuffles.
    short = df.where(~is_long)
    g = short.select(
        id_col, *carry, n_tok.alias("n_tok"), grams.alias("grams")
    )
    # One fold over the sorted grams. CAUTION: expressing the run scan
    # with index lambdas (element_at(sorted, i) vs element_at(sorted,
    # i-1)) re-inlines the array_sort INSIDE the lambda — Catalyst does
    # not CSE captured expressions into higher-order functions, so the
    # sort re-runs per element and the branch degrades to O(L² log L)
    # (measured: 2.5s → 64s at sf0.1). F.aggregate references the
    # sorted array exactly once and folds it in a single pass.
    n_bi = F.size(F.col("grams"))
    zero = F.lit(0).cast("long")
    # grams are concat_ws-joined token pairs (length ≥ 1), so the ""
    # sentinel can never equal a real gram
    init = F.struct(
        F.lit("").alias("prev"),
        zero.alias("run"),
        zero.alias("mx"),
        zero.alias("dups"),
    )

    def _merge(acc, x):
        new_run = (
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .cast("long")
        )
        # a run contributes its full length to the duplicated-slot count
        # once it reaches 2: +2 at the moment it becomes a run, +1 for
        # each further repeat
        new_dups = acc["dups"] + (
            F.when(new_run == 2, 2).when(new_run > 2, 1).otherwise(0)
        )
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.greatest(acc["mx"], new_run).alias("mx"),
            new_dups.alias("dups"),
        )

    folded = F.aggregate(F.array_sort(F.col("grams")), init, _merge)
    max_gram_count = folded["mx"]
    dup_gram_slots = folded["dups"]
    short_stats = g.select(
        id_col,
        *carry,
        F.col("n_tok").cast("long").alias("n_tok"),
        n_bi.cast("long").alias("n_bi"),
        max_gram_count.cast("long").alias("max_gram_count"),
        dup_gram_slots.cast("long").alias("dup_gram_slots"),
    )

    # -- explode branch: linear census, long documents only ------------
    long_docs = df.where(is_long)
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
