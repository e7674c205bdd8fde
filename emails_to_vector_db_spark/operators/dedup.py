"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference has no dedup at all — it blindly re-inserts rows
(``rag.py:55``; ``email_fetching.py:54`` would crash on duplicate Chroma
ids). These operators are the north star's LLM-training-data dedup surface,
built scale-first:

- **exact**: fingerprint (md5 of normalized text) → groupBy → keep min id.
  One shuffle on the fingerprint; at 100 TB this is the cheapest possible
  dedup (hash-partitioned, map-side combinable).
- **MinHash + LSH banding**: shingle → k min-hashes → band buckets →
  self-join *within buckets only*. The self-join is the textbook LSH
  shuffle: candidates are pairs sharing ≥1 band, so the quadratic blow-up
  is confined to bucket-local groups instead of the full corpus.
- **SimHash**: per-token 60-bit hashes folded into a b-bit signature
  entirely with array higher-order functions (no UDF).
- **n-gram Jaccard**: exact set similarity for candidate pairs (used to
  verify LSH candidates, or standalone within a blocking key).

MinHash here uses *lexicographic min of salted md5 hex strings* as the hash
family — deterministic, portable to ANSI SQL (so the oracle can replicate
it bit-for-bit), and just as uniform as integer min-hashing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from emails_to_vector_db_spark.functions.text import (
    fingerprint,
    md5_long,
    shingles,
    tokens,
)


def spread(df: DataFrame) -> DataFrame:
    """Repartition to the session's default parallelism.

    Compute-heavy per-row stages (shingling, hashing, signatures) are CPU-
    bound, not IO-bound: a small parquet input arrives as 1-2 splits, which
    would serialize the expensive stage onto 1-2 cores. The repartition
    shuffles only the raw rows (cheap) and buys full-width execution. At
    100 TB inputs already arrive in thousands of splits and this is a no-op
    cost-wise (AQE coalesces)."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row (minimum id) per normalized-text fingerprint."""
    fp = df.withColumn("_fp", fingerprint(text_col))
    keep = fp.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    return fp.join(keep, [id_col, "_fp"], "inner").drop("_fp")


def salted_md5s(sh_col: Column, salt_idx: int) -> Column:
    """One md5 per shingle (salted for salt_idx > 0); each md5 hex string
    yields FOUR independent 32-bit hash values via 8-char slices, so a
    k-hash MinHash signature costs only ceil(k/4) md5 passes."""
    if salt_idx == 0:
        return F.transform(sh_col, lambda s: F.md5(s))
    return F.transform(
        sh_col, lambda s: F.md5(F.concat(F.lit(f"{salt_idx}|"), s))
    )


def minhash_components(md5_col: Column) -> list[Column]:
    """The four min-hash components carried by one md5 array: min over the
    shingle set of each 8-hex-char slice (lexicographic min of a uniform
    hex string ≡ integer min-hash)."""
    def comp(i: int) -> Column:
        return F.array_min(
            F.transform(md5_col, lambda h: F.substring(h, 1 + 8 * i, 8))
        )

    return [comp(i) for i in range(4)]


def lsh_band_hashes(sig_col: Column, n_bands: int, rows_per_band: int) -> Column:
    """Hash each band (contiguous slice of the signature) to one bucket key.

    NULL signature components (docs with no shingles) propagate to a NULL
    band hash — never joined, matching SQL `||` semantics — hence
    array_join with no null replacement would differ; use aggregate-concat
    that nulls out."""

    def band(b: int) -> Column:
        parts = []
        for r in range(rows_per_band):
            if parts:
                parts.append(F.lit("|"))
            parts.append(F.element_at(sig_col, b * rows_per_band + r + 1))
        return F.md5(F.concat(*parts))

    return F.array(*[band(b) for b in range(n_bands)])


def _minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int,
    n_bands: int,
    shingle_n: int,
) -> DataFrame:
    """(id, sig, bands) MinHash signature frame shared by the pair and
    component-edge forms."""
    if n_hashes % 4:
        raise ValueError("n_hashes must be a multiple of 4 (4 per md5 pass)")
    if n_bands < 1 or n_hashes % n_bands:
        # silently-truncated bands would drop trailing signature components
        # (reduced recall); n_bands > n_hashes would build empty bands.
        raise ValueError(
            f"n_bands ({n_bands}) must be >= 1 and divide n_hashes ({n_hashes})"
        )
    rows_per_band = n_hashes // n_bands
    # Staged projections: each stage's arrays are referenced several times
    # downstream, so CollapseProject keeps them materialized once per row —
    # one shingle pass, ceil(n/4) md5 passes, instead of n of each.
    sh_df = spread(df).select(
        F.col(id_col),
        F.array_distinct(shingles(tokens(text_col), shingle_n)).alias("sh"),
    )
    n_md5 = n_hashes // 4
    md5_df = sh_df.select(
        id_col,
        *[salted_md5s(F.col("sh"), m).alias(f"m{m}") for m in range(n_md5)],
    )
    comps = []
    for m in range(n_md5):
        comps.extend(minhash_components(F.col(f"m{m}")))
    sig = md5_df.select(id_col, F.array(*comps).alias("sig"))
    return sig.withColumn(
        "bands", lsh_band_hashes(F.col("sig"), n_bands, rows_per_band)
    )


def _banded_verified_pairs(
    sig: DataFrame, id_col: str, n_hashes: int, threshold: float
) -> DataFrame:
    """Banded LSH self-join + signature-agreement verification over a
    PERSISTED (id, sig, bands) frame: (id_a, id_b, est_jaccard) with
    id_a < id_b and est ≥ threshold."""
    # Explode to (band_idx, band_hash) and self-join within buckets only.
    # posexplode_OUTER on purpose: the non-outer form makes Catalyst infer a
    # `size(bands) > 0` filter and push the whole signature expression tree
    # down as a per-row filter (recomputing it once more per row); the outer
    # form infers nothing, and NULL band rows drop out of the equi-join.
    banded = sig.select(
        id_col, "sig", F.posexplode_outer("bands").alias("band_idx", "band_hash")
    )
    left = banded.select(
        F.col(id_col).alias("id_a"),
        F.col("sig").alias("sig_a"),
        "band_idx",
        "band_hash",
    )
    right = banded.select(
        F.col(id_col).alias("id_b"),
        F.col("sig").alias("sig_b"),
        "band_idx",
        "band_hash",
    )
    cand = (
        left.join(right, ["band_idx", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    est = signature_est("sig_a", "sig_b", n_hashes)
    return (
        cand.withColumn("est_jaccard", est)
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )



def signature_gid(sig_col: str = "sig"):
    """Null-guarded signature-group fingerprint: md5 over the joined
    components, NULL when any component is NULL (docs with no shingles
    never pair in the doc-grain form — null band hashes never join —
    so they must not collapse into a shared md5('') group). All
    group-grain consumers (component edges, cross-source counting, the
    incremental probe) share this one definition."""
    return F.when(
        ~F.exists(sig_col, lambda x: x.isNull()),
        F.md5(F.concat_ws("|", sig_col)),
    )


def signature_est(sig_a, sig_b, n_hashes: int):
    """Estimated Jaccard between two signatures: fraction of agreeing
    components — the SAME expression _banded_verified_pairs scores
    with, parameterized on n_hashes (a hardcoded divisor silently
    breaks every consumer the day the signature width changes)."""
    return F.aggregate(
        F.zip_with(
            sig_a, sig_b, lambda x, y: F.when(x == y, 1.0).otherwise(0.0)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ) / F.lit(float(n_hashes))


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    n_bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash LSH banding, scored by
    the estimated Jaccard (fraction of matching signature components).

    Returns (id_a, id_b, est_jaccard) with id_a < id_b, est ≥ threshold.
    Within-bucket emission is quadratic in bucket size BY CONTRACT (the
    pairs are the output); consumers that only need duplicate CLUSTERS
    must use minhash_lsh_component_edges instead, which collapses
    signature-identical groups before pairing.
    """
    sig = _minhash_signatures(
        df, id_col, text_col, n_hashes, n_bands, shingle_n
    )
    # Persist: the LSH self-join consumes this twice and Spark does not
    # reuse the exchange across differently-aliased sides — without this
    # the whole shingle→md5→signature pipeline runs twice. Tiny payload
    # (id + n_hashes short strings per row); spills to disk if not.
    from pyspark import StorageLevel

    sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    return _banded_verified_pairs(sig, id_col, n_hashes, threshold)


def minhash_lsh_component_edges(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    n_bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Edge list (src, dst) whose connected components are IDENTICAL to
    components over ``minhash_lsh_pairs`` with the same parameters —
    with O(n) emission per signature-identical group instead of the
    pair form's O(n²) within-bucket blow-up.

    Soundness: est_jaccard is a pure function of the two signatures,
    and two docs with IDENTICAL signatures (a) share every band bucket,
    so the pair form always makes them candidates, and (b) score
    est = 1.0 ≥ threshold, so the pair form always links them. A
    signature-identical group is therefore always a clique in the
    verified pair graph, and any verified edge from one member holds
    for every member. Collapsing each group to its min-id
    representative (star edges, O(n) per group) and running the banded
    verified pair join among REPRESENTATIVES only yields a graph with
    the same connected components. Duplicate-heavy corpora — exact
    twins, boilerplate mirrors, the replicated sf10 worst case — are
    exactly where within-bucket pair listing went quadratic; they
    collapse to one representative here. Docs with no shingles have
    all-NULL signatures and never pair in either form; they are
    EXCLUDED from grouping rather than spuriously linked through a
    shared null fingerprint. Equivalence and the no-all-pairs guard
    live in tests/test_dedup_star_edges.py.

    ``threshold`` must be ≤ 1.0: star edges link signature-identical
    twins unconditionally (their est is exactly 1.0), so a threshold
    above 1.0 — where the pair form emits NOTHING — would silently
    break the components-identical contract. Persisted intermediates
    (the signature frame, the representative set) live until the
    session's next ``spark.catalog.clearCache()``; callers own cache
    lifecycle because the returned DataFrame is lazy over them.
    """
    from pyspark import StorageLevel

    if threshold > 1.0:
        raise ValueError(
            f"threshold ({threshold}) must be <= 1.0: signature-identical "
            "groups link at est exactly 1.0, so the star-edge form is only "
            "components-equivalent to the pair form on that range"
        )
    sig = _minhash_signatures(
        df, id_col, text_col, n_hashes, n_bands, shingle_n
    )
    sig = sig.withColumn("sig_fp", signature_gid("sig"))
    # Persist BEFORE the null filter: PushDownPredicates substitutes a
    # filter condition through projections with NO cost check (unlike
    # CollapseProject), so `where(sig_fp IS NOT NULL)` placed below the
    # cache would inline the entire md5-signature tree into a scan-level
    # filter and recompute it per row (measured 6x the signature cost at
    # sf10). Filtering the cached relation costs one null check per row.
    sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    valid = sig.where(F.col("sig_fp").isNotNull())
    groups = valid.groupBy("sig_fp").agg(F.min(id_col).alias("rep"))
    star = (
        valid.select(id_col, "sig_fp")
        .join(groups, "sig_fp")
        .where(F.col(id_col) != F.col("rep"))
        .select(F.col("rep").alias("src"), F.col(id_col).alias("dst"))
    )
    reps = valid.join(
        groups.select(F.col("rep").alias(id_col)), id_col, "left_semi"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    rep_pairs = _banded_verified_pairs(reps, id_col, n_hashes, threshold)
    return star.unionByName(
        rep_pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        )
    )


def guard_block_sizes(
    df: DataFrame, block_col: str, max_block_rows: int | None
) -> None:
    """Loud-failure guard for bounded-quadratic operators: if any block
    exceeds ``max_block_rows``, raise with the offenders instead of
    silently launching an O(block²) job (a skewed blocking key at 100 TB
    turns 'bounded' quadratic into corpus-quadratic — the guard costs one
    cheap count-per-key aggregate, trivial next to the join it guards).
    ``None`` disables the check."""
    if max_block_rows is None:
        return
    big = (
        df.groupBy(block_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > max_block_rows)
        .orderBy(F.col("n").desc())
        .limit(5)
        .collect()
    )
    if big:
        detail = ", ".join(f"{r[block_col]}={r['n']}" for r in big)
        raise ValueError(
            f"block(s) over max_block_rows={max_block_rows} for quadratic "
            f"pairing on {block_col!r}: {detail}. Use an LSH candidate "
            "stage (minhash/simhash banding) or a finer blocking key."
        )


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "source",
    shingle_n: int = 3,
    threshold: float = 0.3,
    max_block_rows: int | None = 10_000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing a blocking key.

    Blocking bounds the quadratic pair space to within-block groups —
    at scale the block should be an LSH bucket (minhash_lsh_pairs) or a
    cheap partition key like here. ``max_block_rows`` fails loudly if a
    block would explode quadratically (guard_block_sizes).
    """
    guard_block_sizes(df, block_col, max_block_rows)
    # NOT persisted, deliberately: the shingle arrays are large (~KBs/row);
    # A/B at 50k docs showed caching them costs more (serialize + double
    # shuffle read) than recomputing the narrow shingle pipeline per side.
    # Contrast minhash_lsh_pairs, whose signature rows are tiny and DO win
    # from persist. Exact block-quadratic Jaccard is the verification tool;
    # at corpus scale use minhash/simhash banding for candidates first.
    sh = spread(df).select(
        F.col(block_col).alias("_blk"),
        F.col(id_col),
        F.array_distinct(shingles(tokens(text_col), shingle_n)).alias("sh"),
    )
    a = sh.select(
        F.col("_blk"), F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")
    )
    b = sh.select(
        F.col("_blk"), F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")
    )
    pairs = a.join(b, "_blk").where(F.col("id_a") < F.col("id_b"))
    # Size-ratio prefilter: jaccard <= min(|A|,|B|)/max(|A|,|B|), so pairs
    # with mismatched set sizes can't reach the threshold — prune them
    # BEFORE the expensive intersection. Output is provably unchanged.
    sa, sb = F.size("sh_a"), F.size("sh_b")
    pairs = pairs.where(
        F.least(sa, sb) >= F.greatest(sa, sb) * F.lit(threshold)
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter / F.greatest(union, F.lit(1))
    return (
        pairs.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(tok: Column, bits: int = 32) -> Column:
    """SimHash signature of a token array as a non-negative bigint.

    bit j of the signature = 1 iff sum over tokens of ±1 (by bit j of the
    token's 60-bit md5 hash) is positive.

    Single-pass shape: ONE fold over the token hashes with an array-of-
    bit-sums accumulator (each step zip_adds the token's ±1 bit vector),
    then one zip_with over bit positions to weight positive sums by 2^j.
    The naive form — ``bits`` separate aggregate folds — re-walks (and
    with expression re-use, re-hashes) the token array per bit position:
    32× the passes for identical output. Values are bit-identical either
    way, so the engine-mirrored SQL oracle is unchanged."""
    hashes = F.transform(tok, lambda t: md5_long(t))

    def plus_minus(h: Column) -> Column:
        return F.array(
            *[
                F.when(
                    F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
                for j in range(bits)
            ]
        )

    bit_sums = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(acc, plus_minus(h), lambda a, b: a + b),
    )
    weights = F.array(*[F.lit(2**j).cast("long") for j in range(bits)])
    return F.aggregate(
        F.zip_with(
            bit_sums,
            weights,
            lambda s, p: F.when(s > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
