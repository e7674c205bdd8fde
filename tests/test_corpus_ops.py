"""Corpus-hygiene operator invariants (plans/corpus.py): span dedup
surfaces the planted duplicates, leakage-safe splitting never lets a
near-dup cluster straddle splits, and perplexity scores are sane.
Value-level correctness is covered by the DuckDB oracles in
tests/test_oracle_parity.py; these pin the semantic claims."""

from __future__ import annotations

from pyspark.sql import functions as F

from emails_to_vector_db_spark.plans import REGISTRY
from emails_to_vector_db_spark.plans.corpus import leakage_safe_assignments
from tests.conftest import SF_ORACLE


def test_span_dedup_surfaces_planted_chains(spark):
    rows = REGISTRY["span_exact_dedup"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 20
    # the planted chain docs (orig + 2 mutated copies) share every span
    # except the mutated tail -> all top rows are heavily span-duplicated
    assert all(r.n_dup_spans > 0 for r in rows)
    assert all(r.n_dup_spans <= r.n_spans for r in rows)
    # at least one of each chain role appears among the top-20
    ids = {r.doc_id for r in rows}
    assert any(i < 50 for i in ids), "an original planted doc should rank"


def test_leakage_safe_split_no_straddle(spark):
    """THE invariant: every near-dup component lands in exactly one
    split. The raw-id hash (dataset_split_assignment) does NOT guarantee
    this — which is the reason this operator exists."""
    assigned = leakage_safe_assignments(spark, SF_ORACLE)
    straddle = (
        assigned.where(F.col("component").isNotNull())
        .groupBy("component")
        .agg(F.countDistinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .count()
    )
    assert straddle == 0
    # and the raw-id hash DOES straddle on this corpus (the planted
    # chains span ids 0..49 and their +offset copies), proving the
    # cluster-representative hash changes behavior
    raw_bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("split:"), F.col("doc_id").cast("string"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    raw_split = (
        F.when(raw_bucket < 80, F.lit("train"))
        .when(raw_bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    raw_straddle = (
        assigned.where(F.col("component").isNotNull())
        .select("component", raw_split.alias("split"))
        .groupBy("component")
        .agg(F.countDistinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .count()
    )
    assert raw_straddle > 0, (
        "fixture should demonstrate raw-id leakage; if this ever goes to "
        "zero the planted corpus no longer exercises the operator"
    )


def test_streaming_dedup_ingest_first_seen_wins(spark):
    """Cross-batch semantics: the planted exact dups arrive in a LATER
    micro-batch than their originals, so every surviving keep_id must be
    an original (< _DUP_OFFSET) and each fingerprint appears exactly
    once in the store."""
    from emails_to_vector_db_spark.plans.dedup import _DUP_OFFSET, _N_PLANT

    rows = REGISTRY["streaming_dedup_ingest"].fn(spark, SF_ORACLE).collect()
    assert all(r.keep_id < _DUP_OFFSET for r in rows)
    fps = [r.fp for r in rows]
    assert len(fps) == len(set(fps))
    # the dup copies (+_DUP_OFFSET ids) were all rejected by the store's
    # anti-join: total kept = distinct original fingerprints
    docs = (
        REGISTRY["exact_dedup_groups"].fn(spark, SF_ORACLE).collect()
    )  # dup groups exist on this corpus
    assert len(docs) == _N_PLANT  # sanity: the corpus really has dups
    assert len(rows) < 500 + _N_PLANT  # dups collapsed


def test_source_mixing_weights_semantics(spark):
    """Mixing invariants: weights in (0, 1]; a source whose token share
    exceeds the uniform target is down-weighted (< 1) and its sampled
    count shrinks accordingly; under-target sources keep everything."""
    rows = REGISTRY["source_mixing_weights"].fn(spark, SF_ORACLE).collect()
    assert rows
    total = sum(r.src_tokens for r in rows)
    target = 1.0 / len(rows)
    for r in rows:
        assert 0.0 < r.mix_weight <= 1.0
        assert 0 <= r.n_sampled <= r.n_docs
        share = r.src_tokens / total
        if share > target * 1.05:
            assert r.mix_weight < 1.0
            # sampled fraction tracks the weight (hash sampler is uniform)
            assert abs(r.n_sampled / r.n_docs - r.mix_weight) < 0.15
        if share < target * 0.95:
            assert r.mix_weight == 1.0 and r.n_sampled == r.n_docs


def test_unigram_perplexity_scores_sane(spark):
    rows = REGISTRY["unigram_perplexity_scores"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 20
    assert all(r.avg_nll > 0 for r in rows)  # -ln(p) of p<1 is positive
    assert all(r.n_tokens > 0 for r in rows)
    # scores are a ranking: descending by construction
    nlls = [r.avg_nll for r in rows]
    assert nlls == sorted(nlls, reverse=True)


def test_scoring_join_cutover_paths_hash_identical(spark, monkeypatch):
    """The over-RAM-vocab cutover (_scoring_join): forcing the shuffle
    path (cutover=0) must give results identical to the broadcast path
    for every LM-scoring query — same plan semantics, different
    physical join."""
    import emails_to_vector_db_spark.plans.corpus as corpus

    def run(name):
        spark.catalog.clearCache()
        rows = REGISTRY[name].fn(spark, SF_ORACLE).collect()
        return sorted(tuple(r) for r in rows)

    names = [
        "unigram_perplexity_scores",
        "bigram_perplexity_scores",
        "source_curation_health",
    ]
    broadcast_side = {n: run(n) for n in names}
    monkeypatch.setattr(corpus, "_MODEL_BROADCAST_MAX_ROWS", 0)
    shuffle_side = {n: run(n) for n in names}
    spark.catalog.clearCache()
    assert broadcast_side == shuffle_side


def test_scoring_join_physical_strategy_follows_cutover(spark, monkeypatch):
    """Under the cutover the scoring join is a broadcast hash join (the
    corpus stream never shuffles for it); above it, no broadcast of the
    model table is attempted."""
    import emails_to_vector_db_spark.plans.corpus as corpus

    def plan(name):
        spark.catalog.clearCache()
        df = REGISTRY[name].fn(spark, SF_ORACLE)
        return df._jdf.queryExecution().executedPlan().toString()

    assert "BroadcastHashJoin" in plan("unigram_perplexity_scores")
    # above the cutover the hint is dropped; with the planner's own
    # auto-broadcast disabled (at real scale its size estimate does
    # this), the scoring join must degrade to a shuffle join, not
    # attempt a forced broadcast
    monkeypatch.setattr(corpus, "_MODEL_BROADCAST_MAX_ROWS", 0)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        forced = plan("unigram_perplexity_scores")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    spark.catalog.clearCache()
    assert "BroadcastHashJoin" not in forced
    assert "SortMergeJoin" in forced or "ShuffledHashJoin" in forced
