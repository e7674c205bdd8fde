"""Shuffle-budget regression guard: every headline (bench) query's
physical plan must stay within its pinned number of shuffle exchanges.

A silent extra Exchange is the way a 100 TB plan quietly rots — an
accidental repartition, a broadcast that fell back to shuffle, a lost
partitioning reuse. The budgets below are the CURRENT measured plan
shapes at sf0.01 (AQE on, local mode); a regression fails loudly and
the budget may only be raised with a reviewed reason. Broadcast
exchanges are intentionally NOT budgeted (their cost model is
size-driven and environment-dependent); shuffles are the scale killer.
"""

from __future__ import annotations

import re

import pytest

from emails_to_vector_db_spark.plans import REGISTRY
from tests.conftest import SF_ORACLE

# name -> max shuffle exchanges (hash/range/single-partition)
SHUFFLE_BUDGET = {
    "adaboost_stumps": 6,  # 3 rounds x (40-cell err agg + 1-row argmin)
    "alpha_mixing_weights": 4,  # per-source agg + 3 tiny-table re-aggs
    "asof_last_click_before_purchase": 1,
    "bytes_per_token_by_source": 1,
    "containment_near_supersets": 13,  # the prefix-filter family shape
    "hard_negative_mining": 1,  # probe broadcast + per-probe window
    "ivfadc_ann_topk": 0,  # scan-time cid + codes, broadcast LUT, TakeOrdered
    "knn_join_probe_cutover": 1,  # IVF route: one per-probe window exchange
    "ngram_novelty_scores": 2,  # shingle census + per-doc agg
    "psi_value_drift": 3,  # 20-cell contingency agg + 2 tiny re-aggs
    "rfm_customer_segments_approx": 4,  # cust agg + sketch + coding cells
    "winnowing_fingerprint_pairs": 1,  # fp pair-join + pair agg
    "changepoint_detection": 5,  # daily agg + 1-row stats + two-pass prefix
    "duplicate_ngram_coverage": 4,  # gram census + scoring join + 2 re-aggs
    "tfidf_cosine_topk_pairs": 7,  # tf agg + df/norm re-aggs + pair join
    "spatial_radius_join": 1,  # the 9-cell stencil equi-join; verify map-side
    # two-phase adaptive grid: fine window + sat-id anti-join + coarse
    # window (1 -> 4 when the escalation path was added; bought sf10
    # 134.8s -> 18.3s)
    "spatial_radius_topk": 4,
    # kcore's peel executes EAGERLY inside fn() (per-round 1-row collects
    # drive the broadcast/shuffle probe cutover); the returned frame is a
    # local 9-row stat table, so its lazily-countable shuffles are ~0.
    # bench.py still times fn() itself, so the real cost stays measured.
    "kcore_part_basket": 19,
    # + 9 stat-row aggs: per-round traffic is the |V|-sized degree table,
    # never the edge list (checkpointed vector, cached edges)
    "kmv_distinct_sketch": 3,  # (source,tok) distinct + rank + source agg
    "cohort_retention_matrix": 4,  # one corpus agg + cells/sizes re-aggs
    "curation_pipeline_e2e": 2,  # dedup groupBy + final stats agg only
    "mips_topk_augmented": 1,  # max-norm 1-row agg; search is TakeOrdered
    "softmax_lang_classifier": 4,  # 3 gradient aggs + final per-class agg
    "logreg_quality_classifier": 4,  # 3 GD gradient aggs + final accuracy agg
    "prefix_filter_jaccard_join": 15,  # df agg, vocab rank, prefix window, cand, verify (repeated subtrees counted)
    "benchmark_decontamination": 2,
    "bm25_topk": 5,
    "bpe_segmentation_stats": 3,  # occ agg + vocab distinct + per-doc agg
    "bucketed_colocated_join": 1,  # co-located SMJ: only the agg shuffles
    "doc_quality_scores": 0,  # pure scan projection, no shuffle at all
    "doc_token_stats": 1,
    "lang_id_confusion": 1,  # one (lang, predicted) cell agg
    "skyline_pareto_parts": 7,  # level agg + 2 two-pass helpers + part join
    "embedding_jl_projection_pairs": 0,
    "embedding_near_dups_lsh": 0,
    "embedding_pca_topvar": 1,  # projected-corpus moment agg
    "event_funnel_conversion": 2,
    "exact_dedup_groups": 1,
    "hash_embed_knn": 0,
    "heavy_hitter_terms": 2,  # MG partials agg + exact rescore agg
    "hourly_event_counts": 1,
    "incremental_mv_refresh": 2,  # delta partial agg + merge re-agg
    "knn_join_multi_probe": 1,
    "kneser_ney_bigram_scores": 4,  # bigram agg + 2 margins + doc re-agg
    "knn_topk_l2": 0,
    "label_centroid_norm_pandas": 1,  # one grouped-map exchange on label
    "minhash_lsh_near_dups": 1,
    "near_dup_components": 0,  # union-find path: no distributed closure
    "pq_ann_topk": 0,  # Arrow encode + literal-codebook ADC + TakeOrdered
    "semantic_dedup_prune": 1,  # one cid exchange into the grouped-map lane
    "q10_returned_item_customers": 1,
    "q1_pricing_summary": 1,
    "q21_suppliers_kept_orders_waiting": 3,
    "q3_shipping_priority": 1,
    "q5_local_supplier_volume": 1,
    "q6_forecast_revenue": 1,
    "q7_volume_shipping": 1,
    "q9_product_type_profit": 1,
    "simhash_near_dups": 1,
    "corpus_snapshot_diff": 5,  # derived-offset 1-row agg + full-outer join + source agg
    "incremental_lsh_dedup": 13,  # derived-offset agg + 2 sig groupBys, 2 band probes, stats joins
    "span_exact_dedup": 2,  # fp census window + per-doc agg
    "substring_window_dedup": 3,  # fp census + run-label/agg + meta join
    "sliding_window_counts": 1,
    "tfidf_idf_top30": 2,
    "unigram_perplexity_scores": 3,  # LM train agg + vocab total + doc agg
    # raised 0 -> 2 for the long-doc cutover (r6 verdict task): the
    # explode-census branch adds its gram groupBy + per-doc join; the
    # short-doc branch stays scan-local, and at fixture scale the long
    # branch is empty (the exchanges move zero rows)
    "gopher_repetition_filters": 2,
    "naive_bayes_lang_classifier": 10,  # train aggs + scoring agg + argmax window + confusion (vocab/doc-sized)
    "rm3_query_expansion": 14,  # 3 pruned passes + tiny model/weight re-aggs (pre-AQE count; runtime converts several to broadcast)
    "binary_quantized_knn": 2,  # stats row agg + shortlist-rerank join (pre-AQE; broadcast at runtime)
    "source_token_kl": 6,  # token census + per-source cells + grid re-aggs
    # round-7 promotions (the r6 flagships, verdict task 6)
    "cdc_chunk_stability": 9,  # 2 scheme explodes x (doc-grain window + fp agg) + stability joins
    "dedup_quality_survivors": 1,  # star-edge CC is driver-side below cutover; survivor rank rides one exchange
    "split_contamination_matrix": 2,  # distinct (split, gram) census + matrix agg
    "filter_ablation_matrix": 3,  # repetition-cutover branch (empty at fixture scale) + final agg
    "small_file_compaction_plan": 4,  # file-grain agg + distributed prefix pack passes
    "adamic_adar_link_prediction": 11,  # edge extraction + edge-list-local joins/aggs (edge-list-sized, pre-AQE count)
    # round-8 promotions (the r7 flagships, verdict task 5) + the
    # group-grain condensed near-dup twins
    "minhash_near_dup_groups": 2,  # gid groupBy + rep band self-join; sizes ride broadcast
    "embedding_near_dup_groups": 1,  # (label, vector) groupBy; probe join bucket-local
    "split_leakage_audit": 4,  # 2 policy-grain (split,split) censuses + 2 tiny re-aggs
    "epoch_shuffle_decorrelation": 4,  # 100-cell census + 3 tiny re-aggs; zero corpus sort
    "ivf_rebalance_plan": 4,  # k-row count agg + total/action re-aggs (k-sized, pre-AQE)
    # diff join + delta-slice text join + the incremental-LSH routing
    # chain (~13, see incremental_lsh_dedup) + action joins/aggs; the
    # corpus-scale diff and the delta are persisted so no branch
    # re-executes them
    "incremental_curation_e2e": 24,  # r12: persisted 1-row offset frame collapses the derived-offset re-aggs
    # r8 valuation flagships: ONE corpus-grain census each; the rest are
    # vocabulary-grain re-aggregates (plus the bounded x-langs x-cand
    # test-side expansion for loo). The uncached-plan print re-prints
    # the persisted census subtree under every consumer (the
    # prefix_filter convention: repeated subtrees counted) — the
    # EXECUTED plan reads the cache: 10 exchanges for loo.
    "loo_source_valuation": 57,  # r11 single-census collapse (was 59)
    "excess_loss_mixture": 20,
    # (doc,tok) agg + doc agg + fp groupBy, + the 1-row derived-offset
    # max(doc_id) aggregate (SinglePartition — the planted-twin id base)
    "template_dups_cross_lang": 5,
    # r9 postings-index store twins: the corpus census is PERSISTED
    # (paid once at index build), so the query plans carry only
    # hit-grain aggregates
    "bm25_topk_from_index": 1,  # bucket-pruned scan + doc groupBy
    # r11 late-interaction: vocab distinct rides the term-bucketed scan
    # (no exchange), sims broadcast; 1 doc-grain agg + headroom for a
    # vanilla-session distinct fallback
    "colbert_maxsim_from_index": 2,
    # r11 df-aware proximity: broadcast rare list + ≤n_lang final agg
    "proximity_rare_from_index": 1,
    # r11 sparse expansion: broadcast expansion probe + doc-grain agg;
    # vocab distinct rides the term-bucketed scan
    "splade_expansion_from_index": 1,
    # r11 pruned late-interaction: IN-list bucket-pruned scan +
    # broadcast kept set + doc-grain agg (kept-window runs eagerly)
    "plaid_pruned_maxsim_topk": 1,
    # r11 tri-arm fusion: 3 doc-grain arm aggs + 2 rank/fusion
    # exchanges over <=10-row frames; r12: ONE shared lexicon sweep
    # (persisted) feeds both sparse arms — same budget, one fewer
    # store term scan + Arrow pass
    "trihybrid_rrf_from_index": 5,
    # r11 warm streamed lanes (store read, not ingest): proximity is
    # candidate-inner-join + lang agg; phrase pays its per-language
    # denominator contract (doc-grain meta left join) = 3
    "streaming_phrase_from_positions": 3,
    "streaming_proximity_from_positions": 1,
    "rm3_query_expansion_from_index": 1,  # r12: pass-3 doc agg only (feedback frame, score-sum and weight model are collected literals)
    # q/base joins + AP windows + bootstrap re-aggs; the census
    # tokenize/tf/impact-window shuffles are gone (store-read)
    "paired_bootstrap_from_index": 13,
    # both retrieval arms are index lookups; the fusion joins two
    # <=20-row rankings (the 1 exchange is the kw-arm doc groupBy)
    "hybrid_rrf_from_index": 1,
    # pushed df-ceiling scan + doc-norm window + pair-key aggregate
    "tfidf_cosine_from_index": 2,
    # list-grain candidate join + the two margin window exchanges
    "bitext_margin_mining_ivf": 4,
    # r9 registrations
    # r12 prefix-bucket form: ONE hash exchange (window re-uses its
    # own g2 partitioning — no __pid re-shuffle, no range sampling, no
    # stitch frames) + the dup-substring aggregate
    "longest_dup_substring": 2,
    # stage 1 is TakeOrdered, stage 2 is broadcast-pruned 50 rows
    "cross_encoder_rerank_topk": 0,
    # teacher (c,tok) census + doc-grain score agg + 3 GD aggs + the
    # per-source report, plus tiny model-table re-aggs
    "distilled_filter_agreement": 13,
    # r9 bench promotions (the r8 recall audits, verdict task 8):
    # bounded audit universe by contract — exact truth pair join +
    # banded detector + bin censuses (repeated persisted subtrees
    # counted, the prefix_filter convention)
    "minhash_recall_precision_audit": 33,
    "embedding_lsh_recall_audit": 9,
    # r10 bench promotions — the index-only / store-reading lanes
    "term_stats_from_index": 0,  # one postings scan + map-side term agg + TakeOrdered
    "retrieve_rerank_eval_chain": 2,  # index-hit doc agg + 1-row eval agg; rerank windows ride <=50 rows
    "postings_vocab_rebuild_plan": 4,  # base lexicon distinct + anti-probe join + two bucket aggs
    "semdedup_from_ivf_lists": 1,  # one cid exchange into the per-list gram lane
    "query_likelihood_from_index": 2,  # 3-row cf agg + candidate doc agg
    "heaps_law_fit_from_index": 6,  # doc-rank window + firsts/ckpt aggs (n_docs-sized, never postings-grain)
    "dsir_weights_from_index": 13,  # 256-cell censuses + metadata joins + doc/source aggs (bucket- or doc-grain)
    "prefix_terms_from_index": 0,  # pushed StartsWith + map-side term agg + TakeOrdered
    "spelling_variants_from_index": 1,  # bucket-pruned IN-list probe + term agg
    "snippet_windows_from_index": 2,  # bm25 doc agg + 3-doc position merge agg
}


def _depth(line: str) -> int:
    i = 0
    while i < len(line) and line[i] in " :+-":
        i += 1
    return i


def _count_shuffles(df) -> int:
    """Shuffle exchanges the plan EXECUTES, from the plan string.

    Two print artifacts must not inflate the count: a materialized
    InMemoryRelation prints both its AQE '== Final Plan ==' and the
    pre-AQE '== Initial Plan ==' (only the final one ran — skip the
    initial section), and the SAME cached relation is re-printed in
    full under every InMemoryTableScan that reads it (its build ran
    once — count the first print only)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    total = 0
    seen_ids: set[str] = set()
    skip_below: int | None = None
    for line in plan.splitlines():
        d = _depth(line)
        name = line[d:]
        if skip_below is not None:
            # initial-plan bodies print at the marker's own depth (no
            # "+- " prefix on the root line), hence >=
            if d >= skip_below:
                continue
            skip_below = None
        if name.startswith("== Initial Plan =="):
            skip_below = d
            continue
        m = re.match(r"Exchange (hash|range|SinglePartition)", name)
        if m:
            pid = re.search(r"\[plan_id=(\d+)\]", name)
            if pid:
                if pid.group(1) in seen_ids:
                    continue
                seen_ids.add(pid.group(1))
            total += 1
    return total


@pytest.mark.parametrize("name", sorted(SHUFFLE_BUDGET))
def test_shuffle_budget(spark, name):
    # Plans are budgeted in their canonical uncached shape: earlier tests
    # in the shared session may have left persisted intermediates (e.g.
    # bm25's tf), and an InMemoryTableScan swaps exchanges in or out of
    # the executed plan.
    spark.catalog.clearCache()
    df = REGISTRY[name].fn(spark, SF_ORACLE)
    got = _count_shuffles(df)
    assert got <= SHUFFLE_BUDGET[name], (
        f"{name}: plan now has {got} shuffle exchanges, budget is "
        f"{SHUFFLE_BUDGET[name]} — an extra shuffle crept in"
    )


def test_budget_covers_all_bench_queries():
    bench = {n for n, s in REGISTRY.items() if s.bench}
    assert bench == set(SHUFFLE_BUDGET), (
        "bench set and shuffle budgets diverged: "
        f"missing={sorted(bench - set(SHUFFLE_BUDGET))} "
        f"stale={sorted(set(SHUFFLE_BUDGET) - bench)}"
    )


# (table, query) -> max parquet scans of that table in the plan.
SCAN_BUDGET = {
    ("lineitem", "q21_suppliers_kept_orders_waiting"): 1,  # aggregate rewrite
    ("documents", "bm25_topk"): 2,  # tf persisted: 2 scans, not 3
    ("documents", "bm25_topk_from_index"): 0,  # index-only: corpus never read
    ("documents", "rm3_query_expansion_from_index"): 0,  # pass 3 is index-only (passes 1-2 ran eagerly)
    ("documents", "hybrid_rrf_from_index"): 0,  # kw arm index-only; vec arm reads embeddings
    # r10: the drift statistic reads ONLY the postings store — the
    # vocabulary analysis never scans the corpus
    ("documents", "postings_vocab_rebuild_plan"): 0,
    # r10: the term-weight audit is index-only too
    ("documents", "term_stats_from_index"): 0,
    # r10: the e2e chain's only corpus read is the 50-candidate payload
    # lookup (broadcast-pruned); retrieval itself is index-only
    ("documents", "retrieve_rerank_eval_chain"): 1,
    # r10: both rankers and both corpus-linguistics fits are index-only
    ("documents", "query_likelihood_from_index"): 0,
    ("documents", "heaps_law_fit_from_index"): 0,
    # r10: DSIR's token counts are index-reads; the two documents scans
    # left are the doc-grain (doc_id, lang) and (doc_id, source)
    # metadata projections
    ("documents", "dsir_weights_from_index"): 2,
    # r10: lexicon probes are pure dictionary reads
    ("documents", "prefix_terms_from_index"): 0,
    ("documents", "spelling_variants_from_index"): 0,
    # r10: highlighting never tokenizes text — retrieval reads postings,
    # hit positions read the sidecar (pruned by terms AND the 3 doc ids)
    ("documents", "snippet_windows_from_index"): 0,
    ("documents", "benchmark_decontamination"): 2,  # eval + train sides
    ("events", "event_funnel_conversion"): 1,  # window chain, single scan
    ("lineitem", "q17_small_quantity_revenue"): 1,  # filter-first window
    ("lineitem", "q2_min_cost_supplier"): 1,  # partsupp derived once
}


@pytest.mark.parametrize("table,name", sorted(SCAN_BUDGET))
def test_scan_budget(spark, table, name):
    """Multi-scan regressions (a branch re-reading the fact table) are
    as costly as extra shuffles at 100 TB — pin the per-table scan count
    of the plans whose whole point is scan reduction."""
    spark.catalog.clearCache()
    df = REGISTRY[name].fn(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    got = len(re.findall(rf"Location: InMemoryFileIndex \[[^\]]*{table}\.parquet", plan))
    assert got <= SCAN_BUDGET[(table, name)], (
        f"{name}: {got} scans of {table}, budget "
        f"{SCAN_BUDGET[(table, name)]}"
    )


def test_tfidf_pairs_no_doc_grain_broadcast(spark):
    """tfidf_cosine_topk_pairs must never broadcast a doc-grain table:
    norms ride inside the postings rows (doc-partitioned window), so
    no join in the plan is keyed on a doc id with a broadcast build
    side. (AQE legitimately broadcasts the small TERM-keyed sides at
    fixture scale — tok-keyed builds are fine; it would pick shuffle
    joins for those at 100x. A doc_id/doc_a/doc_b-keyed broadcast is
    the norm-table-onto-pairs antipattern that OOMs at scale.)"""
    spark.catalog.clearCache()
    df = REGISTRY["tfidf_cosine_topk_pairs"].fn(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    doc_keyed = [
        line
        for line in plan.splitlines()
        if "BroadcastHashJoin" in line
        and re.search(r"BroadcastHashJoin \[[^\]]*doc", line)
    ]
    assert not doc_keyed, (
        "doc-grain broadcast crept back into the tfidf pair plan:\n"
        + "\n".join(doc_keyed)
    )
