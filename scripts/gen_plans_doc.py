"""Generate docs/PLANS.md: the formatted physical plans of the flagship
queries, as evidence that the shapes claimed in README.md hold.

Usage: python scripts/gen_plans_doc.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emails_to_vector_db_spark.plans import REGISTRY  # noqa: E402
from emails_to_vector_db_spark.session import get_spark  # noqa: E402

SHOWCASE = [
    (
        "knn_topk_l2",
        "Flagship exact KNN: TakeOrderedAndProject (bounded per-partition "
        "heap), broadcast 1-row probe, broadcast docs join.",
    ),
    (
        "q1_pricing_summary",
        "Partial→final HashAggregate; shipdate predicate pushed to parquet.",
    ),
    (
        "q5_local_supplier_volume",
        "Six-table join; dimension sides broadcast.",
    ),
    (
        "part_filter_scan",
        "PushedFilters + pruned ReadSchema at the scan.",
    ),
    (
        "minhash_lsh_near_dups",
        "Staged projections (shingles/md5 arrays computed once), bucket-"
        "local LSH self-join.",
    ),
    (
        "asof_last_click_before_purchase",
        "As-of join as one window pass: single shuffle on user_id.",
    ),
    (
        "q6_forecast_revenue",
        "Pure pushdown: all three predicates in PushedFilters, 4-column "
        "ReadSchema, one partial→final agg, zero joins.",
    ),
    (
        "stratified_sample",
        "Deterministic-hash sampling as one whole-stage-codegen'd "
        "scan+filter — zero shuffle.",
    ),
    (
        "sequence_packing",
        "Per-source prefix-sum packing: exactly one Exchange (the stratum "
        "key); the final agg reuses the window partitioning.",
    ),
    (
        "bm25_topk",
        "Term-pruned explode; df/corpus-stats broadcast; persisted tf "
        "consumed by both branches (two corpus scans, not three).",
    ),
    (
        "int8_quantized_knn",
        "Global quantization scale as a broadcast 1-row agg; integer "
        "distances; TakeOrderedAndProject top-k.",
    ),
    (
        "event_funnel_conversion",
        "Three aggs + two joins all keyed on user_id: the partitioning is "
        "established once and reused; AQE broadcasts the shrinking step "
        "sides.",
    ),
    (
        "benchmark_decontamination",
        "Eval shingle set broadcast (benchmark ≪ corpus): the corpus "
        "shingles in place and never shuffles; only per-doc hit counts "
        "aggregate.",
    ),
    (
        "embedding_jl_projection_pairs",
        "JL projection as a zero-shuffle Arrow-batched matmul at scan "
        "time (ArrowEvalPython stage); the pair join is the verification "
        "harness.",
    ),
    (
        "embedding_pca_topvar",
        "Persisted-component projection: no training in the plan; scalar "
        "centering offsets folded into the final single-row aggregate.",
    ),
    (
        "monthly_order_spine",
        "WITH RECURSIVE spine: recursion over month rows only (UnionLoop); "
        "the fact table contributes one ordinary month-keyed aggregate.",
    ),
    (
        "priority_argmax_orders",
        "max_by/min_by as a plain partial→final hash aggregate — one "
        "champion row per group per partition, no per-group sort.",
    ),
    (
        "span_exact_dedup",
        "C4-style span dedup: span-hash arrays built in one projection, "
        "global census as a window over fp (hashes only cross the "
        "shuffle), per-doc re-agg, TakeOrderedAndProject.",
    ),
    (
        "unigram_perplexity_scores",
        "Two corpus passes (LM train agg + scoring); vocabulary + total "
        "broadcast back onto the token stream — the scoring join "
        "shuffles nothing.",
    ),
    (
        "logreg_quality_classifier",
        "In-engine GD training: 3 chained 1-row gradient aggregates "
        "(map-side combined) over the cached feature projection; "
        "weights broadcast back per step — no driver sync.",
    ),
    (
        "prefix_filter_jaccard_join",
        "Exact AllPairs set join: broadcast vocab dictionary, per-doc "
        "rank-array fold, prefix-token equi-join candidates, one "
        "array_intersect row per candidate — never all-pairs.",
    ),
    (
        "cohort_retention_matrix",
        "One corpus-scale user_id aggregation (min + bounded "
        "collect_set); everything after is cells-scale; divisor joins "
        "broadcast.",
    ),
    (
        "score_auc_eval",
        "Histogram-first AUC: the global-order window runs over "
        "distinct scores, never corpus rows.",
    ),
    (
        "image_resize_stats",
        "mapInPandas decode→bilinear-resize lane: ArrowEvalPython over "
        "independent images, zero shuffle.",
    ),
    (
        "orders_equi_depth_histogram",
        "distributed_ntile: range exchange + per-partition row_number + "
        "broadcast offsets + the ntile closed form — exact ntile "
        "semantics with no single-partition sort.",
    ),
    (
        "tfidf_cosine_topk_pairs",
        "Norms stamped into the postings rows by a doc-partitioned "
        "window BEFORE the self-join: the pair-grain aggregate emits "
        "cosine directly and never joins a doc-grain table.",
    ),
    (
        "fellegi_sunter_linkage",
        "Sorted-neighborhood blocking: distributed name rank, 15-offset "
        "explode, ONE equi self-join on the shifted rank — candidate "
        "space linear in the corpus.",
    ),
    (
        "gopher_repetition_filters",
        "Long-document cutover union: scan-local sorted-gram FOLD branch "
        "(one F.aggregate, zero shuffle) for short docs; explode census "
        "branch whose scan carries the pushed n_chars guard — at this "
        "fixture the long branch prunes to zero row groups.",
    ),
    (
        "substring_window_dedup",
        "Rolling 16-token window dedup: stride-1 fingerprints, two-level "
        "map-side-combinable distinct census, semi-join flag-back, "
        "doc-grain gaps-and-islands run labelling.",
    ),
    (
        "corpus_snapshot_diff",
        "Incremental-crawl diff: ONE full-outer join on doc_id carrying "
        "only (id, source, fp, n_tok); classification scan-local; "
        "source-grain aggregate.",
    ),
    (
        "template_dups_cross_lang",
        "Type-2 template dedup: fused (doc, tok) min-position aggregate "
        "carries the position list (instance stream shuffles once), "
        "fingerprint groupBy — no pair space.",
    ),
    (
        "loo_source_valuation",
        "LOO valuation without retraining: ONE (lang, source, tok) census "
        "feeds every count-subtracted model table; sparse per-source "
        "correction join bounded by the candidate set.",
    ),
    (
        "coreset_sensitivity_sample",
        "Sensitivity coreset: BLAS Arrow costing against k driver-"
        "collected seed literals, scan-local deterministic sample "
        "predicate off a 1-row broadcast total.",
    ),
    (
        "paired_bootstrap_system_eval",
        "System-comparison eval: impact-capped inverted-index candidate "
        "join, map-side dense top-k lane, query-grain paired Poisson "
        "bootstrap unrolled against a broadcast replica range.",
    ),
    (
        "bm25_topk_from_index",
        "Store-reading BM25: the query terms' IN-list bucket-prunes the "
        "persisted postings table (SelectedBucketsCount in the scan), df "
        "and dl ride the posting rows, corpus stats are sidecar "
        "literals — no corpus scan, no tokenize, no census window.",
    ),
    (
        "bitext_margin_mining_ivf",
        "Cross-lingual margin mining through the persisted IVF "
        "quantizer: candidates only within shared lists; above the "
        "~10M-element-op cutover both assignment and scoring run in "
        "Arrow BLAS lanes (one dgemm per inverted list).",
    ),
]


def main() -> None:
    spark = get_spark(app_name="gen-plans", cpus="8")
    sf = "/root/testdata/sf0.01"
    out = ["# PLANS — physical plan evidence (sf0.01, generated)\n"]
    out.append(
        "Regenerate with `python scripts/gen_plans_doc.py`. See README.md "
        "'Scale design' for what to look for in each plan.\n"
    )
    for name, why in SHOWCASE:
        df = REGISTRY[name].fn(spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # keep the operator tree + scan details, drop the long column lists
        lines = plan.splitlines()
        keep: list[str] = []
        for ln in lines:
            s = ln.strip()
            if (
                not keep
                or not s
                or s.startswith(("(", "+-", ":", "*", "=="))
                or any(
                    k in s
                    for k in ("PushedFilters", "ReadSchema", "Location", "Arguments")
                )
            ):
                keep.append(ln[:200])
        out.append(f"## {name}\n\n{why}\n\n```\n" + "\n".join(keep) + "\n```\n")
    with open("docs/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote docs/PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
