"""Scale stress: replicate the sf0.1 fixtures 10x (deterministic id/ts
shifts) into .scale/sf1 and run the headline queries there.

This answers the 'would this plan survive a 10x scale-up' question with
measurements instead of guesses. Writes stay inside the repo (.scale/ is
gitignored). Usage:

    python scripts/scale_stress.py [--copies 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from emails_to_vector_db_spark.plans import REGISTRY  # noqa: E402
from emails_to_vector_db_spark.session import (  # noqa: E402
    get_spark,
    use_tmpfs_scratch,
)

# measurement entrypoint: tmpfs shuffle scratch (r11 stall fix),
# $SPARK_GRAFT_LOCAL_DIR wins when set
use_tmpfs_scratch()
from emails_to_vector_db_spark.sources.tables import (  # noqa: E402
    TABLE_NAMES,
    load_table,
)

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1")

# id columns to shift per copy so keys stay unique and joins stay valid
KEY_SHIFTS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "part": ["p_partkey"],
    "supplier": [],  # dims stay identical (they're dims)
    "nation": [],
    "region": [],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build(spark, copies: int, jitter_embeddings: bool = True) -> None:
    for name in TABLE_NAMES:
        src = load_table(spark, SRC, name)
        if not KEY_SHIFTS[name]:
            out = src
        else:
            maxes = {
                c: src.agg(F.max(c)).collect()[0][0] + 1
                for c in KEY_SHIFTS[name]
            }
            parts = []
            for i in range(copies):
                df = src
                for c, m in maxes.items():
                    df = df.withColumn(c, F.col(c) + F.lit(i * m))
                if name == "events":
                    df = df.withColumn(
                        "ts", F.col("ts") + F.expr(f"INTERVAL {i * 31} DAYS")
                    )
                if name == "embeddings" and jitter_embeddings and i > 0:
                    # Deterministic per-copy jitter (fixture v2): exact
                    # replication collapses the embedding space onto the
                    # 2,000 source directions, so a self-tuned quantizer
                    # measures the DUPLICATION factor, not corpus growth
                    # (the r9 sf30 superlinearity confound). A real
                    # corpus adds new directions as it grows; jittered
                    # copies model that while staying reproducible
                    # (sin-hash of (vec_id, dim, copy) — no RNG state).
                    df = df.withColumn(
                        "embedding",
                        F.expr(
                            "transform(embedding, (x, j) -> cast(x + 0.1 "
                            f"* sin(vec_id * 12.9898 + j * 78.233 + {i} "
                            "* 37.719) as float))"
                        ),
                    )
                parts.append(df)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
        print(f"built {name}: {spark.read.parquet(f'{DST}/{name}.parquet').count()} rows")


def main() -> None:
    global DST
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument(
        "--dst",
        default=DST,
        help="fixture output dir (e.g. .scale/sf10 with --copies 100)",
    )
    ap.add_argument(
        "--no-jitter",
        action="store_true",
        help="replicate embeddings exactly (fixture v1 behavior) instead "
        "of the default deterministic per-copy jitter",
    )
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated registry names to run instead of the "
        "bench+extras sweep (e.g. the 16 recorded r01 queries)",
    )
    args = ap.parse_args()
    DST = args.dst

    spark = get_spark(app_name="scale-stress", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if not args.skip_build:
        t0 = time.perf_counter()
        build(spark, args.copies, jitter_embeddings=not args.no_jitter)
        print(f"build: {time.perf_counter() - t0:.1f}s")

    if args.queries:
        bench = {n: REGISTRY[n] for n in args.queries.split(",")}
        for name, spec in bench.items():
            t0 = time.perf_counter()
            try:
                spec.fn(spark, DST).write.format("noop").mode(
                    "overwrite"
                ).save()
                print(f"{name}: {time.perf_counter() - t0:.2f}s")
            except Exception as e:  # noqa: BLE001 — report and continue
                print(f"{name}: ERROR {str(e)[:200]}")
        spark.stop()
        return

    bench = {n: s for n, s in REGISTRY.items() if s.bench}
    # plus the heavy non-bench operators worth stressing
    for extra in (
        "ngram_jaccard_near_dups",
        "embedding_near_dups",
        "user_sessionization",
        "top3_orders_per_customer",
        "heavy_hitter_terms",
        "sequence_packing",
        "pii_redaction",
        "stratified_sample",
        "per_group_reservoir",
        "int8_quantized_knn",
        "hybrid_rrf_topk",
        "merge_upsert_customers",
        "leakage_safe_split",
        "mmr_rerank",
        "ann_lsh_topk",
        "unigram_perplexity_scores",
        "streaming_dedup_ingest",
        # round-3 session additions (ML / graph / eval / analytics lanes)
        "score_auc_eval",
        "cosupply_triangle_count",
        "orders_column_profile",
        "matryoshka_recall_audit",
        "boolean_and_retrieval",
        "time_weighted_avg_value",
        "orders_equi_depth_histogram",
        "ndcg_retrieval_eval",
        "bigram_perplexity_scores",
        "label_propagation_communities",
        "event_type_value_chi2",
        "join_key_skew_report",
        "transaction_graph_pagerank",
        "window_function_zoo",
        "video_shot_boundaries",
        "curation_pipeline_e2e",
        "mips_topk_augmented",
        "order_value_ks_test",
        "image_codec_stats",
        "label_centroid_norm_arrow",
        "table_diff_audit",
        "logreg_calibration_curve",
        "streaming_ivf_index_ingest",
        "scd2_user_value_history",
        "event_sequence_transitions",
        "order_revenue_proration",
        "orders_equi_depth_approx",
        "textrank_keywords",
        "softmax_lang_classifier",
        "winsorized_order_stats",
        "k_anonymity_audit",
        "percolator_stored_queries",
        "audio_resample_stats",
        "forecast_walkforward_backtest",
        "dbscan_embedding_clusters",
        # round-4 session additions
        "rfm_customer_segments_approx",
        "knn_join_probe_cutover",
        "hard_negative_mining",
        "alpha_mixing_weights",
        "ngram_novelty_scores",
        "psi_value_drift",
        "bytes_per_token_by_source",
        "containment_near_supersets",
        "ivfadc_ann_topk",
        "adaboost_stumps",
        "winnowing_fingerprint_pairs",
    ):
        bench[extra] = REGISTRY[extra]
    for name, spec in sorted(bench.items()):
        t0 = time.perf_counter()
        try:
            spec.fn(spark, DST).write.format("noop").mode("overwrite").save()
            print(f"{name}: {time.perf_counter() - t0:.2f}s")
        except Exception as e:
            print(f"{name}: ERROR {str(e)[:200]}")
    spark.stop()


if __name__ == "__main__":
    main()
