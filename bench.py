"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "bench_total_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Each query executes fully through the noop sink (no driver collect, no
result materialization cost — pure plan execution), matching how a
production job would run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from emails_to_vector_db_spark.plans import REGISTRY  # noqa: E402
from emails_to_vector_db_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Recorded baseline: BENCH_r01.json / BASELINE.md "Recorded baseline" —
# 16 headline queries at sf0.1 on local[32]. Newly-benched queries are
# excluded from the ratio (no recorded number to compare against).
RECORDED_SF01_TOTAL = 23.207
RECORDED_SF01 = {
    "asof_last_click_before_purchase": 2.129,
    "doc_token_stats": 0.675,
    "embedding_near_dups_lsh": 2.693,
    "exact_dedup_groups": 1.895,
    "hash_embed_knn": 0.997,
    "hourly_event_counts": 0.375,
    "knn_join_multi_probe": 0.774,
    "knn_topk_l2": 0.46,
    "minhash_lsh_near_dups": 1.898,
    "q10_returned_item_customers": 0.893,
    "q1_pricing_summary": 0.497,
    "q3_shipping_priority": 1.153,
    "q5_local_supplier_volume": 0.951,
    "simhash_near_dups": 4.126,
    "sliding_window_counts": 2.449,
    "tfidf_idf_top30": 1.242,
}


def main() -> None:
    spark = get_spark(app_name="e2v-bench", cpus=CPUS)
    # Warm the JVM/codegen path once on the smallest table so the first
    # measured query doesn't pay session startup.
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    bench_specs = {n: s for n, s in REGISTRY.items() if s.bench}
    timings: dict[str, float] = {}
    for name, spec in sorted(bench_specs.items()):
        # Best of three runs: the host shows heavy run-to-run noise (the
        # same plan has measured 1.3s and 8.7s minutes apart), and later
        # runs measure steady-state (codegen/JIT-warm) plan cost — the
        # number that actually compares plan quality across rounds. Two
        # runs proved not enough: one noise window covers both.
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            spec.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            # Cache hygiene BETWEEN runs and queries: several plans persist
            # a shared intermediate (retrieval/dedup); leaving those cached
            # pollutes later queries' executor memory and re-persisting the
            # same data each run spams the CacheManager — each timed run
            # must pay (and only pay) its own plan's cost.
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    payload = {
        "metric": "bench_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if payload["sf"] == 0.1:
        # regression vs the recorded round-1 baseline, over the queries
        # that have a recorded number (< 1.0 = faster than baseline)
        common = [n for n in timings if n in RECORDED_SF01]
        rec = sum(RECORDED_SF01[n] for n in common)
        now = sum(timings[n] for n in common)
        if rec > 0:
            payload["baseline_ratio"] = round(now / rec, 3)
            print(
                f"# vs recorded sf0.1 baseline ({len(common)} queries): "
                f"{payload['baseline_ratio']}x (recorded {rec:.1f}s, "
                f"now {now:.1f}s)",
                file=sys.stderr,
            )
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
