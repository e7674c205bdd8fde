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


def main() -> None:
    spark = get_spark(app_name="e2v-bench", cpus=CPUS)
    # Warm the JVM/codegen path once on the smallest table so the first
    # measured query doesn't pay session startup.
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    bench_specs = {n: s for n, s in REGISTRY.items() if s.bench}
    timings: dict[str, float] = {}
    for name, spec in sorted(bench_specs.items()):
        t0 = time.perf_counter()
        spec.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
