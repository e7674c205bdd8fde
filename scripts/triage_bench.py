"""Isolated best-of-3 for named bench queries — the triage discipline
(SCALE_NOTES "Round-N bench triage"): same session shape, noop sink,
and cache hygiene as bench.py, but ONLY the names on argv, so a mover
is measured on an idle box without the 90-query sweep around it.

Usage: python scripts/triage_bench.py [--sf SF_DIR] name [name ...]
Prints per-run timings and the best, plus the plan's exchange count
(the budget guard: exchanges moving between rounds = plan rot, stable
exchanges + moved wall = noise/regen sensitivity).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emails_to_vector_db_spark.plans import REGISTRY  # noqa: E402
from emails_to_vector_db_spark.session import (  # noqa: E402
    get_spark,
    use_tmpfs_scratch,
)

# measurement entrypoint: tmpfs shuffle scratch (r11 stall fix),
# $SPARK_GRAFT_LOCAL_DIR wins when set
use_tmpfs_scratch()


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    spark = get_spark(app_name="triage-bench", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    import glob

    warm = (
        f"{sf_dir}/region.parquet"
        if os.path.exists(f"{sf_dir}/region.parquet")
        else sorted(glob.glob(f"{sf_dir}/*.parquet"))[0]
    )
    spark.read.parquet(warm).count()
    for name in args:
        spec = REGISTRY[name]
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        plan = (
            spec.fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        n_ex = sum(
            1
            for ln in plan.splitlines()
            if ln.lstrip("+-: *()0123456789").startswith("Exchange")
        )
        print(
            f"{name}: best {min(runs):.3f}s  runs "
            f"{[round(r, 3) for r in runs]}  exchanges={n_ex}"
        )


if __name__ == "__main__":
    main()
