"""Plan-shape audit over the whole bench surface: for every bench query,
count the node types that matter for 100 TB scale (shuffle exchanges,
single-partition exchanges, sort-merge joins, Python eval nodes,
cartesian products, partitionless windows). TSV to stdout.

Usage: python scripts/plan_audit.py [--sf SF_DIR]
"""

from __future__ import annotations

import os
import re
import sys

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
    spark = get_spark(app_name="plan-audit", cpus="8")
    print(
        "query\texchanges\tsingle_part_ex\tsmj\tpy_eval\tcartesian\t"
        "global_window\terror"
    )
    for name, spec in sorted(REGISTRY.items()):
        if not spec.bench:
            continue
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            print(f"{name}\t-\t-\t-\t-\t-\t-\t{exc!r}"[:300])
            continue
        n_ex = len(re.findall(r"\bExchange (?:hash|range|Single)", plan))
        n_sp = len(re.findall(r"\bExchange SinglePartition", plan))
        n_smj = len(re.findall(r"\bSortMergeJoin\b", plan))
        n_py = len(
            re.findall(r"\b(?:BatchEvalPython|ArrowEvalPython)\b", plan)
        )
        n_cart = len(re.findall(r"\bCartesianProduct\b", plan))
        # r12 (ADVICE fix): count only PARTITIONLESS windows. A
        # WindowExec prints `Window [exprs], [partSpec], [orderSpec]`
        # — two top-level `], [` separators — while a global window
        # omits the partition group and prints exactly one. The old
        # blanket `plan.count("Window [")` counted partitioned windows
        # too and overstated the audit column.
        n_gw = 0
        for ln in plan.splitlines():
            m = re.search(r"\bWindow \[", ln)
            if m:
                n_gw += ln[m.start():].count("], [") == 1
        print(
            f"{name}\t{n_ex}\t{n_sp}\t{n_smj}\t{n_py}\t{n_cart}\t{n_gw}\t"
        )
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
