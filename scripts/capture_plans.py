"""Capture .explain("formatted") output for named registry queries.

Usage:
    python scripts/capture_plans.py OUT_DIR SUFFIX name [name ...]

Writes OUT_DIR/<name>_<SUFFIX>.txt for each query, built against
$SPARK_GRAFT_SF_DIR (default sf0.1). Run from the repo root whose
registry should be captured (a git worktree of an older commit captures
that commit's plans).
"""

from __future__ import annotations

import os
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_dir, suffix, *names = sys.argv[1:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan-capture", cpus="8")
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"!! {name}: not in registry", file=sys.stderr)
            continue
        try:
            df = spec.fn(spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # capture the failure instead of dying
            txt = f"PLAN CAPTURE FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
