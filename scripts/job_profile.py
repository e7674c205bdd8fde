"""Execution-shape profile for named registry queries: run each query
ONCE through the noop sink and report how many Spark jobs, stages and
tasks it launched (statusTracker deltas). Wall-noise-free evidence for
subtree-collapse claims: a removed duplicate subtree removes its jobs/
stages/tasks regardless of host weather.

Usage: python scripts/job_profile.py [--sf SF_DIR] name [name ...]
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

use_tmpfs_scratch()


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    spark = get_spark(
        app_name="job-profile", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    st = spark.sparkContext.statusTracker()

    def snapshot():
        jids = st.getJobIdsForGroup(None)
        stages, tasks = 0, 0
        for jid in jids:
            ji = st.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = st.getStageInfo(sid)
                if si is not None:
                    stages += 1
                    tasks += si.numTasks
        return len(jids), stages, tasks

    for name in args:
        spec = REGISTRY[name]
        j0, s0, t0 = snapshot()
        spec.fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        j1, s1, t1 = snapshot()
        print(
            f"{name}: jobs={j1 - j0} stages={s1 - s0} tasks={t1 - t0}"
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
