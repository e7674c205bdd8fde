"""SparkSession factory tuned for this engine.

Local mode is a single JVM; ``spark.driver.memory`` is the only memory
knob. On a real cluster the same SQL confs apply (AQE, Arrow, UTC);
``shuffle.partitions`` scales with the cluster instead of local cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# events.parquet carries INT64 TIMESTAMP(NANOS) which Spark cannot read
# natively; this legacy conf reads it as a long (ns since epoch) which
# sources.tables converts to a microsecond timestamp (matching DuckDB's
# truncation). Runtime-settable, but set at build time for new sessions.
NANOS_AS_LONG = "spark.sql.legacy.parquet.nanosAsLong"


def get_spark(
    app_name: str = "emails_to_vector_db_spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    if shuffle_partitions is None:
        shuffle_partitions = (
            int(cpus) if str(cpus).isdigit() else (os.cpu_count() or 8)
        )
    # Shuffle/spill scratch space: the sandbox's root disk shows
    # multi-second write stalls under load (measured: identical plans
    # swinging 9s -> 102s with ZERO GC time and <3% CPU steal — the
    # stall is the local-dir write path). Shuffle files for this
    # engine's bench are far smaller than RAM, so point local.dir at
    # tmpfs when available. Parameterized for clusters
    # ($SPARK_GRAFT_LOCAL_DIR on fast local disks/NVMe); the /tmp
    # fallback keeps behavior unchanged where /dev/shm is absent.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR") or (
        "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else None
    )
    if local_dir:
        # tmpfs files are RAM: a SIGKILLed session skips Spark's
        # shutdown-hook cleanup and would leak its scratch across
        # rounds. Best-effort sweep of long-dead per-app subdirs
        # (anything a live session touches has a fresh mtime).
        import shutil
        import time as _time

        try:
            cutoff = _time.time() - 2 * 3600
            for ent in os.scandir(local_dir):
                if ent.is_dir() and ent.stat().st_mtime < cutoff:
                    shutil.rmtree(ent.path, ignore_errors=True)
        except OSError:
            pass
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # Spark 4's DisableUnnecessaryBucketedScan drops the bucketed
        # scan even when an IN-list on the bucket column could
        # bucket-prune (it only protects join/agg distribution needs).
        # The postings index relies on term-IN-list bucket pruning, so
        # keep bucketed scans authoritative.
        .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config(NANOS_AS_LONG, "true")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
