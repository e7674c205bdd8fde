"""Distributed global ranking — row_number over a total order WITHOUT
a single-partition window.

``Window.orderBy(...)`` with no partitionBy moves the whole input to
one partition (Spark logs ``WindowExec: No Partition Defined``); fine
on a 10⁴-row fixture vocabulary, a straggler on the 10⁸-10⁹ distinct
shingles of a web corpus. The classic fix is the two-pass rank:

1. range-partition the input by the order columns (so partition i's
   rows all sort before partition i+1's),
2. local ``row_number`` within each physical partition,
3. per-partition counts → exclusive running offsets (a table with ONE
   ROW PER PARTITION — bounded by the cluster, not the data),
4. broadcast the offsets back and add.

The rank is deterministic for any total order (ties broken by the
caller's order columns) and independent of where the range boundaries
land, so AQE coalescing or boundary-sampling noise cannot change it.

Two deliberate implementation choices:

- the partition-id'd, locally-ranked table is PERSISTED before it fans
  out to the offsets branch and the result branch.
  ``spark_partition_id()`` is nondeterministic-by-annotation; without
  the pin, the two branches can re-evaluate it over separately
  AQE-coalesced reads of the range exchange and disagree on pids —
  persist makes the assignment happen exactly once. The table is
  input-sized but narrow, and MEMORY_AND_DISK spills rather than OOMs.
- the running offsets use a θ-self-join over the per-partition count
  table (≤ shuffle-partition-count rows, so the join is ≤ P² tiny
  rows), not ``Window.orderBy(pid)`` — keeping the operator free of
  single-partition window stages entirely, even cluster-width ones.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distributed_row_number(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``rank_col`` = 1-based global row_number under the TOTAL
    order ``order_cols`` (caller must make it total — include a unique
    tiebreak column — for a fully deterministic rank).

    Equivalent to ``F.row_number().over(Window.orderBy(*order_cols))``
    (equivalence-tested in tests/test_setsim.py) but never creates a
    single-partition stage: the only small object is the per-partition
    count table, bounded by cluster width, not data size. The returned
    DataFrame reads a persisted intermediate; callers that need cache
    hygiene can ``spark.catalog.clearCache()`` after consuming it.
    """
    # pin the input: repartitionByRange runs a SEPARATE boundary-
    # sampling job over its child before the exchange — uncached, that
    # re-executes the caller's whole upstream pipeline (measured +4s on
    # the sf1 shingle dictionary); cached, the sample reads this narrow
    # table
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    parted = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    local = (
        parted.withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__lrank",
            F.row_number().over(
                Window.partitionBy("__pid").orderBy(*order_cols)
            ),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    prior = counts.select(
        F.col("__pid").alias("__p2"), F.col("__cnt").alias("__c2")
    )
    offsets = (
        counts.join(prior, F.col("__p2") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__c2"), F.lit(0)).alias("__offset"))
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(
            rank_col, (F.col("__lrank") + F.col("__offset")).cast("int")
        )
        .drop("__pid", "__lrank")
    )
