"""Distributed global ranking and prefix aggregates — cumulative
window semantics over a total order WITHOUT a single-partition window.

``Window.orderBy(...)`` with no partitionBy moves the whole input to
one partition (Spark logs ``WindowExec: No Partition Defined``); fine
on a 10⁴-row fixture vocabulary, a straggler on the 10⁸-10⁹ distinct
shingles of a web corpus. The classic fix is the two-pass form:

1. range-partition the input by the order columns (so partition i's
   rows all sort before partition i+1's),
2. local cumulative window within each physical partition,
3. per-partition totals → exclusive running offsets (a table with ONE
   ROW PER PARTITION — bounded by the cluster, not the data),
4. broadcast the offsets back and combine (add for sums, greatest for
   maxima).

The result is deterministic for any total order (ties broken by the
caller's order columns) and independent of where the range boundaries
land, so AQE coalescing or boundary-sampling noise cannot change it.

Two deliberate implementation choices:

- the partition-id'd, locally-aggregated table is PERSISTED before it
  fans out to the offsets branch and the result branch.
  ``spark_partition_id()`` is nondeterministic-by-annotation; without
  the pin, the two branches can re-evaluate it over separately
  AQE-coalesced reads of the range exchange and disagree on pids —
  persist makes the assignment happen exactly once. The table is
  input-sized but narrow, and MEMORY_AND_DISK spills rather than OOMs.
- the per-partition totals are COLLECTED (≤ shuffle-partition-count
  rows — the same driver-side footprint as repartitionByRange's own
  boundary sampler) and scanned into exclusive offsets in plain
  Python. Collecting them is what lets the input pin be unpersisted
  DETERMINISTICALLY: the collect materializes the local table, after
  which the upstream cache is dead weight and is released immediately,
  so repeated calls in one session don't accumulate input-sized cache
  entries. The local table itself must stay pinned while the returned
  DataFrame is live; pass ``pins=[...]`` to receive it and unpersist
  once consumed (otherwise ``spark.catalog.clearCache()`` applies).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ranged_local(
    df: DataFrame,
    order_cols: list[Column],
    num_partitions: int | None,
) -> DataFrame:
    """Range-partition by the order columns and stamp the physical
    partition id — the shared first pass. The INPUT is pinned by the
    caller before the boundary-sampling job; the returned frame is not
    yet persisted."""
    parted = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    return parted.withColumn("__pid", F.spark_partition_id())


def distributed_row_number(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
    pins: list | None = None,
) -> DataFrame:
    """Append ``rank_col`` = 1-based global row_number under the TOTAL
    order ``order_cols`` (caller must make it total — include a unique
    tiebreak column — for a fully deterministic rank).

    Equivalent to ``F.row_number().over(Window.orderBy(*order_cols))``
    (equivalence-tested in tests/test_setsim.py) but never creates a
    single-partition stage: the only small object is the per-partition
    count table, bounded by cluster width, not data size. The input pin
    is released before returning; the persisted local-rank table is
    appended to ``pins`` (if given) for caller-side unpersist.
    """
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    local = (
        _ranged_local(df, order_cols, num_partitions)
        .withColumn(
            "__lrank",
            F.row_number().over(
                Window.partitionBy("__pid").orderBy(*order_cols)
            ),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = (
        local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt")).collect()
    )
    # the collect above materialized ``local``; the input pin (and the
    # caller's upstream lineage cached behind it) is no longer needed
    df.unpersist()
    if pins is not None:
        pins.append(local)
    run, off_rows = 0, []
    for r in sorted(counts, key=lambda r: r["__pid"]):
        off_rows.append((r["__pid"], run))
        run += r["__cnt"]
    offsets = df.sparkSession.createDataFrame(
        off_rows, "__pid int, __offset long"
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(
            rank_col, (F.col("__lrank") + F.col("__offset")).cast("int")
        )
        .drop("__pid", "__lrank", "__offset")
    )


def distributed_ntile(
    df: DataFrame,
    order_cols: list[Column],
    k: int,
    out_col: str = "bucket",
    num_partitions: int | None = None,
    pins: list | None = None,
) -> DataFrame:
    """Append ``out_col`` = SQL-standard ``ntile(k)`` under the TOTAL
    order ``order_cols`` without a single-partition window: the global
    rank comes from :func:`distributed_row_number`, and the bucket is
    ntile's closed form — with q = n div k and r = n mod k, the first
    r buckets take q+1 rows and the rest q, so
    bucket(rn) = ceil(rn/(q+1)) while rn <= r*(q+1),
    else r + ceil((rn - r*(q+1))/q). Bit-identical to the window form
    for any n, k (CaseWhen evaluates branches lazily, so the q=0 case
    when n < k never divides by zero)."""
    ranked = distributed_row_number(
        df, order_cols, "__rn", num_partitions, pins
    )
    n = F.broadcast(ranked.agg(F.max("__rn").cast("long").alias("__n")))
    q = F.floor(F.col("__n") / k)
    r = F.col("__n") - q * k
    big = r * (q + 1)
    bucket = F.when(
        F.col("__rn") <= big, F.ceil(F.col("__rn") / (q + 1))
    ).otherwise(r + F.ceil((F.col("__rn") - big) / q))
    return (
        ranked.crossJoin(n)
        .withColumn(out_col, bucket.cast("int"))
        .drop("__rn", "__n")
    )


def distributed_prefix_agg(
    df: DataFrame,
    order_cols: list[Column],
    sums: list[tuple[str, str]] = (),
    maxs: list[tuple[str, str]] = (),
    num_partitions: int | None = None,
    pins: list | None = None,
) -> DataFrame:
    """Append running-prefix aggregates under the TOTAL order
    ``order_cols``: for each ``(src, out)`` in ``sums`` a cumulative
    sum column ``out``, in ``maxs`` a running maximum — the semantics
    of ``F.sum/max(src).over(Window.orderBy(*order_cols).rowsBetween(
    unboundedPreceding, 0))`` without the single-partition stage
    (equivalence-tested in tests/test_setsim.py).

    Same two-pass shape as :func:`distributed_row_number`: partition-
    local cumulative windows, per-partition totals collected (≤ one
    row per partition), exclusive offsets rebuilt driver-side and
    broadcast back (add for sums; ``greatest`` for maxima, which
    skips the NULL offset partition 0 naturally). Nulls in ``src``
    are ignored, matching the window form. The input pin is released
    before returning; the persisted local table lands in ``pins``.
    """
    sums, maxs = list(sums), list(maxs)
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = _ranged_local(df, order_cols, num_partitions)
    for src, out in sums:
        local = local.withColumn(out, F.sum(src).over(w))
    for src, out in maxs:
        local = local.withColumn(out, F.max(src).over(w))
    local = local.persist(StorageLevel.MEMORY_AND_DISK)
    aggs = [F.sum(src).alias(f"__t_{out}") for src, out in sums] + [
        F.max(src).alias(f"__t_{out}") for src, out in maxs
    ]
    tot_df = local.groupBy("__pid").agg(*aggs)
    tot_fields = {f.name: f.dataType for f in tot_df.schema.fields}
    totals = tot_df.collect()
    df.unpersist()
    if pins is not None:
        pins.append(local)
    outs = [out for _, out in sums] + [out for _, out in maxs]
    run: dict[str, object] = {out: None for out in outs}
    off_rows = []
    for r in sorted(totals, key=lambda r: r["__pid"]):
        off_rows.append(tuple([r["__pid"]] + [run[out] for out in outs]))
        for _, out in sums:
            v = r[f"__t_{out}"]
            if v is not None:
                run[out] = v if run[out] is None else run[out] + v
        for _, out in maxs:
            v = r[f"__t_{out}"]
            if v is not None:
                run[out] = v if run[out] is None else max(run[out], v)
    schema = T.StructType(
        [T.StructField("__pid", T.IntegerType())]
        + [
            T.StructField(f"__o_{out}", tot_fields[f"__t_{out}"], True)
            for out in outs
        ]
    )
    offsets = df.sparkSession.createDataFrame(off_rows, schema)
    res = local.join(F.broadcast(offsets), "__pid")
    for _, out in sums:
        zero = F.lit(0).cast(tot_fields[f"__t_{out}"])
        res = res.withColumn(
            out, F.col(out) + F.coalesce(F.col(f"__o_{out}"), zero)
        )
    for _, out in maxs:
        res = res.withColumn(out, F.greatest(F.col(out), F.col(f"__o_{out}")))
    return res.drop("__pid", *[f"__o_{out}" for out in outs])
