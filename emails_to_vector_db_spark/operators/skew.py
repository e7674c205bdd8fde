"""Skew-handling operators: salted joins and two-phase salted aggregation.

AQE's skew-join splitting (enabled in session.py) handles sort-merge skew
automatically at runtime; these operators are the *declarative* fallback
for the cases AQE can't fix — a broadcast-ineligible dimension with a few
hot keys, or an aggregation whose single hot group saturates one reducer.
Both are standard patterns at 100 TB (a handful of keys owning 10% of rows
turns one task into the whole job's critical path).

Salting is deterministic here (hash of a unique column, not rand()) so
results — and tests — are reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_of(unique_col: Column | str, n_salts: int) -> Column:
    c = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return F.pmod(F.xxhash64(c), F.lit(n_salts)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    n_salts: int = 8,
    big_unique_col: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``n_salts``
    partitions: big rows get a deterministic salt, the small side is
    replicated n_salts× (explode), and the join key becomes (key, salt).
    Total shuffle grows by |small|×(n_salts-1) — cheap when small is small;
    the win is that no single reducer owns a hot key."""
    big_s = big.withColumn("_salt", _salt_of(big_unique_col, n_salts))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")


def salted_groupby_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    n_salts: int = 8,
    unique_col: str,
) -> DataFrame:
    """Two-phase aggregation with an explicit salt: partial aggregate on
    (keys + salt), then final aggregate on keys. Spark's hash aggregate is
    already partial→final, but the PARTIAL side still shuffles hot keys to
    one reducer; salting splits that reducer n_salts ways.

    ``aggs`` maps output column → (function, input column) with function in
    {sum, count, min, max}. (avg decomposes into sum+count — do it in the
    caller.)"""
    decomposable = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    refold = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for fn, _ in aggs.values():
        if fn not in decomposable:
            raise ValueError(f"non-decomposable agg {fn!r}")
    salted = df.withColumn("_salt", _salt_of(unique_col, n_salts))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            decomposable[fn](col).alias(out)
            for out, (fn, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[refold[fn](out).alias(out) for out, (fn, _) in aggs.items()]
    )
