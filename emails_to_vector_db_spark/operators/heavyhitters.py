"""Heavy hitters (frequent items) with bounded memory: per-partition
Misra-Gries summaries + an exact rescoring pass.

The scalable way to ask "top-k most frequent terms in a 100 TB corpus"
without shuffling every distinct term: each partition builds a
Misra-Gries summary of capacity c (≤ c counters, one pass, O(c) memory).
MG guarantees any item with partition frequency > n_p/(c+1) keeps a
counter, so any item with GLOBAL frequency > N/(c+1) survives in at
least one partition's summary — the union of summaries is a guaranteed
candidate superset for every sufficiently-heavy item. A second exact
pass counts only the candidates (broadcast semi-join filter, tiny
aggregation), so the final top-k counts are EXACT, not estimates —
which is why the whole operator can be hash-checked against a plain
GROUP BY oracle (given capacity ≥ the corpus's k-th-frequency bound;
the registry query picks c comfortably above it and a pytest asserts
equality with the exact computation).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def misra_gries(values: Iterator[str], capacity: int) -> dict[str, int]:
    """Classic Misra-Gries: ≤ ``capacity`` counters, one pass."""
    counters: dict[str, int] = {}
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < capacity:
            counters[v] = 1
        else:
            # decrement-all step; drop zeroed counters
            dead = []
            for k in counters:
                counters[k] -= 1
                if counters[k] == 0:
                    dead.append(k)
            for k in dead:
                del counters[k]
    return counters


def heavy_hitters(
    items: DataFrame | Column,
    *,
    item_col: str = "item",
    k: int = 20,
    capacity: int = 256,
) -> DataFrame:
    """Exact top-``k`` items by frequency, computed scale-out:

    1. per-partition Misra-Gries (mapInPandas, ≤ capacity counters) —
       candidate generation, no shuffle of the distinct-item space;
    2. exact counts for the candidate union only (broadcast isin filter
       over a second scan, map-side-combinable groupBy);
    3. top-k with an item-name tiebreak.

    Exactness holds when every true top-k item has global frequency
    > N/(capacity+1); pick capacity ≥ (N / f_k) for your corpus.
    """
    df = items.select(F.col(item_col).alias("item"))

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = misra_gries(
            (v for pdf in batches for v in pdf["item"] if v is not None),
            capacity,
        )
        yield pd.DataFrame({"item": list(counters.keys())})

    candidates = df.mapInPandas(
        summarize, T.StructType([T.StructField("item", T.StringType())])
    ).distinct()
    # Second pass: exact counts for candidates only. The candidate set is
    # ≤ capacity × n_partitions rows — broadcast it into the scan filter.
    exact = (
        df.join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return exact.orderBy(F.col("freq").desc(), F.col("item").asc()).limit(k)
