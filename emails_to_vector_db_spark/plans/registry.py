"""QuerySpec registry — the contract between the engine and the driver.

Conventions that make the DuckDB oracle hash-compare exactly
(SURVEY.md §5, §7 "hard parts"):

- every computed column is aliased identically in Spark and SQL;
- double aggregates are rounded (money → 2dp, ratios/distances → 6dp) so
  partial-aggregation order can't flip the hash;
- timestamps are emitted as epoch seconds (bigint) or formatted strings,
  never raw timestamp values;
- DuckDB ``sum(BIGINT)`` returns HUGEINT → oracles cast to BIGINT;
- top-k queries carry a unique tiebreaker in the ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = ()
    bench: bool = False  # part of the bench.py headline set
    doc: str = field(default="", compare=False)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    """Decorator registering a query callable under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            tags=tags,
            bench=bench,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco
