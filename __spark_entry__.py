"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in emails_to_vector_db_spark/plans/; this module
just re-exports the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from emails_to_vector_db_spark.plans import REGISTRY

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Exact L2 KNN retrieval (the reference's ``rag.py:77-82`` search) with
    the documents join restored — see plans/vector.py::knn_topk_l2.
    """
    return REGISTRY["knn_topk_l2"].fn(spark, SMOKE_SF_DIR)


def _driver_green_names(
    max_round: int | None = None, root: str | None = None
) -> set[str]:
    """Union of driver-green names across every CORRECTNESS_r*.json on disk.

    A name is green once a driver round recorded rows+schema matching
    (hash too when the oracle emits one; rows-only checks record no hash).
    Derived at import time so the rotation below is provably
    registry-minus-green, never hand-maintained.

    ``max_round`` (exclusive) restricts the union to artifacts written by
    rounds BEFORE it. The staleness tripwire needs this: the driver writes
    ``CORRECTNESS_r{N}.json`` *after* round N's final commit, so names
    registered in round N are green in that artifact by construction —
    evidence the driver sampled them, not that the tuple is stale. Only a
    green row from a round *earlier* than the registering round proves the
    tuple was left unrefreshed. ``root`` overrides the scan directory
    (tests simulate a post-commit driver write in a tmp dir).
    """
    import glob
    import json
    import os
    import re

    here = root or os.path.dirname(os.path.abspath(__file__))
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        if max_round is not None:
            m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", path)
            if m and int(m.group(1)) >= max_round:
                continue
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, res in rows.items():
            if (
                isinstance(res, dict)
                and res.get("rows_match")
                and res.get("schema_match")
                and res.get("hash_match") in (True, None)
            ):
                green.add(name)
    return green


# Queries REGISTERED this round: they yield their sample slots to names
# that have been waiting in the backlog since earlier rounds (the union
# math in _driver_green_names can't tell a week-old backlog entry from a
# query added an hour ago — registration age isn't recorded anywhere —
# so this is the one piece of rotation state that must be declared).
# Emptied/refreshed each round, with the registering round stamped in
# _THIS_ROUND_NO. Staleness fails LOUDLY via tests/test_rotation_state.py:
# every name here must be absent from CORRECTNESS_r*.json artifacts of
# rounds BEFORE _THIS_ROUND_NO (a green row in the registering round's own
# artifact is the normal post-commit driver write, not staleness).
_THIS_ROUND_NO = 11
_NEW_THIS_ROUND: tuple[str, ...] = (
    # round 11 registrations (appended as they land this round)
    "proximity_rare_from_index",
    "colbert_maxsim_from_index",
    "splade_expansion_from_index",
    "plaid_pruned_maxsim_topk",
    "plaid_recall_audit",
    "trihybrid_rrf_from_index",
)


def _ordered_names() -> list[str]:
    """Never-driver-sampled names first (oldest first, registry order
    within an age class), then the green ones.

    The driver samples the FIRST ~50 of queries() order each round, so this
    ordering rotates the remaining backlog into the CORRECTNESS window
    automatically: once a name turns green it falls to the tail and the next
    never-sampled name takes its slot. Names registered THIS round queue
    behind the pre-existing backlog so they can't crowd out longer-waiting
    entries. All registry queries pass the identical oracle gate in
    tests/test_oracle_parity.py regardless of order.
    """
    green = _driver_green_names()
    fresh = set(_NEW_THIS_ROUND)
    backlog = [n for n in REGISTRY if n not in green and n not in fresh]
    new = [n for n in REGISTRY if n not in green and n in fresh]
    return backlog + new + [n for n in REGISTRY if n in green]




def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle
    }
