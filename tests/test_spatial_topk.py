"""Exactness of the two-phase adaptive-grid radius top-k
(operators/spatial.py::radius_topk) against a brute-force all-pairs
reference — on fixtures DENSE enough to exercise the fine phase, which
the sparse sf fixtures never do.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from emails_to_vector_db_spark.operators.spatial import radius_topk

R = 0.05
K = 3


def _brute_topk(pts_rows, r, k):
    """Reference: all-pairs, per-point k nearest within r, ranked by
    (d2, id_b) exactly like the operator."""
    out = []
    for pid, px, py in pts_rows:
        cands = []
        for qid, qx, qy in pts_rows:
            if qid == pid:
                continue
            d2 = (px - qx) ** 2 + (py - qy) ** 2
            if d2 <= r * r:
                cands.append((d2, qid))
        cands.sort()
        for rk, (d2, qid) in enumerate(cands[:k], start=1):
            out.append((pid, qid, round(math.sqrt(d2), 9), rk))
    return sorted(out)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = sorted(
        (r["id_a"], r["id_b"], round(math.sqrt(r["d2"]), 9), r["rk"])
        for r in radius_topk(df, R, K).collect()
    )
    assert got == _brute_topk(rows, R, K)


def test_dense_cluster_exercises_fine_phase(spark):
    """60 points packed inside an r/10 box: every point has dozens of
    neighbors within r/4, so the fine phase answers all of them — and
    must agree with brute force."""
    rng = random.Random(7)
    rows = [
        (i, 0.5 + rng.uniform(0, R / 10), 0.5 + rng.uniform(0, R / 10))
        for i in range(60)
    ]
    _run(spark, rows)


def test_mixed_density_split_paths(spark):
    """A dense cluster (fine-phase satisfied), a sparse ring between
    r/4 and r (fine phase finds nothing, escalation must), isolated
    points (no neighbors at all), and straddlers near the r/4
    boundary."""
    rng = random.Random(11)
    rows = []
    nid = 0
    # dense cluster at (0.3, 0.3)
    for _ in range(40):
        rows.append(
            (nid, 0.3 + rng.uniform(0, R / 8), 0.3 + rng.uniform(0, R / 8))
        )
        nid += 1
    # a point whose only neighbors sit between r/4 and r away
    rows.append((nid, 0.7, 0.7)); nid += 1
    for ang in (0.0, 1.0, 2.0, 3.0, 4.5):
        rows.append(
            (
                nid,
                0.7 + 0.6 * R * math.cos(ang),
                0.7 + 0.6 * R * math.sin(ang),
            )
        )
        nid += 1
    # straddlers: exactly k-1 neighbors inside r/4, more outside
    rows.append((nid, 0.1, 0.9)); nid += 1
    rows.append((nid, 0.1 + R / 5, 0.9)); nid += 1  # inside r/4
    rows.append((nid, 0.1, 0.9 + R / 5)); nid += 1  # inside r/4
    rows.append((nid, 0.1 + R * 0.8, 0.9)); nid += 1  # outside r/4, inside r
    # isolated points
    rows.append((nid, 0.05, 0.05)); nid += 1
    rows.append((nid, 0.95, 0.05)); nid += 1
    _run(spark, rows)


def test_uniform_random(spark):
    rng = random.Random(23)
    rows = [
        (i, rng.random(), rng.random()) for i in range(250)
    ]
    _run(spark, rows)


def test_registry_query_matches_oracle(spark):
    """The registered query (sparse fixture -> escalation path) still
    hash-matches the O(n²) oracle after the two-phase rewrite."""
    from emails_to_vector_db_spark.plans import REGISTRY
    from tests.conftest import SF_SMOKE, duck_con, rows_match

    name = "spatial_radius_topk"
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    duck = duck_con(SF_SMOKE).execute(REGISTRY[name].oracle).fetchall()
    ok, why = rows_match(df, duck)
    assert ok, why
