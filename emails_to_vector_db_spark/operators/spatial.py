"""Grid-bucketed spatial operators: radius candidates and adaptive
per-point top-k.

The 9-cell stencil (cell side = search radius r) is the classic
geohash/H3 candidate generator: recall 1 by construction, candidate
count ~ n * density * r². For the TOP-K contract that candidate cost
is the scale killer precisely where it matters — dense regions — even
though the output is bounded at n*k. ``radius_topk`` therefore runs
TWO phases:

1. **fine phase**: stencil with cell side r/f (f = ``fine_factor``),
   candidates filtered to d ≤ r/f. A point with ≥ k neighbors inside
   r/f is EXACT from fine candidates alone: its kth-nearest within
   r/f is at distance ≤ r/f, and every point outside r/f is strictly
   farther, so the top-k within r equals the top-k within r/f. Fine
   candidates cost 1/f² of the coarse stencil — and density is
   exactly what makes a point satisfied here.
2. **escalation**: only points NOT satisfied by the fine phase (few
   neighbors nearby — i.e. sparse neighborhoods, where the coarse
   stencil is cheap anyway) probe the full cell-side-r stencil.

Measured at the sf10 fixture (1.5M points, ~150 points per coarse
cell): single-phase 134.8s → two-phase, see docs/SCALE_NOTES.md.
Exactness of the phase split is pinned by tests/test_spatial_topk.py
against a brute-force reference on dense synthetic clusters.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_cells(pts: DataFrame, cell: float) -> DataFrame:
    return pts.select(
        "id",
        "x",
        "y",
        F.floor(F.col("x") / cell).cast("long").alias("cx"),
        F.floor(F.col("y") / cell).cast("long").alias("cy"),
    )


def _stencil_candidates(
    probe_pts: DataFrame, home_pts: DataFrame, cell: float, r2: float
) -> DataFrame:
    """(id_a, id_b, d2) for all pairs (probe, home) with distance² ≤ r2,
    id_a ≠ id_b, via the 9-cell neighbor stencil. Requires
    cell ≥ sqrt(r2) (one cell step covers the radius in each axis)."""
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = (
        _with_cells(probe_pts, cell)
        .select(
            F.col("id").alias("id_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            F.explode(offsets).alias("o"),
            "cx",
            "cy",
        )
        .select(
            "id_a",
            "xa",
            "ya",
            (F.col("cx") + F.col("o.dx")).alias("cx"),
            (F.col("cy") + F.col("o.dy")).alias("cy"),
        )
    )
    home = _with_cells(home_pts, cell).select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        "cx",
        "cy",
    )
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    d2 = dx * dx + dy * dy
    return (
        probe.join(home, ["cx", "cy"])
        .where((F.col("id_a") != F.col("id_b")) & (d2 <= F.lit(r2)))
        .select("id_a", "id_b", d2.alias("d2"))
    )


def radius_topk(
    pts: DataFrame, r: float, k: int, fine_factor: int = 4
) -> DataFrame:
    """Each point's k nearest neighbors within Euclidean radius r.

    Input: (id, x, y). Output: (id_a, id_b, d2, rk) with rk ∈ [1, k],
    ranked by (d2 asc, id_b asc) — identical rows to the single-phase
    stencil + per-point window form, at a fraction of the candidate
    cost in dense regions (see module docstring for the proof).

    Cache lifecycle: the returned DataFrame is LAZY over two persisted
    intermediates (the points and the fine-phase survivors) — they
    cannot be unpersisted here without recomputing the whole fine
    phase at action time. Callers that invoke this repeatedly in a
    long-lived session own the cleanup (``spark.catalog.clearCache()``
    after the consuming action — the bench.py / driver pattern).
    """
    pts = pts.persist(StorageLevel.MEMORY_AND_DISK)
    rf = r / fine_factor
    w_rank = Window.partitionBy("id_a").orderBy(
        F.col("d2").asc(), F.col("id_b").asc()
    )
    w_all = Window.partitionBy("id_a")
    fine = (
        _stencil_candidates(pts, pts, rf, rf * rf)
        .withColumn("rk", F.row_number().over(w_rank))
        .withColumn("cnt", F.count(F.lit(1)).over(w_all))
    )
    satisfied = fine.where(F.col("cnt") >= k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    out_fine = satisfied.where(F.col("rk") <= k).select(
        "id_a", "id_b", "d2", "rk"
    )
    sat_ids = satisfied.where(F.col("rk") == 1).select(
        F.col("id_a").alias("id")
    )
    unsat = pts.join(sat_ids, "id", "left_anti")
    out_coarse = (
        _stencil_candidates(unsat, pts, r, r * r)
        .withColumn("rk", F.row_number().over(w_rank))
        .where(F.col("rk") <= k)
        .select("id_a", "id_b", "d2", "rk")
    )
    return out_fine.unionByName(out_coarse)
