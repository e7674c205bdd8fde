"""Property / differential tests for the round-4 session-2 operators,
beyond the shared DuckDB oracle gate (tests/test_oracle_parity.py):
each test re-derives the operator's defining invariant a DIFFERENT way
(literal sequential recursion, closed-form guarantee, independent
NumPy recompute) so a bug that slipped into both the Spark plan and
its SQL oracle the same way would still be caught.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from emails_to_vector_db_spark.plans import REGISTRY
from emails_to_vector_db_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE


def test_cusum_prefix_sum_identity_matches_literal_recursion(spark):
    """The windowed form C+_t = S_t - min(0, min prefix S) must equal
    the textbook sequential recursion C+_t = max(0, C+_{t-1} + dev_t)
    replayed literally in Python over the same daily series."""
    from emails_to_vector_db_spark.plans.stats import _CUSUM_H, _CUSUM_K

    daily = (
        load_table(spark, SF_ORACLE, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
        .orderBy("d")
        .collect()
    )
    xs = [r["x"] for r in daily]
    days = [str(r["d"]) for r in daily]
    mu = sum(xs) / len(xs)
    sd = math.sqrt(sum((v - mu) ** 2 for v in xs) / (len(xs) - 1))
    cp = cn = 0.0
    flagged = {}
    for day, x in zip(days, xs):
        cp = max(0.0, cp + x - mu - _CUSUM_K * sd)
        cn = max(0.0, cn - (x - mu) - _CUSUM_K * sd)
        if cp > _CUSUM_H * sd or cn > _CUSUM_H * sd:
            flagged[day] = (round(cp / sd, 4), round(cn / sd, 4))
    got = {
        r["day"]: (r["c_pos_sigma"], r["c_neg_sigma"])
        for r in REGISTRY["cusum_order_level_shift"]
        .fn(spark, SF_ORACLE)
        .collect()
    }
    assert got == flagged


def test_conformal_qhat_and_coverage_guarantee(spark):
    """qhat must be the exact ceil((n+1)*0.9)-th calibration order
    statistic for the SAME quantized coefficients, and empirical test
    coverage must respect the split-conformal band (target +/- a
    finite-sample slack of ~2/sqrt(n_test))."""
    row = (
        REGISTRY["conformal_price_intervals"].fn(spark, SF_ORACLE).collect()
    )[0]
    li = (
        load_table(spark, SF_ORACLE, "lineitem")
        .select("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
        .collect()
    )
    train = [r for r in li if r["l_orderkey"] % 4 < 2]
    n = float(len(train))
    s1 = sum(r["l_quantity"] for r in train)
    s2 = sum(r["l_discount"] for r in train)
    sy = sum(r["l_extendedprice"] for r in train)
    s11 = sum(r["l_quantity"] ** 2 for r in train)
    s22 = sum(r["l_discount"] ** 2 for r in train)
    s12 = sum(r["l_quantity"] * r["l_discount"] for r in train)
    s1y = sum(r["l_quantity"] * r["l_extendedprice"] for r in train)
    s2y = sum(r["l_discount"] * r["l_extendedprice"] for r in train)
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    b0 = round(
        (
            sy * (s11 * s22 - s12 * s12)
            - s1 * (s1y * s22 - s12 * s2y)
            + s2 * (s1y * s12 - s11 * s2y)
        )
        / det,
        6,
    )
    b1 = round(
        (
            n * (s1y * s22 - s12 * s2y)
            - sy * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s2y - s1y * s2)
        )
        / det,
        6,
    )
    b2 = round(
        (
            n * (s11 * s2y - s1y * s12)
            - s1 * (s1 * s2y - s1y * s2)
            + sy * (s1 * s12 - s11 * s2)
        )
        / det,
        6,
    )
    calib = sorted(
        abs(
            r["l_extendedprice"]
            - (b0 + b1 * r["l_quantity"] + b2 * r["l_discount"])
        )
        for r in li
        if r["l_orderkey"] % 4 == 2
    )
    k = math.ceil((len(calib) + 1) * 0.9)
    assert row["qhat"] == pytest.approx(round(calib[k - 1], 2), abs=0.011)
    assert row["n_calib"] == len(calib)
    slack = 2.0 / math.sqrt(row["n_test"])
    assert 0.9 - slack <= row["coverage"] <= 0.9 + slack + 1.0 / len(calib)


def test_bootstrap_weights_are_poisson_and_deterministic(spark):
    """The md5-derived resample weights must follow Poisson(1) closely
    (they are an exact inverse-CDF over a near-uniform hash) and the CI
    must be byte-stable across runs (no RNG state anywhere)."""
    from emails_to_vector_db_spark.plans.stats import _POIS_CDF

    a = REGISTRY["order_value_bootstrap_ci"].fn(spark, SF_ORACLE).collect()
    b = REGISTRY["order_value_bootstrap_ci"].fn(spark, SF_ORACLE).collect()
    assert a == b
    row = a[0]
    assert row["ci_lo"] < row["mean_total"] < row["ci_hi"]
    # marginal weight distribution over one replica, recomputed directly
    import hashlib

    keys = [
        r["o_orderkey"]
        for r in load_table(spark, SF_ORACLE, "orders")
        .select("o_orderkey")
        .collect()
    ]
    counts = [0] * 8
    for kk in keys:
        u = (
            int(hashlib.md5(f"{kk}:0".encode()).hexdigest()[:8], 16)
            / 4294967296.0
        )
        w = next(
            (i for i, p in enumerate(_POIS_CDF) if u < p), len(_POIS_CDF)
        )
        counts[min(w, 7)] += 1
    n = len(keys)
    # expected Poisson(1) pmf for k=0,1,2; loose 3-sigma-ish band
    for k_, p_ in ((0, 0.3679), (1, 0.3679), (2, 0.1839)):
        se = math.sqrt(p_ * (1 - p_) / n)
        assert abs(counts[k_] / n - p_) < 5 * se


def test_gini_matches_numpy_recompute(spark):
    revs = np.array(
        sorted(
            r["r"]
            for r in load_table(spark, SF_ORACLE, "orders")
            .groupBy("o_custkey")
            .agg(F.sum("o_totalprice").alias("r"))
            .collect()
        )
    )
    n = len(revs)
    gini = 2 * np.sum(np.arange(1, n + 1) * revs) / (n * revs.sum()) - (
        n + 1
    ) / n
    row = (
        REGISTRY["gini_revenue_concentration"].fn(spark, SF_ORACLE).collect()
    )[0]
    assert row["gini"] == pytest.approx(gini, abs=1e-6)
    assert row["n_customers"] == n
    assert 0.0 < row["top1pct_share"] < 1.0


def test_bfs_frontiers_disjoint_and_bounded(spark):
    rows = {
        r["hop"]: r["n_new"]
        for r in REGISTRY["bfs_supplier_reach"].fn(spark, SF_ORACLE).collect()
    }
    assert set(rows) == {1, 2, 3}
    n_suppliers = load_table(spark, SF_ORACLE, "supplier").count()
    # reached nodes (plus the seed) can never exceed the node universe
    assert 1 + sum(rows.values()) <= n_suppliers
    assert rows[1] > 0  # the seed has neighbors by construction


def test_naive_bayes_confusion_is_consistent_and_skillful(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    test_counts = {
        r["lang"]: r["n"]
        for r in docs.where(F.col("doc_id") % 5 == 0)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    conf = (
        REGISTRY["naive_bayes_lang_classifier"].fn(spark, SF_ORACLE).collect()
    )
    by_actual: dict[str, int] = {}
    correct = 0
    for r in conf:
        by_actual[r["actual_lang"]] = (
            by_actual.get(r["actual_lang"], 0) + r["n_docs"]
        )
        if r["actual_lang"] == r["predicted_lang"]:
            correct += r["n_docs"]
    # every test doc classified exactly once
    assert by_actual == test_counts
    total = sum(test_counts.values())
    majority = max(test_counts.values()) / total
    assert correct / total > majority  # beats the majority-class baseline


def test_markov_accuracy_bounds_and_model_shape(spark):
    rows = (
        REGISTRY["markov_next_event_accuracy"].fn(spark, SF_ORACLE).collect()
    )
    assert rows, "no test transitions"
    for r in rows:
        assert 0.0 <= r["accuracy"] <= 1.0
        assert r["n_test"] > 0
    # one predictor per observed prev state
    prevs = [r["prev_type"] for r in rows]
    assert len(prevs) == len(set(prevs))


def test_registry_contract_hygiene():
    """The driver-contract surfaces stay consistent: the rotation is
    provably registry-minus-driver-green (derived from the
    CORRECTNESS_r*.json union — a hand-maintained list could typo away
    a sampling slot), every bench query carries a pinned shuffle
    budget (a new bench=True query must not dodge the plan gate), and
    every budgeted name is still benched (dead budgets rot)."""
    import importlib.util

    from tests.test_plan_budget import SHUFFLE_BUDGET

    spec = importlib.util.spec_from_file_location(
        "spark_entry_mod", "__spark_entry__.py"
    )
    se = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(se)
    ordered = se._ordered_names()
    assert set(ordered) == set(REGISTRY)
    green = se._driver_green_names()
    n_backlog = len(set(REGISTRY) - green)
    # never-driver-green names occupy exactly the head of the ordering
    assert all(n not in green for n in ordered[:n_backlog])
    assert all(n in green for n in ordered[n_backlog:])
    bench = {n for n, s in REGISTRY.items() if s.bench}
    assert sorted(bench - set(SHUFFLE_BUDGET)) == []
    assert sorted(set(SHUFFLE_BUDGET) - bench) == []
    # the driver contract exposes every registered query exactly once
    qs = se.queries()
    assert set(qs) == set(REGISTRY)
    assert set(se.oracle_sql()) == {
        n for n, s in REGISTRY.items() if s.oracle
    }
