"""Semantics of the in-engine ML / graph-analytics / profiling plans
(plans/ml.py, plans/graph.py::cosupply_triangle_count,
plans/cohorts.py, plans/maintenance.py::orders_column_profile).

The registry rows are hash-checked against DuckDB by test_oracle_parity;
these tests pin operator-level invariants that the oracle equality alone
would not explain (GD actually descends, AUC hits its closed-form
endpoints, the retention matrix is a valid probability surface)."""

from __future__ import annotations

import math

import pytest

from emails_to_vector_db_spark.plans import REGISTRY
from tests.conftest import SF_ORACLE


def _rows(spark, name):
    return REGISTRY[name].fn(spark, SF_ORACLE).collect()


def test_logreg_training_descends_logloss(spark):
    """The trained weights must strictly reduce mean log-loss vs the
    w=0 start (whose loss is exactly ln 2) — i.e. the unrolled GD
    trajectory really is gradient descent, not just a deterministic
    scramble."""
    from emails_to_vector_db_spark.plans.ml import _spark_features

    [w] = _rows(spark, "logreg_quality_classifier")
    feats = _spark_features(spark, SF_ORACLE).collect()
    loss = 0.0
    for r in feats:
        margin = sum(
            w[f"w{j}"] * r[f"x{j}"] for j in range(5)
        )
        p = 1.0 / (1.0 + math.exp(-margin))
        p = min(max(p, 1e-12), 1 - 1e-12)
        loss += -(r["y"] * math.log(p) + (1 - r["y"]) * math.log(1 - p))
    loss /= len(feats)
    assert loss < math.log(2.0), f"GD failed to descend: {loss:.6f}"
    assert w["n_train"] == len(feats)
    assert 0.0 <= w["train_accuracy"] <= 1.0


def test_auc_closed_form_endpoints(spark):
    """Tie-aware rank-sum AUC on hand-built frames: a perfect separator
    scores 1.0, a constant scorer scores exactly 0.5 (all ties →
    average ranks), an inverted separator 0.0."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def auc(pairs):
        df = spark.createDataFrame(pairs, ["score", "y"])
        hist = df.groupBy("score").agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("y").cast("double").alias("npos"),
        )
        w = (
            Window.orderBy("score")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        ranked = hist.withColumn(
            "cum_less", F.coalesce(F.sum("n").over(w), F.lit(0.0))
        )
        [r] = ranked.agg(
            F.sum(
                F.col("npos") * (F.col("cum_less") + (F.col("n") + 1) / 2.0)
            ).alias("rs"),
            F.sum("npos").alias("p"),
            F.sum(F.col("n") - F.col("npos")).alias("q"),
        ).collect()
        return (r["rs"] - r["p"] * (r["p"] + 1) / 2.0) / (r["p"] * r["q"])

    perfect = [(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)]
    assert auc(perfect) == pytest.approx(1.0)
    inverted = [(s, 1 - y) for s, y in perfect]
    assert auc(inverted) == pytest.approx(0.0)
    constant = [(7.0, 0), (7.0, 1), (7.0, 0), (7.0, 1)]
    assert auc(constant) == pytest.approx(0.5)


def test_auc_registry_rows_are_probabilities(spark):
    rows = _rows(spark, "score_auc_eval")
    assert {r["scorer"] for r in rows} == {"n_chars", "n_tokens"}
    for r in rows:
        assert 0.0 <= r["auc"] <= 1.0
        assert r["n_pos"] > 0 and r["n_neg"] > 0


def test_triangle_transitivity_bounds(spark):
    [r] = _rows(spark, "cosupply_triangle_count")
    assert r["n_edges"] > 0
    assert r["n_triangles"] >= 0
    # transitivity is a closed-wedge fraction
    assert 0.0 <= r["transitivity"] <= 1.0
    # each triangle closes 3 wedges, so 3·tri ≤ wedges is implied by
    # transitivity ≤ 1; also no triangle without at least 3 edges
    if r["n_triangles"] > 0:
        assert r["n_edges"] >= 3


def test_cohort_retention_is_valid_matrix(spark):
    rows = _rows(spark, "cohort_retention_matrix")
    by_cohort: dict[str, dict[int, tuple[int, float]]] = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], {})[r["week_offset"]] = (
            r["active_users"],
            r["retention_rate"],
        )
    for cohort, cells in by_cohort.items():
        assert 0 in cells, f"{cohort}: missing offset-0 cell"
        assert cells[0][1] == pytest.approx(1.0)  # week-0 retention ≡ 1
        size0 = cells[0][0]
        for off, (users, rate) in cells.items():
            assert off >= 0
            assert 0 < users <= size0
            assert 0.0 < rate <= 1.0


def test_column_profile_invariants(spark):
    rows = {r["col_name"]: r for r in _rows(spark, "orders_column_profile")}
    assert set(rows) == {
        "o_orderkey", "o_custkey", "o_totalprice",
        "o_orderstatus", "o_orderpriority", "o_orderdate",
    }
    n = {r["n_rows"] for r in rows.values()}
    assert len(n) == 1  # one table, one row count
    n = n.pop()
    pk = rows["o_orderkey"]
    assert pk["n_nulls"] == 0 and pk["n_distinct"] == n  # key column
    for r in rows.values():
        assert 0 <= r["n_nulls"] <= n
        assert 1 <= r["n_distinct"] <= n
        # exactly one typed min/max lane populated
        num_lane = r["min_num"] is not None
        str_lane = r["min_str"] is not None
        assert num_lane != str_lane
        if num_lane:
            assert r["min_num"] <= r["max_num"]
        else:
            assert r["min_str"] <= r["max_str"]


def test_equi_depth_buckets_are_balanced_and_ordered(spark):
    rows = sorted(
        _rows(spark, "orders_equi_depth_histogram"),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"] for r in rows] == list(range(1, 9))
    counts = [r["n_rows"] for r in rows]
    assert max(counts) - min(counts) <= 1  # equi-depth property
    for prev, nxt in zip(rows, rows[1:]):
        assert prev["hi"] <= nxt["lo"]  # non-overlapping ordered ranges
        assert prev["lo"] <= prev["hi"]


def test_time_weighted_avg_piecewise_constant_integral(spark):
    """Hand-built signal: value 10 held for 30s then 20 held for 10s →
    TWA = (10·30 + 20·10)/40 = 12.5; the final reading carries no
    duration."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, 1, t0, 10.0),
        (1, 2, t0 + dt.timedelta(seconds=30), 20.0),
        (1, 3, t0 + dt.timedelta(seconds=40), 999.0),  # no duration
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "value"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t_us = F.unix_micros(F.col("ts"))
    seq = df.select(
        "user_id", "value", t_us.alias("t"), F.lead(t_us).over(w).alias("tn")
    ).where(F.col("tn").isNotNull())
    d = (F.col("tn") - F.col("t")) / F.lit(1e6)
    [r] = (
        seq.groupBy("user_id")
        .agg((F.sum(F.col("value") * d) / F.sum(d)).alias("twa"))
        .collect()
    )
    assert r["twa"] == pytest.approx(12.5)


def test_boolean_and_retrieval_docs_contain_all_terms(spark):
    from emails_to_vector_db_spark.plans.retrieval import _AND_TERMS
    from emails_to_vector_db_spark.sources.tables import load_table

    hits = {r["doc_id"] for r in _rows(spark, "boolean_and_retrieval")}
    assert hits, "AND query should match at sf0.01"
    docs = load_table(spark, SF_ORACLE, "documents").collect()
    for d in docs:
        toks = set(d["text"].split())
        expected = all(t in toks for t in _AND_TERMS)
        assert (d["doc_id"] in hits) == expected, d["doc_id"]


def test_matryoshka_recall_reasonable(spark):
    rows = _rows(spark, "matryoshka_recall_audit")
    assert rows, "every probe should appear"
    for r in rows:
        assert 0.0 <= r["recall_at_k"] <= 1.0


def test_ndcg_bounds_and_ideal_dominance(spark):
    [r] = _rows(spark, "ndcg_retrieval_eval")
    assert 0.0 < r["idcg_at_k"]
    assert 0.0 <= r["dcg_at_k"] <= r["idcg_at_k"] + 1e-9
    assert 0.0 <= r["ndcg_at_k"] <= 1.0


def test_chi2_statistic_nonnegative(spark):
    [r] = _rows(spark, "event_type_value_chi2")
    assert r["chi2"] >= 0.0
    assert r["dof"] == 4  # (5 event types - 1) × (2 buckets - 1)
    assert r["n_cells"] == 10


def test_skew_report_shares_and_gini(spark):
    [r] = _rows(spark, "join_key_skew_report")
    assert r["n_keys"] > 0
    assert 0.0 < r["max_share"] <= r["top5_share"] <= 1.0
    assert 0.0 <= r["gini"] < 1.0


def test_label_propagation_partitions_all_nodes(spark):
    rows = _rows(spark, "label_propagation_communities")
    assert rows
    # communities are disjoint label groups; sizes are positive and the
    # list arrives largest-first
    sizes = [r["size"] for r in rows]
    assert sizes == sorted(sizes, reverse=True)
    assert all(s > 0 for s in sizes)


def test_bigram_perplexity_exceeds_zero_and_is_finite(spark):
    rows = _rows(spark, "bigram_perplexity_scores")
    assert len(rows) == 20
    for r in rows:
        assert r["n_bigrams"] > 0
        assert 0.0 < r["avg_nll"] < 50.0


def test_equi_depth_approx_matches_exact_contract(spark):
    """The approx variant must cover all 8 buckets with the tolerance
    booleans TRUE, and its bucket masses must be near the exact ntile
    variant's (the two plans answer the same question)."""
    rows = _rows(spark, "orders_equi_depth_approx")
    assert sorted(r["bucket"] for r in rows) == list(range(1, 9))
    assert all(r["within_tolerance"] for r in rows)


def test_calibration_curve_masses_and_bounds(spark):
    rows = _rows(spark, "logreg_calibration_curve")
    [train] = _rows(spark, "logreg_quality_classifier")
    assert sum(r["n_docs"] for r in rows) == train["n_train"]
    for r in rows:
        assert 0 <= r["bucket"] <= 9
        assert 0.0 <= r["avg_predicted"] <= 1.0
        assert 0.0 <= r["frac_positive"] <= 1.0
        # predicted mass must sit inside its decile (least() caps 1.0
        # into bucket 9)
        lo, hi = r["bucket"] / 10, (r["bucket"] + 1) / 10
        assert lo - 1e-9 <= r["avg_predicted"] <= (
            hi + 1e-9 if r["bucket"] < 9 else 1.0 + 1e-9
        )


def test_scd2_intervals_partition_time(spark):
    rows = _rows(spark, "scd2_user_value_history")
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r["valid_from_us"])
        # exactly one open current row, at the end
        assert [r["is_current"] for r in ivs].count(1) == 1
        assert ivs[-1]["is_current"] == 1
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to_us"] == b["valid_from_us"]  # gapless
            assert a["valid_from_us"] < a["valid_to_us"]  # non-empty


def test_proration_conserves_money_and_shares_sum_to_one(spark):
    rows = _rows(spark, "order_revenue_proration")
    assert all(r["conserved"] for r in rows)
    assert sum(r["share_of_total"] for r in rows) == pytest.approx(
        1.0, abs=1e-4
    )


def test_event_transitions_cover_type_pairs(spark):
    rows = _rows(spark, "event_sequence_transitions")
    assert rows
    for r in rows:
        src, dst = r["transition"].split(" -> ")
        assert src and dst
        assert 0 < r["n_users"] <= r["n_transitions"]


def test_softmax_classifier_per_class_rows(spark):
    rows = {r["lang_class"]: r for r in _rows(spark, "softmax_lang_classifier")}
    assert set(rows) == {"de", "en", "es", "fr", "zh"}
    total = sum(r["n_class"] for r in rows.values())
    assert total > 0
    for r in rows.values():
        assert 0.0 <= r["class_recall"] <= 1.0
        assert r["n_class"] > 0
    # weights must differ across classes (training actually moved them)
    vecs = {c: tuple(r[f"w{j}"] for j in range(5)) for c, r in rows.items()}
    assert len(set(vecs.values())) == len(vecs)


def test_dbscan_roles_match_planted_geometry(spark):
    """Planted structure: 20 colinear trios (all core), one simplex
    cluster of 4 cores + 1 border, everything else noise."""
    rows = _rows(spark, "dbscan_embedding_clusters")
    noise = [r for r in rows if r["cluster_id"] == -1]
    clusters = [r for r in rows if r["cluster_id"] != -1]
    assert len(noise) == 1 and noise[0]["n_core"] == 0
    assert noise[0]["n_border"] == 0
    trios = [r for r in clusters if r["n_points"] == 3]
    assert len(trios) == 20
    assert all(r["n_core"] == 3 and r["n_border"] == 0 for r in trios)
    simplex = [r for r in clusters if r["n_points"] == 5]
    assert len(simplex) == 1
    assert simplex[0]["n_core"] == 4 and simplex[0]["n_border"] == 1
    # accounting: every corpus row is classified exactly once
    from emails_to_vector_db_spark.plans.clustering import _TRIO_N
    from emails_to_vector_db_spark.sources.tables import load_table

    n_base = load_table(spark, SF_ORACLE, "embeddings").count()
    total = sum(r["n_points"] for r in rows)
    assert total == n_base + 2 * _TRIO_N + 5
