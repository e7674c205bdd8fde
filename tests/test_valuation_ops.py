"""Invariants for the valuation/curation-audit operators beyond the
oracle parity gate (which tests/test_oracle_parity.py applies to all
six registered queries automatically)."""

from __future__ import annotations

from pyspark.sql import functions as F

from emails_to_vector_db_spark.plans import REGISTRY
from emails_to_vector_db_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE


def test_template_canonicalization_matches_array_expression(spark):
    """The scalable explode+min-position canonical form must equal the
    O(L^2) array_position reference expression doc-for-doc — the same
    equivalence-pinning discipline as the repetition cutover."""
    from emails_to_vector_db_spark.functions import text as TX

    d = (
        load_table(spark, SF_ORACLE, "documents")
        .select("doc_id", "text")
        .limit(100)
    )
    arr = TX.tokens("text")
    # O(L^2) reference: token -> 1-based first-occurrence position.
    ref = d.select(
        "doc_id",
        F.md5(
            F.array_join(
                F.transform(
                    arr, lambda t: F.array_position(arr, t).cast("string")
                ),
                ",",
            )
        ).alias("tfp_ref"),
    )
    inst = d.select(
        "doc_id", F.posexplode(TX.tokens("text")).alias("pos", "tok")
    )
    fo = inst.groupBy("doc_id", "tok").agg(F.min("pos").alias("fpos"))
    got = (
        inst.join(fo, ["doc_id", "tok"])
        .groupBy("doc_id")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "fpos"))),
                        lambda s: (s["fpos"] + 1).cast("string"),
                    ),
                    ",",
                )
            ).alias("tfp")
        )
    )
    diff = (
        ref.join(got, "doc_id")
        .where(F.col("tfp_ref") != F.col("tfp"))
        .count()
    )
    assert diff == 0


def test_template_dups_detects_every_planted_bijection(spark):
    """Each planted word-bijection twin must land in a template group
    with its original: groups containing a planted id (>= 200000) must
    also contain the source doc's template (rep <= original id)."""
    out = (
        REGISTRY["template_dups_cross_lang"]
        .fn(spark, SF_ORACLE)
        .collect()
    )
    assert len(out) > 0
    # planted twin ids ride the derived offset max(doc_id) + 1
    off = (
        load_table(spark, SF_ORACLE, "documents")
        .agg(F.max("doc_id"))
        .collect()[0][0]
        + 1
    )
    # every planted doc (doc_id % 7 == 3) appears in some group whose
    # representative is an ORIGINAL doc (templates are shared), so no
    # group may consist solely of planted ids.
    assert all(r["rep_doc_id"] < off for r in out)
    assert all(r["n_langs"] >= 2 for r in out)


def test_coreset_contract_bounds(spark):
    """The sensitivity sample must be non-trivial and unbiased-ish:
    weighted mass within 25% of n, weighted cost within 50% of the
    true cost (loose bounds — the exact values are oracle-pinned)."""
    row = (
        REGISTRY["coreset_sensitivity_sample"]
        .fn(spark, SF_ORACLE)
        .collect()[0]
    )
    assert 0 < row["coreset_n"] < row["n_points"]
    assert abs(row["est_mass"] - row["n_points"]) / row["n_points"] < 0.25
    assert 0.5 < row["cost_ratio"] < 1.5


def test_self_influence_output_is_sorted_and_positive(spark):
    rows = REGISTRY["nb_self_influence"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 20
    vals = [r["self_influence"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    # removing a doc's own counts can only lower its own likelihood
    # (the prior shift is O(1/n) and dominated at fixture scale)
    assert all(v > 0 for v in vals)


def test_filter_shapley_efficiency_axiom(spark):
    """The Shapley values must sum EXACTLY to the jointly-removed token
    mass (efficiency axiom) — the property naive per-gate removal
    counts violate on overlapping gates."""
    row = (
        REGISTRY["filter_shapley_attribution"]
        .fn(spark, SF_ORACLE)
        .collect()[0]
    )
    s = row["phi_len"] + row["phi_div"] + row["phi_cpt"]
    assert abs(s - row["removed_total"]) < 0.01
    assert 0 < row["removed_total"] < row["total_tokens"]
    # each gate must have some marginal effect on this fixture
    assert row["phi_len"] > 0 and row["phi_div"] > 0 and row["phi_cpt"] > 0


def test_canary_audit_dedup_collapses_replication(spark):
    """Dedup must collapse every canary to at most one surviving copy
    regardless of replication rate; without dedup survivors scale with
    the planted copy count."""
    rows = {
        r["copies_class"]: r
        for r in REGISTRY["canary_extraction_audit"]
        .fn(spark, SF_ORACLE)
        .collect()
    }
    assert set(rows) == {1, 8, 64}
    for rate, r in rows.items():
        assert r["n_planted_copies"] == r["n_canaries"] * rate
        assert r["post_dedup"] <= r["n_canaries"]
        assert r["post_quality_no_dedup"] <= r["n_planted_copies"]
    # replication shows up ONLY on the no-dedup path
    assert (
        rows[64]["post_quality_no_dedup"]
        > rows[64]["post_dedup_quality"]
    )


def test_paired_bootstrap_ci_brackets_delta(spark):
    row = (
        REGISTRY["paired_bootstrap_system_eval"]
        .fn(spark, SF_ORACLE)
        .collect()[0]
    )
    assert row["n_queries"] == 20
    assert row["ci_lo"] <= row["ci_hi"]
    # the point delta should land inside (or on) the resampling CI
    assert row["ci_lo"] - 0.05 <= row["delta"] <= row["ci_hi"] + 0.05
    assert 0.0 <= row["frac_delta_le0"] <= 1.0


def test_excess_loss_mixture_is_normalized(spark):
    rows = REGISTRY["excess_loss_mixture"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 20
    total = sum(r["mix_weight"] for r in rows)
    assert abs(total - 1.0) < 0.001
    # specialization: own-source LM should beat the global LM on
    # held-out text for at least one source
    assert any(r["excess"] > 0 for r in rows)


def test_loo_valuation_covers_topk_sources(spark):
    rows = REGISTRY["loo_source_valuation"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 5
    assert len({r["source"] for r in rows}) == 5
    accs = {r["acc_full"] for r in rows}
    assert len(accs) == 1  # acc_full is a model-level scalar


def test_minhash_audit_tiers_make_errors_visible(spark):
    """The three planted difficulty tiers must produce a non-trivial
    audit: every easy (one-token) twin pair is both truth and detected,
    and the threshold-hugging tier makes recall or precision < 1."""
    row = (
        REGISTRY["minhash_recall_precision_audit"]
        .fn(spark, SF_ORACLE)
        .collect()[0]
    )
    assert row["n_truth"] >= 100  # tiers 1+2 are all true near-dups
    assert row["n_common"] <= min(row["n_truth"], row["n_detected"])
    assert 0.7 <= row["recall"] <= 1.0
    assert 0.7 <= row["precision"] <= 1.0
    assert row["recall"] < 1.0 or row["precision"] < 1.0


def test_embedding_lsh_audit_multiprobe_misses_borderline(spark):
    """The sign-LSH multiprobe must show its real error profile on the
    tiered plants: perfect precision (the verify step is exact) but
    recall < 1 (borderline pairs land at Hamming distance >= 2)."""
    row = (
        REGISTRY["embedding_lsh_recall_audit"]
        .fn(spark, SF_ORACLE)
        .collect()[0]
    )
    assert row["precision"] == 1.0
    assert 0.5 <= row["recall"] < 1.0
    assert row["n_common"] == row["n_detected"] <= row["n_truth"]
