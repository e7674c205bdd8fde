"""Extra semantics checks for operators whose oracle is weak or absent."""

from __future__ import annotations

from emails_to_vector_db_spark.plans.registry import REGISTRY
from tests.conftest import SF_ORACLE


def test_approx_distinct_within_tolerance(spark):
    rows = REGISTRY["segment_approx_distinct"].fn(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.within_tolerance, f"{r.c_mktsegment}: sketch out of tolerance"
        assert r.exact_orders > 0


def test_topk_subset_property(spark):
    """top-k ⊆ top-(k+1) (SURVEY.md §5.4 property test)."""
    from pyspark.sql import functions as F

    from emails_to_vector_db_spark.operators.knn import knn_topk
    from emails_to_vector_db_spark.sources.tables import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings")
    probe = emb.where(F.col("vec_id") == 3).collect()[0].embedding
    k5 = {r.vec_id for r in knn_topk(emb, probe, k=5).collect()}
    k6 = {r.vec_id for r in knn_topk(emb, probe, k=6).collect()}
    assert k5 <= k6


def test_distance_axioms(spark):
    """symmetry + identity on a sample (SURVEY.md §5.4)."""
    from pyspark.sql import functions as F

    from emails_to_vector_db_spark.functions.vector import l2_distance
    from emails_to_vector_db_spark.sources.tables import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings").where(F.col("vec_id") < 20)
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    pairs = a.crossJoin(b)
    checked = pairs.select(
        "ia",
        "ib",
        l2_distance("va", "vb").alias("dab"),
        l2_distance("vb", "va").alias("dba"),
    ).collect()
    for r in checked:
        assert abs(r.dab - r.dba) < 1e-12  # symmetry
        if r.ia == r.ib:
            assert r.dab == 0.0  # identity
