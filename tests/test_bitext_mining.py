"""Bitext margin mining (plans/semantic.py): the exact and IVF-routed
forms share the margin tail, so their only difference is the candidate
set — pinned here the same way the knn_join cutover is pinned in
tests/test_knn_cutover.py: IVF with nprobe covering EVERY list must be
row-identical to the exact cross product, and production nprobe must
keep high top-pair agreement."""

from __future__ import annotations

from pyspark.sql import functions as F

from emails_to_vector_db_spark.functions.vector import (
    cosine_similarity,
)
from emails_to_vector_db_spark.operators.ivf import (
    assign_centroid,
    nearest_centroids,
)
from emails_to_vector_db_spark.plans import REGISTRY
from emails_to_vector_db_spark.plans.semantic import (
    _BMM_SRC,
    _BMM_TGT,
    _bmm_margin_tail,
)
from emails_to_vector_db_spark.plans.vector import (
    _embeddings_rows,
    _ivf_centroids,
    _ivf_k,
)
from emails_to_vector_db_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _sides(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    docs = load_table(spark, SF_ORACLE, "documents").select(
        "doc_id", "lang"
    )
    sides = emb.join(docs, emb["vec_id"] == docs["doc_id"]).select(
        "vec_id", "embedding", "lang"
    )
    xs = sides.where(F.col("lang") == _BMM_SRC).select(
        F.col("vec_id").alias("xid"), F.col("embedding").alias("xv")
    )
    ys = sides.where(F.col("lang") == _BMM_TGT).select(
        F.col("vec_id").alias("yid"), F.col("embedding").alias("yv")
    )
    return xs, ys


def test_full_coverage_ivf_equals_exact(spark):
    """nprobe = k (every list probed) ⇒ the IVF candidate set IS the
    cross product ⇒ the mined pairs must be bit-identical to the exact
    form. This is the cutover-correctness pin: any divergence means the
    IVF routing itself (not the approximation) is wrong."""
    cents = _ivf_centroids(_ivf_k(_embeddings_rows(SF_ORACLE)), SF_ORACLE)
    xs, ys = _sides(spark)
    ys_a = ys.withColumn("_cid", assign_centroid(F.col("yv"), cents))
    xs_p = xs.withColumn(
        "_cid",
        F.explode(
            nearest_centroids(F.col("xv"), cents, len(cents))
        ),
    )
    cand = ys_a.join(xs_p, "_cid").select(
        "xid",
        "yid",
        F.round(cosine_similarity("xv", "yv"), 6).alias("sim"),
    )
    full = _bmm_margin_tail(cand)
    exact = REGISTRY["bitext_margin_mining"].fn(spark, SF_ORACLE)
    assert _rows(full) == _rows(exact)


def test_blas_route_equals_expression_route(spark):
    """The per-list BLAS route (the >10M-element-op cutover taken at
    corpus scale) must produce the same mined pairs as the expression
    route the oracle checks at fixture scale — same candidate
    semantics, same normalizers, different physical lanes."""
    from emails_to_vector_db_spark.plans.semantic import _bmm_ivf_blas

    cents = _ivf_centroids(_ivf_k(_embeddings_rows(SF_ORACLE)), SF_ORACLE)
    xs, ys = _sides(spark)
    blas = _bmm_ivf_blas(spark, xs, ys, cents, 4)
    expr = REGISTRY["bitext_margin_mining_ivf"].fn(spark, SF_ORACLE)
    assert _rows(blas) == _rows(expr)


def test_production_nprobe_recall(spark):
    """At production nprobe=4 the IVF-mined top pairs must agree with
    the exact form on a clear majority — the measured recall of the
    approximation, the same audit the ANN family carries."""
    exact = {
        (r["src_doc"], r["tgt_doc"])
        for r in REGISTRY["bitext_margin_mining"].fn(
            spark, SF_ORACLE
        ).collect()
    }
    approx = {
        (r["src_doc"], r["tgt_doc"])
        for r in REGISTRY["bitext_margin_mining_ivf"].fn(
            spark, SF_ORACLE
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF bitext recall {recall:.2f} < 0.5"
