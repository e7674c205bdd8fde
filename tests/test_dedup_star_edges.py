"""Star-edge component equivalence + no-all-pairs guards for the
MinHash-LSH clustering path (operators/dedup.py::
minhash_lsh_component_edges).

The pair form emits O(n²) edges inside a bucket of n twins; the
component-edge form collapses signature-identical groups to a min-id
representative (star edges, O(n)) and pairs representatives only. The
two must produce IDENTICAL connected components — and a clique of k
identical docs must emit exactly k-1 edges, which is the guard that
fails loudly if all-pairs emission ever creeps back onto the
clustering path.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from emails_to_vector_db_spark.operators.components import (
    connected_components,
)
from emails_to_vector_db_spark.operators.dedup import (
    minhash_lsh_component_edges,
    minhash_lsh_pairs,
)

_KW = dict(n_hashes=8, n_bands=4, shingle_n=3, threshold=0.5)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _components(spark, edges_df):
    return sorted(
        tuple(r) for r in connected_components(edges_df).collect()
    )


def _pair_edges(docs):
    return minhash_lsh_pairs(docs, **_KW).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )


def _mixed_corpus():
    """Exact-twin groups, chained near-dups, singletons, shingle-less."""
    rng = random.Random(42)
    vocab = [f"word{i}" for i in range(200)]
    rows = []
    did = 0

    def sentence(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    # 3 exact-twin groups of sizes 12, 5, 2
    for size in (12, 5, 2):
        text = sentence(30)
        for _ in range(size):
            rows.append((did, text))
            did += 1
    # 4 chained near-dup families: orig -> light edit -> heavier edit
    for _ in range(4):
        base = sentence(40).split()
        rows.append((did, " ".join(base)))
        did += 1
        v1 = base[:-2] + ["tailedit", "tokens"]
        rows.append((did, " ".join(v1)))
        did += 1
        v2 = v1[:-4] + ["second", "round", "of", "edits"]
        rows.append((did, " ".join(v2)))
        did += 1
    # 10 unrelated singletons
    for _ in range(10):
        rows.append((did, sentence(25)))
        did += 1
    # 3 shingle-less docs (<3 tokens): all-NULL signatures, no edges
    for short in ("a", "b c", "x"):
        rows.append((did, short))
        did += 1
    return rows


def test_components_identical_to_pair_form(spark):
    docs = _df(spark, _mixed_corpus())
    via_pairs = _components(spark, _pair_edges(docs))
    via_star = _components(
        spark, minhash_lsh_component_edges(docs, **_KW)
    )
    assert via_star == via_pairs
    assert len(via_star) > 20  # the fixture actually links things


def test_clique_emits_linear_edges(spark):
    """50 identical docs: pair form emits C(50,2)=1225 edges, the
    clustering path must emit exactly 49 star edges — the loud guard
    against all-pairs emission returning to the CC path."""
    text = " ".join(f"tok{i}" for i in range(25))
    docs = _df(spark, [(i, text) for i in range(50)])
    star = minhash_lsh_component_edges(docs, **_KW)
    assert star.count() == 49
    assert minhash_lsh_pairs(docs, **_KW).count() == 1225
    # and the components still name min-id as the label for all 50
    comp = connected_components(star).collect()
    assert len(comp) == 50
    assert {r["component"] for r in comp} == {0}


def test_shingleless_docs_never_linked(spark):
    """Docs with <3 tokens have all-NULL signatures: the pair form never
    candidates them; the star form must not link them through a shared
    null fingerprint."""
    docs = _df(
        spark, [(1, "a"), (2, "b"), (3, "x y"), (4, "solo pair of")]
    )
    assert minhash_lsh_component_edges(docs, **_KW).count() == 0


def test_fellegi_sunter_candidate_space_linear(spark):
    """Regression net for the round-5 fixed-cardinality block key:
    sorted-neighborhood candidates must number EXACTLY
    n*(W-1) - W*(W-1)/2 at every scale (each rank pairs with the next
    W-1 ranks, truncated at the tail). A mod-k block key makes the
    count quadratic in n and fails this formula at the larger scale
    immediately."""
    from emails_to_vector_db_spark.plans.analytics import (
        _FS_WINDOW,
        _fs_candidate_pairs,
    )
    from emails_to_vector_db_spark.sources.tables import load_table
    from tests.conftest import SF_ORACLE, SF_SMOKE

    for sf in (SF_SMOKE, SF_ORACLE):
        cust = load_table(spark, sf, "customer")
        n = (
            cust.count()
            + cust.where(F.col("c_custkey") % 7 == 0).count()
        )
        w = _FS_WINDOW
        expect = n * (w - 1) - w * (w - 1) // 2
        got = _fs_candidate_pairs(spark, sf).count()
        assert got == expect, (
            f"{sf}: {got} candidate pairs, linear contract says {expect}"
        )


def _write_docs_fixture(spark, path, rows):
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_minhash_group_twin_explodes_to_pair_form(spark, tmp_path):
    """minhash_near_dup_groups condensed rows, exploded back through
    group membership, must reproduce the EXACT (id_a, id_b, est) rows of
    minhash_lsh_near_dups — on a duplicate-heavy corpus where the group
    form's row count stays far below the pair form's quadratic output."""
    from emails_to_vector_db_spark.operators.dedup import (
        _minhash_signatures,
        signature_gid,
    )
    from emails_to_vector_db_spark.plans import REGISTRY
    from emails_to_vector_db_spark.plans.dedup import _docs_with_near_dups

    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(150)]

    def sentence(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    rows, did = [], 0
    # two heavy exact-twin groups (the quadratic worst case) + near-dup
    # chains + singletons
    for size in (20, 8):
        text = sentence(30)
        for _ in range(size):
            rows.append((did, text))
            did += 1
    for _ in range(3):
        base = sentence(40).split()
        rows.append((did, " ".join(base)))
        did += 1
        rows.append((did, " ".join(base[:-2] + ["edit", "tail"])))
        did += 1
    for _ in range(6):
        rows.append((did, sentence(25)))
        did += 1
    sf = str(tmp_path / "mh")
    _write_docs_fixture(spark, sf, rows)

    pair = (
        REGISTRY["minhash_lsh_near_dups"].fn(spark, sf).collect()
    )
    grp_rows = REGISTRY["minhash_near_dup_groups"].fn(spark, sf)
    # group membership: doc -> its signature-group representative
    docs = _docs_with_near_dups(spark, sf)
    sig = (
        _minhash_signatures(
            docs.select("doc_id", "text"), "doc_id", "text", 8, 4, 3
        )
        .withColumn("gid", signature_gid("sig"))
        .where(F.col("gid").isNotNull())
        .select("doc_id", "gid")
    )
    reps = sig.groupBy("gid").agg(F.min("doc_id").alias("rep"))
    member = sig.join(reps, "gid").select("doc_id", "rep")

    diag = grp_rows.where(F.col("rep_a") == F.col("rep_b"))
    cross = grp_rows.where(F.col("rep_a") != F.col("rep_b"))
    m1 = member.select(F.col("rep").alias("rep_a"), F.col("doc_id").alias("da"))
    m2 = member.select(F.col("rep").alias("rep_b"), F.col("doc_id").alias("db"))
    exploded_diag = (
        diag.join(m1, "rep_a")
        .join(m2.withColumnRenamed("rep_b", "rep_a"), "rep_a")
        .where(F.col("da") < F.col("db"))
        .select(
            F.col("da").alias("id_a"),
            F.col("db").alias("id_b"),
            "est_jaccard",
        )
    )
    exploded_cross = (
        cross.join(m1, "rep_a")
        .join(m2, "rep_b")
        .select(
            F.least("da", "db").alias("id_a"),
            F.greatest("da", "db").alias("id_b"),
            "est_jaccard",
        )
    )
    got = sorted(
        tuple(r) for r in exploded_diag.unionByName(exploded_cross).collect()
    )
    want = sorted((r.id_a, r.id_b, r.est_jaccard) for r in pair)
    assert got == want
    # condensation actually condenses: 20-twin group alone is C(20,2)=190
    # pair rows but ONE group row
    n_grp = grp_rows.count()
    assert n_grp < len(want) / 4, (n_grp, len(want))
    # and the exploded pair mass matches the recorded n_pairs exactly
    assert (
        grp_rows.agg(F.sum("n_pairs")).collect()[0][0] == len(want)
    )


def test_embedding_group_twin_explodes_to_pair_form(spark, tmp_path):
    """embedding_near_dup_groups exploded through (label, vector) group
    membership must reproduce embedding_near_dups_lsh exactly on a
    corpus with byte-identical duplicate vectors (the replicated-corpus
    shape the condensation exists for)."""
    from emails_to_vector_db_spark.plans import REGISTRY
    from emails_to_vector_db_spark.plans.dedup import (
        _EMB_DUP_OFFSET,
        _EMB_N_PLANT,
    )

    rng = random.Random(11)
    dim = 16
    rows = []
    vid = 0
    # 6 base directions, replicated 1-12x byte-identically, two labels
    for b in range(6):
        v = [round(rng.uniform(-1, 1), 4) for _ in range(dim)]
        for _ in range(1 + (b * 7) % 12):
            rows.append((vid, v, b % 2))
            vid += 1
    # a few unique vectors
    for _ in range(8):
        rows.append(
            (vid, [round(rng.uniform(-1, 1), 4) for _ in range(dim)], vid % 2)
        )
        vid += 1
    sf = str(tmp_path / "emb")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")

    pair = REGISTRY["embedding_near_dups_lsh"].fn(spark, sf).collect()
    grp_rows = REGISTRY["embedding_near_dup_groups"].fn(spark, sf)

    # rebuild the planted union both queries derive from, then the
    # (label, vector) group membership
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    planted = emb.where(F.col("vec_id") < _EMB_N_PLANT).select(
        (F.col("vec_id") + _EMB_DUP_OFFSET).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: x * 2.0
        ).alias("v"),
        "label",
    )
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    ).unionByName(planted)
    member = base.join(
        base.groupBy("label", "v").agg(F.min("vec_id").alias("rep")),
        ["label", "v"],
    ).select("vec_id", "rep")

    diag = grp_rows.where(F.col("rep_a") == F.col("rep_b"))
    cross = grp_rows.where(F.col("rep_a") != F.col("rep_b"))
    m1 = member.select(F.col("rep").alias("rep_a"), F.col("vec_id").alias("da"))
    m2 = member.select(F.col("rep").alias("rep_b"), F.col("vec_id").alias("db"))
    exploded = (
        diag.join(m1, "rep_a")
        .join(m2.withColumnRenamed("rep_b", "rep_a"), "rep_a")
        .where(F.col("da") < F.col("db"))
        .select(
            F.col("da").alias("id_a"), F.col("db").alias("id_b"), "cos_sim"
        )
        .unionByName(
            cross.join(m1, "rep_a")
            .join(m2, "rep_b")
            .select(
                F.least("da", "db").alias("id_a"),
                F.greatest("da", "db").alias("id_b"),
                "cos_sim",
            )
        )
    )
    got = sorted(tuple(r) for r in exploded.collect())
    want = sorted((r.id_a, r.id_b, r.cos_sim) for r in pair)
    assert got == want
    assert len(want) > 50  # replication actually produced pair mass
    # the 12-twin group alone is 66 pair rows but ONE group row
    assert grp_rows.count() < len(want) / 3


def test_registry_queries_hash_unchanged(spark):
    """The two switched registry queries still match their oracles at
    fixture scale (fast inline check; test_oracle_parity.py is the full
    gate)."""
    from emails_to_vector_db_spark.plans import REGISTRY
    from tests.conftest import SF_SMOKE, duck_con, rows_match

    for name in ("near_dup_components", "dedup_quality_survivors"):
        df = REGISTRY[name].fn(spark, SF_SMOKE)
        duck = duck_con(SF_SMOKE).execute(REGISTRY[name].oracle).fetchall()
        ok, why = rows_match(df, duck)
        assert ok, f"{name}: {why}"
