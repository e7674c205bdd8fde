"""Round-7 additions: rolling-window substring dedup (alignment
invariance vs the non-overlapping span form) and leakage-safe split
assignment (cluster-keyed split + honest straddle audit)."""

from __future__ import annotations

from emails_to_vector_db_spark.plans import REGISTRY

from .conftest import SF_ORACLE


def _mk_docs_dir(spark, tmp_path, rows):
    """Write a minimal documents.parquet a plan fn can load via sf_dir."""
    df = spark.createDataFrame(
        [
            (i, text, "en", "unit", len(text))
            for i, text in rows
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_substring_window_alignment_invariance(spark, tmp_path):
    """A 20-token passage copied at a DIFFERENT offset is caught by the
    rolling-window form (stride 1): the shared run must cover all 5
    window starts of the 20-token passage (20 - 16 + 1), i.e. longest
    duplicated substring == 20 tokens exactly. Non-overlapping 8-token
    spans would only match if the copy landed span-aligned."""
    # doc_ids >= 50: the plan's chained-dup fixture plants whole-doc
    # copies for doc_id < 50, which would flag every window
    passage = " ".join(f"p{i}" for i in range(20))
    a = "x0 x1 x2 " + passage + " y0 y1 y2 y3 y4"  # passage at offset 3
    b = "z0 " + passage + " q0 q1 q2 q3 q4 q5 q6"  # passage at offset 1
    filler = [
        (100 + j, " ".join(f"f{j}_{i}" for i in range(30))) for j in range(3)
    ]
    sf = _mk_docs_dir(spark, tmp_path, [(51, a), (52, b)] + filler)
    out = {
        r["doc_id"]: r
        for r in REGISTRY["substring_window_dedup"].fn(spark, sf).collect()
    }
    for d in (51, 52):
        assert out[d]["n_dup_windows"] == 5
        assert out[d]["max_dup_substring_tokens"] == 20
    for j in (100, 101, 102):
        assert out[j]["n_dup_windows"] == 0
        assert out[j]["max_dup_substring_tokens"] == 0


def test_substring_window_within_doc_repeat_not_flagged(spark, tmp_path):
    """Cross-doc contract: a 16-gram repeated twice INSIDE one document
    (but nowhere else) is not a duplicate — the census counts distinct
    documents, not occurrences."""
    block = " ".join(f"r{i}" for i in range(16))
    solo = block + " m0 m1 m2 " + block
    sf = _mk_docs_dir(
        spark,
        tmp_path,
        [(51, solo), (52, " ".join(f"o{i}" for i in range(40)))],
    )
    out = {
        r["doc_id"]: r
        for r in REGISTRY["substring_window_dedup"].fn(spark, sf).collect()
    }
    assert out[51]["n_dup_windows"] == 0


def test_split_leakage_audit_prices_the_policies(spark):
    """The audit measures leakage as data: the cluster-keyed policy is
    provably leak-free (every copy shares its cluster's bucket), while
    the raw doc-id policy must leak SOME of the 50 planted exact copies
    across splits — and every straddling cluster contributes ≥2 docs."""
    fn = REGISTRY["split_leakage_audit"].fn
    rows = {r["policy"]: r for r in fn(spark, SF_ORACLE).collect()}
    assert set(rows) == {"doc_id_hash", "cluster_hash"}
    safe, leaky = rows["cluster_hash"], rows["doc_id_hash"]
    assert safe["straddle_clusters"] == 0
    assert safe["leaked_docs"] == 0
    assert leaky["straddle_clusters"] > 0
    assert leaky["leaked_docs"] >= 2 * leaky["straddle_clusters"]
    # both policies see the same cluster universe
    assert safe["n_clusters"] == leaky["n_clusters"]
    # deterministic: a second run returns identical numbers
    rows2 = {r["policy"]: r for r in fn(spark, SF_ORACLE).collect()}
    assert rows == rows2


def test_corpus_snapshot_diff_conservation(spark):
    """The diff partitions both snapshots: removed+changed+unchanged
    accounts for every snapshot-A doc, added+changed+unchanged for
    every snapshot-B doc, and all four statuses occur on the fixture."""
    from emails_to_vector_db_spark.sources.tables import load_table

    rows = REGISTRY["corpus_snapshot_diff"].fn(spark, SF_ORACLE).collect()
    n_a = load_table(spark, SF_ORACLE, "documents").count()
    tot = {
        k: sum(r[k] for r in rows)
        for k in ("n_added", "n_removed", "n_changed", "n_unchanged")
    }
    assert all(v > 0 for v in tot.values())
    assert tot["n_removed"] + tot["n_changed"] + tot["n_unchanged"] == n_a
    # snapshot B = kept (changed+unchanged) + added
    n_b = tot["n_added"] + tot["n_changed"] + tot["n_unchanged"]
    assert n_b == n_a - tot["n_removed"] + tot["n_added"]


def test_epoch_shuffle_decorrelation_audit(spark):
    """Different epoch seeds must produce statistically independent
    orders: chi² over the 10×10 joint decile census stays below the
    df=99 critical value, all corpus mass is accounted for, and the
    audit CATCHES the correlated failure mode (same seed both epochs
    → all mass on the diagonal, chi² ≳ 9 × corpus size)."""
    from pyspark.sql import functions as F

    from emails_to_vector_db_spark.functions import text as TX
    from emails_to_vector_db_spark.sources.tables import load_table

    rows = (
        REGISTRY["epoch_shuffle_decorrelation"].fn(spark, SF_ORACLE).collect()
    )
    n_docs = load_table(spark, SF_ORACLE, "documents").count()
    assert sum(r["n"] for r in rows) == n_docs
    chi2 = sum(r["chi2_term"] for r in rows)
    assert chi2 < 134.6  # χ²₉₉ at p=0.01
    # degenerate control: identical seeds concentrate on the diagonal
    d = load_table(spark, SF_ORACLE, "documents")
    k = TX.md5_long(F.col("doc_id").cast("string"), salt="epoch:0:")
    dec = F.floor(k * F.lit(10.0) / F.lit(float(2**60))).cast("long")
    same = (
        d.select(dec.alias("d0"), dec.alias("d1"))
        .where(F.col("d0") == F.col("d1"))
        .count()
    )
    assert same == n_docs  # all mass diagonal -> audit would explode


def test_incremental_lsh_dedup_routing(spark):
    """Delta routing contract: changed docs (salted bucket 1) must match
    their own indexed old version; the spawned twins (bucket 2) must
    match within the delta; md5-soup docs (bucket 3, disjoint vocab)
    must come out is_novel — the three branches an incremental ingest
    pipeline takes."""
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["incremental_lsh_dedup"].fn(spark, SF_ORACLE).collect()
    }
    assert rows, "empty delta"
    # delta ids ride multiples of the derived base (10M at fixture ids)
    base = 10_000_000
    changed = [r for i, r in rows.items() if i < base]
    twins = [r for i, r in rows.items() if base <= i < 3 * base]
    novel = [r for i, r in rows.items() if i >= 3 * base]
    assert changed and twins and novel
    assert all(r["n_index_matches"] >= 1 for r in changed)
    assert all(not r["is_novel"] for r in changed)
    assert all(r["n_delta_matches"] >= 1 for r in twins)
    assert all(r["is_novel"] for r in novel)
    assert all(r["best_est"] == 0.0 for r in novel)


def test_ivf_rebalance_plan_invariants_and_skew(spark, tmp_path):
    """Fixture invariants (every list present, counts partition the
    corpus, keep-rows neutral) + a skewed corpus where one list absorbs
    everything: that list must SPLIT into ~k parts and the starved
    lists must MERGE into a real neighbor (never themselves)."""
    from pyspark.sql import functions as F

    from emails_to_vector_db_spark.sources.tables import load_table

    fn = REGISTRY["ivf_rebalance_plan"].fn
    rows = fn(spark, SF_ORACLE).collect()
    n_emb = load_table(spark, SF_ORACLE, "embeddings").count()
    assert sum(r["n_vecs"] for r in rows) == n_emb
    assert {r["cid"] for r in rows} == set(range(len(rows)))
    for r in rows:
        if r["action"] == "keep":
            assert r["split_parts"] == 1 and r["merge_into"] == -1

    # skew: every vector becomes a copy of one embedding -> one hot list
    emb = load_table(spark, SF_ORACLE, "embeddings")
    one = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("e")
    )
    skewed = emb.crossJoin(F.broadcast(one)).select(
        "vec_id", F.col("e").alias("embedding"), "label"
    )
    skewed.write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    srows = fn(spark, str(tmp_path)).collect()
    hot = [r for r in srows if r["action"] == "split"]
    cold = [r for r in srows if r["action"] == "merge"]
    k = len(srows)
    assert len(hot) == 1
    assert hot[0]["n_vecs"] == n_emb
    assert hot[0]["split_parts"] == k
    assert len(cold) == k - 1
    for r in cold:
        assert r["merge_into"] != -1 and r["merge_into"] != r["cid"]
