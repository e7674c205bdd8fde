"""Property tests over the text/dedup/vector expression library: 200
seeded random documents per property, evaluated in ONE Spark job each
(SURVEY.md §5.4)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from emails_to_vector_db_spark.functions import text as TX
from emails_to_vector_db_spark.operators.dedup import simhash

_VOCAB = "alpha beta gamma delta eps zeta eta theta iota kappa".split()


def _docs(n=200, seed=42):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        k = rng.randint(0, 30)
        toks = [rng.choice(_VOCAB) for _ in range(k)]
        out.append((i, " ".join(toks), toks))
    return out


def test_token_and_shingle_counts(spark):
    rows = [(i, t) for i, t, _ in _docs()]
    df = spark.createDataFrame(rows, "id long, text string")
    tok = TX.tokens("text")
    got = df.select(
        "id",
        F.size(tok).alias("n_tok"),
        F.size(TX.shingles(tok, 3)).alias("n_sh"),
    ).collect()
    expected = {i: len(toks) for i, _, toks in _docs()}
    for r in got:
        n = expected[r.id]
        # split('') yields [''] -> size 1 for empty text; guard matches impl
        exp_tok = n if n > 0 else 1
        assert r.n_tok == exp_tok
        assert r.n_sh == (exp_tok - 2 if exp_tok >= 3 else 0)


def test_fingerprint_whitespace_invariance(spark):
    rows = []
    for i, t, toks in _docs(100):
        messy = "  " + t.replace(" ", "   ") + "\t"
        rows.append((i, t, messy))
    df = spark.createDataFrame(rows, "id long, clean string, messy string")
    got = df.select(
        (TX.fingerprint("clean") == TX.fingerprint("messy")).alias("same")
    ).collect()
    assert all(r.same for r in got)


def test_simhash_order_invariance(spark):
    rows = []
    rng = random.Random(7)
    for i, t, toks in _docs(100):
        if not toks:
            continue
        shuffled = toks[:]
        rng.shuffle(shuffled)
        rows.append((i, t, " ".join(shuffled)))
    df = spark.createDataFrame(rows, "id long, a string, b string")
    got = df.select(
        (
            simhash(TX.tokens("a"), bits=32) == simhash(TX.tokens("b"), bits=32)
        ).alias("same")
    ).collect()
    # simhash folds a bag of token hashes: permutation-invariant
    assert all(r.same for r in got)


def test_stopword_and_punct_ratios_bounded(spark):
    rows = [(i, t + (" the a and" if i % 3 == 0 else "")) for i, t, _ in _docs(150)]
    df = spark.createDataFrame(rows, "id long, text string")
    tok = TX.tokens("text")
    got = df.select(
        TX.stopword_ratio(tok, TX.LANG_STOPWORDS["en"]).alias("sr"),
        TX.punct_ratio("text").alias("pr"),
        TX.quality_score("text").alias("q"),
    ).collect()
    for r in got:
        assert 0.0 <= r.sr <= 1.0
        assert 0.0 <= r.pr <= 1.0
        assert 0.0 <= r.q <= 1.0


def test_pii_redaction_idempotent(spark):
    """Redacting already-redacted text is a no-op: placeholders contain no
    match for any PII pattern (200 random PII-laced docs, one job)."""
    from emails_to_vector_db_spark.plans.cleaning import (
        _RE_EMAIL,
        _RE_PHONE,
        _RE_SSN,
    )

    rng = random.Random(7)
    rows = []
    for i in range(200):
        bits = [rng.choice(_VOCAB) for _ in range(rng.randint(0, 8))]
        if i % 2:
            bits.append(f"u{rng.randint(0, 999)}@ex{rng.randint(0, 9)}.org")
        if i % 3 == 0:
            bits.append(f"{rng.randint(100, 999)}-{rng.randint(100, 999)}-{rng.randint(1000, 9999)}")
        if i % 5 == 0:
            bits.append(f"{rng.randint(100, 999)}-{rng.randint(10, 99)}-{rng.randint(1000, 9999)}")
        rows.append((i, " ".join(bits)))
    df = spark.createDataFrame(rows, "id long, text string")

    def redact(col):
        return F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(col, _RE_EMAIL, "[EMAIL]"), _RE_SSN, "[SSN]"
            ),
            _RE_PHONE,
            "[PHONE]",
        )

    once = df.select("id", redact(F.col("text")).alias("r1"))
    twice = once.select("id", "r1", redact(F.col("r1")).alias("r2"))
    bad = twice.where(F.col("r1") != F.col("r2")).count()
    assert bad == 0


def test_sequence_packing_budget_property(spark):
    """Every pack except a stratum's last is within one document of the
    budget: pack_tokens - last_doc_tokens < budget (greedy first-fit
    invariant), and packs partition the corpus exactly."""
    from emails_to_vector_db_spark.plans.cleaning import (
        _PACK_BUDGET,
        sequence_packing,
    )
    from emails_to_vector_db_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    packs = sequence_packing(spark, SF_SMOKE).collect()
    d = load_table(spark, SF_SMOKE, "documents")
    total_docs = d.count()
    assert sum(p.n_docs for p in packs) == total_docs
    # exclusive-prefix-sum binning: a pack's pre-overflow content is < budget,
    # so pack_tokens < budget + max_doc_tokens
    max_doc = d.select(
        F.max(F.size(F.split(F.trim("text"), r"\s+"))).alias("m")
    ).first().m
    for p in packs:
        assert p.pack_tokens < _PACK_BUDGET + max_doc


def test_stratified_sample_rates(spark):
    """Observed per-stratum sampling rates track the configured rates
    (binomial tolerance at fixture scale)."""
    from emails_to_vector_db_spark.plans.cleaning import _RATES, stratified_sample
    from emails_to_vector_db_spark.sources.tables import load_table
    from tests.conftest import SF_ORACLE

    totals = {
        r.lang: r.n
        for r in load_table(spark, SF_ORACLE, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    sampled = {
        r.lang: r.n
        for r in stratified_sample(spark, SF_ORACLE)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for lang, rate in _RATES.items():
        observed = sampled.get(lang, 0) / totals[lang]
        # 100-bucket hash at n>=60 docs: allow generous binomial slack
        assert abs(observed - rate / 100.0) < 0.2, (lang, observed, rate)


def test_resize_bilinear_properties():
    """Property sweep for the numpy bilinear resize (no Spark): value
    range containment, constant-image exactness, and mean preservation
    within interpolation error across random shapes/scales."""
    import numpy as np

    from emails_to_vector_db_spark.sources.multimodal import resize_bilinear

    rng = np.random.default_rng(7)
    for _ in range(50):
        h, w = int(rng.integers(1, 12)), int(rng.integers(1, 12))
        oh, ow = int(rng.integers(1, 12)), int(rng.integers(1, 12))
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = resize_bilinear(img, oh, ow)
        assert out.shape == (oh, ow, 3)
        # interpolation is a convex combination: output range within input
        assert out.min() >= img.min() - 1e-9
        assert out.max() <= img.max() + 1e-9
        # upscaling by an integer factor keeps the global mean close
        # (every source pixel contributes with near-uniform weight)
        if oh == 2 * h and ow == 2 * w:
            assert abs(out.mean() - img.astype(np.float64).mean()) < 16.0
    # exactness: identity resize is the identity
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    np.testing.assert_allclose(
        resize_bilinear(img, 5, 7), img.astype(np.float64)
    )


def test_span_fingerprint_partition_property(spark):
    """Every token belongs to exactly one 8-word span, so the span count
    is ceil(n_tokens/8) for every random document (the plan's
    sequence/slice construction can neither drop nor double-count a
    tail)."""
    import math

    rows = [(i, t) for i, t, _ in _docs(120, seed=9) if t]
    df = spark.createDataFrame(rows, "id long, text string")
    w = F.split(F.trim(F.col("text")), r"\s+")
    n_spans = F.greatest(
        F.ceil(F.size(w) / F.lit(8.0)).cast("int"), F.lit(1)
    )
    span_fps = F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda i: F.md5(F.concat_ws(" ", F.slice(w, i * 8 + 1, 8))),
    )
    got = df.select("id", F.size(w).alias("n"), F.size(span_fps).alias("s")).collect()
    for r in got:
        assert r.s == max(1, math.ceil(r.n / 8.0))
