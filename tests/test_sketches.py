"""Semantic invariants for the sketch family (queries/sketches.py) —
the properties the oracle hash can't express: estimator error bounds,
one-sided CMS error, and sketch-merge consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from canvas_data_2_aws_spark import registry
from canvas_data_2_aws_spark.session import load_table

registry.load_all()


def test_hll_estimates_within_bound(spark, sf_dir):
    """Per-source HLL estimates land within 5% of exact distinct
    counts at lgConfigK=14, and the union row covers the union."""
    rows = {
        r.source: r.est_tokens
        for r in registry.QUERIES["agg_hll_sketch_merge"](spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(F.split("text", " ")).alias("token"))
    exact = {
        r.source: r.n
        for r in tok.groupBy("source")
        .agg(F.countDistinct("token").alias("n"))
        .collect()
    }
    exact["__all__"] = tok.select("token").distinct().count()
    assert set(rows) == set(exact)
    for src, est in rows.items():
        assert abs(est - exact[src]) <= max(2, 0.05 * exact[src]), (
            src,
            est,
            exact[src],
        )


def test_hll_union_at_least_max_source(spark, sf_dir):
    """Union estimate can never be below any single source's (merge
    monotonicity — the property that makes partial sketches safe)."""
    rows = {
        r.source: r.est_tokens
        for r in registry.QUERIES["agg_hll_sketch_merge"](spark, sf_dir).collect()
    }
    union = rows.pop("__all__")
    # 1% slack: estimates are ±rel-error, monotone only in expectation.
    assert union >= max(rows.values()) * 0.99


def test_cms_never_undercounts(spark, sf_dir):
    """Count-min's one-sided guarantee: est >= exact for every probed
    token, and overestimate is bounded by the grid's collision mass."""
    rows = registry.QUERIES["agg_cms_freq"](spark, sf_dir).collect()
    assert len(rows) == 20
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = docs.select(F.explode(F.split("text", " "))).count()
    for r in rows:
        assert r.overcount >= 0, (r.token, r.cms_est, r.exact_cnt)
        assert r.cms_est == r.exact_cnt + r.overcount
        # CMS bound: overcount <= e/w * N with prob 1 - (1/e)^d; use
        # the deterministic worst case (all other mass in one bucket
        # is impossible) loosely: 4x the expected collision mass.
        assert r.overcount <= 4 * (2.718 / 512) * n_tokens + 1


def test_bitmap_distinct_equals_exact(spark, sf_dir):
    """The bitmap path is exact, not approximate — equal to
    countDistinct group by group."""
    got = {
        r.o_orderpriority: r.n_distinct_custs
        for r in registry.QUERIES["agg_bitmap_distinct"](spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders")
    exact = {
        r.o_orderpriority: r.n
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert got == exact


def test_quantile_sketch_bounded_error(spark, sf_dir):
    """r10: the 256-sample discrete percentile tracks the exact one.
    DKW-style bound: with k=256 the empirical CDF is within ~0.085 of
    the true CDF w.h.p. — assert the loose practical form (quantile
    VALUES within the 15% relative band on this distribution, exact
    match on monotonicity)."""
    rows = registry.QUERIES["agg_quantile_sketch"](spark, sf_dir).collect()
    assert len(rows) == 5
    by_q = {r.q: r for r in rows}
    assert sorted(by_q) == [25, 50, 75, 90, 99]
    for r in rows:
        assert r.rel_err <= 0.15, (r.q, r.rel_err)
    # both estimate series are monotone in q
    ks = sorted(by_q)
    assert all(by_q[a].exact_v <= by_q[b].exact_v for a, b in zip(ks, ks[1:]))
    assert all(by_q[a].kmv_v <= by_q[b].kmv_v for a, b in zip(ks, ks[1:]))


def test_neyman_allocation_invariants(spark, sf_dir):
    """r10: quotas respect the budget and the stratum sizes, selection
    fills every quota exactly (md5 rank never undershoots), and
    weights follow N_h·S_h ordering."""
    from canvas_data_2_aws_spark.queries.curation import _NEYMAN_BUDGET

    rows = registry.QUERIES["sample_stratified_neyman"](spark, sf_dir).collect()
    assert rows
    assert sum(r.n_alloc for r in rows) <= _NEYMAN_BUDGET + len(rows)
    for r in rows:
        assert 1 <= r.n_alloc <= r.n_stratum
        assert r.n_sampled == r.n_alloc
        assert r.weight >= 0


def test_join_cardinality_one_sided(spark, sf_dir):
    from canvas_data_2_aws_spark import registry

    registry.load_all()
    r = registry.QUERIES["validate_join_cardinality"](spark, sf_dir).collect()[0]
    # CMS collisions only ADD cross terms: the estimate is an upper bound
    assert r.f2_cms >= r.f2_exact
    assert r.overcount == r.f2_cms - r.f2_exact
    assert r.ratio >= 1.0
    # F2 of any multiset is at least its size
    assert r.f2_exact >= r.n_rows


def test_f2_ams_band(spark, sf_dir):
    from canvas_data_2_aws_spark import registry

    registry.load_all()
    r = registry.QUERIES["validate_f2_ams_sketch"](spark, sf_dir).collect()[0]
    # mean-of-8 AMS rows: sigma/mean = sqrt(2/8) = 0.5; pin a loose
    # 4-sigma band (observed fixtures: 0.49-1.41)
    assert 0.2 <= r.ratio <= 3.0
    assert r.f2_ams > 0


def test_kmv_small_union_is_exact(spark):
    """VERDICT r10: when the whole union fits in the sketch
    (n_union <= k) the KMV "sample" IS the union, so the estimate must
    EQUAL the exact Jaccard — this is the value the LEAST(k, n_union)
    denominator fix protects; a fixed /k denominator would bias it low
    by n_union/k (~0.57x here) and the cross-engine hash-match could
    never catch it because both engines would agree on the biased
    value. sf0.001 has n_union = 147 < 256 by construction."""
    rows = registry.QUERIES["agg_kmv_jaccard"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_union < r.k, "fixture drifted: small-set premise broken"
    assert r.kmv_hits == r.n_inter
    assert r.j_kmv == r.j_exact


def test_theta_setops_exact_below_k(spark):
    """r11: with the whole union inside the sketch (sf0.001 union =
    147 < k = 256) every theta estimate must EQUAL its exact value
    (theta = 1 degeneracy — same rule as the KMV denominator fix), and
    the three disjoint estimates must add up to the union estimate."""
    r = registry.QUERIES["agg_theta_sketch_setops"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert r.n_union < r.k, "fixture drifted: small-set premise broken"
    assert r.est_union == r.n_union
    assert r.est_inter == r.n_inter
    assert abs((r.est_inter + r.est_a_only + r.est_b_only) - r.est_union) < 1e-9


def test_theta_setops_additive_and_bounded(spark, sf_dir):
    """r11: at any SF the disjoint estimates are nonnegative, sum to
    the union estimate (they share one theta), and the union estimate
    tracks the exact cardinality within the k=256 KMV error band."""
    r = registry.QUERIES["agg_theta_sketch_setops"](spark, sf_dir).collect()[0]
    for v in (r.est_union, r.est_inter, r.est_a_only, r.est_b_only):
        assert v >= 0
    assert abs((r.est_inter + r.est_a_only + r.est_b_only) - r.est_union) < 1e-6
    # sigma/mu ~ 1/sqrt(k-2) ~ 6.3%; allow 5 sigma
    assert abs(r.est_union - r.n_union) <= max(3, 0.32 * r.n_union)


def test_quantile_sketch_sweep_consistent(spark, sf_dir):
    """r12: the k=256 ladder row must reproduce the single-point
    eval's errors exactly (its sample is the 256-prefix of the same
    md5 order); mean <= max; every size reports all 5 quantiles."""
    from canvas_data_2_aws_spark import registry

    registry.load_all()
    rows = {
        r.k: r
        for r in registry.QUERIES["agg_quantile_sketch_sweep"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == {64, 128, 256, 512}
    for r in rows.values():
        assert r.n_quantiles == 5
        assert 0.0 <= r.mean_rel_err <= r.max_rel_err
    single = registry.QUERIES["agg_quantile_sketch"](spark, sf_dir).collect()
    assert rows[256].max_rel_err == max(r.rel_err for r in single)
