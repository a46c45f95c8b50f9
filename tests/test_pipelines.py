"""Semantic invariants for the event-pipeline analytics queries and
the deterministic MinHash pipeline — properties the oracle hash-match
can't express (monotonicity, interval chaining, spine completeness).
"""

from __future__ import annotations

from canvas_data_2_aws_spark import registry

registry.load_all()


def test_funnel_monotone(spark, sf_dir):
    rows = registry.QUERIES["analytics_funnel"](spark, sf_dir).collect()
    by_stage = {r.stage: r.n_users for r in rows}
    assert set(by_stage) == {1, 2, 3}
    assert by_stage[1] >= by_stage[2] >= by_stage[3] >= 0


def test_retention_cohorts_have_week_zero(spark, sf_dir):
    rows = registry.QUERIES["analytics_retention"](spark, sf_dir).collect()
    assert all(r.week_offset >= 0 for r in rows)
    cohorts = {r.cohort_week for r in rows}
    week0 = {r.cohort_week for r in rows if r.week_offset == 0}
    assert week0 == cohorts  # every cohort is active in its own first week


def test_gapfill_spine_contiguous(spark, sf_dir):
    rows = registry.QUERIES["timeseries_gapfill"](spark, sf_dir).collect()
    days = sorted(r.day for r in rows)
    assert len(days) == (days[-1] - days[0]).days + 1  # no missing day
    assert len(set(days)) == len(days)  # no duplicate day
    assert all(r.n_events >= 0 and r.total_value >= 0.0 for r in rows)


def test_scd2_intervals_chain(spark, sf_dir):
    rows = registry.QUERIES["merge_scd2_history"](spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user_rows in by_user.values():
        user_rows.sort(key=lambda r: (r.valid_from, r.event_id))
        currents = [r for r in user_rows if r.is_current]
        assert len(currents) == 1  # exactly one open interval per key
        assert currents[0] is user_rows[-1]
        for prev, nxt in zip(user_rows, user_rows[1:]):
            assert prev.valid_to == nxt.valid_from  # gap- and overlap-free


def test_minhash_banded_pairs_well_formed(spark, sf_dir):
    rows = registry.QUERIES["dedup_minhash_banded"](spark, sf_dir).collect()
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0.0 <= r.jaccard <= 1.0


def test_centroid_outliers_topk_shape(spark, sf_dir):
    rows = registry.QUERIES["vector_centroid_outliers"](spark, sf_dir).collect()
    per_label: dict[int, list] = {}
    for r in rows:
        assert 1 <= r.rn <= 5
        assert r.dist >= 0.0
        per_label.setdefault(r.label, []).append(r)
    for label_rows in per_label.values():
        assert sorted(r.rn for r in label_rows) == list(range(1, len(label_rows) + 1))
        # rn order agrees with (dist desc, vec_id) order
        ranked = sorted(label_rows, key=lambda r: (-r.dist, r.vec_id))
        assert [r.rn for r in ranked] == sorted(r.rn for r in label_rows)


def test_pack_sequences_budget_respected(spark, sf_dir):
    from canvas_data_2_aws_spark.queries.pipelines import _PACK_BUDGET

    rows = registry.QUERIES["pipeline_pack_sequences"](spark, sf_dir).collect()
    for r in rows:
        # A sequence only exceeds the budget when a single oversized
        # doc occupies it alone (greedy capacity-reset semantics).
        assert r.seq_tokens <= _PACK_BUDGET or r.n_docs == 1
    # seq ids are dense from 0 within each source
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, set()).add(r.seq_id)
    for ids in by_src.values():
        assert ids == set(range(len(ids)))


def test_decontaminate_only_flags_train_docs(spark, sf_dir):
    rows = registry.QUERIES["pipeline_decontaminate"](spark, sf_dir).collect()
    assert rows, "fixture corpus should contain contaminated docs"
    for r in rows:
        assert r.doc_id % 10 != 0  # benchmark docs are never in the list
        assert r.n_matched >= 1


def test_gopher_keep_is_rule_conjunction(spark, sf_dir):
    rows = registry.QUERIES["text_gopher_rules"](spark, sf_dir).collect()
    kept = sum(1 for r in rows if r.keep)
    assert 0 < kept < len(rows)  # thresholds split the corpus
    for r in rows:
        assert r.keep == (r.r_len and r.r_avg and r.r_uniq and r.r_sym and r.r_stop)


def test_unigram_surprisal_positive_and_rare_heavy(spark, sf_dir):
    rows = registry.QUERIES["text_unigram_logprob"](spark, sf_dir).collect()
    assert all(r.avg_surprisal > 0 for r in rows)
    assert len(rows) == 500


def test_interpolate_fills_every_hour(spark, sf_dir):
    rows = registry.QUERIES["timeseries_interpolate"](spark, sf_dir).collect()
    assert all(r.filled is not None for r in rows)
    gaps = [r for r in rows if r.is_gap]
    assert gaps, "fixture series should have gap hours"
    by_hr = {r.hr: r for r in rows}
    hrs = sorted(by_hr)
    for r in gaps:
        # interpolated value lies within the envelope of its neighbors
        lo = min(x.filled for x in rows if not x.is_gap)
        hi = max(x.filled for x in rows if not x.is_gap)
        assert lo <= r.filled <= hi
    assert len(hrs) == (max(hrs) - min(hrs)).total_seconds() / 3600 + 1


def test_capped_sessions_respect_both_rules(spark, sf_dir):
    import datetime as dt

    rows = registry.QUERIES["stream_session_capped"](spark, sf_dir).collect()
    for r in rows:
        # a session never spans more than cap + one trailing gap
        assert r.t_end - r.t_start <= dt.timedelta(hours=2, minutes=30)
        assert r.n_events >= 1
    # session ids dense per user
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, set()).add(r.session_id)
    for ids in by_user.values():
        assert ids == set(range(len(ids)))


def test_feature_binning_deciles_balanced(spark, sf_dir):
    rows = registry.QUERIES["analytics_feature_binning"](spark, sf_dir).collect()
    assert len(rows) == 10
    sizes = [r.n for r in rows]
    assert max(sizes) - min(sizes) <= 1  # ntile balance property
    by_decile = sorted(rows, key=lambda r: r.decile)
    for a, b in zip(by_decile, by_decile[1:]):
        assert a.hi <= b.lo  # bins are ordered ranges


def test_rolling_median_window_bounds(spark, sf_dir):
    rows = registry.QUERIES["window_rolling_median"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.rolling_median > 0


def test_mix_allocation_sums_to_budget(spark, sf_dir):
    from canvas_data_2_aws_spark.queries.pipelines import _MIX_BUDGET

    rows = registry.QUERIES["pipeline_mix_allocation"](spark, sf_dir).collect()
    assert sum(r.alloc for r in rows) == _MIX_BUDGET
    total = sum(r.toks for r in rows)
    for r in rows:
        # allocation within 1 of the exact proportional share
        exact = _MIX_BUDGET * r.toks / total
        assert abs(r.alloc - exact) < 1.0


def test_rfm_scores_quintiles_balanced(spark, sf_dir):
    rows = registry.QUERIES["analytics_rfm_scores"](spark, sf_dir).collect()
    assert rows
    from collections import Counter

    for field in ("r_score", "f_score", "m_score"):
        sizes = Counter(getattr(r, field) for r in rows)
        assert set(sizes) == {1, 2, 3, 4, 5}
        assert max(sizes.values()) - min(sizes.values()) <= 1


def test_markov_transition_rows_normalized(spark, sf_dir):
    from collections import defaultdict

    rows = registry.QUERIES["analytics_markov_transitions"](spark, sf_dir).collect()
    assert rows
    by_cur = defaultdict(float)
    for r in rows:
        assert 0.0 < r.p <= 1.0
        by_cur[r.cur] += r.p
    for total in by_cur.values():
        assert abs(total - 1.0) < 1e-2  # rounding to 4 dp per cell


def test_anomaly_zscore_flag_consistency(spark, sf_dir):
    rows = registry.QUERIES["timeseries_anomaly_zscore"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # flag comes from the unrounded z; allow the 4-dp boundary band
        if abs(abs(r.z) - 2.0) > 1e-4:
            assert r.is_anomaly == (abs(r.z) > 2.0)


def test_weighted_percentile_ordered(spark, sf_dir):
    rows = registry.QUERIES["agg_weighted_percentile"](spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.wp25_cents <= r.wp50_cents <= r.wp75_cents


def test_leakage_safe_split_is_cluster_atomic(spark, sf_dir):
    """No same-simhash (near-dup) pair may straddle train/test, and
    every document must be assigned exactly once."""
    from pyspark.sql import functions as F

    from canvas_data_2_aws_spark.operators import text as T
    from canvas_data_2_aws_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    sh = T.simhash64(docs)
    hubs = sh.groupBy("simhash").agg(F.min("doc_id").alias("hub"))
    assign = sh.join(hubs, "simhash").select(
        "doc_id",
        "simhash",
        F.when(
            F.substring(F.md5(F.col("hub").cast("string")), 1, 2) < "1a", "test"
        )
        .otherwise("train")
        .alias("split"),
    )
    # cluster-atomic: one distinct split per simhash group
    mixed = (
        assign.groupBy("simhash")
        .agg(F.countDistinct("split").alias("k"))
        .where("k > 1")
        .count()
    )
    assert mixed == 0
    assert assign.count() == docs.count()
    # and both splits are non-empty at this fixture size
    assert assign.select("split").distinct().count() == 2


def test_minhash_component_split_invariants(spark, sf_dir):
    """The banded-MinHash component-root split must satisfy the same
    invariants as the SimHash split, on the REAL near-dup graph: no
    verified pair (jaccard ≥ 0.5) straddles train/test — including
    pairs connected only TRANSITIVELY — and every doc is assigned
    exactly once, reproducibly."""
    from pyspark.sql import functions as F

    from canvas_data_2_aws_spark.operators.graph import connected_components
    from canvas_data_2_aws_spark.queries.dedup import dedup_minhash_banded
    from canvas_data_2_aws_spark.session import load_table

    pairs = (
        dedup_minhash_banded(spark, sf_dir)
        .where(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    comps = connected_components(pairs, src="doc_a", dst="doc_b").select(
        F.col("node").alias("doc_id"), "comp"
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    assign = docs.join(comps, "doc_id", "left").select(
        "doc_id",
        F.when(
            F.substring(
                F.md5(F.coalesce("comp", "doc_id").cast("string")), 1, 2
            )
            < "1a",
            "test",
        )
        .otherwise("train")
        .alias("split"),
    )
    amap = {r.doc_id: r.split for r in assign.collect()}
    assert len(amap) == docs.count()  # every doc exactly once
    straddling = [
        (r.doc_a, r.doc_b)
        for r in pairs.collect()
        if amap[r.doc_a] != amap[r.doc_b]
    ]
    assert straddling == []
    # reproducible: the graded query's totals are stable across reruns
    g = registry.QUERIES["pipeline_leakage_split_minhash"]
    r1 = {r.split: (r.n_docs, r.n_clusters) for r in g(spark, sf_dir).collect()}
    r2 = {r.split: (r.n_docs, r.n_clusters) for r in g(spark, sf_dir).collect()}
    assert r1 == r2
    assert sum(n for n, _ in r1.values()) == docs.count()


def test_dsir_weights_favor_target_language(spark, sf_dir):
    """DSIR importance weighting with target = lang('en') must surface
    English docs at a higher rate than the corpus base rate, with
    weights in descending order and positive token counts."""
    from pyspark.sql import functions as F

    from canvas_data_2_aws_spark.session import load_table

    rows = registry.QUERIES["pipeline_dsir_weights"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 100
    ws = [r.dsir_logweight for r in rows]
    assert ws == sorted(ws, reverse=True)
    assert all(r.n_tok > 0 for r in rows)
    docs = load_table(spark, sf_dir, "documents")
    lang = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    base = sum(1 for v in lang.values() if v == "en") / len(lang)
    top = sum(1 for r in rows if lang[r.doc_id] == "en") / len(rows)
    assert top > base, (top, base)


def test_cuped_reduces_variance_and_preserves_grand_mean(spark, sf_dir):
    """CUPED must leave each arm's adjusted mean finite and, pooled
    over arms weighted by size, preserve the overall post-period mean
    (the adjustment is mean-zero by construction)."""
    rows = registry.QUERIES["analytics_ab_cuped"](spark, sf_dir).collect()
    assert len(rows) == 2 and {r.arm for r in rows} == {0, 1}
    n = sum(r.n_users for r in rows)
    raw = sum(r.mean_y_usd * r.n_users for r in rows) / n
    adj = sum(r.mean_y_cuped_usd * r.n_users for r in rows) / n
    assert abs(raw - adj) < 0.01  # mean-zero adjustment (4dp rounding)


def test_rocchio_expansion_contract(spark, sf_dir):
    """Rocchio invariants: exactly 20 ranked rows, rnk is a 1..20
    permutation aligned with (score desc, doc_id asc), and every
    score positive (α,β > 0 over non-negative BM25 mass)."""
    from canvas_data_2_aws_spark.queries.pipelines import search_rocchio_expand

    rows = search_rocchio_expand(spark, sf_dir).collect()
    assert len(rows) == 20
    assert [r.rnk for r in rows] == list(range(1, 21))
    ordered = sorted(rows, key=lambda r: (-r.score, r.doc_id))
    assert [r.rnk for r in ordered] == list(range(1, 21))
    assert all(r.score > 0 for r in rows)


def test_water_filling_exhausts_budget(spark, sf_dir):
    """r11: the allocation never over-asks a source, exhausts the
    budget exactly when supply suffices (up to the integer-division
    remainder, < number of uncapped sources), and the level is the
    true water line — every source below it fully taken, every source
    above it capped at the level."""
    from canvas_data_2_aws_spark.queries.pipelines import (
        _WATERFILL_BUDGET,
        pipeline_water_filling,
    )

    rows = pipeline_water_filling(spark, sf_dir).collect()
    assert rows
    total_alloc = sum(r.tokens_allocated for r in rows)
    total_supply = sum(r.tokens_available for r in rows)
    level = rows[0].fill_level
    assert len({r.fill_level for r in rows}) == 1
    for r in rows:
        assert 0 <= r.tokens_allocated <= r.tokens_available
        if level >= 0:
            if r.tokens_available <= level:
                assert r.tokens_allocated == r.tokens_available
            else:
                assert r.tokens_allocated == level
    if total_supply >= _WATERFILL_BUDGET:
        n_capped = sum(1 for r in rows if r.tokens_available > level)
        assert 0 <= _WATERFILL_BUDGET - total_alloc < max(n_capped, 1)
    else:
        assert total_alloc == total_supply


def test_water_filling_level_branch(spark, tmp_path):
    """r12 (ADVICE high): supply EXCEEDS the budget and the level sits
    mid-ladder with TWO qualifying ranks whose candidates differ
    (59_900 at the first, 49_800 at the last) — the exact shape where
    the old MIN aggregate picked the last qualifying candidate and
    under-allocated. The true level is the FIRST qualifying rank's
    candidate and the budget is exhausted exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from canvas_data_2_aws_spark.queries.pipelines import (
        _WATERFILL_BUDGET,
        pipeline_water_filling,
    )

    supplies = {"a": 50, "b": 50, "c": 50, "d": 50, "e": 70_000, "f": 80_000}
    texts = [("w " * n).strip() for n in supplies.values()]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(supplies)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(supplies)),
            "source": pa.array(list(supplies)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    rows = pipeline_water_filling(spark, str(tmp_path)).collect()
    by_src = {r.source: r for r in rows}
    # level = (120000 - 200) // 2 at the first qualifying rank (src e)
    assert all(r.fill_level == 59_900 for r in rows)
    for s in "abcd":
        assert by_src[s].tokens_allocated == 50  # below the water line
    assert by_src["e"].tokens_allocated == 59_900
    assert by_src["f"].tokens_allocated == 59_900
    assert sum(r.tokens_allocated for r in rows) == _WATERFILL_BUDGET


def test_stage_order_quality_first_dominates(spark, sf_dir):
    """r11: quality-first can only RETAIN more than dedup-first (a
    group whose min member fails quality still keeps its best gated
    member), and the unique-doc counts reconcile with the totals."""
    from canvas_data_2_aws_spark.queries.pipelines import (
        pipeline_stage_order_eval,
    )

    r = pipeline_stage_order_eval(spark, sf_dir).collect()[0]
    assert r.n_quality_first >= r.n_dedup_first
    assert r.tokens_quality_first >= r.tokens_dedup_first
    shared_qf = r.n_quality_first - r.only_quality_first
    shared_df = r.n_dedup_first - r.only_dedup_first
    assert shared_qf == shared_df


def test_decontam_sweep_monotone_and_consistent(spark, sf_dir):
    """r12: a longer n-gram rule can only flag a SUBSET of a shorter
    one's docs (every (n+1)-gram contains an n-gram... shared with the
    same benchmark doc), so flagged doc/token masses are non-increasing
    in n; shares are in [0,1]; and the n=4 leg agrees with the
    single-rule pipeline_decontaminate's flagged-doc count."""
    from canvas_data_2_aws_spark import registry

    registry.load_all()
    rows = registry.QUERIES["pipeline_decontam_sweep"](spark, sf_dir).collect()
    assert [r.n_gram for r in rows] == [3, 4, 6, 8]
    for a, b in zip(rows, rows[1:]):
        assert a.n_flagged_docs >= b.n_flagged_docs
        assert a.flagged_tokens >= b.flagged_tokens
    for r in rows:
        assert 0.0 <= r.flagged_doc_share <= 1.0
        assert 0.0 <= r.flagged_token_share <= 1.0
        assert r.n_flagged_docs <= r.n_train_docs
    single = registry.QUERIES["pipeline_decontaminate"](spark, sf_dir)
    n4 = next(r for r in rows if r.n_gram == 4)
    assert single.count() == n4.n_flagged_docs


def test_seqlen_sweep_conservation_and_monotone(spark, sf_dir):
    """r13: per cell, kept tokens seen from the corpus side equal kept
    slots seen from the budget side (tokens_total - truncated ==
    n_docs*L - padding); truncation only falls and padding only rises
    as L grows; and the L=64 cell matches a direct computation."""
    registry.load_all()
    rows = sorted(
        registry.QUERIES["pipeline_seqlen_tradeoff_sweep"](
            spark, sf_dir
        ).collect(),
        key=lambda r: r.max_seq_len,
    )
    assert [r.max_seq_len for r in rows] == [32, 64, 96, 128]
    for r in rows:
        assert (
            r.tokens_total - r.tokens_truncated
            == r.n_docs * r.max_seq_len - r.tokens_padding
        )
        assert 0.0 <= r.trunc_share <= 1.0 and 0.0 <= r.pad_share <= 1.0
    for a, b in zip(rows, rows[1:]):
        assert a.tokens_truncated >= b.tokens_truncated
        assert a.tokens_padding <= b.tokens_padding
        assert a.docs_truncated >= b.docs_truncated
        assert a.n_docs == b.n_docs and a.tokens_total == b.tokens_total

    from pyspark.sql import functions as F

    from canvas_data_2_aws_spark.session import load_table

    lens = load_table(spark, sf_dir, "documents").select(
        F.size(F.split("text", " ")).alias("n")
    )
    direct = lens.agg(
        F.sum(F.greatest(F.col("n") - 64, F.lit(0))).alias("tr"),
        F.sum(F.lit(64) - F.least(F.col("n"), F.lit(64))).alias("pad"),
        F.sum(F.when(F.col("n") > 64, 1).otherwise(0)).alias("dt"),
    ).collect()[0]
    cell = next(r for r in rows if r.max_seq_len == 64)
    assert (cell.tokens_truncated, cell.tokens_padding, cell.docs_truncated) == (
        direct.tr,
        direct.pad,
        direct.dt,
    )


def test_pca_decimal_ladder_matches_spark_expressions(spark):
    """Pin the driver-side power-iteration ladder against the live
    Spark expression sequence it replaced (ADVICE r13): one iteration
    step in Spark is w = CAST(SUM(CAST(c*v AS DECIMAL(38,9))) AS
    DOUBLE), nrm = sqrt(CAST(SUM(CAST(w*w AS DECIMAL(38,9))) AS
    DOUBLE)), v = ROUND(w/nrm, 6). Any future change to either side
    that desynchronizes the HALF_UP decimal semantics fails here
    instead of silently drifting from the oracle CTE ladder."""
    import math

    from pyspark.sql import functions as F

    from canvas_data_2_aws_spark.queries.pipelines import (
        _pca_power_iterations,
    )

    # fixed pseudo-random covariance: deterministic trig formula, no
    # RNG — full 64x64 support with irregular magnitudes/signs.
    rows = [
        (d1, d2, round(math.sin(1.0 + 7 * d1 + 13 * d2) * 3.7, 9))
        for d1 in range(64)
        for d2 in range(64)
    ]
    cvals: dict[int, list] = {}
    for d1, d2, cv in rows:
        cvals.setdefault(d1, []).append((d2, cv))
    got_v, got_n = _pca_power_iterations(cvals)

    c = spark.createDataFrame(rows, "d1 int, d2 int, c double")
    v = spark.createDataFrame(
        [(d, 0.125) for d in range(64)], "dim int, v double"
    )
    want_n = None
    for _ in range(8):
        w = (
            c.join(v, c.d2 == v.dim)
            .groupBy(F.col("d1").alias("dim"))
            .agg(
                F.expr("CAST(SUM(CAST(c * v AS DECIMAL(38,9))) AS DOUBLE)").alias(
                    "w"
                )
            )
        )
        n = w.agg(
            F.sqrt(
                F.expr("CAST(SUM(CAST(w * w AS DECIMAL(38,9))) AS DOUBLE)")
            ).alias("nrm")
        )
        v = w.crossJoin(F.broadcast(n)).select(
            "dim", F.round(F.col("w") / F.col("nrm"), 6).alias("v")
        ).localCheckpoint(eager=True)
        want_n = n.head().nrm
    want_v = {r.dim: r.v for r in v.collect()}
    assert got_v == want_v
    assert got_n == want_n
