"""ANN recall tests: the approximate paths must actually find most of
the exact neighbors, or they are fast garbage."""

from __future__ import annotations

from pyspark.sql import functions as F

from canvas_data_2_aws_spark import registry
from canvas_data_2_aws_spark.operators.similarity import cosine_blas
from canvas_data_2_aws_spark.session import load_table

registry.load_all()


def test_ivf_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    query_vec = emb.where(F.col("vec_id") == 0).head().embedding
    corpus = emb.where(F.col("vec_id") != 0)

    exact = cosine_blas(
        emb.where(F.col("vec_id") == 0), corpus, mode="knn", k=10
    )
    exact_ids = {r.neighbor_id for r in exact.collect()}

    approx = registry.QUERIES["ann_ivf"](spark, sf_dir)
    approx_ids = {r.vec_id for r in approx.collect()}

    # probing 4/16 cells must still recover most of the true top-10
    assert len(exact_ids & approx_ids) >= 6, (exact_ids, approx_ids)


def test_ivf_deterministic_structure_and_recall(spark, sf_dir):
    """The hash-matched IVF composite: per-query top-10 from probed
    cells only, ranks contiguous, and recall vs exact ≥ 50% on average
    (nprobe=2 of 4 cells at sf0.01 — half the corpus is scanned, so
    most true neighbors must be recoverable)."""
    rows = registry.QUERIES["ann_ivf_deterministic"](spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(32))
    for q, rs in by_q.items():
        assert sorted(r.rn for r in rs) == list(range(1, len(rs) + 1))
        assert len(rs) == 10
        assert all(r.neighbor_id != q for r in rs)

    emb = load_table(spark, sf_dir, "embeddings")
    exact = cosine_blas(
        emb.where(F.col("vec_id") < 32), emb, mode="knn", k=11
    ).where(F.col("neighbor_id") != F.col("query_id"))
    exact_sets: dict[int, set] = {}
    for r in exact.collect():
        s = exact_sets.setdefault(r.query_id, set())
        if len(s) < 10:
            s.add(r.neighbor_id)
    hits = sum(
        len(exact_sets[q] & {r.neighbor_id for r in rs})
        for q, rs in by_q.items()
    )
    assert hits >= 0.5 * 10 * 32, hits


def test_kmeans_assignments_valid_and_moving(spark, sf_dir):
    from canvas_data_2_aws_spark import registry
    from canvas_data_2_aws_spark.session import load_table

    rows = registry.QUERIES["vector_kmeans_assign"](spark, sf_dir).collect()
    assert len(rows) == load_table(spark, sf_dir, "embeddings").count()
    assert {r.c1 for r in rows} <= {0, 1, 2, 3}
    assert {r.c2 for r in rows} <= {0, 1, 2, 3}
    # Lloyd iteration refines the id-bucket init: some vectors move
    assert any(r.c1 != r.c2 for r in rows)


def test_kmeans_sampled_build_matches_exact_when_sample_is_full(spark, sf_dir):
    """Forcing the big-corpus path (exact_cap=0) at fixture scale makes
    denom=1 → the training sample IS the full corpus, so the sampled
    build trains identical centroids with the identical decimal plan.

    The two ASSIGNMENT argmins are computed in different arithmetic —
    DECIMAL(38,12) sum-of-squares vs float64 BLAS (||c||² − 2x·c) — so a
    vector near-equidistant between two centroids can legitimately flip
    without any code bug. The contract asserted here is therefore
    "identical up to float-tie measure": same key set, and at most a
    0.1% near-tie allowance on the (c1, c2) values rather than bitwise
    dict equality (which would be fixture-dependent)."""
    from canvas_data_2_aws_spark.queries.vectors import _build_kmeans_assignment

    exact = {
        (r.vec_id): (r.c1, r.c2)
        for r in _build_kmeans_assignment(spark, sf_dir).collect()
    }
    sampled = {
        (r.vec_id): (r.c1, r.c2)
        for r in _build_kmeans_assignment(spark, sf_dir, exact_cap=0).collect()
    }
    assert exact.keys() == sampled.keys()
    disagree = [k for k in exact if exact[k] != sampled[k]]
    allowance = max(1, len(exact) // 1000)
    assert len(disagree) <= allowance, (
        f"{len(disagree)}/{len(exact)} assignments differ between the "
        f"decimal and BLAS argmin paths (allowance {allowance} for "
        f"near-equidistant float ties): {disagree[:10]}"
    )


def test_lloyd_assign_matches_all_decimal_reference(spark, sf_dir):
    """The r14 two-phase certified argmin (_lloyd_assign: plain-double
    distances + gap certificate, exact-decimal leg only for uncertified
    vectors) must reproduce the historical all-decimal assignment
    bit-for-bit on the fixture."""
    import math

    from canvas_data_2_aws_spark.queries.vectors import _lloyd_assign
    from canvas_data_2_aws_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    k = max(4, math.ceil(math.sqrt(n / 50.0)))
    pos = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim0", "vf")
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.col("vf").cast("double").alias("v"),
    )
    cent = (
        pos.withColumn("j", F.col("vec_id") % k)
        .groupBy("j", "dim")
        .agg(
            (
                F.sum(F.col("v").cast("decimal(38,10)")).cast("double")
                / F.count("*")
            ).alias("c")
        )
    )
    reference = (
        pos.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "j")
        .agg(
            F.sum(F.expr("CAST((v - c) * (v - c) AS DECIMAL(38,12))")).alias(
                "dist"
            )
        )
        .groupBy("vec_id")
        .agg(F.min(F.struct("dist", "j"))["j"].alias("c"))
    )
    got = {r.vec_id: r.c for r in _lloyd_assign(pos, cent).collect()}
    want = {r.vec_id: r.c for r in reference.collect()}
    assert got == want


def test_lloyd_assign_near_tie_takes_exact_decimal_path(spark):
    """A vector exactly equidistant to two centroids fails the gap
    certificate, so the exact-decimal leg must decide it — and break
    the (impossible-on-real-data) tie toward the lower cluster id,
    exactly like the historical plan."""
    from canvas_data_2_aws_spark.queries.vectors import _lloyd_assign

    # one vector at v=0 on a single dim; centroids at ±1 → dist 1 both
    pos = spark.createDataFrame(
        [(7, 1, 0.0)], "vec_id long, dim int, v double"
    )
    cent = spark.createDataFrame(
        [(0, 1, 1.0), (1, 1, -1.0)], "j long, dim int, c double"
    )
    rows = _lloyd_assign(pos, cent).collect()
    assert [(r.vec_id, r.c) for r in rows] == [(7, 0)]

    # a sub-certificate near-tie (gap ~1e-10, below the 1e-9 guard but
    # above the decimal12 resolution) must also be decided by the
    # decimal leg, which picks the genuinely closer centroid j=1 —
    # dist₁ quantizes to 0.999999999900 < 1.000000000000 = dist₀.
    cent2 = spark.createDataFrame(
        [(0, 1, 1.0), (1, 1, -1.0 + 5e-11)], "j long, dim int, c double"
    )
    rows2 = _lloyd_assign(pos, cent2).collect()
    assert [(r.vec_id, r.c) for r in rows2] == [(7, 1)]


def test_kmeans_sampled_build_subsample_invariants(spark, sf_dir):
    """With a genuinely partial training sample (KMEANS_TRAIN_SAMPLE_ROWS
    patched below n), every corpus vector still gets exactly one
    assignment per iteration and clusters stay in range."""
    import canvas_data_2_aws_spark.queries.vectors as V
    from canvas_data_2_aws_spark.session import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    old = V.KMEANS_TRAIN_SAMPLE_ROWS
    V.KMEANS_TRAIN_SAMPLE_ROWS = max(1, n // 4)  # denom≈4 → ~25% sample
    try:
        rows = V._build_kmeans_assignment(spark, sf_dir, exact_cap=0).collect()
    finally:
        V.KMEANS_TRAIN_SAMPLE_ROWS = old
    import math

    k = max(4, math.ceil(math.sqrt(n / 50.0)))
    assert len(rows) == n
    assert len({r.vec_id for r in rows}) == n
    assert all(0 <= r.c1 < k and 0 <= r.c2 < k for r in rows)


def test_cosine_blas_refuses_oversized_corpus(spark):
    """The broadcast-corpus path must refuse (not driver-OOM) above the
    row cap, and the error must name the bucketed alternatives."""
    import pyspark.sql.functions as F
    import pytest

    from canvas_data_2_aws_spark.operators.similarity import cosine_blas

    emb = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(seed=1), F.rand(seed=2)).alias("embedding"),
    )
    import canvas_data_2_aws_spark.operators.similarity as sim

    # Patching the module constant is honored at CALL time (row_cap=None
    # resolves inside the function) — so callers like cosine_blas get a
    # non-default cap too, not just explicit row_cap= callers.
    old = sim.CORPUS_ROW_CAP
    sim.CORPUS_ROW_CAP = 10
    try:
        with pytest.raises(ValueError, match="ann_hyperplane_lsh"):
            sim._np_corpus(emb, "vec_id", "embedding")
    finally:
        sim.CORPUS_ROW_CAP = old
    # under the cap the pipeline still works end-to-end
    out = cosine_blas(emb, emb, mode="knn", k=3).collect()
    assert len(out) == 150


def test_block_local_reranks_partition_invariant(spark, sf_dir):
    """The applyInPandas block-local BLAS reranks must produce
    identical rows regardless of shuffle partitioning — each block is
    processed whole, and ordering inside the kernel is pinned by the
    vec_id sort."""
    from canvas_data_2_aws_spark import registry

    registry.load_all()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for nparts in ("3", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", nparts)
            for name in (
                "ann_hyperplane_lsh",
                "dedup_semantic_clusters",
                "dedup_embedding_cosine",
            ):
                rows = frozenset(
                    tuple(r) for r in registry.QUERIES[name](spark, sf_dir).collect()
                )
                results.setdefault(name, []).append(rows)
        for name, (a, b) in results.items():
            assert a == b, f"{name} differs across partitionings"
            assert a, f"{name} empty"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_hybrid_rrf_fusion_invariants(spark, sf_dir):
    """RRF output: ≤20 rows, fused score descending, ranks in [1, 50],
    and a doc present in BOTH legs must outscore any doc present in
    only one leg at an equal-or-worse rank."""
    rows = registry.QUERIES["search_hybrid_rrf"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    scores = [r.rrf for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r.rank_text is None or 1 <= r.rank_text <= 50
        assert r.rank_vec is None or 1 <= r.rank_vec <= 50
        assert r.rank_text is not None or r.rank_vec is not None
        expected = (1 / (60 + r.rank_text) if r.rank_text else 0) + (
            1 / (60 + r.rank_vec) if r.rank_vec else 0
        )
        assert abs(r.rrf - expected) < 1e-6


def test_hard_negatives_all_cross_label_and_harder_than_rank(spark, sf_dir):
    """Every mined negative crosses labels (the mask ran inside the
    BLAS kernel), ranks are dense 1..5 per query, and scores are
    non-increasing in rank (rounded-score ordering)."""
    from canvas_data_2_aws_spark.queries.pipelines import search_hard_negatives

    rows = search_hard_negatives(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        assert r.label != r.neighbor_label
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rn)
        assert [r.rn for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_mmr_rerank_diversifies_vs_plain_topk(spark, sf_dir):
    """MMR invariants: rank-1 is the plain cosine top-1 (no penalty
    yet); all 5 picks are distinct members of the top-20 candidate
    set; and the MMR sequence is no LESS diverse than plain top-5 —
    measured by max intra-set pairwise cosine."""
    import itertools

    import numpy as np

    from canvas_data_2_aws_spark.operators.similarity import cosine_blas
    from canvas_data_2_aws_spark.queries.pipelines import search_mmr_rerank
    from canvas_data_2_aws_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cand = cosine_blas(
        emb.where("vec_id < 8"), emb, mode="knn", k=20
    ).collect()
    by_q = {}
    for r in cand:
        by_q.setdefault(r.query_id, []).append(r)
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.where("vec_id < 600").collect()
    }

    def max_pairwise(ids):
        best = -1.0
        for a, b in itertools.combinations(ids, 2):
            va, vb = vecs[a], vecs[b]
            s = round(
                float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))), 4
            )
            best = max(best, s)
        return best

    rows = search_mmr_rerank(spark, sf_dir).collect()
    sel = {}
    for r in rows:
        sel.setdefault(r.query_id, []).append(r)
    for q, rs in sel.items():
        rs.sort(key=lambda r: r.rk)
        cands = sorted(
            by_q[q], key=lambda r: (-r.score, r.neighbor_id)
        )
        assert rs[0].neighbor_id == cands[0].neighbor_id
        picked = [r.neighbor_id for r in rs]
        assert len(set(picked)) == 5
        assert set(picked) <= {c.neighbor_id for c in by_q[q]}
        plain5 = [c.neighbor_id for c in cands[:5]]
        assert max_pairwise(picked) <= max_pairwise(plain5) + 1e-9


def test_pca_power_matches_numpy_reference(spark, sf_dir):
    """Independent numpy re-derivation: same integer-tick covariance,
    same 8 normalized power iterations (float, no decimal quantization
    → 1e-5 tolerance); loadings unit-norm; eig positive."""
    import numpy as np

    from canvas_data_2_aws_spark.queries.pipelines import vector_pca_power
    from canvas_data_2_aws_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").collect()
    m = np.round(
        np.stack([np.asarray(r.embedding, dtype=np.float64) for r in emb])
        * 10000
    )
    n = len(m)
    cov = (n * (m.T @ m) - np.outer(m.sum(0), m.sum(0))) / float(n * n)
    v = np.full(64, 0.125)
    for _ in range(8):
        w = cov @ v
        v = np.round(w / np.linalg.norm(w), 6)
    rows = vector_pca_power(spark, sf_dir).collect()
    got = np.array([r.loading for r in sorted(rows, key=lambda r: r.dim)])
    assert abs(np.linalg.norm(got) - 1.0) < 1e-4
    assert rows[0].eig > 0
    assert np.max(np.abs(got - v)) < 1e-5


def test_mmr_select_stepwise_optimality_property():
    """Property (no Spark): on random candidate sets, every greedy pick
    maximizes λ·simq − (1−λ)·max-penalty over the unpicked candidates,
    with ties to the smaller id — checked by direct re-evaluation."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from canvas_data_2_aws_spark.operators.similarity import mmr_select

    @settings(max_examples=150, deadline=None)
    @given(st.integers(2, 12), st.integers(0, 2**31 - 1))
    def run(n, seed):
        rng = np.random.default_rng(seed)
        ids = np.sort(rng.choice(10_000, size=n, replace=False)).astype(
            np.int64
        )
        simq = np.round(rng.uniform(-1, 1, n), 4)
        raw = np.round(rng.uniform(-1, 1, (n, n)), 4)
        sims = np.triu(raw, 1) + np.triu(raw, 1).T
        out = mmr_select(ids, simq, sims, k=5, lam=0.5)
        assert len(out) == min(5, n)
        picked_idx: list[int] = []
        idx_of = {int(d): i for i, d in enumerate(ids)}
        for rk, d, mmr in out:
            i = idx_of[int(d)]
            pen = (
                max(sims[i][j] for j in picked_idx) if picked_idx else 0.0
            )
            assert mmr == 0.5 * simq[i] - 0.5 * pen
            for j in range(n):
                if j in picked_idx or j == i:
                    continue
                pj = (
                    max(sims[j][p] for p in picked_idx)
                    if picked_idx
                    else 0.0
                )
                other = 0.5 * simq[j] - 0.5 * pj
                assert other < mmr or (other == mmr and ids[i] < ids[j])
            picked_idx.append(i)

    run()


def test_kcenter_matches_exact_python_reference(spark, sf_dir):
    """Integer-exact check: a pure-Python farthest-first traversal on
    the same tick vectors must reproduce the selection EXACTLY (no
    float anywhere); radii are non-increasing from rank 2 on."""
    import numpy as np

    from canvas_data_2_aws_spark.queries.curation import (
        sample_coreset_kcenter,
    )
    from canvas_data_2_aws_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").collect()
    ticks = {
        r.vec_id: np.round(
            np.asarray(r.embedding, dtype=np.float64) * 10000
        ).astype(np.int64)
        for r in emb
    }
    ids = sorted(ticks)
    chosen = [ids[0]]
    mind = {i: int(((ticks[i] - ticks[ids[0]]) ** 2).sum()) for i in ids}
    expect = [(1, ids[0], 0)]
    for rk in range(2, 9):
        nxt = max(ids, key=lambda i: (mind[i], -i))
        expect.append((rk, nxt, mind[nxt]))
        for i in ids:
            d = int(((ticks[i] - ticks[nxt]) ** 2).sum())
            if d < mind[i]:
                mind[i] = d
    rows = sorted(
        [(r.rank, r.vec_id, r.radius2) for r in
         sample_coreset_kcenter(spark, sf_dir).collect()]
    )
    assert rows == expect
    radii = [r[2] for r in rows[1:]]
    assert radii == sorted(radii, reverse=True)
    assert len({r[1] for r in rows}) == 8


def test_pca_project_moments_match_population(spark, sf_dir):
    """Per-label projection stats re-derived in numpy from the Spark
    loadings: counts partition the corpus, means/variances agree to
    quantization tolerance, and variance is non-negative."""
    import numpy as np

    from canvas_data_2_aws_spark.queries.pipelines import (
        vector_pca_power,
        vector_pca_project,
    )
    from canvas_data_2_aws_spark.session import load_table

    v = np.array(
        [
            r.loading
            for r in sorted(
                vector_pca_power(spark, sf_dir).collect(),
                key=lambda r: r.dim,
            )
        ]
    )
    emb = load_table(spark, sf_dir, "embeddings").collect()
    by_label = {}
    for r in emb:
        t = np.round(np.asarray(r.embedding, dtype=np.float64) * 10000)
        by_label.setdefault(r.label, []).append(float(t @ v))
    rows = vector_pca_project(spark, sf_dir).collect()
    assert sum(r.n for r in rows) == len(emb)
    for r in rows:
        ps = by_label[r.label]
        assert r.n == len(ps)
        assert abs(r.mean_proj - np.mean(ps)) < 1e-3
        assert r.var_proj >= 0
        assert abs(r.var_proj - (np.mean(np.square(ps)) - np.mean(ps) ** 2)) < 1.0


def test_hard_negatives_blas_equals_dataframe_derivation(spark, sf_dir):
    """The BLAS kernel's different-label mask must agree with an
    independent JVM-side derivation (broadcast join + HOF cosine +
    rank window) row for row."""
    from pyspark.sql import Window, functions as F

    from canvas_data_2_aws_spark.functions.vectors import cosine_similarity
    from canvas_data_2_aws_spark.queries.pipelines import search_hard_negatives
    from canvas_data_2_aws_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where("vec_id < 32").select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlab"),
        F.col("embedding").alias("qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("nlab"),
        F.col("embedding").alias("cv"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    ref = (
        q.join(F.broadcast(c), F.col("qlab") != F.col("nlab"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity("qv", "cv"), 4).alias("score"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where("rn <= 5")
    )
    got = {
        (r.query_id, r.rn): (r.neighbor_id, r.score)
        for r in search_hard_negatives(spark, sf_dir).collect()
    }
    exp = {
        (r.query_id, r.rn): (r.neighbor_id, r.score)
        for r in ref.collect()
    }
    assert got == exp


def test_kcenter_radius_is_2_approx_property():
    """Property (no Spark): greedy farthest-first on random integer
    point sets — the selection radius sequence is non-increasing, and
    the k-th selection radius lower-bounds the optimal k-center radius
    (standard 2-approximation argument: any k-clustering has two
    selected points in one cluster)."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=80, deadline=None)
    @given(st.integers(10, 60), st.integers(0, 2**31 - 1))
    def run(n, seed):
        rng = np.random.default_rng(seed)
        pts = rng.integers(-100, 100, size=(n, 4)).astype(np.int64)
        ids = np.arange(n)
        chosen = [0]
        mind = ((pts - pts[0]) ** 2).sum(axis=1)
        radii = []
        for _ in range(1, 6):
            best = max(ids, key=lambda i: (mind[i], -i))
            radii.append(int(mind[best]))
            chosen.append(int(best))
            d = ((pts - pts[best]) ** 2).sum(axis=1)
            mind = np.minimum(mind, d)
        assert radii == sorted(radii, reverse=True)
        # after selecting k centers, max remaining min-dist <= last radius
        assert int(mind.max()) <= radii[-1]

    run()


def test_sq8_distortion_bounded_by_step(spark, sf_dir):
    """r11: SQ8's approx-dot error is bounded by the quantization
    geometry — |approx - exact| <= sum_d |q_d| * step_d / 2 for every
    vector (each dim rounds to the nearest level), so the reported
    gate-mean distortion must respect the same bound. Recall and hit
    counts live in their ranges."""
    from canvas_data_2_aws_spark import registry
    from canvas_data_2_aws_spark.session import load_table
    from pyspark.sql import functions as F

    registry.load_all()
    r = registry.QUERIES["vector_sq8_recall_eval"](spark, sf_dir).collect()[0]
    assert 0 <= r.n_hit <= 5
    assert r.recall_at_5 == round(r.n_hit / 5, 4)
    assert r.mean_abs_err >= 0

    emb = load_table(spark, sf_dir, "embeddings")
    pos = emb.where(F.col("vec_id") != 0).select(
        "vec_id", F.posexplode("embedding").alias("dim", "v")
    ).withColumn("v", F.col("v").cast("double"))
    steps = {
        row.dim: row.step
        for row in pos.groupBy("dim")
        .agg(((F.max("v") - F.min("v")) / 255.0).alias("step"))
        .collect()
    }
    q = emb.where(F.col("vec_id") == 0).head().embedding
    bound = sum(abs(float(qd)) * steps[d] / 2.0 for d, qd in enumerate(q))
    assert r.mean_abs_err <= bound + 1e-9, (r.mean_abs_err, bound)


def test_ivf_nprobe_curve_monotone(spark, sf_dir):
    """r11: recall and candidate volume are nondecreasing in nprobe,
    recall lives in [0,1], and probing every listed cell can only add
    candidates — never lose them."""
    from canvas_data_2_aws_spark import registry

    registry.load_all()
    rows = registry.QUERIES["vector_ivf_nprobe_curve"](spark, sf_dir).collect()
    assert [r.nprobe for r in rows] == [1, 2, 4]
    prev_r, prev_c = -1.0, -1
    for r in rows:
        assert 0.0 <= r.mean_recall <= 1.0
        assert r.mean_recall >= prev_r
        assert r.n_candidates >= prev_c
        assert r.n_hit <= 10 * r.n_queries
        prev_r, prev_c = r.mean_recall, r.n_candidates
