"""Invariant tests for the round-4 curation operators.

The oracle harness (test_graded_queries) already pins exact values;
these assert the semantic invariants that must hold at ANY scale —
the properties a fixture change cannot silently relax.
"""

from __future__ import annotations

from canvas_data_2_aws_spark import registry
from canvas_data_2_aws_spark.session import load_table

registry.load_all()


def test_pq_codes_are_bytes_with_full_coverage(spark, sf_dir):
    rows = registry.QUERIES["vector_pq_codes"](spark, sf_dir).collect()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n_vecs * 8  # 8 subspaces per vector
    for r in rows:
        assert 0 <= r.code <= 255
        assert 0 <= r.subspace <= 7


def test_pq_adc_ranks_are_dense_per_query(spark, sf_dir):
    rows = registry.QUERIES["vector_pq_adc_topk"](spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(8))
    for q, rs in by_q.items():
        assert sorted(r.rn for r in rs) == list(range(1, 11))
        ordered = sorted(rs, key=lambda r: r.rn)
        hams = [r.hamming for r in ordered]
        assert hams == sorted(hams)  # rank follows distance
        assert all(r.neighbor_id != q for r in rs)


def test_prefix_recall_bounded(spark, sf_dir):
    rows = registry.QUERIES["vector_prefix_dim_recall"](spark, sf_dir).collect()
    assert {r.query_id for r in rows} == set(range(8))
    for r in rows:
        assert 0 <= r.n_hit <= 10
        assert abs(r.recall - r.n_hit / 10) < 1e-9


def test_semantic_dedup_never_drops_cluster_canonical(spark, sf_dir):
    """Every dropped vector must have a LOWER-id near-dup, so the
    minimum vec_id of any cluster can never appear as a drop."""
    drops = registry.QUERIES["dedup_semantic_clusters"](spark, sf_dir).collect()
    from canvas_data_2_aws_spark.queries.vectors import _kmeans_assignment

    assign = {
        r.vec_id: r.c2 for r in _kmeans_assignment(spark, sf_dir).collect()
    }
    cluster_min = {}
    for vid, c in assign.items():
        cluster_min[c] = min(cluster_min.get(c, vid), vid)
    for r in drops:
        assert assign[r.drop_id] == r.cluster
        assert r.drop_id != cluster_min[r.cluster]
        assert r.n_better >= 1


def test_mix_sampler_keeps_smallest_source_whole(spark, sf_dir):
    rows = registry.QUERIES["pipeline_mix_sampler"](spark, sf_dir).collect()
    smallest = min(rows, key=lambda r: (r.n_docs, r.source))
    assert smallest.thresh == 256  # rate 1.0 → every bucket < 256
    assert smallest.n_kept == smallest.n_docs
    for r in rows:
        assert 0 <= r.n_kept <= r.n_docs
        assert r.thresh <= 256


def test_bpe_pairs_are_two_chars_sorted(spark, sf_dir):
    rows = registry.QUERIES["pipeline_bpe_merges"](spark, sf_dir).collect()
    assert rows
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    assert all(len(r.pair) == 2 for r in rows)


def test_phash_pairs_within_hamming_bound(spark, sf_dir):
    rows = registry.QUERIES["multimodal_phash_dedup"](spark, sf_dir).collect()
    pairs = [(r.doc_a, r.doc_b) for r in rows]
    assert len(pairs) == len(set(pairs))  # banding dedup worked
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 <= r.hamming <= 3


def test_containment_bounded_and_blocked(spark, sf_dir):
    docs = {
        r.doc_id: (r.lang, r.source)
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source")
        .collect()
    }
    for r in registry.QUERIES["dedup_containment"](spark, sf_dir).collect():
        assert 0.05 <= r.containment <= 1.0
        assert docs[r.doc_a] == docs[r.doc_b]  # block respected


def test_lsh_recall_consistent(spark, sf_dir):
    (r,) = registry.QUERIES["dedup_lsh_recall_eval"](spark, sf_dir).collect()
    assert r.n_hit <= min(r.n_truth, r.n_cand)
    if r.n_truth:
        assert abs(r.recall - r.n_hit / r.n_truth) < 1e-4


def test_kcore_degrees_meet_k_when_converged(spark, sf_dir):
    """At both fixture scales the bounded peel converges, so every
    surviving node keeps degree ≥ k within the core."""
    rows = registry.QUERIES["graph_kcore"](spark, sf_dir).collect()
    if rows:
        assert min(r.degree for r in rows) >= 5


def test_nb_quality_confusion_partitions_corpus(spark, sf_dir):
    rows = registry.QUERIES["text_naive_bayes_quality"](spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.label in (0, 1) and r.pred in (0, 1)


def _ref_bpe(w: str, merges: list[str]) -> list[str]:
    """Reference BPE encode: apply each merge in rank order as one
    greedy leftmost non-overlapping pass over the symbol sequence."""
    syms = list(w)
    for m in merges:
        a, b = m[0], m[1]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(m)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_fold_matches_reference_encoder(spark, sf_dir):
    """The double-separator replace fold used by pipeline_bpe_encode
    must reproduce textbook BPE (greedy leftmost per merge, merges in
    rank order) on adversarial words: runs, boundary prefix/suffix
    collisions, chained merges — plus real fixture words."""
    from pyspark.sql import functions as F

    merges = ["ll", "lx", "he", "aa", "xa"]
    words = [
        "llll", "lllll", "llx", "lxl", "hello", "aaaa", "aaaaa",
        "xaa", "axa", "aaxaa", "helloll", "lxlx", "x", "", "a",
    ]
    fixture_words = [
        r.w
        for r in load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .distinct()
        .orderBy("w")
        .limit(200)
        .collect()
    ]
    allw = words + fixture_words
    df = spark.createDataFrame([(w,) for w in allw], "w string").withColumn(
        "merges", F.array(*[F.lit(m) for m in merges])
    )
    from canvas_data_2_aws_spark.queries.curation import _BPE_FOLD_SQL

    got = {
        r.w: list(r.toks)
        for r in df.select(
            "w",
            F.expr(_BPE_FOLD_SQL.format(w="w", merges="merges")).alias("toks"),
        ).collect()
    }
    for w in allw:
        assert got[w] == _ref_bpe(w, merges), (w, got[w], _ref_bpe(w, merges))


def test_bpe_encode_token_ids_consistent(spark, sf_dir):
    """token_ids length must equal n_tokens, ids must be within the
    vocab range, and every sliced doc with a nonempty token stream must
    appear exactly once."""
    rows = registry.QUERIES["pipeline_bpe_encode"](spark, sf_dir).collect()
    assert rows
    assert len({r.doc_id for r in rows}) == len(rows)
    for r in rows:
        ids = r.token_ids.split(" ")
        assert len(ids) == r.n_tokens
        assert all(i.isdigit() and int(i) >= 1 for i in ids)


def test_bpe_vocab_growth_curve_monotone(spark, sf_dir):
    """Each additional merge can only shrink the corpus token count
    (every application replaces 2 tokens with 1) and grows the vocab
    by at most one new symbol per k."""
    rows = sorted(
        registry.QUERIES["pipeline_bpe_vocab_growth"](spark, sf_dir).collect(),
        key=lambda r: r.merges_applied,
    )
    assert [r.merges_applied for r in rows] == list(range(9))
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_tokens <= prev.n_tokens
        assert cur.vocab_size <= prev.vocab_size + 1
        assert cur.fertility <= prev.fertility
    # k=0 is the character baseline: fertility = chars per word
    assert rows[0].fertility >= rows[-1].fertility


def test_mix_temperature_exact_budget_and_flattening(spark, sf_dir):
    """Hamilton invariant: Σalloc == budget exactly. Temperature
    invariant: α = 0.5 flattens the mix, so every below-average-share
    language gets at least its proportional allocation (concavity of
    sqrt) and the largest language gets at most it."""
    from canvas_data_2_aws_spark.queries.curation import (
        _MIX_TEMP_BUDGET,
        pipeline_mix_temperature,
    )

    rows = pipeline_mix_temperature(spark, sf_dir).collect()
    assert sum(r.alloc for r in rows) == _MIX_TEMP_BUDGET
    tot_toks = sum(r.toks for r in rows)
    for r in rows:
        prop = _MIX_TEMP_BUDGET * r.toks / tot_toks
        if r.toks * len(rows) <= tot_toks:
            assert r.alloc >= int(prop) - 1
    biggest = max(rows, key=lambda r: r.toks)
    assert biggest.alloc <= _MIX_TEMP_BUDGET * biggest.toks / tot_toks + 1


def test_calibration_ece_consistent_with_bins(spark, sf_dir):
    """ECE recomputed from the emitted bins equals the attached scalar;
    bin populations cover the corpus; confidences live in their bin."""
    from canvas_data_2_aws_spark.queries.curation import (
        analytics_calibration_ece,
    )
    from canvas_data_2_aws_spark.session import load_table

    rows = analytics_calibration_ece(spark, sf_dir).collect()
    n = sum(r.n_docs for r in rows)
    assert n == load_table(spark, sf_dir, "documents").count()
    ece = round(
        sum(
            round(r.n_docs * abs(r.frac_pos - r.avg_conf) / n, 6)
            for r in rows
        ),
        4,
    )
    assert abs(ece - rows[0].ece) < 1e-9
    for r in rows:
        assert 0.0 <= r.avg_conf <= 1.0 and 0.0 <= r.frac_pos <= 1.0
        if r.bin < 9:
            assert r.bin / 10 - 1e-4 <= r.avg_conf <= (r.bin + 1) / 10 + 1e-4


def test_kneser_ney_is_a_probability_distribution(spark, sf_dir):
    """For each context w1 present in the top-50, P_KN summed over ALL
    continuations equals 1 (the KN mass balance: discounts exactly fund
    the continuation back-off) — recomputed in pure Python from the
    corpus bigrams."""
    from collections import Counter, defaultdict

    from canvas_data_2_aws_spark.queries.curation import (
        text_kneser_ney_bigram,
    )
    from canvas_data_2_aws_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    c12 = Counter()
    for r in docs:
        ws = r.text.split(" ")
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] += 1
    c1, n1p, ncont = Counter(), Counter(), Counter()
    conts = defaultdict(set)
    for (a, b), c in c12.items():
        c1[a] += c
        n1p[a] += 1
        ncont[b] += 1
        conts[a].add(b)
    ntypes = len(c12)
    rows = text_kneser_ney_bigram(spark, sf_dir).collect()
    assert len(rows) == 50
    for r in rows[:5]:
        w1 = r.w1
        mass = sum(
            max(c12[(w1, b)] - 0.75, 0.0) / c1[w1]
            + (0.75 * n1p[w1] / c1[w1]) * (ncont[b] / ntypes)
            for b in {b for (a, b) in c12} | conts[w1]
        )
        # mass sums Pcont over OBSERVED continuation types only, which
        # is the support KN normalizes over when Pcont is the
        # continuation-count distribution.
        assert abs(mass - 1.0) < 1e-9
    for r in rows:
        got = max(c12[(r.w1, r.w2)] - 0.75, 0.0) / c1[r.w1] + (
            0.75 * n1p[r.w1] / c1[r.w1]
        ) * (ncont[r.w2] / ntypes)
        assert abs(round(got, 6) - r.pkn) < 1e-9


def test_boilerplate_ranks_and_df_bounds(spark, sf_dir):
    """Per source: exactly 5 dense ranks, df non-increasing in rank,
    share == df/n_docs, and every mined n-gram is 3 tokens long."""
    from canvas_data_2_aws_spark.queries.curation import (
        text_boilerplate_ngrams,
    )

    rows = text_boilerplate_ngrams(spark, sf_dir).collect()
    by_s = {}
    for r in rows:
        assert len(r.ng.split(" ")) == 3
        assert r.df <= r.n_docs
        assert abs(r.share - round(r.df / r.n_docs, 4)) < 1e-9
        by_s.setdefault(r.source, []).append(r)
    for s, rs in by_s.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == [1, 2, 3, 4, 5]
        dfs = [r.df for r in rs]
        assert dfs == sorted(dfs, reverse=True)


def test_feature_hashing_load(spark, sf_dir):
    from canvas_data_2_aws_spark import registry

    registry.load_all()
    rows = registry.QUERIES["text_feature_hashing"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.bucket < 1024
        assert r.n_tokens >= r.n_distinct_tokens >= 1
        # net signed weight can never exceed the occurrence count
        assert abs(r.net_weight) <= r.n_tokens


def test_weighted_priority_matches_reference(spark, sf_dir):
    """r11: recompute the Efraimidis–Spirakis selection in pure
    Python/hashlib and require the exact same 100 ids in the same
    order — the md5-uniform, the key formula, and the top-k are all
    engine-independent. Also pin the length bias: the sample's mean
    weight exceeds the corpus mean."""
    import hashlib
    import math

    from canvas_data_2_aws_spark.queries.curation import _WPS_K
    from canvas_data_2_aws_spark.session import load_table

    got = (
        registry.QUERIES["sample_weighted_priority"](spark, sf_dir)
        .orderBy("rank")
        .collect()
    )
    assert len(got) == _WPS_K
    assert [r.rank for r in got] == list(range(1, _WPS_K + 1))

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    keys = []
    for d in docs:
        w = max(d.n_chars, 1)
        h = int(hashlib.md5(f"wps:{d.doc_id}".encode()).hexdigest()[:13], 16)
        keys.append((math.log((h + 1.0) / 4503599627370496.0) / w, -d.doc_id))
    expected = [
        -neg_id for _, neg_id in sorted(keys, reverse=True)[:_WPS_K]
    ]
    assert [r.doc_id for r in got] == expected

    corpus_mean = sum(max(d.n_chars, 1) for d in docs) / len(docs)
    sample_mean = sum(r.weight for r in got) / len(got)
    assert sample_mean > corpus_mean


def test_threshold_sweep_pigeonhole_and_consistency(spark, sf_dir):
    """r11: tau=2 recall is provably 1.0 (any pair within Hamming 3
    shares one of 4 16-bit bands), counts are monotone in tau, recall
    is bounded, and the tau=8 row reproduces the single-point recall
    eval (uncapped regime at this SF)."""
    rows = registry.QUERIES["dedup_threshold_sweep"](spark, sf_dir).collect()
    assert [r.tau for r in rows] == [2, 4, 6, 8]
    by = {r.tau: r for r in rows}
    assert by[2].recall == 1.0
    prev_t = prev_f = -1
    for r in rows:
        assert r.n_found <= r.n_truth
        assert r.recall is None or r.recall <= 1.0
        assert r.n_truth >= prev_t and r.n_found >= prev_f
        prev_t, prev_f = r.n_truth, r.n_found
    single = registry.QUERIES["dedup_simhash_recall_eval"](
        spark, sf_dir
    ).collect()[0]
    assert by[8].n_truth == single.n_truth
    assert by[8].n_found == single.n_hit


def test_ndcg_matches_python_recompute(spark, sf_dir):
    """r11: recompute nDCG@10 for every query in pure Python from the
    collected tf and BM25 tables — discount, gain map, top-k cut, and
    normalization must all agree with the distributed form."""
    import math

    from canvas_data_2_aws_spark.queries.text import _NDCG_K, bm25_scores

    got = {
        r.query: r
        for r in registry.QUERIES["search_ndcg_eval"](spark, sf_dir).collect()
    }
    assert len(got) == 5
    scores = bm25_scores(spark, sf_dir).collect()
    from collections import defaultdict

    by_tok = defaultdict(list)
    for s in scores:
        by_tok[s.token].append(s)
    df = {t: len(v) for t, v in by_tok.items()}
    queries = sorted(df, key=lambda t: (-df[t], t))[:5]
    assert set(queries) == set(got)
    gain_map = {0: 0.0, 1: 1.0, 2: 3.0, 3: 7.0}
    for t in queries:
        rows = by_tok[t]
        rel = {r.doc_id: min(r.tf, 3) for r in rows}
        ranking = sorted(rows, key=lambda r: (-r.bm25, r.doc_id))[:_NDCG_K]
        dcg = sum(
            gain_map[rel[r.doc_id]] / (math.log(i + 2) / math.log(2.0))
            for i, r in enumerate(ranking)
        )
        ideal = sorted(rel.items(), key=lambda kv: (-kv[1], kv[0]))[:_NDCG_K]
        idcg = sum(
            gain_map[rl] / (math.log(i + 2) / math.log(2.0))
            for i, (_, rl) in enumerate(ideal)
        )
        g = got[t]
        assert abs(g.dcg - round(dcg, 4)) < 1e-3, (t, g.dcg, dcg)
        assert abs(g.idcg - round(idcg, 4)) < 1e-3
        assert abs(g.ndcg - round(dcg / idcg, 4)) < 1e-3
        assert 0 < g.ndcg <= 1.0


def test_banding_grid_nesting(spark, sf_dir):
    """r12: banding geometries nest (a band of r rows agreeing implies
    every sub-band agreeing), so candidate and hit counts are
    non-increasing as rows-per-band grows; hits are bounded by both
    truth and candidates; and n_truth agrees with the single-point
    dedup_lsh_recall_eval (same J >= 0.5 postings-join derivation)."""
    from canvas_data_2_aws_spark import registry

    registry.load_all()
    rows = {
        r.geometry: r
        for r in registry.QUERIES["dedup_banding_grid_eval"](
            spark, sf_dir
        ).collect()
    }
    order = ["8x1", "4x2", "2x4", "1x8"]
    assert set(rows) == set(order)
    for g1, g2 in zip(order, order[1:]):
        assert rows[g1].n_cand >= rows[g2].n_cand
        assert rows[g1].n_hit >= rows[g2].n_hit
    for r in rows.values():
        assert r.n_hit <= min(r.n_cand, r.n_truth)
    assert len({r.n_truth for r in rows.values()}) == 1
    single = registry.QUERIES["dedup_lsh_recall_eval"](spark, sf_dir).collect()[0]
    assert single.n_truth == rows["8x1"].n_truth


def test_bm25_param_grid_contract(spark, sf_dir):
    """r12: 4 grid rows, every query scored at every point, nDCG in
    [0,1], and the b=0 point is EXACTLY 1.0 — with no length
    normalization BM25 is strictly monotone in tf for a fixed token,
    equal-gain ties contribute identical DCG, so the no-norm ranking
    recovers the tf-graded ideal by construction. The b>0 points can
    only do worse or equal (length norm fights raw-tf relevance)."""
    from canvas_data_2_aws_spark import registry

    registry.load_all()
    rows = {
        (r.k1, r.b): r
        for r in registry.QUERIES["search_bm25_param_grid"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == {(1.2, 0.75), (0.9, 0.4), (2.0, 0.75), (1.2, 0.0)}
    for r in rows.values():
        assert r.n_queries == 5
        assert 0.0 <= r.mean_ndcg <= 1.0
    assert rows[(1.2, 0.0)].mean_ndcg == 1.0
    assert rows[(1.2, 0.75)].mean_ndcg <= rows[(0.9, 0.4)].mean_ndcg


def test_gopher_threshold_sweep_consistent(spark, sf_dir):
    """r12: tightening the diversity floor can only drop docs (kept
    masses monotone non-increasing), and the u=0.5 row equals the base
    gate's keep count (same rules at the production point)."""
    from canvas_data_2_aws_spark import registry

    registry.load_all()
    rows = registry.QUERIES["text_gopher_threshold_sweep"](
        spark, sf_dir
    ).collect()
    assert [r.uniq_floor for r in rows] == [0.3, 0.4, 0.5, 0.6]
    for a, b in zip(rows, rows[1:]):
        assert a.n_kept >= b.n_kept
        assert a.kept_tokens >= b.kept_tokens
    base = registry.QUERIES["text_gopher_rules"](spark, sf_dir).collect()
    kept = sum(1 for r in base if r.keep)
    u50 = next(r for r in rows if r.uniq_floor == 0.5)
    assert u50.n_kept == kept


def test_minhash_perm_sweep_prefix_nesting(spark, sf_dir):
    """r13: signature budgets are PREFIX predicates over the shared
    agreement mask, so candidates and hits are non-decreasing in the
    hash budget; the 8-hash singles point must equal the banding
    grid's 8x1 row exactly (same predicate over the same superset);
    and n_truth agrees across the whole eval family."""
    registry.load_all()
    rows = {
        r.n_hashes: r
        for r in registry.QUERIES["dedup_minhash_perm_sweep"](
            spark, sf_dir
        ).collect()
    }
    assert sorted(rows) == [1, 2, 4, 8]
    for s1, s2 in zip([1, 2, 4], [2, 4, 8]):
        assert rows[s1].n_cand <= rows[s2].n_cand
        assert rows[s1].n_hit <= rows[s2].n_hit
    for r in rows.values():
        assert r.n_hit <= min(r.n_cand, r.n_truth)
    grid = {
        g.geometry: g
        for g in registry.QUERIES["dedup_banding_grid_eval"](
            spark, sf_dir
        ).collect()
    }
    assert rows[8].n_cand == grid["8x1"].n_cand
    assert rows[8].n_hit == grid["8x1"].n_hit
    assert rows[8].n_truth == grid["8x1"].n_truth


def test_stage_funnel_accounting(spark, sf_dir):
    """r13: the funnel's books must balance — stage 1 (exact) flags
    zero docs on the globally-unique-text fixture, n_new <= n_flagged
    per stage, the n_new column sums to the distinct union of all
    family flags, cumulative coverage is the running n_new sum, and
    each family's n_flagged equals its source frame's distinct doc_b
    count."""
    from canvas_data_2_aws_spark.queries.dedup import (
        minhash_truth_cached,
        simhash_pairs_cached,
    )

    registry.load_all()
    rows = sorted(
        registry.QUERIES["dedup_stage_funnel"](spark, sf_dir).collect(),
        key=lambda r: r.stage,
    )
    assert [r.family for r in rows] == [
        "exact", "minhash_j05", "simhash_ham8", "phash_ham3",
    ]
    assert rows[0].n_flagged == 0 and rows[0].n_new == 0
    cum = 0
    for r in rows:
        assert r.n_new <= r.n_flagged or r.stage == 1
        cum += r.n_new
        assert r.cum_flagged == cum
        assert 0.0 <= r.coverage_share <= 1.0
    mh = minhash_truth_cached(spark, sf_dir).select("doc_b").distinct().count()
    sim = simhash_pairs_cached(spark, sf_dir).select("doc_b").distinct().count()
    by = {r.family: r for r in rows}
    assert by["minhash_j05"].n_flagged == mh
    assert by["simhash_ham8"].n_flagged == sim
    assert cum <= by["exact"].n_docs


def test_isotonic_calibration_matches_pav_reference(spark, sf_dir):
    """r13: the minimax-identity isotonic fit equals a direct Python
    pool-adjacent-violators run on the same (n, pos) bin census; the
    fit is monotone nondecreasing; bins cover the corpus; pooled
    blocks align exactly to bin boundaries; and pooling happened iff
    the raw rates had an inversion."""
    from canvas_data_2_aws_spark.queries.curation import (
        analytics_isotonic_calibration,
    )
    from canvas_data_2_aws_spark.session import load_table

    rows = analytics_isotonic_calibration(spark, sf_dir).collect()
    assert rows == sorted(rows, key=lambda r: r.bin)
    assert sum(r.n_docs for r in rows) == load_table(
        spark, sf_dir, "documents"
    ).count()

    # direct PAV on the exact integer census
    blocks = [[r.pos, r.n_docs] for r in rows]  # [num, den]
    i = 0
    while i + 1 < len(blocks):
        a, b = blocks[i], blocks[i + 1]
        if a[0] * b[1] > b[0] * a[1]:  # avg_i > avg_{i+1}: pool
            blocks[i] = [a[0] + b[0], a[1] + b[1]]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    # expand pooled blocks back to per-bin fitted values
    expected = []
    for num, den in blocks:
        mill = (num * 2000000 + den) // (2 * den)
        expected.append((num, den, mill / 1e6))
    fitted = []
    bi = 0
    for num, den, v in expected:
        span = 0
        while span < den:
            span += rows[bi].n_docs
            fitted.append(v)
            bi += 1
        assert span == den, "pooled block does not align to bin boundaries"
    assert len(fitted) == len(rows)
    for r, v in zip(rows, fitted):
        assert abs(r.iso_rate - v) < 1e-12, (r.bin, r.iso_rate, v)

    # monotone nondecreasing
    for a, b in zip(rows, rows[1:]):
        assert a.iso_rate <= b.iso_rate + 1e-12

    # pooling happened iff the raw rates had an inversion
    raw_monotone = all(
        a.raw_rate <= b.raw_rate + 1e-12 for a, b in zip(rows, rows[1:])
    )
    pooled = any(abs(r.iso_rate - r.raw_rate) > 1e-9 for r in rows)
    assert pooled == (not raw_monotone)


def test_auc_equals_pair_counting_reference(spark, sf_dir):
    """r13: the rank-identity AUC equals the O(n^2) pair-counting
    definition (P[pos > neg] + 0.5*P[tie]) computed in pure Python on
    the same scored frame; gini == 2*auc - 1; and the classifier is
    genuinely informative (auc > 0.5) so the instrument isn't grading
    a coin flip."""
    from canvas_data_2_aws_spark.queries.curation import (
        _nb_scored,
        analytics_auc_quality,
    )

    r = analytics_auc_quality(spark, sf_dir).collect()[0]
    scored = [(x.label, x.score) for x in _nb_scored(spark, sf_dir).collect()]
    pos = sorted(s for l, s in scored if l == 1)
    neg = sorted(s for l, s in scored if l == 0)
    assert r.n_pos == len(pos) and r.n_neg == len(neg)
    import bisect

    num2 = 0  # 2 * (wins + 0.5*ties), exact integer
    for p in pos:
        lo = bisect.bisect_left(neg, p)
        hi = bisect.bisect_right(neg, p)
        num2 += 2 * lo + (hi - lo)
    d = 2 * len(pos) * len(neg)
    expected = ((num2 * 1000000 + len(pos) * len(neg)) // d) / 1e6
    assert abs(r.auc - expected) < 1e-12, (r.auc, expected)
    assert abs(r.gini - (2 * r.auc - 1.0)) < 1e-9
    assert r.auc > 0.5


def test_isotonic_fit_adversarial_censuses(spark):
    """r13: drive ADVERSARIAL synthetic (bin, n, pos) censuses through
    the exact production minimax expressions (isotonic_fit) and
    compare to a direct PAV reference: strictly decreasing rates (one
    global pool), already-monotone (identity), plateau + spike,
    single bin, two inverted bins, all-zero and all-one labels, and a
    sawtooth. These shapes hit every pooling branch the fixture
    census cannot guarantee to cover."""
    from canvas_data_2_aws_spark.queries.curation import isotonic_fit

    def pav(blocks):
        blocks = [list(b) for b in blocks]
        i = 0
        while i + 1 < len(blocks):
            a, b = blocks[i], blocks[i + 1]
            if a[0] * b[1] > b[0] * a[1]:
                blocks[i] = [a[0] + b[0], a[1] + b[1]]
                del blocks[i + 1]
                i = max(i - 1, 0)
            else:
                i += 1
        return blocks

    cases = {
        "decreasing": [(9, 10), (7, 10), (5, 10), (3, 10), (1, 10)],
        "monotone": [(1, 10), (3, 10), (5, 10), (9, 10)],
        "plateau_spike": [(5, 10), (5, 10), (10, 10), (0, 10), (5, 10)],
        "single": [(4, 7)],
        "two_inverted": [(6, 8), (2, 8)],
        "all_zero": [(0, 5), (0, 9), (0, 2)],
        "all_one": [(5, 5), (9, 9), (2, 2)],
        "sawtooth": [(1, 4), (3, 4), (0, 4), (4, 4), (2, 4), (3, 4)],
    }
    for name, census in cases.items():
        df = spark.createDataFrame(
            [(i, n, p) for i, (p, n) in enumerate(census)],
            "bin long, n long, pos long",
        )
        rows = isotonic_fit(df, max_bins=20).collect()
        assert [r.bin for r in rows] == list(range(len(census))), name
        # expand the PAV blocks to per-bin fitted values
        fitted = []
        for num, den in pav([(p, n) for p, n in census]):
            mill = (num * 2000000 + den) // (2 * den)
            span = 0
            while span < den:
                span += census[len(fitted)][1]
                fitted.append(mill / 1e6)
        assert len(fitted) == len(census), name
        for r, v in zip(rows, fitted):
            assert abs(r.iso_rate - v) < 1e-12, (name, r.bin, r.iso_rate, v)
        for a, b in zip(rows, rows[1:]):
            assert a.iso_rate <= b.iso_rate + 1e-12, name
