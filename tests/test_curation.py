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
