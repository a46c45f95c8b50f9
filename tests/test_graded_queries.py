"""Differential test for EVERY registered oracle-checked query.

Parametrizes over the registry at collection time: any new @graded
query with an oracle automatically gets a sf0.001 hash-match test —
the in-repo mirror of the driver's t2 gate.
"""

from __future__ import annotations

import pytest

from canvas_data_2_aws_spark import registry
from tests.oracle_util import assert_matches_oracle

registry.load_all()


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = registry.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(sdf, duck, registry.ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(registry.QUERIES) - set(registry.ORACLES)))
def test_rows_only_query_runs(name, spark, sf_dir):
    rows = registry.QUERIES[name](spark, sf_dir).collect()
    assert rows is not None


def test_interval_overlap_pairs_truly_overlap(spark, sf_dir):
    from canvas_data_2_aws_spark import registry

    rows = registry.QUERIES["join_interval_overlap"](spark, sf_dir).collect()
    assert rows
    assert all(r.overlap_sec >= 0 for r in rows)
    # exactly-once emission: no duplicate (p_id, e_id) pairs
    pairs = [(r.p_id, r.e_id) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_incremental_probe_sides(spark, sf_dir):
    from canvas_data_2_aws_spark import registry

    rows = registry.QUERIES["dedup_incremental_probe"](spark, sf_dir).collect()
    for r in rows:
        assert r.doc_new % 10 == 9
        assert r.doc_old % 10 != 9
        assert 0.0 <= r.jaccard <= 1.0


def test_weighted_reservoir_k_per_stratum(spark, sf_dir):
    from collections import Counter

    from canvas_data_2_aws_spark import registry

    rows = registry.QUERIES["sample_weighted_reservoir"](spark, sf_dir).collect()
    per_lang = Counter(r.lang for r in rows)
    assert all(n == 5 for n in per_lang.values())


def test_reconcile_covers_all_orders(spark, sf_dir):
    from canvas_data_2_aws_spark import registry
    from canvas_data_2_aws_spark.session import load_table

    rows = registry.QUERIES["validate_reconcile_totals"](spark, sf_dir).collect()
    assert sum(r.n_orders for r in rows) == load_table(
        spark, sf_dir, "orders"
    ).count()
    for r in rows:
        assert r.n_diverged <= r.n_with_lines <= r.n_orders


def test_minhash_bucket_cap(spark):
    """A pathological bucket (10⁴ docs with identical shingles) must
    neither explode quadratically nor lose members: the hub-spoke cap
    emits n-1 star pairs whose connected component covers every doc."""
    import pyspark.sql.functions as F

    from canvas_data_2_aws_spark.queries.dedup import minhash_candidates

    n = 10_000
    sh = (
        spark.range(n)
        .select(
            F.col("id").cast("long").alias("doc_id"),
            F.expr("array('a b c', 'b c d', 'c d e')").alias("shingles"),
        )
        .repartition(8)
    )
    pairs = minhash_candidates(sh).collect()
    # star, not clique: n-1 pairs, NOT C(n,2) ≈ 5·10⁷
    assert len(pairs) == n - 1
    hub = min(r.doc_a for r in pairs)
    assert all(r.doc_a == hub for r in pairs)
    assert {r.doc_b for r in pairs} == set(range(1, n))


def test_minhash_cap_preserves_small_buckets(spark):
    """Buckets at or under the cap still emit the full clique."""
    import pyspark.sql.functions as F

    from canvas_data_2_aws_spark.queries.dedup import minhash_candidates

    n = 10
    sh = spark.range(n).select(
        F.col("id").cast("long").alias("doc_id"),
        F.expr("array('a b c', 'b c d')").alias("shingles"),
    )
    pairs = minhash_candidates(sh).collect()
    assert len(pairs) == n * (n - 1) // 2


def test_phash_bucket_cap(tmp_path, spark):
    """10⁴ identical documents collapse every band bucket to a star:
    verified pairs stay O(n), not C(n,2)."""
    import shutil

    import pyspark.sql.functions as F

    from canvas_data_2_aws_spark import registry

    n = 10_000
    src = "/root/testdata/sf0.001"
    probe = tmp_path / "phash_cap"
    probe.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        shutil.copyfile(f"{src}/{t}.parquet", probe / f"{t}.parquet")
    spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same payload text repeated for every document").alias(
            "text"
        ),
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
        F.lit(48).alias("n_chars"),
    ).write.mode("overwrite").parquet(str(probe / "documents.parquet"))
    rows = registry.QUERIES["multimodal_phash_dedup"](
        spark, str(probe)
    ).collect()
    # identical docs ⇒ hamming 0 everywhere; star caps each band
    # bucket at n-1 edges, distinct across the two bands -> n-1 pairs
    assert len(rows) == n - 1
    assert all(r.hamming == 0 and r.doc_a == 0 for r in rows)
