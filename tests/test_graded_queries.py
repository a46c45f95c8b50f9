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


def test_simhash_band_pigeonhole():
    """The banded candidate scheme's exactness argument (pure math, no
    Spark): any two 63-bit hashes within Hamming distance 3 MUST share
    one of the 4 16-bit bands — a 4-band split can't spread 3 flipped
    bits across every band. Property-checked over deterministic
    md5-derived hash pairs."""
    import hashlib

    def h63(seed: str) -> int:
        return int(hashlib.md5(seed.encode()).hexdigest()[:16], 16) & ((1 << 63) - 1)

    for t in range(200):
        base = h63(f"base:{t}")
        flips = sorted(
            int(hashlib.md5(f"f:{t}:{j}".encode()).hexdigest()[:4], 16) % 63
            for j in range(3)
        )
        other = base
        for f in set(flips):  # <=3 distinct bit flips
            other ^= 1 << f
        shares_band = any(
            (base >> (b * 16)) & 0xFFFF == (other >> (b * 16)) & 0xFFFF
            for b in range(4)
        )
        assert shares_band, (t, flips)


def test_simhash_pairs_verified_within_threshold(spark, sf_dir):
    """Every emitted near-dup pair honors the exact Hamming gate
    (bit_count(xor) <= SIMHASH_HAM_MAX) and is doc_a < doc_b exactly
    once — the invariants the graph family builds on."""
    from pyspark.sql import functions as F

    from canvas_data_2_aws_spark.operators import text as T
    from canvas_data_2_aws_spark.queries.dedup import simhash_pairs
    from canvas_data_2_aws_spark.queries.shared_sql import SIMHASH_HAM_MAX
    from canvas_data_2_aws_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = simhash_pairs(docs).localCheckpoint()
    n = pairs.count()
    assert n == pairs.select("doc_a", "doc_b").distinct().count()
    assert pairs.where(F.col("doc_a") >= F.col("doc_b")).count() == 0
    sh = T.simhash64(docs)
    joined = (
        pairs.join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("simhash", "sim_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("simhash", "sim_b")
    )
    over = joined.where(
        F.expr(f"bit_count(sim_a ^ sim_b) > {SIMHASH_HAM_MAX}")
    ).count()
    assert over == 0


def test_simhash64_stays_in_bigint_range(spark, sf_dir):
    """The 63-bit construction must never set the sign bit: DuckDB
    raises Out of Range on 1::BIGINT << 63, so a negative simhash
    would break every oracle twin's shift/xor arithmetic."""
    from pyspark.sql import functions as F

    from canvas_data_2_aws_spark.operators import text as T
    from canvas_data_2_aws_spark.session import load_table

    sh = T.simhash64(load_table(spark, sf_dir, "documents"))
    assert sh.where(F.col("simhash") < 0).count() == 0


def test_bloom_prefilter_no_false_negatives(spark, sf_dir):
    rows = registry.QUERIES["join_bloom_prefilter"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # a Bloom filter may over-approximate, never under-approximate
        assert r.n_candidates >= r.n_members
        assert r.n_false_pos == r.n_candidates - r.n_members
        # 16 bits/key, k=3 ⇒ designed fp ≈ 0.5%; allow generous slack
        assert r.fp_rate is None or r.fp_rate < 0.05


def test_deletion_vectors_accounting(spark, sf_dir):
    rows = registry.QUERIES["merge_deletion_vectors"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_live + r.n_deleted == r.n_rows
        assert r.n_rows <= 1024
        # dense bitmap never exceeds ceil(file_rows/8); zero iff no deletes
        assert r.dv_bytes <= (1024 + 7) // 8
        assert (r.dv_bytes == 0) == (r.n_deleted == 0)
        assert (r.cow_rewrite_bytes == 0) == (r.n_deleted == 0)


def test_key_skew_audit_bounds(spark, sf_dir):
    """r12: shares nest (top1 <= top10 <= 1), entropy is bounded by
    ln(n_keys) so the balance ratio lives in [0, 1], and the exact
    integer masses reconcile."""
    rows = registry.QUERIES["validate_key_skew"](spark, sf_dir).collect()
    assert [r.key_name for r in rows] == [
        "events.user_id",
        "lineitem.l_orderkey",
        "orders.o_custkey",
    ]
    for r in rows:
        assert 0 < r.max_key_rows <= r.n_rows
        assert 0 < r.top1_share <= r.top10_share <= 1.0
        assert r.max_key_rows * r.n_keys >= r.n_rows  # max >= mean
        assert 0.0 <= r.balance_ratio <= 1.0
        assert r.entropy >= 0.0


def test_asof_tolerance_sweep_monotone(spark, sf_dir):
    """r12: widening the tolerance can only ADD matches (and the added
    matches are staler, so mean staleness is non-decreasing); the
    widest bound never exceeds the unbounded as-of's match count."""
    rows = registry.QUERIES["join_asof_tolerance_sweep"](spark, sf_dir).collect()
    assert [r.tol_hours for r in rows] == [1, 24, 168, 720]
    assert len({r.n_purchases for r in rows}) == 1
    for a, b in zip(rows, rows[1:]):
        assert a.n_matched <= b.n_matched
        assert a.mean_staleness_min <= b.mean_staleness_min
    unbounded = (
        registry.QUERIES["join_asof"](spark, sf_dir)
        .where("last_signup_ts IS NOT NULL")
        .count()
    )
    assert rows[-1].n_matched <= unbounded
    assert rows[-1].n_purchases == rows[0].n_purchases


def test_disorder_stats_invariants(spark, sf_dir):
    """r13: the lateness census is internally consistent — quantiles
    are nondecreasing (p50 <= p95 <= p99 <= max), the late share
    matches n_late/n_events, counts cover the table, and re-sorting
    the events by event time would zero the census (checked by feeding
    an already-sorted frame through the same two-level running max)."""
    from canvas_data_2_aws_spark.queries.streaming import (
        stream_disorder_stats,
    )
    from canvas_data_2_aws_spark.session import load_table

    r = stream_disorder_stats(spark, sf_dir).collect()[0]
    assert r.n_events == load_table(spark, sf_dir, "events").count()
    assert 0 <= r.n_late <= r.n_events
    assert abs(r.late_share - round(r.n_late / r.n_events, 6)) < 2e-6
    assert 0.0 <= r.p50_s <= r.p95_s <= r.p99_s <= r.max_s
    # the fixture's ingest order is genuinely disordered (else the
    # instrument grades a vacuous all-zero table)
    assert r.max_s > 0.0 and r.n_late > 0


def test_map_in_arrow_equals_builtin_expressions(spark, sf_dir):
    """r13 U6: the RecordBatch kernel chain reproduces the JVM-side
    builtin expressions bit-for-bit (same IEEE op order), and the
    modulo-via-divide identity used for qty_bucket is exact."""
    from canvas_data_2_aws_spark.queries.udfs import udf_map_in_arrow
    from canvas_data_2_aws_spark.session import load_table
    from pyspark.sql import functions as F

    got = {
        (r.l_orderkey, r.l_linenumber): (r.charge, r.qty_bucket)
        for r in udf_map_in_arrow(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem").where("l_orderkey % 48 = 0")
    want = {
        (r.l_orderkey, r.l_linenumber): (r.charge, r.qty_bucket)
        for r in li.select(
            "l_orderkey",
            "l_linenumber",
            (
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            )
            .cast("decimal(18,6)")
            .cast("double")
            .alias("charge"),
            (F.col("l_quantity").cast("bigint") % 7).alias("qty_bucket"),
        ).collect()
    }
    assert got == want and got
