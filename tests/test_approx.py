"""Quality bounds for approximate operators: rows-only queries still
need their approximation to be demonstrably close to the exact answer,
or they are fast garbage (same rationale as the IVF recall test)."""

from __future__ import annotations

from pyspark.sql import functions as F

from canvas_data_2_aws_spark import registry
from canvas_data_2_aws_spark.session import load_table

registry.load_all()


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    approx = ev.select(F.approx_count_distinct("user_id", rsd=0.05)).first()[0]
    assert abs(approx - exact) <= max(3 * 0.05 * exact, 2), (approx, exact)


def test_minhash_pairs_are_actually_similar(spark, sf_dir):
    """Every pair MinHash-LSH returns at distance ≤ 0.6 must have TRUE
    shingle-set Jaccard distance ≤ 0.6 — approxSimilarityJoin computes
    the exact distance for candidates, so false positives here mean a
    wiring bug (wrong columns, wrong feature space)."""
    pairs = registry.QUERIES["dedup_near_minhash"](spark, sf_dir)
    assert pairs.where(F.col("jaccard_dist") > 0.6).count() == 0


def test_lsh_ann_neighbors_overlap_exact(spark, sf_dir):
    """LSH top-10 for vec_id=0 must share most members with the exact
    top-10 by Euclidean distance (the LSH family's metric)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).head().embedding
    q_arr = "array(" + ",".join(f"CAST({float(x)!r} AS DOUBLE)" for x in q) + ")"
    dist = F.expr(
        f"sqrt(aggregate(zip_with(embedding, {q_arr},"
        " (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    exact_ids = {
        r.vec_id
        for r in emb.select("vec_id", dist.alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    }
    approx_ids = {r.vec_id for r in registry.QUERIES["ann_lsh"](spark, sf_dir).collect()}
    assert len(exact_ids & approx_ids) >= 7, (exact_ids, approx_ids)


def test_fake_codec_is_deterministic_and_shaped(spark, sf_dir):
    from canvas_data_2_aws_spark.operators.multimodal import fake_codec

    frames = fake_codec(b"x" * 300)
    assert frames == fake_codec(b"x" * 300)  # pure function of bytes
    assert 1 <= len(frames) <= 3
    for idx, (frame_idx, w, h, mean_byte) in enumerate(frames):
        assert frame_idx == idx
        assert w > 0 and h > 0 and 0 <= mean_byte <= 255

    rows = registry.QUERIES["multimodal_decode_frames"](spark, sf_dir).collect()
    assert rows and all(r.width > 0 and r.height > 0 for r in rows)
    # 1→N expansion really happened: some doc produced >1 frame
    assert len(rows) > len({r.doc_id for r in rows})


def test_approx_percentile_close_to_exact(spark, sf_dir):
    """t-digest p50/p90 must land within 2% of the exact interpolated
    percentile on every group (generous: accuracy=10000 is near-exact
    at fixture scale)."""
    rows = registry.QUERIES["agg_approx_percentile"](spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    exact = {
        r.o_orderpriority: (r.p50, r.p90)
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        )
        .collect()
    }
    for r in rows:
        p50e, p90e = exact[r.o_orderpriority]
        a50, a90 = r.approx_p50, r.approx_p90
        assert abs(a50 - p50e) <= 0.02 * p50e, (r.o_orderpriority, a50, p50e)
        assert abs(a90 - p90e) <= 0.02 * p90e, (r.o_orderpriority, a90, p90e)


def test_resize_bytes_match_python_reference(spark, sf_dir):
    """The mapInPandas resize stage returns byte-for-byte what the
    reference fake_resize computes driver-side (pins the Arrow binary
    round-trip, not just the graded geometry)."""
    from canvas_data_2_aws_spark.operators.multimodal import (
        attach_payload,
        fake_resize,
        resize_media,
    )
    from canvas_data_2_aws_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").where("doc_id % 25 = 0")
    media = attach_payload(docs)
    got = {
        r.doc_id: bytes(r.resized)
        for r in resize_media(media, resizer=fake_resize).collect()
    }
    want = {
        r.doc_id: fake_resize(bytes(r.payload))
        for r in media.select("doc_id", "payload").collect()
    }
    assert got == want and len(got) >= 10


def test_resize_without_resizer_raises(spark, sf_dir):
    """The real-codec path is explicitly NotImplemented in this
    environment — never a silent fake."""
    import pytest as _pytest

    from canvas_data_2_aws_spark.operators.multimodal import (
        attach_payload,
        resize_media,
    )
    from canvas_data_2_aws_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").limit(1)
    with _pytest.raises(NotImplementedError):
        resize_media(attach_payload(docs))


def test_phash_threshold_curve_pigeonhole(spark, sf_dir):
    """r12: 2 bands with <=1 bit error leave one band clean, so recall
    at tau in {0,1} is EXACTLY 1.0; truth mass is non-decreasing in tau
    and always bounds the found mass; recall is non-increasing."""
    from canvas_data_2_aws_spark import registry

    registry.load_all()
    rows = registry.QUERIES["multimodal_phash_threshold_curve"](
        spark, sf_dir
    ).collect()
    assert [r.tau for r in rows] == [0, 1, 2, 3]
    assert rows[0].recall == 1.0 and rows[1].recall == 1.0
    for a, b in zip(rows, rows[1:]):
        assert b.n_truth_pairs >= a.n_truth_pairs
        assert b.n_found_pairs >= a.n_found_pairs
        assert b.recall <= a.recall
    for r in rows:
        assert r.n_found_pairs <= r.n_truth_pairs
