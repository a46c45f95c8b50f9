"""Unit coverage for plans/audit.py's build-side row-bound resolver —
each provable-source class, plus the unprovable cases that must stay
flagged."""

from __future__ import annotations

from pyspark.sql import functions as F

from canvas_data_2_aws_spark.plans.audit import (
    SCALAR_ATTACH_MAX_ROWS,
    find_nested_loops,
)
from canvas_data_2_aws_spark.session import load_table


def _one(df):
    hits = find_nested_loops(df)
    assert len(hits) >= 1, "expected a nested-loop node"
    return hits[0]


def test_bound_range(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    h = _one(orders.crossJoin(F.broadcast(spark.range(5))))
    assert h["ok"] and h["bound"] == 5


def test_bound_limit(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    small = orders.select("o_orderkey").limit(7)
    h = _one(orders.crossJoin(F.broadcast(small)))
    assert h["ok"] and h["bound"] == 7


def test_bound_union_of_bounded(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    u = spark.range(3).unionAll(spark.range(4))
    h = _one(orders.crossJoin(F.broadcast(u)))
    assert h["ok"] and h["bound"] == 7


def test_bound_explode_literal_array(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    grid = spark.range(1).select(
        F.explode(F.array(F.lit(10), F.lit(50), F.lit(100))).alias("k")
    )
    h = _one(orders.crossJoin(F.broadcast(grid)))
    assert h["ok"] and h["bound"] == 3


def test_bound_explode_literal_sequence(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    grid = spark.range(1).select(F.explode(F.expr("sequence(0, 6)")).alias("k"))
    h = _one(orders.crossJoin(F.broadcast(grid)))
    assert h["ok"] and h["bound"] == 7


def test_unbounded_data_dependent_explode_is_flagged(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    orders = load_table(spark, sf_dir, "orders")
    fan = docs.select(F.explode(F.split("text", " ")).alias("w")).limit(
        SCALAR_ATTACH_MAX_ROWS + 1
    )
    # limit above the threshold: bounded but NOT scalar-sized
    h = _one(orders.crossJoin(F.broadcast(fan)))
    assert not h["ok"] and h["bound"] == SCALAR_ATTACH_MAX_ROWS + 1

    nolimit = docs.select(F.explode(F.split("text", " ")).alias("w"))
    h2 = _one(orders.crossJoin(F.broadcast(nolimit)))
    assert not h2["ok"] and h2["bound"] is None


def test_audit_checkpoints_sees_through_truncation(spark, sf_dir):
    """A data×data product upstream of a localCheckpoint vanishes from
    the final plan (RDD-scan truncation) — audit_checkpoints() must
    still catch it, and count_rdd_scans must expose the opaque scan."""
    from canvas_data_2_aws_spark.plans.audit import (
        audit_checkpoints,
        count_rdd_scans,
    )

    orders = load_table(spark, sf_dir, "orders").limit(200)
    cust = load_table(spark, sf_dir, "customer").limit(200)
    with audit_checkpoints() as hits:
        hidden = (
            orders.crossJoin(cust.select(F.col("c_custkey").alias("ck")))
            .localCheckpoint(eager=False)
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
    # post-hoc inspection is blind...
    assert find_nested_loops(hidden) == []
    assert count_rdd_scans(hidden) >= 1
    # ...but the checkpoint-time audit caught the product. The build
    # sides are LIMIT 200 frames (bounded above the scalar threshold),
    # so the hit must be flagged not-ok.
    assert hits and any(
        h["via"] == "checkpoint" and not h["ok"] for h in hits
    ), hits
