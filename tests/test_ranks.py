"""Distributed global ranks ≡ naive single-partition window forms.

The operators must be *bit-identical* to `row_number()/ntile()` over a
bare ORDER BY — the graded queries swap implementations on this
guarantee.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from canvas_data_2_aws_spark.operators.ranks import exact_ntile, global_row_number
from canvas_data_2_aws_spark.session import load_table


def test_global_row_number_matches_naive(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    dist = global_row_number(o, ["o_totalprice", "o_orderkey"], out="rn")
    naive = o.withColumn(
        "rn",
        F.row_number()
        .over(Window.orderBy("o_totalprice", "o_orderkey"))
        .cast("long"),
    )
    assert (
        dist.select("o_orderkey", "rn")
        .exceptAll(naive.select("o_orderkey", "rn"))
        .count()
        == 0
    )
    assert dist.count() == naive.count()


def test_global_row_number_desc_order(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    keys = [F.col("o_totalprice").desc(), F.col("o_orderkey").desc()]
    dist = global_row_number(o, keys, out="rn")
    naive = o.withColumn(
        "rn", F.row_number().over(Window.orderBy(*keys)).cast("long")
    )
    assert (
        dist.select("o_orderkey", "rn")
        .exceptAll(naive.select("o_orderkey", "rn"))
        .count()
        == 0
    )


def test_exact_ntile_matches_naive(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    for k in (3, 5, 10, 7):
        dist = exact_ntile(o, k, ["o_totalprice", "o_orderkey"], out="b")
        naive = o.withColumn(
            "b",
            F.ntile(k)
            .over(Window.orderBy("o_totalprice", "o_orderkey"))
            .cast("long"),
        )
        assert (
            dist.select("o_orderkey", "b")
            .exceptAll(naive.select("o_orderkey", "b"))
            .count()
            == 0
        ), f"ntile({k}) mismatch"


def test_exact_ntile_more_buckets_than_rows(spark, sf_dir):
    small = load_table(spark, sf_dir, "region")  # 5 rows
    dist = exact_ntile(small, 10, ["r_regionkey"], out="b")
    naive = small.withColumn(
        "b", F.ntile(10).over(Window.orderBy("r_regionkey")).cast("long")
    )
    assert (
        dist.select("r_regionkey", "b")
        .exceptAll(naive.select("r_regionkey", "b"))
        .count()
        == 0
    )


def test_no_single_partition_window_in_plan(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    plan = exact_ntile(
        o, 10, ["o_totalprice", "o_orderkey"], out="b"
    )._jdf.queryExecution().executedPlan().toString()
    # The data-bearing window must be partitioned; the only allowed
    # SinglePartition exchange feeds the ≤#partitions-row offset table.
    import re

    for m in re.finditer(r"Window \[[^\n]*", plan):
        line = m.group(0)
        if "__rank_pid" not in line:
            assert "partitionBy" not in line or "[]" not in line


def test_global_cumsum_matches_naive(spark, sf_dir):
    from canvas_data_2_aws_spark.operators.ranks import global_cumsum

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    keys = [F.col("cents").desc(), F.col("o_orderkey")]
    dist = global_cumsum(o, keys, "cents", out="cum")
    naive = o.withColumn(
        "cum",
        F.sum("cents").over(
            Window.orderBy(*keys).rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    assert (
        dist.select("o_orderkey", "cum")
        .exceptAll(naive.select("o_orderkey", "cum"))
        .count()
        == 0
    )
