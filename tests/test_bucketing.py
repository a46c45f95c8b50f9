"""Bucketed-layout co-located join (SCALE.md §1): replica tables
bucketed by PK must join with ZERO shuffle — the property that makes
the per-sync M1 merge shuffle-free at 100 TB."""

from __future__ import annotations

import pytest

from canvas_data_2_aws_spark.session import load_table


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .withColumnRenamed("l_orderkey", "o_orderkey")
    )
    for name, df in (("b_orders", orders), ("b_lineitem", li)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_cobucketed_join_is_shuffle_free(spark, bucketed_pair):
    a, b = bucketed_pair
    # Disable broadcast: at fixture scale the dim side fits under the
    # threshold and Catalyst would broadcast instead — the property
    # under test is the big-big case, where bucketing must remove the
    # ShuffleExchange on BOTH sides.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and it still computes the right thing
        assert joined.count() == b.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_is_shuffle_free(spark, bucketed_pair):
    a, _ = bucketed_pair
    agg = a.groupBy("o_orderkey").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_dynamic_partition_pruning_fires(spark, sf_dir, tmp_path):
    """SCALE.md §1: date-partitioned fact layout + dim-side filter →
    Catalyst injects a dynamic pruning subquery into the fact scan, so
    only matching partitions are read at 100 TB."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    orders.write.partitionBy("order_year").mode("overwrite").parquet(
        str(tmp_path / "fact")
    )
    years = [r.order_year for r in orders.select("order_year").distinct().collect()]
    dim = spark.createDataFrame(
        [(y, "keep" if y == min(years) else "drop") for y in years],
        "order_year int, flag string",
    )
    dim.write.mode("overwrite").parquet(str(tmp_path / "dim"))

    fact = spark.read.parquet(str(tmp_path / "fact"))
    dim_f = spark.read.parquet(str(tmp_path / "dim")).where("flag = 'keep'")
    joined = fact.join(dim_f, "order_year")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    assert joined.count() == orders.where(F.col("order_year") == min(years)).count()
