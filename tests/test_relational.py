"""Unit tests for scans/filters + flagship aggregation (SURVEY §2.1-2.4)."""

from __future__ import annotations

from canvas_data_2_aws_spark import registry
from tests.oracle_util import assert_matches_oracle

registry.load_all()


def test_scan_project_filter_matches_oracle(spark, sf_dir, duck):
    sdf = registry.QUERIES["scan_project_filter"](spark, sf_dir)
    assert_matches_oracle(sdf, duck, registry.ORACLES["scan_project_filter"])


def test_scan_pushdown_reaches_parquet(spark, sf_dir):
    sdf = registry.QUERIES["scan_project_filter"](spark, sf_dir)
    plan = sdf._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    # column pruning: l_tax is not referenced, must not be read
    assert "l_tax" not in plan.split("ReadSchema")[-1]


def test_agg_group_sum_matches_oracle(spark, sf_dir, duck):
    sdf = registry.QUERIES["agg_group_sum"](spark, sf_dir)
    assert_matches_oracle(sdf, duck, registry.ORACLES["agg_group_sum"])


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert len(df.collect()) > 0


def test_every_query_has_matching_oracle_keys():
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0


def test_sink_roundtrip_counts(spark, sf_dir):
    out = registry.QUERIES["sink_roundtrip"](spark, sf_dir).collect()
    total = sum(r.n_rows for r in out)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert total == orders.count()


def test_csv_roundtrip(spark, sf_dir):
    out = registry.QUERIES["csv_decode_smoke"](spark, sf_dir).collect()
    assert len(out) == 25


def test_schema_drift_rejected(spark, sf_dir, tmp_path, monkeypatch):
    """S4 strict mode: a type change in the stored table must fail
    loudly, not coerce silently."""
    import pytest
    from canvas_data_2_aws_spark import schemas, session
    from pyspark.sql import functions as F

    drifted = (
        spark.read.parquet(f"{sf_dir}/region.parquet")
        .withColumn("r_regionkey", F.col("r_regionkey").cast("string"))
    )
    drifted.write.mode("overwrite").parquet(str(tmp_path / "region.parquet"))
    with pytest.raises(ValueError, match="schema drift"):
        session.load_table(spark, str(tmp_path), "region")


def test_declared_schemas_match_fixtures(spark, sf_dir):
    """Every declared StructType matches the shipped fixtures exactly
    (the load path validates on every read; this pins all ten)."""
    from canvas_data_2_aws_spark import schemas, session

    for name in schemas.TABLE_NAMES:
        session.load_table(spark, sf_dir, name)  # raises on drift
