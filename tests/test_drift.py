"""Schema-drift policy: benign numeric width re-aligns, breaks raise."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from canvas_data_2_aws_spark import schemas
from canvas_data_2_aws_spark.session import _align_drift, load_table


@pytest.fixture
def fake_table():
    schemas.TABLES["_drift_test"] = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    yield "_drift_test"
    del schemas.TABLES["_drift_test"]


def test_numeric_width_drift_coerces(spark, fake_table):
    df = spark.createDataFrame(
        [(1, 2.5)],
        T.StructType(
            [
                T.StructField("k", T.IntegerType()),  # narrowed key
                T.StructField("v", T.FloatType()),  # narrowed value
            ]
        ),
    )
    aligned = _align_drift(fake_table, df)
    assert [f.dataType for f in aligned.schema.fields] == [
        T.LongType(),
        T.DoubleType(),
    ]
    assert aligned.collect()[0].k == 1


def test_column_rename_raises(spark, fake_table):
    df = spark.createDataFrame([(1, 2.5)], "kk long, v double")
    with pytest.raises(ValueError, match="declared columns"):
        _align_drift(fake_table, df)


def test_incompatible_type_raises(spark, fake_table):
    df = spark.createDataFrame([("a", 2.5)], "k string, v double")
    with pytest.raises(ValueError, match="incompatible"):
        _align_drift(fake_table, df)


def test_real_tables_load_unchanged(spark, sf_dir):
    for name in schemas.TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        assert df.columns == [f.name for f in schemas.TABLES[name]]


def test_lossy_narrowing_drift_raises(spark, fake_table):
    """File wider than contract AND values that don't fit: double
    column with fractional values under a declared... use a bigint
    contract via a second fake table."""
    schemas.TABLES["_drift_lossy"] = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.LongType())]
    )
    try:
        df = spark.createDataFrame([(1, 2.5)], "k long, v double")
        with pytest.raises(ValueError, match="lossy numeric drift"):
            _align_drift("_drift_lossy", df)
    finally:
        del schemas.TABLES["_drift_lossy"]


def test_value_preserving_narrowing_coerces(spark, fake_table):
    """File wider than contract but every value round-trips (2.0 is
    exactly representable as bigint): coerce, don't raise."""
    schemas.TABLES["_drift_ok"] = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.LongType())]
    )
    try:
        df = spark.createDataFrame([(1, 2.0), (2, None)], "k long, v double")
        aligned = _align_drift("_drift_ok", df)
        assert [f.dataType for f in aligned.schema.fields] == [
            T.LongType(), T.LongType(),
        ]
        rows = {r.k: r.v for r in aligned.collect()}
        assert rows == {1: 2, 2: None}
    finally:
        del schemas.TABLES["_drift_ok"]


def test_int_overflow_narrowing_raises(spark, fake_table):
    """bigint file values beyond int32 range under a declared int must
    raise (non-ANSI cast would silently wrap)."""
    schemas.TABLES["_drift_of"] = T.StructType(
        [T.StructField("k", T.IntegerType())]
    )
    try:
        df = spark.createDataFrame([(2**40,)], "k long")
        with pytest.raises(ValueError, match="lossy numeric drift"):
            _align_drift("_drift_of", df)
    finally:
        del schemas.TABLES["_drift_of"]
