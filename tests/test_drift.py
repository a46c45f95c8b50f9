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
