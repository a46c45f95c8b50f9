"""Salted-join / two-phase-agg equivalence (operators/skew.py): the
skew-mitigated plans must return exactly the plain plans' results."""

from __future__ import annotations

from pyspark.sql import functions as F

from canvas_data_2_aws_spark.operators.skew import salted_join, two_phase_agg
from canvas_data_2_aws_spark.session import load_table


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_join_equals_plain_join(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey"
    )
    supplier = load_table(spark, sf_dir, "supplier").withColumnRenamed(
        "s_suppkey", "l_suppkey"
    )
    plain = lineitem.join(supplier, on=["l_suppkey"])
    salted = salted_join(lineitem, supplier, on=["l_suppkey"], n_salts=8)
    cols = ["l_orderkey", "l_linenumber", "l_suppkey", "s_name"]
    assert _rows(salted, cols) == _rows(plain, cols)


def test_salted_left_join_preserves_unmatched(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id").limit(500)
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "user_id long, tag string")
    plain = ev.join(dim, on=["user_id"], how="left")
    salted = salted_join(ev, dim, on=["user_id"], n_salts=4, how="left")
    cols = ["event_id", "user_id", "tag"]
    assert _rows(salted, cols) == _rows(plain, cols)


def test_two_phase_agg_equals_direct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    direct = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    two = two_phase_agg(
        ev,
        keys=["event_type"],
        aggs=[F.count("*").alias("pn")],
        finals=[F.sum("pn").alias("n")],
        n_salts=8,
    )
    cols = ["event_type", "n"]
    assert _rows(two, cols) == _rows(direct, cols)
