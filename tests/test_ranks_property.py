"""Property-based equivalence of the distributed rank operators with
their naive single-task ANSI window forms, over randomized frames —
duplicates, negative values, skewed groups, and tiny partitions
included. The fixed-seed unit tests pin one case; these sweep the
space the range partitioner actually has to survive (ties at partition
borders, empty groups, all-equal order keys are impossible by the
total-order contract, so a unique tiebreak column is always added).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Window, functions as F

from canvas_data_2_aws_spark.operators.ranks import (
    exact_ntile,
    global_cumsum,
    global_row_number,
    grouped_prefix_max,
)

ROWS = st.lists(
    st.tuples(
        st.integers(0, 3),      # group
        st.integers(-20, 20),   # order value (ties likely)
        st.integers(-50, 50),   # payload value
    ),
    min_size=1,
    max_size=60,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


def _df(spark, rows):
    # uid makes (o, uid) a total order — the operators' stated contract
    data = [(g, o, v, i) for i, (g, o, v) in enumerate(rows)]
    return spark.createDataFrame(
        data, "g int, o int, v int, uid int"
    ).repartition(7)


@settings(**_SETTINGS)
@given(rows=ROWS)
def test_global_row_number_matches_ansi(spark, rows):
    df = _df(spark, rows)
    got = global_row_number(df, ["o", "uid"], out="rn", num_partitions=4)
    w = Window.orderBy("o", "uid")
    want = df.withColumn("rn", F.row_number().over(w).cast("long"))
    assert sorted(got.collect()) == sorted(want.collect())


@settings(**_SETTINGS)
@given(rows=ROWS)
def test_exact_ntile_matches_ansi(spark, rows):
    df = _df(spark, rows)
    got = exact_ntile(df, 3, ["o", "uid"], out="b", num_partitions=4)
    w = Window.orderBy("o", "uid")
    want = df.withColumn("b", F.ntile(3).over(w).cast("long"))
    assert sorted(got.collect()) == sorted(want.collect())


@settings(**_SETTINGS)
@given(rows=ROWS)
def test_global_cumsum_matches_ansi(spark, rows):
    df = _df(spark, rows)
    got = global_cumsum(df, ["o", "uid"], "v", out="c", num_partitions=4)
    w = Window.orderBy("o", "uid").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("c", F.sum("v").over(w))
    assert sorted(got.collect()) == sorted(want.collect())


@settings(**_SETTINGS)
@given(rows=ROWS)
def test_grouped_prefix_max_matches_ansi(spark, rows):
    df = _df(spark, rows)
    got = grouped_prefix_max(
        df, group_cols=["g"], order_cols=["o", "uid"], value_col="v",
        out="rm", num_partitions=4,
    )
    w = (
        Window.partitionBy("g")
        .orderBy("o", "uid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = df.withColumn("rm", F.max("v").over(w))
    assert sorted(got.collect()) == sorted(want.collect())


@settings(**_SETTINGS)
@given(rows=ROWS)
def test_grouped_prefix_sum_matches_ansi(spark, rows):
    from canvas_data_2_aws_spark.operators.ranks import grouped_prefix_sum

    df = _df(spark, rows)
    got = grouped_prefix_sum(
        df, group_cols=["g"], order_cols=["o", "uid"], value_col="v",
        out="c", num_partitions=4,
    )
    w = (
        Window.partitionBy("g")
        .orderBy("o", "uid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = df.withColumn("c", F.coalesce(F.sum("v").over(w), F.lit(0).cast("long")))
    assert sorted(got.collect()) == sorted(want.collect())


@settings(**_SETTINGS)
@given(rows=ROWS)
def test_grouped_prefix_sum_inclusive_matches_ansi(spark, rows):
    from canvas_data_2_aws_spark.operators.ranks import grouped_prefix_sum

    df = _df(spark, rows)
    got = grouped_prefix_sum(
        df, group_cols=["g"], order_cols=["o", "uid"], value_col="v",
        out="c", inclusive=True, num_partitions=4,
    )
    w = (
        Window.partitionBy("g")
        .orderBy("o", "uid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = df.withColumn("c", F.sum("v").over(w))
    assert sorted(got.collect()) == sorted(want.collect())


@given(
    st.lists(
        st.tuples(st.integers(0, 2**20), st.integers(0, 2**20)),
        min_size=1,
        max_size=200,
    )
)
@settings(max_examples=200, deadline=None)
def test_ks_packing_decodes_exactly(pairs):
    """The analytics_ks_test packing (na, nb) → na·2³¹ + nb carries two
    prefix sums through ONE cumsum exactly: decoding the packed running
    sum must equal the two independent running sums at every prefix,
    for any counts below the 2³¹ arm bound."""
    PACK = 1 << 31
    cum = 0
    ca = cb = 0
    for na, nb in pairs:
        cum += na * PACK + nb
        ca += na
        cb += nb
        assert cum // PACK == ca
        assert cum % PACK == cb
