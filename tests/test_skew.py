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


def test_aqe_skew_split_fires_and_salted_matches(spark):
    """r7 verdict task 2: SCALE.md §2 claims AQE skew-join splitting +
    salting cover pathological keys — prove both on a measured fixture.
    One key holds ~30% of a 200k-row side; with the skew thresholds
    scaled to fixture bytes the finalized adaptive plan must contain a
    skew-split SMJ (``skew=true`` / ``AQEShuffleRead ... skewed``), and
    ``salted_join`` must return exactly the plain join's rows at that
    same skew."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "131072",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        n = 200_000
        big = spark.range(n).select(
            F.when(F.col("id") % 10 < 3, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(997)) + 1)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        small = spark.range(998).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("v")
        )
        joined = big.join(small, "k")
        plain = joined.collect()  # finalizes joined's own adaptive plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        # Plan-STRING markers ('skew=true', AQEShuffleRead 'skewed')
        # are not a stable Spark API (ADVICE r8): hard-assert only on
        # the pyspark minor this spelling was pinned against; on other
        # versions a missing marker warns instead of failing the suite
        # without a real regression. The behavioral half below
        # (salted_join row-equal to the plain join) stays unconditional.
        import warnings

        import pyspark

        markers = "skew=true" in plan and any(
            "AQEShuffleRead" in line and "skewed" in line
            for line in plan.splitlines()
        )
        if pyspark.__version__.startswith("4.1."):
            assert markers, plan[:2000]
        elif not markers:
            warnings.warn(
                "AQE skew plan-string markers not found on pyspark "
                f"{pyspark.__version__} — spelling may have drifted; "
                "behavioral equality below still enforced"
            )

        salted = salted_join(big, small, on=["k"], n_salts=16)
        key = lambda r: (r["k"], r["payload"], r["v"])  # noqa: E731
        assert sorted(map(key, salted.collect())) == sorted(map(key, plain))
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
