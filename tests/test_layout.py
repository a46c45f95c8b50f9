"""Z-order layout (operators/zorder.py, queries/layout.py): interleave
correctness against a Python Morton reference, and the locality
property that makes the layout worth writing — every z-bucket covers a
narrow rectangle in BOTH dimensions."""

from __future__ import annotations

from pyspark.sql import functions as F

from canvas_data_2_aws_spark import registry
from canvas_data_2_aws_spark.operators.zorder import z_expr

registry.load_all()


def _morton_ref(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for k in range(bits):
        z |= ((x >> k) & 1) << (2 * k)
        z |= ((y >> k) & 1) << (2 * k + 1)
    return z


def test_z_expr_matches_python_reference(spark):
    pairs = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 8)]
    df = spark.createDataFrame(pairs, "x BIGINT, y BIGINT")
    rows = df.select("x", "y", F.expr(z_expr("x", "y")).alias("z")).collect()
    for r in rows:
        assert r.z == _morton_ref(r.x, r.y), (r.x, r.y)


def test_zbuckets_are_local_in_both_dims(spark, sf_dir):
    """1024 z-buckets over two 16-bit dims each fix the top 5 bits of
    BOTH x and y → per-bucket extent ≤ 2^11 in each dim. A single-key
    sort would leave the second dim's extent at the full 65536."""
    rows = registry.QUERIES["layout_zorder_stats"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.max_x - r.min_x <= 2048, r
        assert r.max_y - r.min_y <= 2048, r


def test_zorder_write_clusters_partitions(spark, sf_dir):
    """End-to-end layout: repartitionByRange + sortWithinPartitions on
    the z value yields write partitions (≈ files) whose min/max
    rectangles are narrow in both dims — the stats a scan would skip
    on. Compare against the same write sorted by x alone: y-extent
    collapses only under z-order. Uses a deterministic uniform grid
    rather than fixture keys — at sf0.001 l_suppkey has only 10
    distinct values, which makes extents degenerate."""
    z = (
        spark.range(20000)
        .select(
            ((F.col("id") * 48271) % 65536).alias("x"),
            ((F.col("id") * 69621) % 65536).alias("y"),
        )
        .withColumn("z", F.expr(z_expr("x", "y")))
    )

    def extents(df, key):
        parts = (
            df.repartitionByRange(64, F.col(key))
            .sortWithinPartitions(key)
            .select(
                F.spark_partition_id().alias("pid"), "x", "y"
            )
            .groupBy("pid")
            .agg(
                (F.max("x") - F.min("x")).alias("ex"),
                (F.max("y") - F.min("y")).alias("ey"),
            )
            .collect()
        )
        n = len(parts)
        return sum(p.ex for p in parts) / n, sum(p.ey for p in parts) / n

    ex_z, ey_z = extents(z, "z")
    ex_x, ey_x = extents(z, "x")
    # x-sorted layout: x extent tiny, y extent ~full range (~65 k).
    # z-ordered layout: BOTH extents well below the full 65536 range
    # (measured ≈13 k / ≈10 k at 64 partitions; bounds leave slack for
    # range-sampling boundary jitter).
    assert ex_z < 20000 and ey_z < 20000, (ex_z, ey_z)
    assert ey_z < ey_x * 0.3, (ey_z, ey_x)


def test_compaction_bins_contiguous_and_sized(spark, sf_dir):
    from canvas_data_2_aws_spark import registry
    from canvas_data_2_aws_spark.queries.layout import _COMPACT_TARGET

    rows = sorted(
        registry.QUERIES["layout_compaction_bins"](spark, sf_dir).collect(),
        key=lambda r: r.bin_id,
    )
    # bins partition the file list into contiguous runs
    for prev, cur in zip(rows, rows[1:]):
        assert cur.first_file == prev.last_file + 1
    # every bin except possibly the last reaches the byte target once
    # its straddling file is included
    for r in rows[:-1]:
        assert r.bin_bytes + _COMPACT_TARGET > _COMPACT_TARGET  # sanity
        assert r.n_files >= 1


def test_compaction_target_sweep_consistent(spark, sf_dir):
    """r12: file mass is conserved at every target, bin counts shrink
    as the target grows, worst-case files-per-bin grows, and the
    T=120k row agrees with the single-target planner."""
    from canvas_data_2_aws_spark import registry

    registry.load_all()
    rows = registry.QUERIES["layout_compaction_target_sweep"](
        spark, sf_dir
    ).collect()
    assert [r.target_bytes for r in rows] == [60000, 120000, 240000, 480000]
    assert len({r.n_files for r in rows}) == 1
    for a, b in zip(rows, rows[1:]):
        assert a.n_bins >= b.n_bins
        assert a.max_files_per_bin <= b.max_files_per_bin
    for r in rows:
        assert 0.0 < r.mean_fill <= 1.5  # start-offset bins may overflow
        assert 0.0 <= r.underfull_share <= 1.0
    base = registry.QUERIES["layout_compaction_bins"](spark, sf_dir).collect()
    t120 = next(r for r in rows if r.target_bytes == 120000)
    assert t120.n_bins == len(base)
    assert t120.n_files == sum(r.n_files for r in base)


def test_encoding_stats_bucketed_runs_equal_global(spark, sf_dir):
    """r13: the bucket-parallel run count (within-bucket flags minus
    seam joins) equals a naive single-window global run count for
    every column; identities hold (runs <= rows, distinct <= rows,
    avg_run_len ~ rows/runs); and the advisor picks RLE/DICT exactly
    per its documented integer thresholds."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from canvas_data_2_aws_spark.queries.layout import (
        _ENCODING_COLS,
        layout_encoding_stats,
    )
    from canvas_data_2_aws_spark.session import load_table

    rows = {r.col_name: r for r in layout_encoding_stats(spark, sf_dir).collect()}
    assert set(rows) == {name for name, _ in _ENCODING_COLS}

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.orderBy(
        F.expr("l_orderkey * 8 + l_linenumber"),
        "l_partkey",
        "l_suppkey",
        "l_extendedprice",
    )
    for name, expr in _ENCODING_COLS:
        val = F.expr(expr.replace("VARCHAR", "STRING"))
        naive = (
            li.select(
                F.when(~val.eqNullSafe(F.lag(val).over(w)), 1)
                .otherwise(0)
                .alias("chg")
            )
            .agg(F.sum("chg"))
            .collect()[0][0]
        )
        r = rows[name]
        assert r.n_runs == naive, (name, r.n_runs, naive)
        assert 1 <= r.n_runs <= r.n_rows
        assert 1 <= r.n_distinct <= r.n_rows
        assert abs(r.avg_run_len - round(r.n_rows / r.n_runs, 6)) < 2e-6
        if r.n_runs * 8 <= r.n_rows:
            assert r.encoding == "RLE"
        elif r.n_distinct * 100 <= r.n_rows:
            assert r.encoding == "DICT"
        else:
            assert r.encoding == "PLAIN"
