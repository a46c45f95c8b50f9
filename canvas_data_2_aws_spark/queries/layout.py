"""Graded physical-layout queries (EXT): Z-order clustering statistics.

The reference materializes its replica as flat per-table dumps; the
Spark-native upgrade is layout-aware writes — files clustered so
Parquet footer min/max stats prune scans for more than one predicate
column. ``layout_zorder_stats`` grades the math and the skipping
effect: rows are bucketed by their Morton value and each bucket's
min/max extent in both source dimensions is reported — narrow extents
are exactly what makes a file skippable."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators import ranks as R
from ..operators.zorder import z_expr
from ..registry import graded
from ..session import load_table

# Two independent dims of lineitem, odd-multiplied so every scale
# factor spreads across the full 16-bit space (raw l_suppkey tops out
# at 10 at sf0.001, which would collapse every row into z-bucket 0);
# 1024 z-buckets stand in for files.
_ZX = "((l_partkey * 331) % 65536)"
_ZY = "((l_suppkey * 5471) % 65536)"
_Z = z_expr(_ZX, _ZY)
_BUCKET_SHIFT = 22  # 32-bit z >> 22 → 1024 buckets

_ZORDER_ORACLE = f"""
WITH z AS (
  SELECT (l_partkey * 331) % 65536 AS x,
         (l_suppkey * 5471) % 65536 AS y,
         {_Z} >> {_BUCKET_SHIFT} AS zbucket
  FROM lineitem
)
SELECT zbucket,
       COUNT(*) AS n,
       MIN(x) AS min_x, MAX(x) AS max_x,
       MIN(y) AS min_y, MAX(y) AS max_y
FROM z GROUP BY zbucket
"""


@graded("layout_zorder_stats", oracle=_ZORDER_ORACLE)
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-interleave two key columns, bucket by the top z bits
    (bucket ≈ output file), and report each bucket's (x, y) extent —
    the data-skipping manifest a ZORDER write produces. The interleave
    is one codegen expression per row (zorder.z_expr); the plan is
    scan → project → single hash agg. At scale the same z value is the
    ``repartitionByRange`` + ``sortWithinPartitions`` key for the
    actual write (tests/test_layout.py proves the locality win)."""
    li = load_table(spark, sf_dir, "lineitem")
    z = li.select(
        F.expr(_ZX).alias("x"),
        F.expr(_ZY).alias("y"),
        F.expr(f"{_Z} >> {_BUCKET_SHIFT}").alias("zbucket"),
    )
    return z.groupBy("zbucket").agg(
        F.count("*").alias("n"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
    )


# --- small-file compaction planning ---------------------------------------------

_COMPACT_TARGET = 120_000  # bytes per output bin (fixture-scaled)

_COMPACTION_ORACLE = f"""
WITH files AS (
  SELECT o_orderkey // 512 AS file_id,
         COUNT(*) AS n_rows,
         CAST(SUM(32 + LENGTH(o_orderstatus) + LENGTH(o_orderpriority))
              AS BIGINT) AS bytes
  FROM orders GROUP BY file_id
),
planned AS (
  SELECT file_id, n_rows, bytes,
         CAST(SUM(bytes) OVER (ORDER BY file_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           - bytes AS start_off
  FROM files
)
SELECT start_off // {_COMPACT_TARGET} AS bin_id,
       COUNT(*) AS n_files,
       CAST(SUM(n_rows) AS BIGINT) AS bin_rows,
       CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
       MIN(file_id) AS first_file, MAX(file_id) AS last_file
FROM planned
GROUP BY bin_id
"""


@graded("layout_compaction_bins", oracle=_COMPACTION_ORACLE)
def layout_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner: roll the file manifest (per-file
    row/byte stats) into contiguous target-sized output bins by byte
    offset — contiguity preserves the table's key clustering, so the
    rewrite is a pure concat per bin. The manifest is tiny (one row
    per file) — the window runs on the driver-sized side, never on
    row-level data; the actual 100 TB rewrite reads only the files of
    each bin. Assignment by cumulative start offset is one window
    pass, no iteration."""
    o = load_table(spark, sf_dir, "orders")
    files = o.groupBy(F.expr("o_orderkey DIV 512").alias("file_id")).agg(
        F.count("*").alias("n_rows"),
        F.sum(
            F.lit(32)
            + F.length("o_orderstatus")
            + F.length("o_orderpriority")
        ).alias("bytes"),
    )
    w = (
        Window.partitionBy(R.UNIT_GROUP)  # file manifest: tiny by design
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    files = R.attach_unit_group(files)
    planned = files.withColumn(
        "start_off", F.sum("bytes").over(w) - F.col("bytes")
    )
    return (
        planned.groupBy(
            F.expr(f"start_off DIV {_COMPACT_TARGET}").alias("bin_id")
        )
        .agg(
            F.count("*").alias("n_files"),
            F.sum("n_rows").alias("bin_rows"),
            F.sum("bytes").alias("bin_bytes"),
            F.min("file_id").alias("first_file"),
            F.max("file_id").alias("last_file"),
        )
    )


# --- data-skipping evaluation: natural vs Z-order layout under real predicates ---

# The question a layout decision actually answers: for a given set of
# predicates, what fraction of files does each layout's min/max footer
# stats let the scanner SKIP? Three x-range predicates (low / mid /
# high band of the 16-bit space) are evaluated against two file
# manifests built from the same rows: natural insert order
# (l_orderkey-contiguous files — x extents are full-range because
# partkey is uncorrelated with insert order) and the Morton-bucket
# layout of layout_zorder_stats (narrow extents by construction). A
# file is HIT when [min_x, max_x] intersects the predicate range.
# Everything is integer counts + one rounded division; the manifests
# are file-cardinality (never row-scale), so the predicate probe is a
# broadcast of a 3-row literal against a metadata table — exactly how
# a real scan planner consults footer stats.
_SKIP_PREDS = [(0, 0, 4095), (1, 30000, 30999), (2, 61440, 65535)]

_SKIP_PREDS_SQL = ", ".join(f"({i}, {lo}, {hi})" for i, lo, hi in _SKIP_PREDS)

_SKIPPING_ORACLE = f"""
WITH rows_x AS (
  SELECT l_orderkey // 128 AS nat_file,
         {_Z} >> {_BUCKET_SHIFT} AS z_file,
         (l_partkey * 331) % 65536 AS x
  FROM lineitem
),
nat AS (
  SELECT nat_file AS file_id, MIN(x) AS min_x, MAX(x) AS max_x
  FROM rows_x GROUP BY nat_file
),
zord AS (
  SELECT z_file AS file_id, MIN(x) AS min_x, MAX(x) AS max_x
  FROM rows_x GROUP BY z_file
),
manifests AS (
  SELECT 'natural' AS layout, file_id, min_x, max_x FROM nat
  UNION ALL
  SELECT 'zorder' AS layout, file_id, min_x, max_x FROM zord
),
preds(pred_id, lo, hi) AS (VALUES {_SKIP_PREDS_SQL})
SELECT m.layout, CAST(p.pred_id AS BIGINT) AS pred_id,
       COUNT(*) AS n_files,
       CAST(SUM(CASE WHEN m.min_x <= p.hi AND m.max_x >= p.lo
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       ROUND(1.0 - CAST(SUM(CASE WHEN m.min_x <= p.hi AND m.max_x >= p.lo
                                 THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*), 4) AS skip_ratio
FROM manifests m, preds p
GROUP BY m.layout, p.pred_id
"""


@graded("layout_skipping_eval", oracle=_SKIPPING_ORACLE)
def layout_skipping_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max data-skipping simulation: per (layout, predicate), the
    file count, hit count, and skip ratio when the scanner prunes on
    footer x-stats. One row-scale aggregation builds both manifests in
    a single pass (conditional keys, one scan); the predicate probe is
    a 3-row broadcast against the file-cardinality manifest — the
    scan-planning join shape, metadata-sized at any corpus."""
    li = load_table(spark, sf_dir, "lineitem")
    rows_x = li.select(
        F.expr("l_orderkey DIV 128").alias("nat_file"),
        F.expr(f"{_Z} >> {_BUCKET_SHIFT}").alias("z_file"),
        F.expr(_ZX).alias("x"),
    )
    nat = rows_x.groupBy("nat_file").agg(
        F.min("x").alias("min_x"), F.max("x").alias("max_x")
    ).select(F.lit("natural").alias("layout"), F.col("nat_file").alias("file_id"), "min_x", "max_x")
    zord = rows_x.groupBy("z_file").agg(
        F.min("x").alias("min_x"), F.max("x").alias("max_x")
    ).select(F.lit("zorder").alias("layout"), F.col("z_file").alias("file_id"), "min_x", "max_x")
    manifests = nat.unionByName(zord)
    # Literal-array fan-out, not createDataFrame: the plan audit proves
    # GenerateExec-over-literal-array × Range(1) = 3 rows, while an
    # Arrow-built local frame scans as ExistingRDD with no provable
    # bound (plans/audit.max_rows_bound).
    preds = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("long").alias("pred_id"),
                        F.lit(lo).cast("long").alias("lo"),
                        F.lit(hi).cast("long").alias("hi"),
                    )
                    for i, lo, hi in _SKIP_PREDS
                ]
            )
        ).alias("p")
    ).select("p.*")
    hit = F.when(
        (F.col("min_x") <= F.col("hi")) & (F.col("max_x") >= F.col("lo")), 1
    ).otherwise(0)
    return (
        manifests.crossJoin(F.broadcast(preds))  # 3-row predicate probe
        .groupBy("layout", "pred_id")
        .agg(
            F.count("*").alias("n_files"),
            F.sum(hit).cast("bigint").alias("n_hit"),
            F.round(
                1.0 - F.sum(hit).cast("double") / F.count("*"), 4
            ).alias("skip_ratio"),
        )
    )


# --- EXT: compaction target-size sweep (r12) ------------------------------------------

# layout_compaction_bins plans at ONE target size; the operational
# question is the SWEEP — how do bin count, fill ratio, and worst-case
# files-per-bin move as the target doubles? (Small targets leave many
# well-filled bins but more rewrite tasks and more residual files;
# large targets concentrate files per rewrite and strand a
# half-empty tail bin.) The whole curve derives from the ONE planned
# manifest (per-file cumulative start offsets): bin assignment under
# target T is start_off DIV T, so a 4-row broadcast target ladder +
# one (target, bin) re-group — all manifest-sized, exactly like the
# base planner. Fill ratios are single divisions over exact integers.
_COMPACT_SWEEP_TARGETS = [60_000, 120_000, 240_000, 480_000]

_COMPACT_SWEEP_ORACLE = f"""
WITH files AS (
  SELECT o_orderkey // 512 AS file_id,
         COUNT(*) AS n_rows,
         CAST(SUM(32 + LENGTH(o_orderstatus) + LENGTH(o_orderpriority))
              AS BIGINT) AS bytes
  FROM orders GROUP BY file_id
),
planned AS (
  SELECT file_id, n_rows, bytes,
         CAST(SUM(bytes) OVER (ORDER BY file_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           - bytes AS start_off
  FROM files
),
ts AS (SELECT CAST(unnest([{", ".join(map(str, _COMPACT_SWEEP_TARGETS))}])
              AS BIGINT) AS t),
bins AS (
  SELECT ts.t, p.start_off // ts.t AS bin_id,
         COUNT(*) AS n_files, CAST(SUM(p.bytes) AS BIGINT) AS bin_bytes
  FROM ts, planned p
  GROUP BY 1, 2
)
SELECT t AS target_bytes,
       CAST(COUNT(*) AS BIGINT) AS n_bins,
       CAST(SUM(n_files) AS BIGINT) AS n_files,
       CAST(MAX(n_files) AS BIGINT) AS max_files_per_bin,
       ROUND(CAST(SUM(bin_bytes) AS DOUBLE) / (COUNT(*) * t), 4)
         AS mean_fill,
       ROUND(CAST(SUM(CASE WHEN bin_bytes * 2 < t THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 4) AS underfull_share
FROM bins
GROUP BY t
ORDER BY t
"""


@graded("layout_compaction_target_sweep", oracle=_COMPACT_SWEEP_ORACLE)
def layout_compaction_target_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Compaction operating curve per target size T in {60k..480k}
    bytes: bin count, fill ratio, underfull share, and worst-case
    files-per-bin, all from the one planned file manifest + a 4-row
    broadcast target ladder (rationale above the oracle)."""
    o = load_table(spark, sf_dir, "orders")
    files = o.groupBy(F.expr("o_orderkey DIV 512").alias("file_id")).agg(
        F.count("*").alias("n_rows"),
        F.sum(
            F.lit(32)
            + F.length("o_orderstatus")
            + F.length("o_orderpriority")
        ).alias("bytes"),
    )
    w = (
        Window.partitionBy(R.UNIT_GROUP)  # file manifest: tiny by design
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    planned = R.attach_unit_group(files).withColumn(
        "start_off", F.sum("bytes").over(w) - F.col("bytes")
    )
    ts = spark.range(1).select(
        F.explode(
            F.array(
                *[F.lit(t).cast("bigint") for t in _COMPACT_SWEEP_TARGETS]
            )
        ).alias("t")
    )
    bins = (
        planned.crossJoin(F.broadcast(ts))  # 4-row target ladder
        .groupBy("t", F.expr("start_off DIV t").alias("bin_id"))
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("bytes").cast("bigint").alias("bin_bytes"),
        )
    )
    return (
        bins.groupBy("t")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bins"),
            F.sum("n_files").cast("bigint").alias("n_files"),
            F.max("n_files").cast("bigint").alias("max_files_per_bin"),
            F.round(
                F.sum("bin_bytes").cast("double")
                / (F.count(F.lit(1)) * F.col("t")),
                4,
            ).alias("mean_fill"),
            F.round(
                F.sum(
                    F.when(F.col("bin_bytes") * 2 < F.col("t"), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("underfull_share"),
        )
        .select(
            F.col("t").alias("target_bytes"),
            "n_bins",
            "n_files",
            "max_files_per_bin",
            "mean_fill",
            "underfull_share",
        )
        .orderBy("target_bytes")
    )


# --- per-column encoding advisor (r13) --------------------------------------------

# Parquet's biggest storage lever after compaction is choosing the
# right column encoding, and the choice is a pure function of three
# exact statistics IN LAYOUT ORDER: run structure (RLE), distinct
# ratio (dictionary), or neither (plain). This query measures all
# three for four representative lineitem columns in one unpivoted
# pass and emits the decision table. Runs are counted EXACTLY but
# distributed — the same two-level decomposition as the disorder
# census: within-bucket change flags (windows partitioned by
# (column, l_orderkey DIV 512) — parallel, and correct because the
# bucketing is monotone in the layout key) plus a bucket-census
# seam correction that subtracts one run for every adjacent bucket
# pair whose last/first values coincide. A bare global lag would be
# a single task at 100 TB; the bucket census is rows/512 and the
# seam window nests. Values compare as strings only for EQUALITY
# (runs/distinct counts depend on equality classes alone, so the
# cast is cross-engine safe; l_quantity goes through BIGINT first).
# Ratios use the integer-domain millionths recipe; the encoding CASE
# compares exact integers (avg run >= 8 -> RLE, distinct ratio <= 1%
# -> DICT, else PLAIN — the parquet-mr defaults' shape).
_ENCODING_COLS = (
    ("l_returnflag", "l_returnflag"),
    ("l_linestatus", "l_linestatus"),
    ("l_quantity", "CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)"),
    ("l_shipdate", "CAST(l_shipdate AS VARCHAR)"),
)

_ENCODING_ORACLE = f"""
WITH u AS (
  {" UNION ALL ".join(
      f"SELECT '{name}' AS col_name, {expr} AS val, "
      "l_orderkey * 8 + l_linenumber AS ok2, "
      "l_partkey AS pk, l_suppkey AS sk, l_extendedprice AS pr, "
      "l_orderkey // 512 AS bkt FROM lineitem"
      for name, expr in _ENCODING_COLS
  )}
),
flags AS (
  SELECT col_name, bkt, val,
         CASE WHEN val IS DISTINCT FROM
                   LAG(val) OVER (PARTITION BY col_name, bkt
                                  ORDER BY ok2, pk, sk, pr)
              THEN 1 ELSE 0 END AS chg,
         FIRST_VALUE(val) OVER (PARTITION BY col_name, bkt
                                ORDER BY ok2, pk, sk, pr
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND UNBOUNDED FOLLOWING) AS fv,
         LAST_VALUE(val) OVER (PARTITION BY col_name, bkt
                               ORDER BY ok2, pk, sk, pr
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING) AS lv
  FROM u
),
per_bucket AS (
  SELECT col_name, bkt,
         CAST(SUM(chg) AS BIGINT) AS runs_in,
         MIN(fv) AS first_val,
         MIN(lv) AS last_val
  FROM flags GROUP BY col_name, bkt
),
seam_flags AS (
  SELECT col_name, runs_in,
         CASE WHEN first_val IS NOT DISTINCT FROM
                   LAG(last_val) OVER (PARTITION BY col_name ORDER BY bkt)
              THEN 1 ELSE 0 END AS seam
  FROM per_bucket
),
seams AS (
  SELECT col_name,
         CAST(SUM(seam) AS BIGINT) AS n_seam_joins,
         CAST(SUM(runs_in) AS BIGINT) AS runs_in
  FROM seam_flags GROUP BY col_name
),
stats AS (
  SELECT col_name,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct
  FROM u GROUP BY col_name
)
SELECT s.col_name, s.n_rows, s.n_distinct,
       CAST(m.runs_in - m.n_seam_joins AS BIGINT) AS n_runs,
       CAST(CAST((s.n_rows * 2000000 + (m.runs_in - m.n_seam_joins))
                 // (2 * (m.runs_in - m.n_seam_joins)) AS BIGINT) AS DOUBLE)
         / 1000000.0 AS avg_run_len,
       CAST(CAST((s.n_distinct * 2000000 + s.n_rows)
                 // (2 * s.n_rows) AS BIGINT) AS DOUBLE)
         / 1000000.0 AS distinct_ratio,
       CASE WHEN (m.runs_in - m.n_seam_joins) * 8 <= s.n_rows THEN 'RLE'
            WHEN s.n_distinct * 100 <= s.n_rows THEN 'DICT'
            ELSE 'PLAIN' END AS encoding
FROM stats s JOIN seams m USING (col_name)
ORDER BY s.col_name
"""


@graded("layout_encoding_stats", oracle=_ENCODING_ORACLE)
def layout_encoding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-column (runs, distinct, null-free) layout statistics
    and the RLE/DICT/PLAIN encoding decision per column (rationale
    above the oracle) — ONE window pass over un-unpivoted rows
    (r13, guide §2.3/§2.4): the four audited columns share the same
    (bkt, ok2, pk, sk, pr) sort, so computing all four change flags
    from one lag per column inside a single bkt-keyed window exchanges
    and sorts |lineitem| rows once instead of 4·|lineitem| unpivoted
    rows four times; the unpivot happens on the 1-row census at the
    end. Values are identical — same total order, same null-safe
    change flags, same min_by/max_by bucket endpoints, same
    count-distinct semantics per column."""
    from ..operators import ranks as RK

    li = load_table(spark, sf_dir, "lineitem")
    names = [name for name, _ in _ENCODING_COLS]
    base = li.select(
        *[
            F.expr(expr.replace("VARCHAR", "STRING")).alias(f"v{i}")
            for i, (_, expr) in enumerate(_ENCODING_COLS)
        ],
        F.expr("l_orderkey * 8 + l_linenumber").cast("bigint").alias("ok2"),
        F.col("l_partkey").alias("pk"),
        F.col("l_suppkey").alias("sk"),
        F.col("l_extendedprice").alias("pr"),
        F.expr("l_orderkey DIV 512").cast("bigint").alias("bkt"),
    )
    # spread on the window's partition key (r14, guide §2.5): the
    # 1-row-group lineitem scan otherwise runs BOTH legs' map work
    # single-task (the window projection and the 4-way countDistinct
    # expand below); hashpartitioning(bkt, n) satisfies the window's
    # required distribution, so the window leg pays no extra exchange.
    from ..session import spread

    base = spread(base, "bkt")
    # (ok2, pk, sk, pr) is a TOTAL order at every fixture SF (the
    # synthetic lineitem repeats (orderkey, linenumber) pairs, so ok2
    # alone would leave LAG ties engine-dependent — SURVEY §8.4)
    win = Window.partitionBy("bkt").orderBy("ok2", "pk", "sk", "pr")
    flags = base.select(
        "bkt",
        "ok2",
        "pk",
        "sk",
        "pr",
        *[f"v{i}" for i in range(len(names))],
        *[
            F.when(
                ~F.col(f"v{i}").eqNullSafe(F.lag(f"v{i}").over(win)), 1
            )
            .otherwise(0)
            .alias(f"chg{i}")
            for i in range(len(names))
        ],
    )
    per_bucket = flags.groupBy("bkt").agg(
        *[F.sum(f"chg{i}").cast("bigint").alias(f"runs{i}") for i in range(len(names))],
        *[
            F.expr(f"min_by(v{i}, struct(ok2, pk, sk, pr))").alias(f"fv{i}")
            for i in range(len(names))
        ],
        *[
            F.expr(f"max_by(v{i}, struct(ok2, pk, sk, pr))").alias(f"lv{i}")
            for i in range(len(names))
        ],
    )
    # bucket census = rows/512 — manifest-sized, so the single-ordered
    # seam window is bounded (unit-group attach, house pattern)
    wb = Window.partitionBy(RK.UNIT_GROUP).orderBy("bkt")
    seams = (
        RK.attach_unit_group(per_bucket)
        .select(
            *[f"runs{i}" for i in range(len(names))],
            *[
                F.when(
                    F.col(f"fv{i}").eqNullSafe(F.lag(f"lv{i}").over(wb)), 1
                )
                .otherwise(0)
                .alias(f"seam{i}")
                for i in range(len(names))
            ],
        )
        .agg(
            *[F.sum(f"seam{i}").cast("bigint").alias(f"sj{i}") for i in range(len(names))],
            *[F.sum(f"runs{i}").cast("bigint").alias(f"ri{i}") for i in range(len(names))],
        )
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        *[
            F.countDistinct(f"v{i}").cast("bigint").alias(f"nd{i}")
            for i in range(len(names))
        ],
    )
    one = seams.crossJoin(F.broadcast(stats))  # 1-row × 1-row census
    j = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("col_name"),
                        F.col("n_rows").alias("n_rows"),
                        F.col(f"nd{i}").alias("n_distinct"),
                        (F.col(f"ri{i}") - F.col(f"sj{i}"))
                        .cast("bigint")
                        .alias("n_runs"),
                    )
                    for i, name in enumerate(names)
                ]
            )
        ).alias("r")
    ).select("r.*")
    return j.select(
        "col_name",
        "n_rows",
        "n_distinct",
        "n_runs",
        (
            F.expr("(n_rows * 2000000 + n_runs) DIV (2 * n_runs)").cast(
                "double"
            )
            / F.lit(1000000.0)
        ).alias("avg_run_len"),
        (
            F.expr("(n_distinct * 2000000 + n_rows) DIV (2 * n_rows)").cast(
                "double"
            )
            / F.lit(1000000.0)
        ).alias("distinct_ratio"),
        F.when(F.col("n_runs") * 8 <= F.col("n_rows"), F.lit("RLE"))
        .when(F.col("n_distinct") * 100 <= F.col("n_rows"), F.lit("DICT"))
        .otherwise(F.lit("PLAIN"))
        .alias("encoding"),
    ).orderBy("col_name")
