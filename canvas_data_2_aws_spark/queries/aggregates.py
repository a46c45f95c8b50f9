"""Aggregations beyond the flagship (SURVEY §2.4 A2–A8).

All shapes are single-pass hash aggregates with map-side partial
aggregation (HashAggregateExec partial→final) — at 100 TB the partial
pass collapses each executor's slice before the key shuffle, so the
exchange carries ~|groups|·|executors| rows, not |input|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.numeric import dsum, oracle_dsum
from ..registry import graded
from ..session import load_table

# --- A2/A3: global + distinct aggregates -------------------------------------

_COUNT_DISTINCT_ORACLE = """
SELECT
  COUNT(*) AS n_rows,
  COUNT(DISTINCT l_orderkey) AS n_orders,
  COUNT(DISTINCT l_partkey) AS n_parts,
  COUNT(DISTINCT l_suppkey) AS n_supps,
  CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_distinct_qty
FROM lineitem
"""


@graded("agg_count_distinct", oracle=_COUNT_DISTINCT_ORACLE)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregate (no keys) with multiple COUNT(DISTINCT) columns.

    Catalyst rewrites multi-distinct via Expand (one pass, n copies of
    each row tagged per distinct set) — no driver-side work.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.sum_distinct(F.col("l_quantity").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_distinct_qty"),
    )


# --- A4: approximate distinct (HLL) — rows-only -------------------------------


@graded("agg_approx_distinct", oracle=None)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketch count per group (rows-only: sketches differ across
    engines and can never hash-match — SURVEY §2.4 A4)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
            F.countDistinct("l_orderkey").alias("exact_orders"),
        )
        .orderBy("l_returnflag")
    )


# --- A5 + A7: rollup with conditional aggregate -------------------------------

_ROLLUP_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
  COUNT(*) AS n,
  {oracle_dsum('l_quantity', 'sum_qty')},
  {oracle_dsum(
      "CASE WHEN l_quantity > 25 THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END",
      'high_qty_revenue',
  )}
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@graded("agg_rollup", oracle=_ROLLUP_ORACLE)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals + filtered/conditional aggregate (A7).

    GROUPING() flags disambiguate subtotal rows (fixture keys are never
    NULL, so flags are informative, not load-bearing — SURVEY §2.4).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_rf"),
        F.grouping("l_linestatus").cast("int").alias("g_ls"),
        F.count("*").alias("n"),
        dsum("l_quantity", "sum_qty"),
        dsum(
            "CASE WHEN l_quantity > 25 THEN l_extendedprice * (1 - l_discount)"
            " ELSE 0.0 END",
            "high_qty_revenue",
        ),
    )


# --- A6: cube ----------------------------------------------------------------

_CUBE_ORACLE = f"""
SELECT
  o_orderstatus,
  o_orderpriority,
  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_st,
  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_pr,
  COUNT(*) AS n,
  {oracle_dsum('o_totalprice', 'sum_price')}
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@graded("agg_cube", oracle=_CUBE_ORACLE)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping-key combinations (2^2 sets) in one Expand pass."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_st"),
        F.grouping("o_orderpriority").cast("int").alias("g_pr"),
        F.count("*").alias("n"),
        dsum("o_totalprice", "sum_price"),
    )


# --- A8: collect aggregates (order-normalized) --------------------------------

_COLLECT_ORACLE = """
SELECT
  lang,
  COUNT(*) AS n_docs,
  COALESCE(array_to_string(list_sort(list(DISTINCT source)), ','), '') AS sources
FROM documents
GROUP BY lang
"""


@graded("agg_collect_sorted", oracle=_COLLECT_ORACLE)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set normalized with array_sort — bare collect order is
    engine-nondeterministic and must never be graded (SURVEY §8.4).
    Graded as a joined string: the driver's canonicalizer (pandas)
    cannot hash list cells (ADVICE r1)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.array_join(F.array_sort(F.collect_set("source")), ",").alias("sources"),
    )


# --- A4 companion: t-digest approximate percentiles (rows-only) -----------------


@graded("agg_approx_percentile", oracle=None)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile per group — the mergeable one-pass sketch that
    replaces exact percentiles at 100 TB (exact needs a per-group
    sort; the sketch is partial-aggregatable like any sum). Rows-only:
    sketch internals are engine-specific; accuracy vs the exact
    interpolated percentile is bounded in tests/test_approx.py."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.expr(
                "approx_percentile(o_totalprice, 0.5, 10000)"
            ).alias("approx_p50"),
            F.expr(
                "approx_percentile(o_totalprice, 0.9, 10000)"
            ).alias("approx_p90"),
            F.expr("percentile(o_totalprice, 0.5)").alias("exact_p50"),
        )
        .orderBy("o_orderpriority")
    )


# --- A8 companion: ordered string aggregation (listagg) -------------------------

_STRING_AGG_ORACLE = """
SELECT lang,
       string_agg(DISTINCT source, ',' ORDER BY source) AS sources_csv,
       COUNT(DISTINCT source) AS n_sources
FROM documents
GROUP BY lang
"""


@graded("agg_string_concat", oracle=_STRING_AGG_ORACLE)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """listagg/string_agg: Spark has no ordered string_agg, so the
    deterministic form is array_join(array_sort(collect_set)) — same
    rule as A8: never grade bare collect order (SURVEY §8.4)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.array_join(F.array_sort(F.collect_set("source")), ",").alias(
            "sources_csv"
        ),
        F.countDistinct("source").alias("n_sources"),
    )


# --- A6 companion: explicit GROUPING SETS (beyond rollup/cube) ------------------

_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


@graded("agg_grouping_sets", oracle=_GROUPING_SETS_SQL)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-picked GROUPING SETS (each dimension alone + grand total —
    a selection no rollup/cube produces). Byte-identical SQL runs on
    both engines; GROUPING() flags disambiguate the padding NULLs
    (SURVEY §2.4 note)."""
    from ..session import register_tables

    register_tables(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)


# --- equi-depth histogram (quantile-bounded buckets) ----------------------------

# Depth boundaries are the exact interpolated quartiles; bucket id =
# number of boundaries strictly below the value (0..3). Boundary
# comparison uses the same doubles in both engines (quantile_cont ≡
# percentile, verified by agg_percentile), so bucketing is exact.
_HISTOGRAM_EQ_ORACLE = """
WITH q AS (
  SELECT quantile_cont(o_totalprice, 0.25) AS q1,
         quantile_cont(o_totalprice, 0.50) AS q2,
         quantile_cont(o_totalprice, 0.75) AS q3
  FROM orders
)
SELECT CAST(o_totalprice > q1 AS INTEGER) + CAST(o_totalprice > q2 AS INTEGER)
         + CAST(o_totalprice > q3 AS INTEGER) AS bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS bucket_rev
FROM orders, q
GROUP BY bucket
"""


@graded("agg_histogram_equidepth", oracle=_HISTOGRAM_EQ_ORACLE)
def agg_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile-bounded equi-depth histogram — the profile-then-bucket
    shape with data-driven boundaries (equal-width twin:
    agg_histogram). 1-row quartile aggregate broadcast over the fact
    scan; at 100 TB swap the exact quantiles for approx_percentile
    and the plan is unchanged."""
    o = load_table(spark, sf_dir, "orders")
    q = o.agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("q1"),
        F.expr("percentile(o_totalprice, 0.50)").alias("q2"),
        F.expr("percentile(o_totalprice, 0.75)").alias("q3"),
    )
    p = F.col("o_totalprice")
    bucket = (
        (p > F.col("q1")).cast("int")
        + (p > F.col("q2")).cast("int")
        + (p > F.col("q3")).cast("int")
    )
    return (
        o.crossJoin(F.broadcast(q))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum(p.cast("decimal(18,6)")).cast("double").alias("bucket_rev"),
        )
    )


# --- deterministic mode (most frequent value, tie-broken) -----------------------

_MODE_ORACLE = """
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
),
counts AS (
  SELECT lang, token, COUNT(*) AS c FROM tok GROUP BY lang, token
)
SELECT lang, token AS top_token, c AS n_occurrences
FROM (
  SELECT lang, token, c,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, token) AS rk
  FROM counts
) t
WHERE rk = 1
"""


@graded("agg_mode_deterministic", oracle=_MODE_ORACLE)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode via count + rank with a total tie-break — the
    native ``mode()`` picks an arbitrary value on ties in both engines
    and can never be graded (same rule as max_by, SURVEY §8.4)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("c").desc(), "token")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "lang",
            F.col("token").alias("top_token"),
            F.col("c").alias("n_occurrences"),
        )
    )


# --- boolean aggregates (bool_and / bool_or / conditional count) ----------------

_BOOL_AGG_ORACLE = """
SELECT o_orderpriority,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_orderstatus = 'P') AS any_pending,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished
FROM orders
GROUP BY o_orderpriority
"""


@graded("agg_boolean", oracle=_BOOL_AGG_ORACLE)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool_and / bool_or / filtered count — the data-quality assertion
    aggregates (\"every row satisfies X\" as a query result)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "P").alias("any_pending"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
    )


# --- robust statistics: median / IQR / MAD on integer cents ---------------------

# Interpolated quantiles of INTEGER cents are cross-engine exact: the
# position fraction is a small dyadic (0, .25, .5, .75), b−a is an
# integer, and a + frac·(b−a) incurs zero IEEE rounding — so Spark
# percentile() and DuckDB quantile_cont() agree bit-for-bit. Raw-double
# quantiles would NOT (interpolating arbitrary doubles rounds).
_ROBUST_ORACLE = """
WITH cents AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c
  FROM lineitem
),
q AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         quantile_cont(c, 0.5) AS median_cents,
         quantile_cont(c, 0.25) AS p25_cents,
         quantile_cont(c, 0.75) AS p75_cents
  FROM cents GROUP BY l_returnflag
),
dev AS (
  SELECT cents.l_returnflag, ABS(cents.c - q.median_cents) AS ad
  FROM cents JOIN q USING (l_returnflag)
)
SELECT q.l_returnflag, q.n, q.median_cents, q.p25_cents, q.p75_cents,
       q.p75_cents - q.p25_cents AS iqr_cents,
       m.mad_cents
FROM q JOIN (
  SELECT l_returnflag, quantile_cont(ad, 0.5) AS mad_cents
  FROM dev GROUP BY l_returnflag
) m USING (l_returnflag)
"""


@graded("agg_robust_stats", oracle=_ROBUST_ORACLE)
def agg_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median / IQR / MAD per group — the outlier-resistant profile
    stats. Two aggregation passes (medians, then deviations from the
    broadcast-joined group median); quantiles interpolate integer
    cents, which is bit-exact in both engines (see oracle comment).
    At scale the second pass re-shuffles only (group, deviation) pairs
    and the medians table is broadcast — no full re-sort."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("c"),
    )
    q = cents.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.expr("percentile(c, 0.5)").alias("median_cents"),
        F.expr("percentile(c, 0.25)").alias("p25_cents"),
        F.expr("percentile(c, 0.75)").alias("p75_cents"),
    )
    dev = cents.join(
        F.broadcast(q.select("l_returnflag", "median_cents")), "l_returnflag"
    ).select(
        "l_returnflag", F.abs(F.col("c") - F.col("median_cents")).alias("ad")
    )
    mad = dev.groupBy("l_returnflag").agg(
        F.expr("percentile(ad, 0.5)").alias("mad_cents")
    )
    return (
        q.join(F.broadcast(mad), "l_returnflag")
        .select(
            "l_returnflag",
            "n",
            "median_cents",
            "p25_cents",
            "p75_cents",
            (F.col("p75_cents") - F.col("p25_cents")).alias("iqr_cents"),
            "mad_cents",
        )
    )


# --- EXT: weighted percentiles (quantity-weighted price quartiles) -------------

# Weighted quantile = smallest value whose peer-inclusive cumulative
# weight reaches q·W. Both engines' default window frame with an ORDER
# BY is RANGE UNBOUNDED PRECEDING → CURRENT ROW, which for tied order
# keys includes ALL peers — so the cumulative weight at a given price is
# the total weight of rows priced ≤ it, independent of intra-tie row
# order. Weights and values are exact longs (integer quantity, integer
# cents); thresholds compare as 4·cum ≥ k·W in integer arithmetic — no
# division, no rounding, no float anywhere.
_WEIGHTED_PCTL_ORACLE = """
WITH cum AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
         SUM(CAST(round(l_quantity, 0) AS BIGINT)) OVER (
           PARTITION BY l_returnflag ORDER BY round(l_extendedprice * 100, 0)
         ) AS cw,
         SUM(CAST(round(l_quantity, 0) AS BIGINT)) OVER (
           PARTITION BY l_returnflag
         ) AS w_total
  FROM lineitem
)
SELECT l_returnflag,
       MIN(CASE WHEN 4 * cw >= w_total     THEN cents END) AS wp25_cents,
       MIN(CASE WHEN 2 * cw >= w_total     THEN cents END) AS wp50_cents,
       MIN(CASE WHEN 4 * cw >= 3 * w_total THEN cents END) AS wp75_cents
FROM cum
GROUP BY l_returnflag
"""


@graded("agg_weighted_percentile", oracle=_WEIGHTED_PCTL_ORACLE)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted price quartiles per returnflag — the weighted
    median family (training-mix reweighting, cost attribution). One
    window shuffle on (flag, price) + one hash agg; at 100 TB the
    cumulative pass partitions by group exactly like any running sum,
    and the final agg is map-side combinable."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    wgt = F.round(F.col("l_quantity"), 0).cast("long")
    # Default (RANGE) frame on purpose: peer rows must share one
    # cumulative value or tied prices would be order-dependent.
    w_cum = Window.partitionBy("l_returnflag").orderBy(cents)
    w_all = Window.partitionBy("l_returnflag")
    cum = li.select(
        "l_returnflag",
        cents.alias("cents"),
        F.sum(wgt).over(w_cum).alias("cw"),
        F.sum(wgt).over(w_all).alias("w_total"),
    )
    def pick(mult: int) -> F.Column:
        cond = 4 * F.col("cw") >= mult * F.col("w_total")
        return F.min(F.when(cond, F.col("cents")))

    return cum.groupBy("l_returnflag").agg(
        pick(1).alias("wp25_cents"),
        pick(2).alias("wp50_cents"),
        pick(3).alias("wp75_cents"),
    )


# --- EXT: exact median by distributed selection ----------------------------------

# The scalable EXACT median: global rank via range repartitioning
# (operators/ranks.py — no single-task sort), then select the middle
# rank(s). Interpolation for even n averages two exact integer cents —
# one mirrored division. This upgrades the "exact percentile needs a
# per-group sort" scale caveat into a first-class distributed op.
_MEDIAN_DIST_ORACLE = """
WITH c AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
),
r AS (
  SELECT cents,
         CAST(ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) AS BIGINT) AS rn
  FROM c
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c)
SELECT n.n AS n_rows,
       CAST(SUM(r.cents) AS DOUBLE) / COUNT(*) / 100.0 AS median_usd
FROM r, n
WHERE r.rn IN ((n.n + 1) // 2, n.n // 2 + 1)
GROUP BY n.n
"""


@graded("agg_median_distributed", oracle=_MEDIAN_DIST_ORACLE)
def agg_median_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global median of order totals by distributed selection:
    range-partitioned rank, pick the middle rank(s), average exact
    cents. Bounded per-task memory at any row count — the scale path
    for exact percentiles (generalizes to any quantile by picking
    other ranks)."""
    from ..operators.ranks import global_row_number

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents")
    )
    ranked = global_row_number(o, ["cents", "o_orderkey"], out="rn")
    n = o.agg(F.count(F.lit(1)).alias("n"))
    mid = ranked.crossJoin(F.broadcast(n)).where(
        (F.col("rn") == F.expr("(n + 1) DIV 2"))
        | (F.col("rn") == F.expr("n DIV 2 + 1"))
    )
    return mid.groupBy("n").agg(
        (F.sum("cents").cast("double") / F.count(F.lit(1)) / 100.0).alias(
            "median_usd"
        )
    ).select(F.col("n").alias("n_rows"), "median_usd")


# --- EXT: rollup cell share-of-parent --------------------------------------------

# Drill-down shares from ONE rollup pass: each (flag, status) leaf
# joined to its flag-level subtotal via the grouping-flag split of the
# same ROLLUP result — the OLAP "percent of parent" column computed
# without rescanning the fact table. Decimal-exact sums; the share is
# one division of two identically-derived doubles.
_ROLLUP_SHARE_ORACLE = """
WITH r AS (
  SELECT l_returnflag, l_linestatus,
         GROUPING(l_linestatus) AS g,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
  FROM lineitem
  GROUP BY ROLLUP (l_returnflag, l_linestatus)
)
SELECT leaf.l_returnflag, leaf.l_linestatus, leaf.rev,
       parent.rev AS flag_rev,
       leaf.rev / parent.rev AS share_of_flag
FROM r leaf
JOIN r parent
  ON parent.l_returnflag = leaf.l_returnflag AND parent.g = 1
WHERE leaf.g = 0
"""


@graded("agg_rollup_parent_share", oracle=_ROLLUP_SHARE_ORACLE)
def agg_rollup_parent_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent for every rollup leaf from a single ROLLUP
    pass: the grouping flag splits leaves from subtotals and a
    self-join on the parent key attaches each flag's total — no
    second fact-table scan, and the join runs on the rollup result
    (groups², metadata scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    r = li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_linestatus").alias("g"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("rev"),
    )
    leaf = r.where(F.col("g") == 0).select(
        "l_returnflag", "l_linestatus", "rev"
    )
    parent = r.where((F.col("g") == 1) & F.col("l_returnflag").isNotNull()).select(
        "l_returnflag", F.col("rev").alias("flag_rev")
    )
    return (
        leaf.join(F.broadcast(parent), "l_returnflag")
        .select(
            "l_returnflag",
            "l_linestatus",
            "rev",
            "flag_rev",
            (F.col("rev") / F.col("flag_rev")).alias("share_of_flag"),
        )
    )
