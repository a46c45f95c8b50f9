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
  list_sort(list(DISTINCT source)) AS sources
FROM documents
GROUP BY lang
"""


@graded("agg_collect_sorted", oracle=_COLLECT_ORACLE)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set normalized with array_sort — bare collect order is
    engine-nondeterministic and must never be graded (SURVEY §8.4)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.array_sort(F.collect_set("source")).alias("sources"),
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
                "approx_percentile(o_totalprice, array(0.5, 0.9), 10000)"
            ).alias("approx_p50_p90"),
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
