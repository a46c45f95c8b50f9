"""Extended analytics surface: statistical aggregates, percentiles,
arg-extremes, pivot, subquery forms, full ranking family.

Widens SURVEY §2.4/§2.5 beyond the minimum contract — these are the
shapes a replica's analytics consumers (dashboards, data-quality
monitors) run daily. All DuckDB-oracle-checked; determinism notes
inline per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.numeric import dsum_col
from ..registry import graded
from ..session import load_table, register_tables

# --- statistical aggregates (stddev/var/corr/covar) ----------------------------

# Second moments from exact decimal power sums, not the engines' native
# streaming co-moment accumulators: those merge partials in shuffle
# order, which varies run-to-run AND cross-engine in the last ulps. The
# fixture columns are ≤2 dp, so every power/cross product is ≤4 dp —
# DECIMAL(38,8) sums are exact and order-independent; the closed-form
# arithmetic below then runs the identical IEEE op sequence in both
# engines → bit-identical before ROUND.
_MOMENTS = {
    "n": "COUNT(*)",
    "sd": "CAST(SUM(CAST(l_discount AS DECIMAL(38,8))) AS DOUBLE)",
    "sdd": "CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(38,8))) AS DOUBLE)",
    "sq": "CAST(SUM(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE)",
    "sqq": "CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,8))) AS DOUBLE)",
    "sp": "CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,8))) AS DOUBLE)",
    "spp": "CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,8))) AS DOUBLE)",
    "sqp": "CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,8))) AS DOUBLE)",
    "st": "CAST(SUM(CAST(l_tax AS DECIMAL(38,8))) AS DOUBLE)",
    "sqt": "CAST(SUM(CAST(l_quantity * l_tax AS DECIMAL(38,8))) AS DOUBLE)",
}

_STATS_FINAL = """
SELECT l_returnflag,
       ROUND(sqrt((sdd - sd * sd / n) / (n - 1)), 4)    AS sd_discount,
       ROUND((sqq - sq * sq / n) / (n - 1), 4)          AS var_qty,
       ROUND((sqp - sq * sp / n)
             / (sqrt(sqq - sq * sq / n) * sqrt(spp - sp * sp / n)), 4)
                                                        AS corr_qty_price,
       ROUND((sqt - sq * st / n) / (n - 1), 6)          AS covar_qty_tax
FROM moments
"""

_STATS_ORACLE = (
    "WITH moments AS (SELECT l_returnflag, "
    + ", ".join(f"{v} AS {k}" for k, v in _MOMENTS.items())
    + " FROM lineitem GROUP BY l_returnflag) "
    + _STATS_FINAL
)


@graded("agg_stats", oracle=_STATS_ORACLE)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev_samp / var_samp / corr / covar_samp via exact decimal
    power sums + closed-form finals (rationale above the oracle)."""
    li = load_table(spark, sf_dir, "lineitem")
    moments = li.groupBy("l_returnflag").agg(
        *[F.expr(v).alias(k) for k, v in _MOMENTS.items()]
    )
    moments.createOrReplaceTempView("moments")
    return spark.sql(_STATS_FINAL)


# --- percentiles / median ------------------------------------------------------

_PERCENTILE_ORACLE = """
SELECT o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75
FROM orders
GROUP BY o_orderpriority
"""


@graded("agg_percentile", oracle=_PERCENTILE_ORACLE)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``: position (n−1)·q, linear interpolation). At
    100 TB switch to ``approx_percentile`` (t-digest sketch, one pass,
    mergeable) — exact percentile needs a per-group sort."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 4).alias("p75"),
    )


# --- arg-extremes (max_by / min_by) --------------------------------------------

# Composite ordering key keeps the winner unique + deterministic:
# o_totalprice has 2 dp, so price·10⁶ is a multiple of 10⁴ and adding
# o_orderkey (< 10⁶) can never collide; the double product is exact to
# well under the gap between distinct keys.
_ARG_ORACLE = """
SELECT o_orderpriority,
       arg_max(o_orderkey, o_totalprice * 1000000 + o_orderkey) AS priciest_order,
       arg_min(o_orderkey, o_totalprice * 1000000 + o_orderkey) AS cheapest_order
FROM orders
GROUP BY o_orderpriority
"""


@graded("agg_arg_extremes", oracle=_ARG_ORACLE)
def agg_arg_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by with a uniqueness-forcing composite ordering key
    (bare max_by over a tied ordering column is nondeterministic —
    same rule as SURVEY §8.4 for LIMIT/rank)."""
    o = load_table(spark, sf_dir, "orders")
    key = F.col("o_totalprice") * F.lit(1000000) + F.col("o_orderkey")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", key).alias("priciest_order"),
        F.min_by("o_orderkey", key).alias("cheapest_order"),
    )


# --- pivot (A7 as first-class wide-table shape) --------------------------------

_PIVOT_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
            FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS rev_f
FROM orders
GROUP BY o_orderpriority
"""


@graded("agg_pivot", oracle=_PIVOT_ORACLE)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status → columns pivot. Expressed as conditional aggregation
    (identical plan to ``.pivot()`` with explicit values, but keeps
    column names/aliases under our control for the oracle)."""
    o = load_table(spark, sf_dir, "orders")

    def n_status(s: str):
        return F.count(F.when(F.col("o_orderstatus") == s, 1))

    return o.groupBy("o_orderpriority").agg(
        n_status("F").alias("n_f"),
        n_status("O").alias("n_o"),
        n_status("P").alias("n_p"),
        dsum_col(
            F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")), "rev_f"
        ),
    )


# --- subquery forms: scalar + EXISTS + IN (SQL-string path) --------------------

_SUBQUERY_SQL = """
SELECT c_custkey, c_acctbal
FROM customer
WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
        FROM customer
      )
  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)
ORDER BY c_custkey
"""


@graded("sql_subqueries", oracle=_SUBQUERY_SQL)
def sql_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (decimal-recipe average, no tie risk against
    full-precision balances) + EXISTS (decorrelated to a semi join) +
    IN (semi join) through the SQL-string path — Catalyst and DuckDB
    run the byte-identical statement."""
    register_tables(spark, sf_dir)
    return spark.sql(_SUBQUERY_SQL)


# --- full ranking family (W1 completion: ntile / percent_rank / cume_dist) -----

_RANK_FAMILY_ORACLE = """
SELECT o_orderkey, o_orderpriority,
       rank()         OVER w AS rnk,
       dense_rank()   OVER w AS drnk,
       ntile(4)       OVER w AS quartile,
       percent_rank() OVER w AS prk,
       cume_dist()    OVER w AS cd
FROM orders
WHERE o_orderkey % 8 = 0
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
"""


@graded("window_rank_family", oracle=_RANK_FAMILY_ORACLE)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every ranking function over one window. percent_rank/cume_dist
    are (rank−1)/(n−1) and rank/n divisions of identical integers →
    bit-identical across engines; orderBy ends in the unique PK."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").where("o_orderkey % 8 = 0")
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("prk"),
        F.cume_dist().over(w).alias("cd"),
    )


# --- unpivot / melt (wide → long) ----------------------------------------------

_UNPIVOT_ORACLE = """
SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val
FROM part WHERE p_partkey % 16 = 0
UNION ALL
SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val
FROM part WHERE p_partkey % 16 = 0
"""


@graded("unpivot_metrics", oracle=_UNPIVOT_ORACLE)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape via native ``unpivot`` (Expand operator: one
    pass, rows × n_metrics output, no shuffle)."""
    p = load_table(spark, sf_dir, "part").where("p_partkey % 16 = 0")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "val")


# --- equal-width histogram ------------------------------------------------------

_HISTOGRAM_ORACLE = """
WITH mm AS (
  SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders
)
SELECT LEAST(CAST(FLOOR((o_totalprice - mn) / ((mx - mn) / 10)) AS BIGINT), 9)
         AS bucket,
       COUNT(*) AS n
FROM orders, mm
GROUP BY bucket
"""


@graded("agg_histogram", oracle=_HISTOGRAM_ORACLE)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-bucket equal-width histogram. Two-pass plan: tiny min/max
    aggregate broadcast back over the fact scan — the standard
    profile-then-bucket shape. Bucket arithmetic uses identical IEEE
    ops on identical operands in both engines → exact."""
    o = load_table(spark, sf_dir, "orders")
    mm = o.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    bucket = F.least(
        F.floor(
            (F.col("o_totalprice") - F.col("mn")) / ((F.col("mx") - F.col("mn")) / 10)
        ),
        F.lit(9),
    ).alias("bucket")
    return (
        o.crossJoin(F.broadcast(mm))
        .groupBy(bucket)
        .agg(F.count("*").alias("n"))
    )


# --- extended date/time functions (F2 completion) ------------------------------

_DATE_EXT_ORACLE = """
SELECT o_orderkey,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       dayofweek(o_orderdate) + 1 AS dow,
       quarter(o_orderdate) AS qtr,
       weekofyear(o_orderdate) AS iso_week,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m
FROM orders
WHERE o_orderkey % 16 = 0
"""


@graded("scalar_date_extended", oracle=_DATE_EXT_ORACLE)
def scalar_date_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """last_day / dayofweek / quarter / ISO week / add_months.
    Dialect deltas handled oracle-side: DuckDB dayofweek is 0-based
    Sunday vs Spark's 1-based (+1); both use ISO week numbering."""
    o = load_table(spark, sf_dir, "orders").where("o_orderkey % 16 = 0")
    return o.select(
        "o_orderkey",
        F.last_day("o_orderdate").alias("month_end"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
        F.add_months("o_orderdate", 3).alias("plus3m"),
    )


# --- correlated LATERAL subquery (top-k per outer row) --------------------------

_LATERAL_SQL = """
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n,
LATERAL (SELECT c_custkey, c_acctbal FROM customer
         WHERE c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
"""


@graded("sql_lateral_topk", oracle=_LATERAL_SQL)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-outer-row ORDER BY/LIMIT —
    the other spelling of top-k-per-group (W2's window form is the
    scale path; Catalyst decorrelates this one into a join). Same
    statement runs on both engines; LIMIT tie-broken by the PK."""
    register_tables(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


# --- higher moments + regression aggregates (same exact-sum technique) ----------

_REGR_MOMENTS = {
    "n": "COUNT(*)",
    "sx": "CAST(SUM(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE)",
    "sxx": "CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,8))) AS DOUBLE)",
    "sxxx": "CAST(SUM(CAST(l_quantity * l_quantity * l_quantity"
    " AS DECIMAL(38,8))) AS DOUBLE)",
    "sxxxx": "CAST(SUM(CAST(l_quantity * l_quantity * l_quantity * l_quantity"
    " AS DECIMAL(38,8))) AS DOUBLE)",
    "sy": "CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,8))) AS DOUBLE)",
    "sxy": "CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,8))) AS DOUBLE)",
}

# Population skewness/kurtosis and OLS slope/intercept from raw power
# sums — one aggregation pass, closed-form finals on identical doubles
# in both engines (the native accumulators stream in partition order
# and can never hash-match; the moment route is also the one-pass
# 100 TB plan). ROUND(,4) absorbs final-arithmetic ulps.
_REGR_FINAL = """
SELECT l_linestatus,
       ROUND((sxxx / n - 3 * (sx / n) * (sxx / n) + 2 * pow(sx / n, 3))
             / pow(sxx / n - pow(sx / n, 2), 1.5), 4) AS skewness,
       ROUND((sxxxx / n - 4 * (sx / n) * (sxxx / n)
              + 6 * pow(sx / n, 2) * (sxx / n) - 3 * pow(sx / n, 4))
             / pow(sxx / n - pow(sx / n, 2), 2) - 3, 4) AS excess_kurtosis,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
       ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 4)
         AS intercept
FROM regr_moments
"""

_REGR_ORACLE = (
    "WITH regr_moments AS (SELECT l_linestatus, "
    + ", ".join(f"{v} AS {k}" for k, v in _REGR_MOMENTS.items())
    + " FROM lineitem GROUP BY l_linestatus) "
    + _REGR_FINAL
)


@graded("agg_regression_moments", oracle=_REGR_ORACLE)
def agg_regression_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness, excess kurtosis, and OLS price-on-quantity slope/
    intercept per linestatus — 3rd/4th-moment and bivariate extensions
    of agg_stats (rationale above the oracle)."""
    li = load_table(spark, sf_dir, "lineitem")
    moments = li.groupBy("l_linestatus").agg(
        *[F.expr(v).alias(k) for k, v in _REGR_MOMENTS.items()]
    )
    moments.createOrReplaceTempView("regr_moments")
    return spark.sql(_REGR_FINAL)


# --- recursive CTE (Spark 4 WITH RECURSIVE — hierarchy walk) --------------------

# Byte-identical statement on both engines. Implicit binary-tree
# hierarchy over the order PKs (parent = floor(k/2)): the recursive
# member walks each node to the root, then the outer query aggregates
# walk depth — the org-chart / category-tree traversal shape. Integer
# halving spelled floor(k / 2.0) because `/` is float division in both
# dialects and CAST(double AS BIGINT) rounds in DuckDB but truncates
# in Spark — floor agrees everywhere (SURVEY §8.3 family).
_RECURSIVE_SQL = """
WITH RECURSIVE walk(k, cur, depth) AS (
  SELECT o_orderkey AS k, o_orderkey AS cur, 0 AS depth
  FROM orders WHERE o_orderkey % 16 = 0
  UNION ALL
  SELECT k, CAST(FLOOR(cur / 2.0) AS BIGINT) AS cur, depth + 1 AS depth
  FROM walk WHERE cur > 0
)
SELECT k, MAX(depth) AS depth_to_root, COUNT(*) AS n_ancestors
FROM walk GROUP BY k
"""


@graded("sql_recursive_cte", oracle=_RECURSIVE_SQL)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4): per-node root-path walk over an
    implicit hierarchy, ~log2(max_key) iterations. Spark executes each
    recursive step as a fresh plan over the previous frontier — the
    same loop-of-DataFrames shape as operators/graph.py, but expressed
    in pure SQL and oracle-checked byte-for-byte against DuckDB's
    recursive executor."""
    register_tables(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)


# --- EXT: market-basket association rules ----------------------------------------

# Support / confidence / lift over same-order brand pairs — the classic
# association miner. Pair fanout is order-keyed (quadratic only in the
# per-order distinct-brand count, ~4), the brand-support table and the
# scalar order count broadcast back onto the pair aggregate. Scores
# are unrounded: every operand is an exact integer, so the divisions
# are bit-identical cross-engine, and ROUND(,4) would *introduce* a
# half-tie hazard on exact .xxxx5 quotients.
_BASKET_ORACLE = """
WITH b AS (
  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
n AS (SELECT COUNT(DISTINCT ok) AS n FROM b),
s AS (SELECT brand, COUNT(*) AS sup FROM b GROUP BY brand),
pr AS (
  SELECT a.brand AS brand_a, c.brand AS brand_b, COUNT(*) AS sup_ab
  FROM b a JOIN b c ON a.ok = c.ok AND a.brand < c.brand
  GROUP BY a.brand, c.brand
  HAVING COUNT(*) >= 10
)
SELECT pr.brand_a, pr.brand_b, pr.sup_ab,
       CAST(pr.sup_ab AS DOUBLE) / sa.sup AS confidence,
       CAST(pr.sup_ab AS DOUBLE) * n.n
         / (CAST(sa.sup AS DOUBLE) * sb.sup) AS lift
FROM pr
JOIN s sa ON sa.brand = pr.brand_a
JOIN s sb ON sb.brand = pr.brand_b, n
"""


@graded("analytics_market_basket", oracle=_BASKET_ORACLE)
def analytics_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand co-purchase rules (support ≥ 10) with confidence and lift.
    Each order collapses to its sorted distinct-brand array in ONE
    shuffle; pairs then expand map-side from the array (no self-join),
    so the pair aggregate's input is already combiner-friendly. The
    basket table materializes once (localCheckpoint — supports, the
    scalar count, and the pair expansion all read it). At 100 TB: cap
    the per-basket array before pairing (fanout is quadratic in that
    cap only)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # One shuffle total for the pair expansion: collapse each order to
    # its sorted distinct-brand array, then emit pairs MAP-SIDE with a
    # nested array transform — no order-keyed self-join. (The
    # self-join form shuffles the basket table twice and was ~2.4×
    # slower at sf0.1.)
    baskets = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.sort_array(F.collect_set("p_brand")).alias("bs"))
        # Explicit width before the checkpoint: AQE sizes this exchange
        # by basket BYTES, but the next stage's cost is the quadratic
        # pair explode of each array — work AQE cannot see. Coalesced
        # to 3 partitions it straggled (~1.5 s for the pair stage at
        # sf0.1; 0.35 s at full width — the r8 root cause of the
        # r6→r7 bench drift on this query).
        .repartition(li.sparkSession.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)  # feeds supports, count, pairs
    )
    n = baskets.agg(F.count(F.lit(1)).alias("n"))
    s = (
        baskets.select(F.explode("bs").alias("brand"))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).alias("sup"))
    )
    pair_structs = F.expr(
        "flatten(transform(bs, (x, i) ->"
        " transform(slice(bs, i + 2, size(bs)),"
        " y -> struct(x AS brand_a, y AS brand_b))))"
    )
    pr = (
        baskets.select(F.explode(pair_structs).alias("p"))
        .select("p.brand_a", "p.brand_b")
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("sup_ab"))
        .where(F.col("sup_ab") >= 10)
    )
    sa = s.select(F.col("brand").alias("brand_a"), F.col("sup").alias("sup_a"))
    sb = s.select(F.col("brand").alias("brand_b"), F.col("sup").alias("sup_b"))
    return (
        pr.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "sup_ab",
            (F.col("sup_ab").cast("double") / F.col("sup_a")).alias("confidence"),
            (
                F.col("sup_ab").cast("double")
                * F.col("n")
                / (F.col("sup_a").cast("double") * F.col("sup_b"))
            ).alias("lift"),
        )
    )


# --- EXT: last-touch attribution -------------------------------------------------

# Marketing-style attribution: each purchase credits the user's most
# recent preceding non-purchase event type ('direct' if none). The
# ignore-nulls running last_value over the user timeline is the same
# machinery as gap interpolation; revenue stays exact cents until one
# unrounded division.
_ATTRIBUTION_ORACLE = """
WITH tagged AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS cents,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
  FROM events
)
SELECT COALESCE(channel, 'direct') AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents,
       CAST(SUM(cents) AS DOUBLE) / 100.0 AS revenue_usd
FROM tagged
WHERE event_type = 'purchase'
GROUP BY COALESCE(channel, 'direct')
"""


@graded("analytics_attribution", oracle=_ATTRIBUTION_ORACLE)
def analytics_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution of purchase revenue to the preceding
    event type per user. One window exchange on user_id computes the
    running ignore-nulls last non-purchase type; the attribution agg
    then runs on the tiny |channels| keyspace. At 100 TB this is the
    single-exchange form — no per-purchase asof join back into the
    event stream."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    channel = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    tagged = ev.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        channel.alias("channel"),
    )
    return (
        tagged.where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("cents").alias("revenue_cents"),
        )
        .withColumn("revenue_usd", F.col("revenue_cents").cast("double") / 100.0)
    )


# --- EXT: A/B lift with a two-proportion z-score ---------------------------------

# Experiment readout: arms from the stable user-id parity, conversion
# = at least one purchase over $200 (the threshold keeps rates off 0
# and 1 at every fixture SF — a saturated rate zeroes the pooled
# variance). Every input is an exact integer count; the
# proportions, pooled variance, and z-statistic are one mirrored IEEE
# expression tree — emitted unrounded (bit-identical cross-engine).
_AB_ORACLE = """
WITH u AS (
  SELECT user_id, CAST(user_id % 2 AS INTEGER) AS arm,
         MAX(CASE WHEN event_type = 'purchase' AND value > 200 THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
arms AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(converted) AS BIGINT) AS conv
  FROM u GROUP BY arm
),
wide AS (
  SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n_a,
         MAX(CASE WHEN arm = 0 THEN conv END) AS conv_a,
         MAX(CASE WHEN arm = 1 THEN n END) AS n_b,
         MAX(CASE WHEN arm = 1 THEN conv END) AS conv_b
  FROM arms
)
SELECT n_a, conv_a, n_b, conv_b,
       CAST(conv_a AS DOUBLE) / n_a AS p_a,
       CAST(conv_b AS DOUBLE) / n_b AS p_b,
       (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
         / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                * (1.0 / n_a + 1.0 / n_b)) AS z
FROM wide
"""


@graded("analytics_ab_lift", oracle=_AB_ORACLE)
def analytics_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test between user-parity arms (conversion =
    any purchase) — the experiment-readout primitive. Two hash aggs
    (per-user collapse, then the 2-row arm table); everything after is
    a scalar projection, so the whole statistic costs one scan +
    user-keyed exchange at any scale."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 200), 1
            ).otherwise(0)
        ).alias("converted")
    ).select(
        (F.col("user_id") % 2).cast("int").alias("arm"), "converted"
    )
    arms = u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == 0, F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == 1, F.col("conv"))).alias("conv_b"),
    )
    p_a = F.col("conv_a").cast("double") / F.col("n_a")
    p_b = F.col("conv_b").cast("double") / F.col("n_b")
    pp = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (p_a - p_b) / F.sqrt(
        pp * (1.0 - pp) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return wide.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        z.alias("z"),
    )


# --- EXT: CUPED variance-reduced experiment readout ------------------------------

# CUPED (Deng et al. 2013, public): adjust each arm's metric with a
# pre-period covariate, yadj = y − θ(x − x̄), θ = cov(x,y)/var(x) pooled.
# Pre/post split at the integer midpoint of the event-time range
# (epoch-µs arithmetic, exact in both engines); x/y are per-user
# purchase CENTS (integer-exact), so every moment is a BIGINT sum and
# θ plus the arm means are mirrored IEEE expression trees over
# identical integer operands — the agg_regression_moments recipe
# applied to experimentation.
_AB_CUPED_ORACLE = """
WITH b AS (
  SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS mid FROM events
),
u AS (
  SELECT user_id,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                 AND epoch_us(ts) < b.mid
              THEN CAST(round(value * 100, 0) AS BIGINT) END), 0) AS BIGINT) AS x,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                 AND epoch_us(ts) >= b.mid
              THEN CAST(round(value * 100, 0) AS BIGINT) END), 0) AS BIGINT) AS y
  FROM events, b GROUP BY user_id
),
pool AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM u
),
arms AS (
  SELECT CAST(user_id % 2 AS INTEGER) AS arm,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(x) AS BIGINT) AS sx_v, CAST(SUM(y) AS BIGINT) AS sy_v
  FROM u GROUP BY arm
)
SELECT arm, n_users,
       ROUND(CAST(sy_v AS DOUBLE) / n_users / 100.0, 4) AS mean_y_usd,
       ROUND((CAST(sy_v AS DOUBLE) / n_users
              - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                * (CAST(sx_v AS DOUBLE) / n_users - CAST(sx AS DOUBLE) / n))
             / 100.0, 4) AS mean_y_cuped_usd
FROM arms, pool
ORDER BY arm
"""


@graded("analytics_ab_cuped", oracle=_AB_CUPED_ORACLE)
def analytics_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted experiment readout (see oracle comment). One
    user-keyed aggregate feeds both the pooled moment row (1 row,
    broadcast) and the 2-row arm table, so the whole statistic costs
    one scan + one user exchange at any scale; the per-user frame is
    lazily checkpointed for its two consumers."""
    ev = load_table(spark, sf_dir, "events")
    b = F.broadcast(
        ev.agg(
            (
                (F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts")))
                / F.lit(2)
            )
            .cast("long")
            .alias("mid")
        )
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    u = (
        ev.crossJoin(b)
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("event_type") == "purchase")
                        & (F.unix_micros("ts") < F.col("mid")),
                        cents,
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("x"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("event_type") == "purchase")
                        & (F.unix_micros("ts") >= F.col("mid")),
                        cents,
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("y"),
        )
        .localCheckpoint(eager=False)
    )
    pool = F.broadcast(
        u.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        )
    )
    arms = u.groupBy(
        (F.col("user_id") % 2).cast("int").alias("arm")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("sx_v"),
        F.sum("y").cast("long").alias("sy_v"),
    )
    theta = (
        F.col("n").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    )
    return (
        arms.crossJoin(pool)
        .select(
            "arm",
            "n_users",
            F.round(F.col("sy_v").cast("double") / F.col("n_users") / 100.0, 4)
            .alias("mean_y_usd"),
            F.round(
                (
                    F.col("sy_v").cast("double") / F.col("n_users")
                    - theta
                    * (
                        F.col("sx_v").cast("double") / F.col("n_users")
                        - F.col("sx").cast("double") / F.col("n")
                    )
                )
                / 100.0,
                4,
            ).alias("mean_y_cuped_usd"),
        )
        .orderBy("arm")
    )


# --- EXT: per-group OLS regression ----------------------------------------------

# Grouped least squares (price-vs-size per brand) from exact BIGINT
# power sums — the per-segment trend fit behind pricing/elasticity
# dashboards. Slope and intercept are mirrored IEEE expression trees
# over identical integer operands, emitted unrounded.
_GROUP_REGR_ORACLE = """
WITH s AS (
  SELECT p_brand,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(p_size) AS BIGINT) AS sx,
         CAST(SUM(CAST(p_size AS BIGINT) * p_size) AS BIGINT) AS sxx,
         CAST(SUM(CAST(round(p_retailprice * 100, 0) AS BIGINT)) AS BIGINT) AS sy,
         CAST(SUM(p_size * CAST(round(p_retailprice * 100, 0) AS BIGINT))
              AS BIGINT) AS sxy
  FROM part GROUP BY p_brand
)
SELECT p_brand, n,
       (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) / 100.0
         AS slope_usd_per_size,
       (CAST(sy AS DOUBLE)
        - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
          / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * sx)
         / n / 100.0 AS intercept_usd
FROM s
WHERE n >= 2 AND CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx <> 0
"""


@graded("analytics_group_regression", oracle=_GROUP_REGR_ORACLE)
def analytics_group_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS fit of retail price against size. One map-side-
    combinable hash agg produces the five power sums; the closed-form
    finals are scalar projections — so a grouped regression over
    100 TB costs exactly one shuffle of |groups| rows."""
    p = load_table(spark, sf_dir, "part")
    cents = F.round(F.col("p_retailprice") * 100, 0).cast("long")
    s = p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p_size").alias("sx"),
        F.sum(F.col("p_size").cast("long") * F.col("p_size")).alias("sxx"),
        F.sum(cents).alias("sy"),
        F.sum(F.col("p_size") * cents).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    den = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    slope = (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / den
    intercept = (
        (F.col("sy").cast("double") - slope * F.col("sx")) / F.col("n") / 100.0
    )
    return (
        s.where((F.col("n") >= 2) & (den != 0))
        .select(
            "p_brand",
            "n",
            (slope / 100.0).alias("slope_usd_per_size"),
            intercept.alias("intercept_usd"),
        )
    )


# --- Spark 4 SQL pipe syntax (same semantics, new surface) ----------------------

# Spark 4's pipe operator chains read top-down (FROM |> WHERE
# |> AGGREGATE); Catalyst resolves them to the identical plan as the
# classic form, which is what the DuckDB oracle runs — proving the new
# syntax surface against the old semantics.
_PIPE_SQL = """
FROM orders
|> WHERE o_orderstatus = 'F'
|> AGGREGATE COUNT(*) AS n,
     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
   GROUP BY o_orderpriority
"""

_PIPE_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
"""


@graded("sql_pipe_syntax", oracle=_PIPE_ORACLE)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax (`FROM ... |> WHERE ... |> AGGREGATE`)
    over the registered views; the oracle is the classic equivalent —
    same Catalyst plan, same decimal aggregate recipe."""
    register_tables(spark, sf_dir)
    return spark.sql(_PIPE_SQL)


# --- EXT: 2-D equi-width histogram (heat grid) ----------------------------------

# The qty × price density grid behind heatmap dashboards and 2-D
# histogram statistics for join-selectivity estimation. Bucket edges
# derive from the data (1-row min/max broadcast); bucket ids are
# floor((x−min)/w) over identical doubles in both engines, clamped to
# the top cell, so binning is exact. Revenue uses the decimal recipe.
_HEAT2D_ORACLE = """
WITH b AS (
  SELECT MIN(l_quantity) AS qlo, MAX(l_quantity) AS qhi,
         MIN(l_extendedprice) AS plo, MAX(l_extendedprice) AS phi
  FROM lineitem
)
SELECT
  CAST(LEAST(FLOOR((l_quantity - b.qlo) / ((b.qhi - b.qlo) / 10.0)), 9)
       AS INTEGER) AS qbin,
  CAST(LEAST(FLOOR((l_extendedprice - b.plo) / ((b.phi - b.plo) / 10.0)), 9)
       AS INTEGER) AS pbin,
  COUNT(*) AS n,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
FROM lineitem, b
GROUP BY qbin, pbin
"""


@graded("analytics_heatmap_2d", oracle=_HEAT2D_ORACLE)
def analytics_heatmap_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10×10 equi-width qty × price grid with per-cell count and
    revenue — one scan + one hash agg over a ≤100-key space (fully
    map-side-combinable); the bucket-edge row broadcasts. The
    histogram-statistics shape a CBO or dashboard tiles at any
    scale."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.agg(
        F.min("l_quantity").alias("qlo"),
        F.max("l_quantity").alias("qhi"),
        F.min("l_extendedprice").alias("plo"),
        F.max("l_extendedprice").alias("phi"),
    )
    qbin = F.least(
        F.floor((F.col("l_quantity") - F.col("qlo")) / ((F.col("qhi") - F.col("qlo")) / 10.0)),
        F.lit(9),
    ).cast("int")
    pbin = F.least(
        F.floor(
            (F.col("l_extendedprice") - F.col("plo"))
            / ((F.col("phi") - F.col("plo")) / 10.0)
        ),
        F.lit(9),
    ).cast("int")
    return (
        li.crossJoin(F.broadcast(b))
        .groupBy(qbin.alias("qbin"), pbin.alias("pbin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("rev"),
        )
    )


# --- EXT: Pareto / cumulative revenue concentration ------------------------------

# "Which slice of customers carries which share of revenue" — the
# Lorenz-curve rollup. Customers rank by exact-cent revenue (total
# order via the custkey tie-break); rank and running sum both come
# from the distributed primitives in operators/ranks.py, so there is
# no single-task sort anywhere. Shares are integer-operand divisions,
# unrounded.
_PARETO_ORACLE = """
WITH cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT o_custkey, cents,
         CAST(ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS BIGINT) AS rn,
         CAST(SUM(cents) OVER (ORDER BY cents DESC, o_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM cust
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_cust,
         CAST(SUM(cents) AS BIGINT) AS total
  FROM cust
)
SELECT CAST((r.rn - 1) * 10 // t.n_cust AS INTEGER) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(r.cents) AS BIGINT) AS cents,
       CAST(SUM(r.cents) AS DOUBLE) / t.total AS revenue_share,
       CAST(MAX(r.cum) AS DOUBLE) / t.total AS cum_share_at_end
FROM ranked r, tot t
GROUP BY decile, t.n_cust, t.total
"""


@graded("analytics_pareto_share", oracle=_PARETO_ORACLE)
def analytics_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration by customer decile (Pareto/Lorenz
    rollup). Rank and cumulative revenue use the range-partitioned
    distributed primitives — bounded per-task memory at any customer
    count — then one 10-key agg; the (n, total) scalars broadcast."""
    from ..operators.ranks import global_cumsum, global_row_number

    o = load_table(spark, sf_dir, "orders")
    cust = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("cents")
        )
        # r14 §2.4: cust is consumed three times (rank, cumsum, totals)
        # and each evaluation re-ran the fact collapse. Customer-sized;
        # computed once.
        .localCheckpoint(eager=False)
    )
    keys = [F.col("cents").desc(), F.col("o_custkey")]
    rn = global_row_number(cust, keys, out="rn").select("o_custkey", "rn")
    cum = global_cumsum(cust, keys, "cents", out="cum")
    ranked = cum.join(rn, "o_custkey")
    tot = cust.agg(
        F.count(F.lit(1)).alias("n_cust"), F.sum("cents").alias("total")
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy(
            F.expr("CAST((rn - 1) * 10 DIV n_cust AS INT)").alias("decile"),
            "n_cust",
            "total",
        )
        .agg(
            F.count(F.lit(1)).alias("n_cust_d"),
            F.sum("cents").alias("cents"),
            (F.sum("cents").cast("double") / F.first("total")).alias(
                "revenue_share"
            ),
            (F.max("cum").cast("double") / F.first("total")).alias(
                "cum_share_at_end"
            ),
        )
        .select(
            "decile",
            F.col("n_cust_d").alias("n_cust"),
            "cents",
            "revenue_share",
            "cum_share_at_end",
        )
    )


# --- EXT: activity survival curve ------------------------------------------------

# Discrete survival: S(w) = share of users still active ≥ w weeks
# after their first event (lifetime = last − first, floored to whole
# weeks from exact integer µs). Weeks 0..8 explode from a literal
# sequence; everything is integer counts until one unrounded division
# — the churn-analysis curve without a stats library.
_SURVIVAL_ORACLE = """
WITH life AS (
  SELECT user_id,
         (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 604800000000 AS weeks
  FROM events GROUP BY user_id
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM life),
grid AS (SELECT CAST(unnest(range(0, 9)) AS INTEGER) AS week)
SELECT g.week,
       CAST(COUNT(l.user_id) AS BIGINT) AS n_surviving,
       CAST(COUNT(l.user_id) AS DOUBLE) / n.n_users AS survival
FROM grid g
LEFT JOIN life l ON l.weeks >= g.week, n
GROUP BY g.week, n.n_users
"""


@graded("analytics_survival_curve", oracle=_SURVIVAL_ORACLE)
def analytics_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly activity survival curve S(w) over user lifetimes. One
    user-keyed agg produces lifetimes; each user then contributes one
    row per week of the 9-point grid they survive past
    (explode(sequence(0, min(weeks, 8))) — a ≤9× fan-out), and a
    week-keyed count gives |{users: weeks ≥ w}|. The r6 shape theta-
    joined the grid against the user-cardinality lifetime table via a
    BroadcastNestedLoopJoin that BUILT THE LIFETIME SIDE — a
    users-sized broadcast at scale, caught by the round-7 BNLJ-aware
    plan audit. This form has no nested loop at all: the only joins
    are a 9-row broadcast-hash grid fill and the 1-row total attach."""
    ev = load_table(spark, sf_dir, "events")
    life = ev.groupBy("user_id").agg(
        F.expr(
            "(unix_micros(MAX(ts)) - unix_micros(MIN(ts))) DIV 604800000000"
        ).alias("weeks")
    )
    n = life.agg(F.count(F.lit(1)).alias("n_users"))
    counts = (
        life.select(
            F.explode(F.expr("sequence(0, least(weeks, 8))")).alias("wk")
        )
        .groupBy("wk")
        .agg(F.count(F.lit(1)).alias("n_surv"))
    )
    grid = spark.range(0, 9).select(F.col("id").cast("int").alias("week"))
    return (
        grid.join(
            F.broadcast(counts), grid.week == counts.wk.cast("int"), "left"
        )
        .select("week", F.coalesce("n_surv", F.lit(0)).alias("n_surviving"))
        .crossJoin(F.broadcast(n))
        .select(
            "week",
            "n_surviving",
            (F.col("n_surviving").cast("double") / F.col("n_users")).alias(
                "survival"
            ),
        )
    )


# --- Spark parameterized SQL (named parameters) ----------------------------------

# The injection-safe parameter-binding surface (spark.sql(query,
# args={...})): markers type as literals in the plan, so Catalyst
# constant-folds them exactly like inlined constants. Oracle inlines
# the same values — identical semantics, different binding mechanism.
_PARAM_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
FROM orders
WHERE o_orderstatus = 'F' AND o_totalprice >= 1000.0
GROUP BY o_orderpriority
"""


@graded("sql_named_parameters", oracle=_PARAM_ORACLE)
def sql_named_parameters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL: the same aggregate with :status and
    :min_total bound via spark.sql(..., args=...) — the API a query
    service uses instead of string interpolation."""
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
        FROM orders
        WHERE o_orderstatus = :status AND o_totalprice >= :min_total
        GROUP BY o_orderpriority
        """,
        args={"status": "F", "min_total": 1000.0},
    )


# --- EXT: Gini coefficient -------------------------------------------------------

# Inequality of customer revenue as one scalar: for ascending-sorted
# exact cents with rank i, G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n. The rank
# comes from the distributed primitive and Σ(i·xᵢ) accumulates in
# DECIMAL(38,0) (rank·cents ≈ 1e5·1e7 per row — BIGINT-safe here, but
# decimal keeps the identity at 10⁹ customers). One mirrored
# expression over exact integers, unrounded.
_GINI_ORACLE = """
WITH cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey
),
r AS (
  SELECT cents,
         CAST(ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS rn
  FROM cust
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cust,
       2.0 * CAST(SUM(CAST(rn AS HUGEINT) * cents) AS DOUBLE)
         / (COUNT(*) * CAST(SUM(cents) AS DOUBLE))
       - (CAST(COUNT(*) AS DOUBLE) + 1.0) / COUNT(*) AS gini
FROM r
"""


@graded("analytics_gini_coefficient", oracle=_GINI_ORACLE)
def analytics_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue — the single-scalar
    inequality readout over the Pareto machinery. Ranks come from the
    range-partitioned primitive; the rank-weighted sum accumulates in
    DECIMAL(38,0), so the whole statistic is exact until two final
    divisions."""
    from ..operators.ranks import global_row_number

    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents")
    )
    ranked = global_row_number(cust, ["cents", "o_custkey"], out="rn")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_cust"),
        (
            2.0
            * F.sum(
                F.col("rn").cast("decimal(38,0)") * F.col("cents").cast("decimal(38,0)")
            ).cast("double")
            / (F.count(F.lit(1)) * F.sum("cents").cast("double"))
            - (F.count(F.lit(1)).cast("double") + 1.0) / F.count(F.lit(1))
        ).alias("gini"),
    )


# --- EXT: first-touch attribution ------------------------------------------------

# The acquisition-credit dual of analytics_attribution: each purchase
# credits the FIRST non-purchase event in the user's history up to
# that point (running ignore-nulls first_value over the same
# user-timeline frame — one shared window exchange shape).
_FIRST_TOUCH_ORACLE = """
WITH tagged AS (
  SELECT user_id, event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS cents,
         first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                     IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
  FROM events
)
SELECT COALESCE(channel, 'direct') AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents,
       CAST(SUM(cents) AS DOUBLE) / 100.0 AS revenue_usd
FROM tagged
WHERE event_type = 'purchase'
GROUP BY COALESCE(channel, 'direct')
"""


@graded("analytics_attribution_first", oracle=_FIRST_TOUCH_ORACLE)
def analytics_attribution_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: purchase revenue credited to the
    user's earliest preceding event type — the acquisition-channel
    view beside the last-touch (conversion-channel) one. Identical
    single-exchange plan; only the carried value function differs."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    channel = F.first(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    tagged = ev.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        channel.alias("channel"),
    )
    return (
        tagged.where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("cents").alias("revenue_cents"),
        )
        .withColumn("revenue_usd", F.col("revenue_cents").cast("double") / 100.0)
    )


# --- EXT: ABC classification -----------------------------------------------------

# Inventory ABC classes by revenue concentration: parts sorted by
# exact-cent revenue descending; A = cumulative share ≤ 80%, B ≤ 95%,
# C = tail. The running share uses the distributed prefix sum, so the
# classification never single-task sorts; class membership compares
# identically-derived doubles (exact integer operands) in both
# engines.
_ABC_ORACLE = """
WITH p AS (
  SELECT l_partkey,
         CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem GROUP BY l_partkey
),
r AS (
  SELECT l_partkey, cents,
         CAST(SUM(cents) OVER (ORDER BY cents DESC, l_partkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM p
),
t AS (SELECT CAST(SUM(cents) AS BIGINT) AS total FROM p)
SELECT CASE WHEN CAST(r.cum AS DOUBLE) / t.total <= 0.80 THEN 'A'
            WHEN CAST(r.cum AS DOUBLE) / t.total <= 0.95 THEN 'B'
            ELSE 'C' END AS abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(r.cents) AS BIGINT) AS revenue_cents,
       CAST(SUM(r.cents) AS DOUBLE) / t.total AS revenue_share
FROM r, t
GROUP BY abc_class, t.total
"""


@graded("analytics_abc_classification", oracle=_ABC_ORACLE)
def analytics_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classes (80/95 cumulative-revenue cuts) per part.
    Revenue ranks and the running share come from the distributed
    prefix sum (operators/ranks.py — bounded per-task memory at any
    part count); the final rollup is a 3-key agg."""
    from ..operators.ranks import global_cumsum

    li = load_table(spark, sf_dir, "lineitem")
    p = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        ).alias("cents")
    )
    r = global_cumsum(
        p, [F.col("cents").desc(), "l_partkey"], "cents", out="cum"
    )
    t = p.agg(F.sum("cents").alias("total"))
    share = F.col("cum").cast("double") / F.col("total")
    abc = (
        F.when(share <= 0.80, "A").when(share <= 0.95, "B").otherwise("C")
    )
    return (
        r.crossJoin(F.broadcast(t))
        .groupBy(abc.alias("abc_class"), "total")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("cents").alias("revenue_cents"),
            (F.sum("cents").cast("double") / F.first("total")).alias(
                "revenue_share"
            ),
        )
        .select("abc_class", "n_parts", "revenue_cents", "revenue_share")
    )


# --- EXT: abandonment detection --------------------------------------------------

# Users whose LAST click has no purchase within the following 24 h —
# the cart-abandonment audience a re-engagement campaign targets.
# Last-click selection is an exact MAX per user; the follow-up check
# is a user-keyed EXISTS with an integer-µs window bound.
_ABANDON_ORACLE = """
WITH last_click AS (
  SELECT user_id, MAX(ts) AS click_ts
  FROM events WHERE event_type = 'click' GROUP BY user_id
)
SELECT lc.user_id, lc.click_ts,
       NOT EXISTS (
         SELECT 1 FROM events p
         WHERE p.user_id = lc.user_id AND p.event_type = 'purchase'
           AND p.ts >= lc.click_ts
           AND epoch_us(p.ts) - epoch_us(lc.click_ts) <= 86400000000
       ) AS abandoned
FROM last_click lc
"""


@graded("analytics_abandonment", oracle=_ABANDON_ORACLE)
def analytics_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user abandonment flag: no purchase within 24 h of the last
    click. The EXISTS decorrelates to a user-keyed left-semi join that
    co-partitions with the last-click aggregate — one shuffle shape
    end to end."""
    ev = load_table(spark, sf_dir, "events")
    last_click = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.max("ts").alias("click_ts"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    converted = (
        last_click.join(purchases, "user_id")
        .where(
            (F.col("p_ts") >= F.col("click_ts"))
            & (
                F.unix_micros("p_ts") - F.unix_micros("click_ts")
                <= 86400000000
            )
        )
        .select("user_id")
        .distinct()
        .withColumn("conv", F.lit(1))
    )
    return (
        last_click.join(converted, "user_id", "left")
        .select("user_id", "click_ts", F.col("conv").isNull().alias("abandoned"))
    )


# --- winsorized group statistics -------------------------------------------------

# Robust-mean reporting: clip each order's price into the group's
# [p05, p95] band, then compare raw vs winsorized means. The clip is a
# pure LEAST/GREATEST on identical doubles; clipped addends quantize to
# DECIMAL(38,9) before the order-independent sum (interpolated
# percentile bounds carry sub-ulp engine noise — quantization absorbs
# it, same rationale as text_unigram_logprob).
_WINSORIZE_ORACLE = """
WITH pct AS (
  SELECT o_orderpriority,
         quantile_cont(o_totalprice, 0.05) AS p05,
         quantile_cont(o_totalprice, 0.95) AS p95
  FROM orders GROUP BY o_orderpriority
)
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(ANY_VALUE(p.p05), 4) AS p05,
       ROUND(ANY_VALUE(p.p95), 4) AS p95,
       ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 4) AS mean_raw,
       ROUND(CAST(SUM(CAST(LEAST(GREATEST(o.o_totalprice, p.p05), p.p95)
                           AS DECIMAL(38,9))) AS DOUBLE)
             / COUNT(*), 4) AS mean_winsorized
FROM orders o JOIN pct p USING (o_orderpriority)
GROUP BY o.o_orderpriority
"""


@graded("agg_winsorized_stats", oracle=_WINSORIZE_ORACLE)
def agg_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized vs raw group means: one exact-percentile aggregate
    (groups-sized, broadcast back) + one clipped re-aggregate of the
    fact table — two shuffles on the same group key; at 100 TB the
    percentile stage switches to approx_percentile per the
    agg_percentile scale note."""
    o = load_table(spark, sf_dir, "orders")
    pct = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.05)").alias("p05"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
    )
    clipped = F.least(
        F.greatest(F.col("o_totalprice"), F.col("p05")), F.col("p95")
    )
    return (
        o.join(F.broadcast(pct), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.first("p05"), 4).alias("p05"),
            F.round(F.first("p95"), 4).alias("p95"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double")
                / F.count("*"),
                4,
            ).alias("mean_raw"),
            F.round(
                F.sum(clipped.cast("decimal(38,9)")).cast("double")
                / F.count("*"),
                4,
            ).alias("mean_winsorized"),
        )
    )


# --- GROUP BY ALL / ORDER BY ALL surface ----------------------------------------

# Spark 4 and DuckDB both resolve GROUP BY ALL to "every non-aggregate
# select item" and ORDER BY ALL to the full select list left-to-right;
# grading the pair proves the resolution rules agree (a silent
# divergence here would corrupt any migrated query that relies on
# them). Semantics are the classic A1 rollup shape.
_GROUP_BY_ALL_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
FROM orders
GROUP BY ALL
ORDER BY ALL
"""


@graded("sql_group_by_all", oracle=_GROUP_BY_ALL_SQL)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL + ORDER BY ALL resolution parity: Spark runs the
    statement verbatim, the oracle runs the identical text in DuckDB —
    both engines must infer the same grouping keys and total order."""
    register_tables(spark, sf_dir)
    return spark.sql(_GROUP_BY_ALL_SQL)


# --- click → purchase conversion-latency distribution ---------------------------

# The SLA view of the attribution family: how long between a user's
# first click and their next purchase. Latencies are exact integer
# microseconds; the percentile runs over minutes (integer µs / 6e7 —
# identical-operand IEEE), interpolation per the agg_percentile
# precedent, ROUND(4) at the edge.
_TIME_TO_CONVERT_ORACLE = """
WITH first_click AS (
  SELECT user_id, MIN(ts) AS click_ts
  FROM events WHERE event_type = 'click' GROUP BY user_id
),
conv AS (
  SELECT f.user_id,
         epoch_us(MIN(e.ts)) - epoch_us(f.click_ts) AS lat_us
  FROM first_click f
  JOIN events e
    ON e.user_id = f.user_id
   AND e.event_type = 'purchase'
   AND e.ts >= f.click_ts
  GROUP BY f.user_id, f.click_ts
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       ROUND(quantile_cont(lat_us / 60000000.0, 0.50), 4) AS p50_min,
       ROUND(quantile_cont(lat_us / 60000000.0, 0.90), 4) AS p90_min
FROM conv
"""


@graded("analytics_time_to_convert", oracle=_TIME_TO_CONVERT_ORACLE)
def analytics_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-click → next-purchase latency percentiles: two aggregates
    co-partitioned on user_id + one key join — no window over the raw
    stream; at 100 TB swap exact percentile for approx_percentile as
    agg_percentile documents."""
    ev = load_table(spark, sf_dir, "events")
    first_click = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    conv = (
        first_click.join(
            ev.where(F.col("event_type") == "purchase").select(
                "user_id", F.col("ts").alias("p_ts")
            ),
            "user_id",
        )
        .where(F.col("p_ts") >= F.col("click_ts"))
        .groupBy("user_id", "click_ts")
        .agg(
            (
                F.unix_micros(F.min("p_ts")) - F.unix_micros("click_ts")
            ).alias("lat_us")
        )
    )
    lat_min = F.col("lat_us") / 60000000.0
    return conv.select(lat_min.alias("lat_min")).agg(
        F.count("*").alias("n_converted"),
        F.round(F.expr("percentile(lat_min, 0.50)"), 4).alias("p50_min"),
        F.round(F.expr("percentile(lat_min, 0.90)"), 4).alias("p90_min"),
    )


# --- EXT: CEP-style event-sequence pattern match ---------------------------------

# MATCH_RECOGNIZE / Flink-CEP analog as a pure relational op: each
# user's ordered event history becomes a one-char-per-event string
# (v/c/p/e/s), and journey patterns are regexes over it. The two
# graded patterns are unambiguous BY CONSTRUCTION: gaps exclude both
# terminators ([^ep]*), so a match starting at position s must end at
# the FIRST terminator after s — the extracted substring and the
# non-overlapping count are engine-independent (no reliance on
# greedy-vs-lazy or leftmost-longest differences between Java regex
# and RE2). Conversion = view → click → purchase with no error or
# earlier purchase between; abort = the same prefix terminated by an
# error instead.
_CEP_CONV_PAT = "v[^ep]*c[^ep]*p"
_CEP_ABORT_PAT = "v[^ep]*c[^ep]*e"

_CEP_ORACLE = f"""
WITH seq AS (
  SELECT user_id,
         string_agg(CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                    WHEN 'purchase' THEN 'p' WHEN 'error' THEN 'e'
                    ELSE 's' END, '' ORDER BY ts, event_id) AS seq,
         COUNT(*) AS n_events
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(len(regexp_extract_all(seq, '{_CEP_CONV_PAT}', 0)) AS BIGINT)
         AS n_conversions,
       CAST(len(regexp_extract_all(seq, '{_CEP_ABORT_PAT}', 0)) AS BIGINT)
         AS n_aborted,
       CAST(length(regexp_extract(seq, '{_CEP_CONV_PAT}', 0)) AS BIGINT)
         AS first_conv_len
FROM seq
"""


@graded("analytics_cep_pattern", oracle=_CEP_ORACLE)
def analytics_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern match (MATCH_RECOGNIZE analog):
    per-user conversion/abort journey counts via regex over the
    encoded event-type sequence. One shuffle (the user-keyed collect);
    the sort happens inside ``array_sort`` per group, so no global
    ordering stage exists. Per-entity sequence length is the state
    bound — at 100 TB the same op runs per (user, session window)
    exactly like the streaming session queries, capping any one
    group's string at session size; user-lifetime sequences here match
    the oracle's scope."""
    ev = load_table(spark, sf_dir, "events")
    ch = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "error", "e")
        .otherwise("s")
    )
    seq = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", ch.alias("ch")))
                ),
                lambda x: x["ch"],
            ),
            "",
        ).alias("seq"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return seq.select(
        "user_id",
        "n_events",
        F.size(
            F.expr(f"regexp_extract_all(seq, '{_CEP_CONV_PAT}', 0)")
        ).cast("long").alias("n_conversions"),
        F.size(
            F.expr(f"regexp_extract_all(seq, '{_CEP_ABORT_PAT}', 0)")
        ).cast("long").alias("n_aborted"),
        F.length(
            F.regexp_extract("seq", _CEP_CONV_PAT, 0)
        ).cast("long").alias("first_conv_len"),
    )


# --- chi-square independence test: lang × source ---------------------------------

# The categorical counterpart of analytics_mann_whitney: is document
# language independent of source? Observed cell counts and the row/
# column margins are exact integers; each expected count e = r*c/N and
# each (o-e)²/e term are identical-operand IEEE in both engines, and
# the statistic sums those terms as DECIMAL(38,12) so partial-agg
# order cannot perturb the double (house recipe). dof = (R-1)(C-1)
# from exact distinct counts.
_CHI2_ORACLE = """
WITH obs AS (
  SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY lang, source
),
margins AS (
  SELECT o.lang, o.source, o.o,
         SUM(o.o) OVER (PARTITION BY o.lang) AS r,
         SUM(o.o) OVER (PARTITION BY o.source) AS c,
         SUM(o.o) OVER () AS n
  FROM obs o
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST((COUNT(DISTINCT lang) - 1) * (COUNT(DISTINCT source) - 1)
            AS BIGINT) AS dof,
       ROUND(CAST(SUM(CAST(
         (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
         * (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
         / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
         AS DECIMAL(38,12))) AS DOUBLE), 4) AS chi2
FROM margins
"""


@graded("analytics_chi_square", oracle=_CHI2_ORACLE)
def analytics_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence statistic over the lang × source
    contingency table. One row-scale aggregation to cell counts; the
    margins are windows over the CELL table (≤ |langs|·|sources| rows —
    metadata-sized at any corpus), so nothing after the first agg
    touches row-scale data."""
    docs = load_table(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(F.count("*").alias("o"))
    m = (
        obs.withColumn("r", F.sum("o").over(Window.partitionBy("lang")))
        .withColumn("c", F.sum("o").over(Window.partitionBy("source")))
        .withColumn("n", F.sum("o").over(Window.partitionBy()))
    )
    e = F.col("r").cast("double") * F.col("c").cast("double") / F.col("n").cast("double")
    term = (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    return m.agg(
        F.count("*").cast("bigint").alias("n_cells"),
        (
            (F.countDistinct("lang") - 1) * (F.countDistinct("source") - 1)
        ).cast("bigint").alias("dof"),
        F.round(
            F.sum(term.cast("decimal(38,12)")).cast("double"), 4
        ).alias("chi2"),
    )


# --- Poisson-bootstrap confidence interval -----------------------------------------

# Resampling-based uncertainty WITHOUT collecting the sample: the
# classic bootstrap draws n rows with replacement per replicate, which
# is undistributable; the Poisson bootstrap replaces each row's draw
# count with an independent Poisson(1) weight, so every (row,
# replicate) weight is a pure function of the row — one scan, B
# replicate aggregates, map-side combinable. Weights are DETERMINISTIC
# here: u = md5("boot:b:key") as a 52-bit uniform, inverted through
# the Poisson(1) CDF (literal thresholds shared by both engines), so
# the whole resampling experiment hash-matches cross-engine. CI bounds
# are the 5th/196th order statistics of the B=200 replicate means
# (the index convention for a 2.5%/97.5% interval at B=200).
import math as _math

_BOOT_B = 200
_POIS_CDF = []
_acc = 0.0
for _k in range(9):
    _acc += _math.exp(-1.0) / _math.factorial(_k)
    _POIS_CDF.append(repr(_acc))
del _acc, _k


def _boot_w_sql(u: str) -> str:
    """Poisson(1) inverse-CDF over an already-computed 52-bit uniform
    column — the md5 hashes ONCE per (row, replicate); inlining the
    hash into every CASE branch re-evaluated it up to 10× per row
    (measured 3.5 s → ~1 s at sf0.1)."""
    branches = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS_CDF)
    )
    return f"CASE {branches} ELSE 9 END"


_BOOT_SEED_DUCK = (
    "CAST(concat('0x', substring(md5('boot:' || CAST(b AS VARCHAR) || ':' "
    "|| CAST(c_custkey AS VARCHAR)), 1, 13)) AS BIGINT)"
)
_BOOT_SEED_SPARK = (
    "CAST(conv(substring(md5(concat_ws(':', 'boot', CAST(b AS STRING), "
    "CAST(c_custkey AS STRING))), 1, 13), 16, 10) AS BIGINT)"
)

_BOOT_ORACLE = f"""
WITH base AS (
  SELECT c_custkey,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
  FROM customer
),
grand AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS mean_cents
  FROM base
),
reps AS (SELECT unnest(range(0, {_BOOT_B})) AS b),
uni AS (
  SELECT r.b, x.cents,
         CAST({_BOOT_SEED_DUCK} AS DOUBLE) / 4503599627370496.0 AS u
  FROM base x, reps r
),
weighted AS (
  SELECT b, cents, {_boot_w_sql('u')} AS w FROM uni
),
rep AS (
  SELECT b,
         CAST(SUM(w * cents) AS DOUBLE) / NULLIF(SUM(w), 0) AS mean_b
  FROM weighted GROUP BY b
),
bar AS (
  SELECT CAST(SUM(CAST(mean_b AS DECIMAL(38,12))) AS DOUBLE)
           / {_BOOT_B} AS bar
  FROM rep
),
ranked AS (
  SELECT mean_b,
         ROW_NUMBER() OVER (ORDER BY mean_b ASC NULLS LAST, b) AS rn
  FROM rep
),
ci AS (
  SELECT COUNT(*) AS b_count,
         MIN(CASE WHEN rn = 5 THEN mean_b END) AS lo,
         MIN(CASE WHEN rn = 196 THEN mean_b END) AS hi,
         sqrt(CAST(SUM(CAST((mean_b - (SELECT bar FROM bar))
                            * (mean_b - (SELECT bar FROM bar))
                            AS DECIMAL(38,12))) AS DOUBLE)
              / ({_BOOT_B} - 1)) AS se
  FROM ranked
)
SELECT CAST(ci.b_count AS BIGINT) AS b_count,
       grand.n,
       ROUND(grand.mean_cents / 100, 4) AS mean_usd,
       ROUND(ci.lo / 100, 4) AS ci_lo_usd,
       ROUND(ci.hi / 100, 4) AS ci_hi_usd,
       ROUND(ci.se / 100, 4) AS se_usd
FROM ci, grand
"""


@graded("analytics_bootstrap_ci", oracle=_BOOT_ORACLE)
def analytics_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Poisson-bootstrap CI for the mean customer balance. One
    base scan crossed with a broadcast 200-row replicate axis; each
    (row, replicate) Poisson(1) weight is a deterministic md5
    function, so the shuffle reduces 200·n weighted rows to 200
    replicate means with full map-side combine. Everything after the
    replicate agg is a 200-row frame — order statistics and the
    deviation sum are metadata-sized at any corpus."""
    from ..operators import ranks as RK

    cust = load_table(spark, sf_dir, "customer")
    base = cust.select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("cents"),
    )
    grand = base.agg(
        F.count("*").cast("bigint").alias("n"),
        (F.sum("cents").cast("double") / F.count("*")).alias("mean_cents"),
    )
    # Replicate fan-out as a literal-bounded sequence explode (no join
    # node at all — the plan audit proves the 200-row bound from the
    # sequence literals). The explode multiplies whatever parallelism
    # the scan gives; the fixture's customer table is ONE parquet
    # row-group, so without a spread the 200·n md5 evaluations run on a
    # single core (measured 4.4 s → ~1 s at sf0.1). At 100 TB the base
    # arrives in thousands of scan partitions and this 16-way spread of
    # the pre-fan-out rows is noise.
    uni = (
        base.repartition(16)
        .select(
            "c_custkey",
            "cents",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.lit(_BOOT_B - 1).cast("long"))
            ).alias("b"),
        )
        .select(
            "b",
            "cents",
            (
                F.expr(_BOOT_SEED_SPARK).cast("double") / 4503599627370496.0
            ).alias("u"),
        )
    )
    weighted = uni.select("b", "cents", F.expr(_boot_w_sql("u")).alias("w"))
    rep = (
        weighted.groupBy("b")
        .agg(
            (
                F.sum(F.col("w") * F.col("cents")).cast("double")
                / F.nullif(F.sum("w"), F.lit(0))
            ).alias("mean_b")
        )
        # r14 §2.4: rep is consumed twice (the bar mean and the ranked
        # CI readout) and each evaluation re-ran the 200·n md5 fan-out
        # — the query's entire cost, twice. 200 rows; computed once.
        .localCheckpoint(eager=False)
    )
    bar = rep.agg(
        (
            F.sum(F.col("mean_b").cast("decimal(38,12)")).cast("double")
            / _BOOT_B
        ).alias("bar")
    )
    ranked = RK.attach_unit_group(rep).withColumn(
        "rn",
        F.row_number().over(
            # NULLS LAST explicitly: a replicate whose Poisson weights
            # are all zero yields a NULL mean_b, and Spark's ASC default
            # (NULLS FIRST) disagrees with DuckDB's (NULLS LAST) —
            # unreachable at B=200 on real fixtures (~e^-n) but the
            # ordering contract must be engine-identical regardless.
            Window.partitionBy(RK.UNIT_GROUP).orderBy(
                F.asc_nulls_last("mean_b"), "b"
            )
        ),
    )
    dev = F.col("mean_b") - F.col("bar")
    ci = (
        ranked.crossJoin(F.broadcast(bar))
        .agg(
            F.count("*").cast("bigint").alias("b_count"),
            F.min(F.when(F.col("rn") == 5, F.col("mean_b"))).alias("lo"),
            F.min(F.when(F.col("rn") == 196, F.col("mean_b"))).alias("hi"),
            F.sqrt(
                F.sum((dev * dev).cast("decimal(38,12)")).cast("double")
                / (_BOOT_B - 1)
            ).alias("se"),
        )
    )
    return ci.crossJoin(F.broadcast(grand)).select(
        "b_count",
        "n",
        F.round(F.col("mean_cents") / 100, 4).alias("mean_usd"),
        F.round(F.col("lo") / 100, 4).alias("ci_lo_usd"),
        F.round(F.col("hi") / 100, 4).alias("ci_hi_usd"),
        F.round(F.col("se") / 100, 4).alias("se_usd"),
    )


# --- mutual information between two categorical columns ----------------------------

# The information-theoretic sibling of analytics_chi_square: how many
# nats does knowing the source tell you about the language? All
# probabilities are exact-integer ratios over the contingency CELL
# table (metadata-sized at any corpus), each ln() runs on
# identical-operand doubles in both engines, and the three sums use
# the DECIMAL(38,12) house recipe so partial-agg order cannot perturb
# them. NMI normalizes by sqrt(H_lang · H_source).
_MI_ORACLE = """
WITH obs AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
  FROM documents GROUP BY lang, source
),
nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
lr AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY lang),
sc AS (SELECT source, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY source),
mi AS (
  SELECT SUM(CAST(
    (CAST(obs.o AS DOUBLE) / nn.n)
    * ln(CAST(obs.o AS DOUBLE) * nn.n
         / (CAST(lr.r AS DOUBLE) * sc.c))
    AS DECIMAL(38,12))) AS mi_dec
  FROM obs JOIN lr USING (lang) JOIN sc USING (source), nn
),
hl AS (
  SELECT SUM(CAST(-(CAST(r AS DOUBLE) / nn.n)
                  * ln(CAST(r AS DOUBLE) / nn.n)
                  AS DECIMAL(38,12))) AS h_dec
  FROM lr, nn
),
hs AS (
  SELECT SUM(CAST(-(CAST(c AS DOUBLE) / nn.n)
                  * ln(CAST(c AS DOUBLE) / nn.n)
                  AS DECIMAL(38,12))) AS h_dec
  FROM sc, nn
)
SELECT nn.n,
       ROUND(CAST(mi.mi_dec AS DOUBLE), 6) AS mi_nats,
       ROUND(CAST(hl.h_dec AS DOUBLE), 6) AS h_lang,
       ROUND(CAST(hs.h_dec AS DOUBLE), 6) AS h_source,
       ROUND(CAST(mi.mi_dec AS DOUBLE)
             / sqrt(CAST(hl.h_dec AS DOUBLE)
                    * CAST(hs.h_dec AS DOUBLE)), 6) AS nmi
FROM nn, mi, hl, hs
"""


@graded("analytics_mutual_information", oracle=_MI_ORACLE)
def analytics_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (and sqrt-normalized NMI) between document
    language and source. One row-scale agg to the contingency cells;
    margins, entropies, and the MI sum all run over cell/margin tables
    bounded by |langs|·|sources| — nothing after the first shuffle is
    corpus-sized."""
    docs = load_table(spark, sf_dir, "documents")
    obs = (
        docs.groupBy("lang", "source")
        .agg(F.count("*").cast("bigint").alias("o"))
        # r14 §2.4: obs is consumed four times (total, both margins,
        # the MI join) and each evaluation re-scanned the corpus. The
        # frame is |langs|·|sources| cells; the lazy checkpoint
        # computes the contingency table once.
        .localCheckpoint(eager=False)
    )
    nn = obs.agg(F.sum("o").cast("bigint").alias("n"))
    lr = obs.groupBy("lang").agg(F.sum("o").cast("bigint").alias("r"))
    sc = obs.groupBy("source").agg(F.sum("o").cast("bigint").alias("c"))
    joined = obs.join(lr, "lang").join(sc, "source").crossJoin(F.broadcast(nn))
    mi_term = (F.col("o").cast("double") / F.col("n")) * F.log(
        F.col("o").cast("double") * F.col("n")
        / (F.col("r").cast("double") * F.col("c"))
    )
    mi = joined.agg(F.sum(mi_term.cast("decimal(38,12)")).alias("mi_dec"))

    def entropy(margin: DataFrame, cnt: str) -> DataFrame:
        p = F.col(cnt).cast("double") / F.col("n")
        return margin.crossJoin(F.broadcast(nn)).agg(
            F.sum((-p * F.log(p)).cast("decimal(38,12)")).alias("h_dec")
        )

    hl = entropy(lr, "r").withColumnRenamed("h_dec", "hl_dec")
    hs = entropy(sc, "c").withColumnRenamed("h_dec", "hs_dec")
    return (
        nn.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hl))
        .crossJoin(F.broadcast(hs))
        .select(
            "n",
            F.round(F.col("mi_dec").cast("double"), 6).alias("mi_nats"),
            F.round(F.col("hl_dec").cast("double"), 6).alias("h_lang"),
            F.round(F.col("hs_dec").cast("double"), 6).alias("h_source"),
            F.round(
                F.col("mi_dec").cast("double")
                / F.sqrt(
                    F.col("hl_dec").cast("double")
                    * F.col("hs_dec").cast("double")
                ),
                6,
            ).alias("nmi"),
        )
    )


# --- randomization (permutation) test ----------------------------------------------

# Exact-null inference without distributional assumptions: re-assign
# each user's arm label B times under the null (labels exchangeable)
# and ask how often the resampled |mean difference| beats the observed
# one. Labels are md5 coin flips keyed on (replicate, user) — fully
# deterministic, so the whole Monte-Carlo experiment hash-matches
# cross-engine. Same scan-shape as analytics_bootstrap_ci: one user
# collapse, a broadcast 200-row replicate axis, map-side-combined
# replicate aggregates, then a 200-row tail. The +1/(B+1) correction
# keeps the p-value valid (never exactly 0).
_PERM_B = 200

_PERM_ORACLE = f"""
WITH u AS (
  SELECT user_id, CAST(user_id % 2 AS INTEGER) AS arm,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
              THEN CAST(round(value * 100, 0) AS BIGINT) END), 0) AS BIGINT)
           AS cents
  FROM events GROUP BY user_id
),
obs AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(arm * cents) AS DOUBLE) / SUM(arm)
         - CAST(SUM((1 - arm) * cents) AS DOUBLE) / SUM(1 - arm) AS d_obs
  FROM u
),
reps AS (SELECT unnest(range(0, {_PERM_B})) AS b),
relab AS (
  SELECT r.b,
         CASE WHEN substring(md5('perm:' || CAST(r.b AS VARCHAR) || ':'
                                  || CAST(u.user_id AS VARCHAR)), 1, 1) < '8'
              THEN 1 ELSE 0 END AS arm,
         u.cents
  FROM u, reps r
),
perm AS (
  SELECT b,
         CAST(SUM(arm * cents) AS DOUBLE) / NULLIF(SUM(arm), 0)
         - CAST(SUM((1 - arm) * cents) AS DOUBLE)
           / NULLIF(SUM(1 - arm), 0) AS d_b
  FROM relab GROUP BY b
)
SELECT obs.n_users,
       ROUND(obs.d_obs / 100, 4) AS d_obs_usd,
       CAST({_PERM_B} AS BIGINT) AS b_count,
       CAST(SUM(CASE WHEN ABS(perm.d_b) >= ABS(obs.d_obs)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
       ROUND((1.0 + SUM(CASE WHEN ABS(perm.d_b) >= ABS(obs.d_obs)
                             THEN 1 ELSE 0 END)) / (1.0 + {_PERM_B}), 6)
         AS p_value
FROM perm, obs
GROUP BY obs.n_users, obs.d_obs
"""


@graded("analytics_permutation_test", oracle=_PERM_ORACLE)
def analytics_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization test for the purchase-spend difference between
    user-parity arms: 200 deterministic md5 relabelings, two-sided
    p-value with the standard +1 correction. The replicate axis
    broadcasts; the only row-scale shuffle is the user collapse shared
    with analytics_mann_whitney."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100, 0).cast("bigint"),
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("cents")
    ).select(
        "user_id", (F.col("user_id") % 2).cast("int").alias("arm"), "cents"
    # r14 §2.4: u is consumed twice (the observed difference and the
    # 200-replicate fan-out) and each evaluation re-ran the events
    # collapse. User-sized; computed once.
    ).localCheckpoint(eager=False)
    arm, cents = F.col("arm"), F.col("cents")
    obs = u.agg(
        F.count("*").cast("bigint").alias("n_users"),
        (
            F.sum(arm * cents).cast("double") / F.sum(arm)
            - F.sum((1 - arm) * cents).cast("double") / F.sum(1 - arm)
        ).alias("d_obs"),
    )
    # Literal-bounded sequence explode, same shape (and rationale) as
    # analytics_bootstrap_ci's replicate axis — no join node to audit.
    relab = u.select(
        "user_id",
        "cents",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(_PERM_B - 1).cast("long"))
        ).alias("b"),
    ).select(
        "b",
        F.when(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit("perm"),
                        F.col("b").cast("string"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                1,
            )
            < "8",
            1,
        )
        .otherwise(0)
        .alias("parm"),
        "cents",
    )
    parm = F.col("parm")
    perm = relab.groupBy("b").agg(
        (
            F.sum(parm * cents).cast("double") / F.nullif(F.sum(parm), F.lit(0))
            - F.sum((1 - parm) * cents).cast("double")
            / F.nullif(F.sum(1 - parm), F.lit(0))
        ).alias("d_b")
    )
    extreme = F.when(F.abs(F.col("d_b")) >= F.abs(F.col("d_obs")), 1).otherwise(0)
    return (
        perm.crossJoin(F.broadcast(obs))
        .groupBy("n_users", "d_obs")
        .agg(
            F.lit(_PERM_B).cast("bigint").alias("b_count"),
            F.sum(extreme).cast("bigint").alias("n_extreme"),
            F.round(
                (1.0 + F.sum(extreme)) / (1.0 + _PERM_B), 6
            ).alias("p_value"),
        )
        .select(
            "n_users",
            F.round(F.col("d_obs") / 100, 4).alias("d_obs_usd"),
            "b_count",
            "n_extreme",
            "p_value",
        )
    )


# --- differentially-private count release (mechanics demo) -------------------------

# The release shape privacy teams ask the warehouse for: per-category
# counts with Laplace(1/ε) noise and a post-hoc non-negativity clamp.
# Real DP requires non-reproducible randomness; this graded query
# demonstrates the MECHANICS with a deterministic md5-uniform driven
# through the Laplace inverse CDF (noise = −b·sgn(u−½)·ln(1−2|u−½|)),
# which makes the whole release hash-checkable cross-engine — swap the
# uniform for a secure RNG in production and nothing else changes. The
# true counts are deliberately NOT in the output. Sensitivity of a
# per-user-disjoint count is 1; ε=0.5 ⇒ b=2.
_DP_EPS = 0.5

_DP_ORACLE = f"""
WITH cnt AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type
),
uni AS (
  SELECT event_type, c,
         CAST(concat('0x', substring(md5('dp:' || event_type), 1, 13))
              AS BIGINT) / 4503599627370496.0 AS u
  FROM cnt
),
noised AS (
  SELECT event_type,
         c + (CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END)
             * (1.0 / {_DP_EPS}) * ln(1.0 - 2.0 * ABS(u - 0.5)) AS noisy
  FROM uni
)
SELECT event_type,
       CAST(GREATEST(round(noisy, 0), 0) AS BIGINT) AS released_count,
       CAST({_DP_EPS} AS DOUBLE) AS epsilon
FROM noised
ORDER BY event_type
"""


@graded("analytics_dp_counts", oracle=_DP_ORACLE)
def analytics_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε=0.5 Laplace-noised per-event-type counts, rounded and clamped
    to ℕ — the standard private count release. One row-scale
    aggregation; the noise is per-CATEGORY work on the metadata-sized
    count table (the md5 uniform stands in for the secure RNG so both
    engines release identical values; the inverse-CDF transform is the
    production mechanism verbatim)."""
    ev = load_table(spark, sf_dir, "events")
    cnt = ev.groupBy("event_type").agg(F.count("*").cast("bigint").alias("c"))
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dp:"), F.col("event_type"))), 1, 13),
            16,
            10,
        ).cast("bigint")
        / 4503599627370496.0
    )
    noisy = F.col("c") + (
        F.when(F.col("u") < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
        * (1.0 / _DP_EPS)
        * F.log(1.0 - 2.0 * F.abs(F.col("u") - 0.5))
    )
    return (
        cnt.withColumn("u", u)
        .select(
            "event_type",
            F.greatest(F.round(noisy, 0), F.lit(0))
            .cast("bigint")
            .alias("released_count"),
            F.lit(_DP_EPS).alias("epsilon"),
        )
        .orderBy("event_type")
    )


# --- Welch's unequal-variance t-test -----------------------------------------------

# Completes the classical readout family (z-proportions in ab_lift,
# CUPED, rank-sum, KS, permutation): Welch's t on the continuous
# per-user spend metric with the Satterthwaite degrees of freedom —
# the default two-sample mean test when arm variances differ. Every
# moment (n, Σx, Σx²) is exact-integer from integer cents; the
# t/dof expressions run on identical-operand doubles in both engines
# (Σx is cast to double BEFORE squaring — the BIGINT square overflows
# at ~1.5e10 total cents). The squared moments Σx² accumulate as
# DECIMAL(38,0), not BIGINT: at ~1e8 users × ~1e7 cents each the sum
# reaches ~1e22, where Spark's non-ANSI long sum wraps silently while
# DuckDB widens to HUGEINT — decimal accumulation keeps both engines
# exact (and identical) to 38 digits, then converts to double once.
_WELCH_ORACLE = """
WITH u AS (
  SELECT user_id, CAST(user_id % 2 AS INTEGER) AS arm,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
              THEN CAST(round(value * 100, 0) AS BIGINT) END), 0) AS BIGINT)
           AS cents
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(SUM(arm) AS BIGINT) AS na,
         CAST(COUNT(*) - SUM(arm) AS BIGINT) AS nb,
         CAST(SUM(arm * cents) AS BIGINT) AS sa,
         CAST(SUM((1 - arm) * cents) AS BIGINT) AS sb,
         CAST(SUM(CAST(arm * cents AS DECIMAL(38,0)) * cents)
              AS DECIMAL(38,0)) AS qa,
         CAST(SUM(CAST((1 - arm) * cents AS DECIMAL(38,0)) * cents)
              AS DECIMAL(38,0)) AS qb
  FROM u
),
v AS (
  SELECT na, nb,
         CAST(sa AS DOUBLE) / na AS ma,
         CAST(sb AS DOUBLE) / nb AS mb,
         (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / na) / (na - 1)
           AS va,
         (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / nb) / (nb - 1)
           AS vb
  FROM m
)
SELECT na, nb,
       ROUND((ma - mb) / 100, 4) AS mean_diff_usd,
       ROUND((ma - mb) / sqrt(va / na + vb / nb), 4) AS t_welch,
       ROUND((va / na + vb / nb) * (va / na + vb / nb)
             / ((va / na) * (va / na) / (na - 1)
                + (vb / nb) * (vb / nb) / (nb - 1)), 1) AS dof
FROM v
"""


@graded("analytics_welch_ttest", oracle=_WELCH_ORACLE)
def analytics_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t between user-parity arms on per-user purchase cents:
    one user collapse, one 6-moment global aggregate, then scalar
    arithmetic — a single scan + user-keyed exchange at any corpus
    size."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100, 0).cast("bigint"),
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("cents")
    ).select((F.col("user_id") % 2).cast("int").alias("arm"), "cents")
    arm, cents = F.col("arm"), F.col("cents")
    m = u.agg(
        F.sum(arm).cast("bigint").alias("na"),
        (F.count("*") - F.sum(arm)).cast("bigint").alias("nb"),
        F.sum(arm * cents).cast("bigint").alias("sa"),
        F.sum((1 - arm) * cents).cast("bigint").alias("sb"),
        F.sum((arm * cents).cast("decimal(38,0)") * cents)
        .cast("decimal(38,0)")
        .alias("qa"),
        F.sum(((1 - arm) * cents).cast("decimal(38,0)") * cents)
        .cast("decimal(38,0)")
        .alias("qb"),
    )
    ma = F.col("sa").cast("double") / F.col("na")
    mb = F.col("sb").cast("double") / F.col("nb")
    va = (
        F.col("qa").cast("double")
        - F.col("sa").cast("double") * F.col("sa") / F.col("na")
    ) / (F.col("na") - 1)
    vb = (
        F.col("qb").cast("double")
        - F.col("sb").cast("double") * F.col("sb") / F.col("nb")
    ) / (F.col("nb") - 1)
    sea = va / F.col("na")
    seb = vb / F.col("nb")
    return m.select(
        "na",
        "nb",
        F.round((ma - mb) / 100, 4).alias("mean_diff_usd"),
        F.round((ma - mb) / F.sqrt(sea + seb), 4).alias("t_welch"),
        F.round(
            (sea + seb) * (sea + seb)
            / (sea * sea / (F.col("na") - 1) + seb * seb / (F.col("nb") - 1)),
            1,
        ).alias("dof"),
    )


# --- experiment power / sample-size analysis ---------------------------------------

# The question asked BEFORE ab_lift's z-test: how many users per arm
# does detecting a +2pp conversion lift take at α=0.05 / power 0.8,
# and is the current traffic already enough? Standard two-proportion
# formula n = (z_{α/2}·√(2p̄q̄) + z_β·√(p₀q₀+p₁q₁))² / δ², everything
# from exact counts except the two z literals (shared text in both
# engines). Pure scalar arithmetic after one user collapse.
_PWR_Z_A = "1.959963984540054"  # z_{0.975}
_PWR_Z_B = "0.8416212335729143"  # z_{0.80}
_PWR_DELTA = "0.02"

_POWER_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' AND value > 200
                  THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(converted) AS BIGINT) AS n_conv
  FROM u
),
p AS (
  SELECT n_users, n_conv,
         CAST(n_conv AS DOUBLE) / n_users AS p0,
         LEAST(CAST(n_conv AS DOUBLE) / n_users + {_PWR_DELTA}, 1.0) AS p1
  FROM m
),
nreq AS (
  SELECT n_users, n_conv, p0, p1,
         CAST(ceil(
           ({_PWR_Z_A} * sqrt(2.0 * ((p0 + p1) / 2.0)
                              * (1.0 - (p0 + p1) / 2.0))
            + {_PWR_Z_B} * sqrt(p0 * (1.0 - p0) + p1 * (1.0 - p1)))
           * ({_PWR_Z_A} * sqrt(2.0 * ((p0 + p1) / 2.0)
                                * (1.0 - (p0 + p1) / 2.0))
              + {_PWR_Z_B} * sqrt(p0 * (1.0 - p0) + p1 * (1.0 - p1)))
           / ({_PWR_DELTA} * {_PWR_DELTA})) AS BIGINT) AS n_required
  FROM p
)
SELECT n_users, ROUND(p0, 6) AS p_baseline, n_required,
       CASE WHEN n_users // 2 >= n_required THEN 1 ELSE 0 END AS powered
FROM nreq
"""


@graded("analytics_power_analysis", oracle=_POWER_ORACLE)
def analytics_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-arm sample size to detect a +2pp conversion lift at
    α=0.05 / power 0.8, from the observed baseline conversion rate —
    plus whether current traffic (split in half) already clears it.
    One user collapse, one 2-moment aggregate, scalar math."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 200), 1
            ).otherwise(0)
        ).alias("converted")
    )
    m = u.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_conv"),
    )
    p0 = F.col("n_conv").cast("double") / F.col("n_users")
    # Clamp the lifted arm at 1.0: a ≥0.98 baseline would otherwise push
    # p1 past 1 and hand sqrt a negative argument — NaN in Spark but an
    # out-of-range ERROR in DuckDB, breaking the cross-engine contract.
    p1 = F.least(p0 + float(_PWR_DELTA), F.lit(1.0))
    pbar = (p0 + p1) / 2.0
    za, zb, delta = float(_PWR_Z_A), float(_PWR_Z_B), float(_PWR_DELTA)
    root = za * F.sqrt(2.0 * pbar * (1.0 - pbar)) + zb * F.sqrt(
        p0 * (1.0 - p0) + p1 * (1.0 - p1)
    )
    n_req = F.ceil(root * root / (delta * delta)).cast("bigint")
    return m.select(
        "n_users",
        F.round(p0, 6).alias("p_baseline"),
        n_req.alias("n_required"),
        F.when(F.expr("n_users DIV 2") >= n_req, 1).otherwise(0).alias("powered"),
    )


# --- EXT: difference-in-differences INFERENCE (SE + t) (r11) -----------------------

# analytics_did_lift (pipelines.py) grades the 2×2 panel cells and the
# DiD point estimate; what it cannot answer is whether the estimate is
# distinguishable from noise. This query completes the readout with
# the pooled-variance standard error and t statistic — the same
# point-estimate-vs-inference split as ab_lift (proportions) vs
# analytics_welch_ttest (means). Same design: user-parity arms, the
# exact midpoint of the observed time range as the switch point
# (integer microseconds — (min+max) DIV 2, exact in both engines),
# per-user purchase cents per period zero-filled via a users ×
# {pre, post} grid (explode(sequence(0,1)) — the ≤32-rule fan-out
# form). The SE pools the four group variances from exact integer
# moments (Σx as BIGINT, Σx² as DECIMAL(38,0) — the same
# overflow-proof recipe as Welch). Plan: one user-period collapse, one
# 10-moment aggregate, scalar arithmetic — a single scan + user-keyed
# exchange at any corpus size.
_DID_SE_ORACLE = """
WITH span AS (
  SELECT CAST((MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS BIGINT) AS cutoff
  FROM events
),
users AS (SELECT DISTINCT user_id FROM events),
grid AS (
  SELECT u.user_id, CAST(u.user_id % 2 AS INTEGER) AS arm, p.period
  FROM users u, (SELECT unnest(range(0, 2)) AS period) p
),
spend AS (
  SELECT e.user_id,
         CASE WHEN epoch_us(e.ts) > s.cutoff THEN 1 ELSE 0 END AS period,
         CAST(SUM(CASE WHEN e.event_type = 'purchase'
                       THEN CAST(round(e.value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS cents
  FROM events e, span s
  GROUP BY 1, 2
),
up AS (
  SELECT g.arm, g.period, COALESCE(sp.cents, 0) AS cents
  FROM grid g
  LEFT JOIN spend sp ON sp.user_id = g.user_id AND sp.period = g.period
),
grp AS (
  SELECT arm, period,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS s,
         CAST(SUM(CAST(cents AS DECIMAL(19,0)) * CAST(cents AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS q
  FROM up GROUP BY arm, period
),
wide AS (
  SELECT
    MAX(CASE WHEN arm = 1 AND period = 0 THEN n END) AS n_t,
    MAX(CASE WHEN arm = 0 AND period = 0 THEN n END) AS n_c,
    MAX(CASE WHEN arm = 1 AND period = 0 THEN s END) AS s_t0,
    MAX(CASE WHEN arm = 1 AND period = 1 THEN s END) AS s_t1,
    MAX(CASE WHEN arm = 0 AND period = 0 THEN s END) AS s_c0,
    MAX(CASE WHEN arm = 0 AND period = 1 THEN s END) AS s_c1,
    MAX(CASE WHEN arm = 1 AND period = 0 THEN q END) AS q_t0,
    MAX(CASE WHEN arm = 1 AND period = 1 THEN q END) AS q_t1,
    MAX(CASE WHEN arm = 0 AND period = 0 THEN q END) AS q_c0,
    MAX(CASE WHEN arm = 0 AND period = 1 THEN q END) AS q_c1
  FROM grp
)
SELECT n_t, n_c,
       ROUND(((CAST(s_t1 AS DOUBLE) / n_t - CAST(s_t0 AS DOUBLE) / n_t)
              - (CAST(s_c1 AS DOUBLE) / n_c - CAST(s_c0 AS DOUBLE) / n_c))
             / 100, 4) AS did_usd,
       ROUND(sqrt(
           ((CAST(q_t0 AS DOUBLE) - CAST(s_t0 AS DOUBLE) * s_t0 / n_t)
              / (n_t - 1)) / n_t
         + ((CAST(q_t1 AS DOUBLE) - CAST(s_t1 AS DOUBLE) * s_t1 / n_t)
              / (n_t - 1)) / n_t
         + ((CAST(q_c0 AS DOUBLE) - CAST(s_c0 AS DOUBLE) * s_c0 / n_c)
              / (n_c - 1)) / n_c
         + ((CAST(q_c1 AS DOUBLE) - CAST(s_c1 AS DOUBLE) * s_c1 / n_c)
              / (n_c - 1)) / n_c) / 100, 4) AS se_usd,
       ROUND(((CAST(s_t1 AS DOUBLE) / n_t - CAST(s_t0 AS DOUBLE) / n_t)
              - (CAST(s_c1 AS DOUBLE) / n_c - CAST(s_c0 AS DOUBLE) / n_c))
             / sqrt(
           ((CAST(q_t0 AS DOUBLE) - CAST(s_t0 AS DOUBLE) * s_t0 / n_t)
              / (n_t - 1)) / n_t
         + ((CAST(q_t1 AS DOUBLE) - CAST(s_t1 AS DOUBLE) * s_t1 / n_t)
              / (n_t - 1)) / n_t
         + ((CAST(q_c0 AS DOUBLE) - CAST(s_c0 AS DOUBLE) * s_c0 / n_c)
              / (n_c - 1)) / n_c
         + ((CAST(q_c1 AS DOUBLE) - CAST(s_c1 AS DOUBLE) * s_c1 / n_c)
              / (n_c - 1)) / n_c), 4) AS t_stat
FROM wide
"""


@graded("analytics_diff_in_diff", oracle=_DID_SE_ORACLE)
def analytics_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DiD pooled-variance SE and t statistic — the inference
    companion to analytics_did_lift's panel cells (rationale above
    the oracle)."""
    ev = load_table(spark, sf_dir, "events")
    mic = F.unix_micros(F.col("ts"))
    span = ev.agg(
        F.expr("(MIN(unix_micros(ts)) + MAX(unix_micros(ts))) DIV 2")
        .cast("long")
        .alias("cutoff")
    )
    users = ev.select("user_id").distinct()
    grid = users.select(
        "user_id",
        (F.col("user_id") % 2).cast("int").alias("arm"),
        F.explode(F.sequence(F.lit(0), F.lit(1))).alias("period"),
    )
    spend = (
        ev.crossJoin(F.broadcast(span))
        .groupBy(
            "user_id",
            F.when(mic > F.col("cutoff"), 1).otherwise(0).alias("period"),
        )
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100, 0).cast("long"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("cents")
        )
    )
    up = grid.join(spend, ["user_id", "period"], "left").select(
        "arm", "period", F.coalesce("cents", F.lit(0)).alias("cents")
    )
    c19 = F.col("cents").cast("decimal(19,0)")
    grp = up.groupBy("arm", "period").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.sum(c19 * c19).cast("decimal(38,0)").alias("q"),
    )

    def pick(col: str, arm: int, period: int):
        return F.max(
            F.when((F.col("arm") == arm) & (F.col("period") == period), F.col(col))
        )

    wide = grp.agg(
        pick("n", 1, 0).alias("n_t"),
        pick("n", 0, 0).alias("n_c"),
        pick("s", 1, 0).alias("s_t0"),
        pick("s", 1, 1).alias("s_t1"),
        pick("s", 0, 0).alias("s_c0"),
        pick("s", 0, 1).alias("s_c1"),
        pick("q", 1, 0).alias("q_t0"),
        pick("q", 1, 1).alias("q_t1"),
        pick("q", 0, 0).alias("q_c0"),
        pick("q", 0, 1).alias("q_c1"),
    )

    def mean(s: str, n: str):
        return F.col(s).cast("double") / F.col(n)

    def var_over_n(q: str, s: str, n: str):
        return (
            (F.col(q).cast("double") - F.col(s).cast("double") * F.col(s) / F.col(n))
            / (F.col(n) - 1)
        ) / F.col(n)

    did = (mean("s_t1", "n_t") - mean("s_t0", "n_t")) - (
        mean("s_c1", "n_c") - mean("s_c0", "n_c")
    )
    se = F.sqrt(
        var_over_n("q_t0", "s_t0", "n_t")
        + var_over_n("q_t1", "s_t1", "n_t")
        + var_over_n("q_c0", "s_c0", "n_c")
        + var_over_n("q_c1", "s_c1", "n_c")
    )
    return wide.select(
        "n_t",
        "n_c",
        F.round(did / 100, 4).alias("did_usd"),
        F.round(se / 100, 4).alias("se_usd"),
        F.round(did / se, 4).alias("t_stat"),
    )


# --- EXT: ridge regression by distributed normal equations (r11) -------------------

# THE scalable pattern for small-width linear models over huge tables:
# one pass accumulates the Gramian X'X and X'y as exact integer
# moments (counts/sums BIGINT, squared/cross moments DECIMAL(38,0) via
# the (19,0)x(19,0) recipe), then the 3x3 ridge system — intercept
# unregularized, lambda on the two feature diagonals — solves by
# Cramer's rule in scalar arithmetic. No iteration, no gradient, one
# shuffle (the per-user collapse); the solve costs O(1) regardless of
# corpus size. The Cramer expressions are SHARED STRINGS evaluated by
# F.expr on the Spark side and spliced into the DuckDB oracle, so both
# engines run the identical IEEE tree on identical double operands.
# Features: per-user event count and active-day count; target: user
# purchase cents.
_RIDGE_LAM = "100.0"

_RIDGE_D_STAGE = f"""
  CAST(n AS DOUBLE) AS a11,
  CAST(s1 AS DOUBLE) AS a12,
  CAST(s2 AS DOUBLE) AS a13,
  CAST(s11 AS DOUBLE) + {_RIDGE_LAM} AS a22,
  CAST(s12 AS DOUBLE) AS a23,
  CAST(s22 AS DOUBLE) + {_RIDGE_LAM} AS a33,
  CAST(sy AS DOUBLE) AS b1,
  CAST(s1y AS DOUBLE) AS b2,
  CAST(s2y AS DOUBLE) AS b3,
  n
"""

_RIDGE_DET = (
    "a11 * (a22 * a33 - a23 * a23)"
    " - a12 * (a12 * a33 - a23 * a13)"
    " + a13 * (a12 * a23 - a22 * a13)"
)
_RIDGE_DET0 = (
    "b1 * (a22 * a33 - a23 * a23)"
    " - a12 * (b2 * a33 - a23 * b3)"
    " + a13 * (b2 * a23 - a22 * b3)"
)
_RIDGE_DET1 = (
    "a11 * (b2 * a33 - a23 * b3)"
    " - b1 * (a12 * a33 - a23 * a13)"
    " + a13 * (a12 * b3 - b2 * a13)"
)
_RIDGE_DET2 = (
    "a11 * (a22 * b3 - b2 * a23)"
    " - a12 * (a12 * b3 - b2 * a13)"
    " + b1 * (a12 * a23 - a22 * a13)"
)

_RIDGE_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS x1,
         CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS x2,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
              THEN CAST(round(value * 100, 0) AS BIGINT) END), 0) AS BIGINT)
           AS y
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x1) AS BIGINT) AS s1,
         CAST(SUM(x2) AS BIGINT) AS s2,
         CAST(SUM(CAST(x1 AS DECIMAL(19,0)) * CAST(x1 AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS s11,
         CAST(SUM(CAST(x1 AS DECIMAL(19,0)) * CAST(x2 AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS s12,
         CAST(SUM(CAST(x2 AS DECIMAL(19,0)) * CAST(x2 AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS s22,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(CAST(x1 AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS s1y,
         CAST(SUM(CAST(x2 AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS s2y
  FROM u
),
d AS (SELECT {_RIDGE_D_STAGE} FROM m)
SELECT n AS n_users,
       CAST({_RIDGE_LAM} AS DOUBLE) AS lambda,
       ROUND(({_RIDGE_DET0}) / ({_RIDGE_DET}), 6) AS beta0,
       ROUND(({_RIDGE_DET1}) / ({_RIDGE_DET}), 6) AS beta1,
       ROUND(({_RIDGE_DET2}) / ({_RIDGE_DET}), 6) AS beta2
FROM d
"""


@graded("analytics_ridge_regression", oracle=_RIDGE_ORACLE)
def analytics_ridge_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge (intercept + 2 features) on per-user spend via
    one-pass exact Gramian moments + Cramer's rule (rationale above)."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("x1"),
        F.countDistinct(F.to_date("ts")).cast("bigint").alias("x2"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100, 0).cast("bigint"),
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("y"),
    )

    def m19(a: str, b: str):
        return F.sum(
            F.col(a).cast("decimal(19,0)") * F.col(b).cast("decimal(19,0)")
        ).cast("decimal(38,0)")

    m = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").cast("bigint").alias("s1"),
        F.sum("x2").cast("bigint").alias("s2"),
        m19("x1", "x1").alias("s11"),
        m19("x1", "x2").alias("s12"),
        m19("x2", "x2").alias("s22"),
        F.sum("y").cast("bigint").alias("sy"),
        m19("x1", "y").alias("s1y"),
        m19("x2", "y").alias("s2y"),
    )
    d = m.selectExpr(*[e.strip() for e in _RIDGE_D_STAGE.split(",\n")])
    return d.selectExpr(
        "n AS n_users",
        f"CAST({_RIDGE_LAM} AS DOUBLE) AS lambda",
        f"ROUND(({_RIDGE_DET0}) / ({_RIDGE_DET}), 6) AS beta0",
        f"ROUND(({_RIDGE_DET1}) / ({_RIDGE_DET}), 6) AS beta1",
        f"ROUND(({_RIDGE_DET2}) / ({_RIDGE_DET}), 6) AS beta2",
    )


# --- EXT: Kaplan–Meier product-limit survival with right censoring (r11) -----------

# Time-to-event with right censoring — the estimator naive conversion
# shares get WRONG when the observation window cuts users short: a
# user first seen five days before the horizon never had 30 days to
# convert. Event = first purchase over $300; users who never convert
# are CENSORED at (horizon - first_seen): they leave the risk set
# without counting as events, and S(t) = prod_{v<=t} (1 - d_v / n_v)
# is the unbiased share still unconverted after t days. The
# product runs as exp(cumsum(ln(1 - d/n))) with per-week ln terms
# quantized to DECIMAL(38,9) (the PSI recipe) so the cumulative sum is
# exact decimal addition in both engines; the day table is
# calendar-sized, so the ordered window is a deliberate manifest-scale
# single group. One user collapse + one day-keyed agg at any corpus.
_KM_ORACLE = """
WITH life AS (
  SELECT user_id,
         MIN(CAST(ts AS DATE)) AS d0,
         MIN(CASE WHEN event_type = 'purchase' AND value > 300
                  THEN CAST(ts AS DATE) END) AS ev_date
  FROM events GROUP BY user_id
),
hz AS (SELECT MAX(CAST(ts AS DATE)) AS horizon FROM events),
u AS (
  SELECT CASE WHEN l.ev_date IS NOT NULL
              THEN CAST(date_diff('day', l.d0, l.ev_date) AS BIGINT)
              ELSE CAST(date_diff('day', l.d0, h.horizon) AS BIGINT)
         END AS wk,
         CASE WHEN l.ev_date IS NULL THEN 1 ELSE 0 END AS censored
  FROM life l, hz h
),
wkagg AS (
  SELECT wk,
         CAST(SUM(1 - censored) AS BIGINT) AS d,
         CAST(SUM(censored) AS BIGINT) AS c
  FROM u GROUP BY wk
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM u),
risk AS (
  SELECT wk, d, c,
         CAST(t.n_total
           - COALESCE(SUM(d + c) OVER (ORDER BY wk
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_risk
  FROM wkagg, tot t
),
terms AS (
  SELECT wk, d, c, n_risk,
         CASE WHEN d < n_risk
              THEN CAST(ln(1.0 - CAST(d AS DOUBLE) / n_risk)
                        AS DECIMAL(38,9))
              ELSE NULL END AS lnterm,
         MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
           OVER (ORDER BY wk ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS absorbed
  FROM risk
)
SELECT wk AS day, n_risk, d AS n_deaths, c AS n_censored,
       CASE WHEN absorbed = 1 THEN 0.0
            ELSE ROUND(exp(CAST(SUM(lnterm) OVER (ORDER BY wk
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DOUBLE)), 4) END AS s_km
FROM terms
ORDER BY wk
"""


@graded("analytics_kaplan_meier", oracle=_KM_ORACLE)
def analytics_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier daily survival over user lifetimes (30-day fixture
    horizon) with final-3-day right censoring (rationale above the oracle). The ordered windows
    run over the week manifest (attach_unit_group — calendar-sized by
    design, never data-sized)."""
    from ..operators import ranks as RK

    ev = load_table(spark, sf_dir, "events")
    life = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 300),
                F.to_date("ts"),
            )
        ).alias("ev_date"),
    )
    hz = ev.agg(F.max(F.to_date("ts")).alias("horizon"))
    u = life.crossJoin(F.broadcast(hz)).select(
        F.when(
            F.col("ev_date").isNotNull(),
            F.datediff(F.col("ev_date"), F.col("d0")).cast("bigint"),
        )
        .otherwise(F.datediff(F.col("horizon"), F.col("d0")).cast("bigint"))
        .alias("wk"),
        F.when(F.col("ev_date").isNull(), 1).otherwise(0).alias("censored"),
    # r14 §2.4: u is consumed twice (the daily census and the at-risk
    # total) and each evaluation re-ran the per-user lifetime collapse
    # over events. User-sized; computed once.
    ).localCheckpoint(eager=False)
    wkagg = u.groupBy("wk").agg(
        F.sum(1 - F.col("censored")).cast("bigint").alias("d"),
        F.sum("censored").cast("bigint").alias("c"),
    )
    tot = u.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    w_prev = (
        Window.partitionBy(RK.UNIT_GROUP)
        .orderBy("wk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cur = (
        Window.partitionBy(RK.UNIT_GROUP)
        .orderBy("wk")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    risk = (
        RK.attach_unit_group(wkagg.crossJoin(F.broadcast(tot)))
        .withColumn(
            "n_risk",
            F.col("n_total")
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)
            ),
        )
    )
    lnterm = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(1.0 - F.col("d").cast("double") / F.col("n_risk")).cast(
            "decimal(38,9)"
        ),
    )
    absorbed = F.max(
        F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
    ).over(w_cur)
    terms = risk.withColumn("lnterm", lnterm).withColumn("absorbed", absorbed)
    return terms.select(
        F.col("wk").alias("day"),
        "n_risk",
        F.col("d").alias("n_deaths"),
        F.col("c").alias("n_censored"),
        F.when(F.col("absorbed") == 1, F.lit(0.0))
        .otherwise(
            F.round(F.exp(F.sum("lnterm").over(w_cur).cast("double")), 4)
        )
        .alias("s_km"),
    ).orderBy("wk")


# --- EXT: sequential probability ratio test (SPRT) early stopping (r11) ------------

# The missing piece of the experiment family: fixed-horizon tests
# (z / CUPED / Welch / permutation) answer "is there an effect at n";
# the SPRT answers "how early could we have STOPPED". Observations
# (per-user conversion, the ab_lift definition) are ordered by the
# stable user_id; because the per-outcome log-likelihood increments
# are the two CONSTANTS ln(p1/p0) and ln((1-p1)/(1-p0)), the running
# LLR is the CLOSED FORM conv_t*C1 + (n_t - conv_t)*C0 over exact
# cumulative integer counts — no floating cumsum anywhere, so the
# whole path is engine-exact. The cumulative counts come from the
# distributed global_rank_and_cumsum builder (range-partitioned, no
# single-task window), Wald bounds ln((1-beta)/alpha), ln(beta/
# (1-alpha)) at alpha=0.05 / beta=0.2 are Python-computed literals
# shared by both engines. Output: the decision, how many observations
# it took vs the full horizon, and the LLR at the boundary crossing.
_SPRT_P0 = "0.30"
_SPRT_P1 = "0.35"
_SPRT_C1 = repr(_math.log(0.35 / 0.30))  # per-conversion increment
_SPRT_C0 = repr(_math.log(0.65 / 0.70))  # per-non-conversion increment
_SPRT_UPPER = repr(_math.log((1.0 - 0.2) / 0.05))  # accept H1
_SPRT_LOWER = repr(_math.log(0.2 / (1.0 - 0.05)))  # accept H0

_SPRT_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' AND value > 200
                  THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
seq AS (
  SELECT user_id, converted,
         ROW_NUMBER() OVER (ORDER BY user_id) AS rn,
         CAST(SUM(converted) OVER (ORDER BY user_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS conv_t
  FROM u
),
llrs AS (
  SELECT rn, conv_t,
         conv_t * CAST({_SPRT_C1} AS DOUBLE)
           + (rn - conv_t) * CAST({_SPRT_C0} AS DOUBLE) AS llr
  FROM seq
),
cr AS (
  SELECT MIN(CASE WHEN llr >= CAST({_SPRT_UPPER} AS DOUBLE)
                    OR llr <= CAST({_SPRT_LOWER} AS DOUBLE)
                  THEN rn END) AS rn_dec
  FROM llrs
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM u)
SELECT t.n_total,
       CAST(cr.rn_dec AS BIGINT) AS n_at_decision,
       ROUND(l.llr, 6) AS llr_at_decision,
       CASE WHEN l.llr >= CAST({_SPRT_UPPER} AS DOUBLE) THEN 'accept_h1'
            WHEN l.llr <= CAST({_SPRT_LOWER} AS DOUBLE) THEN 'accept_h0'
            ELSE 'continue' END AS decision,
       ROUND(CAST({_SPRT_UPPER} AS DOUBLE), 6) AS upper_bound,
       ROUND(CAST({_SPRT_LOWER} AS DOUBLE), 6) AS lower_bound
FROM cr
LEFT JOIN llrs l ON l.rn = cr.rn_dec, tot t
"""


@graded("analytics_sprt_boundary", oracle=_SPRT_ORACLE)
def analytics_sprt_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT (H0 p=0.30 vs H1 p=0.35, alpha=0.05, beta=0.2) over
    user-ordered conversions: decision, stopping index, boundary LLR
    (rationale above the oracle). The ordered scan is the distributed
    global_rank_and_cumsum — never a single-task window."""
    from ..operators.ranks import global_rank_and_cumsum

    ev = load_table(spark, sf_dir, "events")
    # r14 §2.4: u is consumed twice (the ordered scan and the total)
    # and llrs twice (the decision index and the boundary readout) —
    # unmaterialized, the whole distributed rank+cumsum pipeline ran
    # twice. Both frames are user-sized; computed once each.
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 200), 1
            ).otherwise(0)
        ).alias("converted")
    ).localCheckpoint(eager=False)
    seq = global_rank_and_cumsum(
        u, ["user_id"], "converted", rank_out="rn", cum_out="conv_t"
    )
    llrs = seq.select(
        "rn",
        F.col("conv_t").cast("bigint").alias("conv_t"),
    ).withColumn(
        "llr",
        F.col("conv_t") * float(_SPRT_C1)
        + (F.col("rn") - F.col("conv_t")) * float(_SPRT_C0),
    ).localCheckpoint(eager=False)
    up, lo = float(_SPRT_UPPER), float(_SPRT_LOWER)
    cr = llrs.agg(
        F.min(
            F.when((F.col("llr") >= up) | (F.col("llr") <= lo), F.col("rn"))
        ).alias("rn_dec")
    )
    tot = u.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    return (
        cr.join(llrs, cr["rn_dec"] == llrs["rn"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "n_total",
            F.col("rn_dec").cast("bigint").alias("n_at_decision"),
            F.round("llr", 6).alias("llr_at_decision"),
            F.when(F.col("llr") >= up, "accept_h1")
            .when(F.col("llr") <= lo, "accept_h0")
            .otherwise("continue")
            .alias("decision"),
            F.round(F.lit(up).cast("double"), 6).alias("upper_bound"),
            F.round(F.lit(lo).cast("double"), 6).alias("lower_bound"),
        )
    )


# --- EXT: longest activity streaks (gaps-and-islands) (r11) -------------------------

# Engagement's classic shape: how many CONSECUTIVE days has each user
# been active, and how are longest streaks distributed? The
# gaps-and-islands trick makes it two hash aggregations instead of any
# self-join: within a user, consecutive dates and consecutive row
# numbers advance in lockstep, so date - row_number is CONSTANT inside
# a streak and the constant (the anchor date) is the island key.
# All integer/date arithmetic, exact in both engines. Plan: distinct
# (user, day) collapse -> per-user day window -> island-keyed count ->
# per-user max -> 1-pass histogram; every exchange is user-keyed.
_STREAKS_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
isl AS (
  SELECT user_id,
         d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                  AS INTEGER) AS anchor
  FROM days
),
streaks AS (
  SELECT user_id, anchor, CAST(COUNT(*) AS BIGINT) AS len
  FROM isl GROUP BY user_id, anchor
),
longest AS (
  SELECT user_id, MAX(len) AS max_streak,
         CAST(COUNT(*) AS BIGINT) AS n_streaks
  FROM streaks GROUP BY user_id
)
SELECT max_streak AS streak_days,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(CAST(SUM(CAST(n_streaks AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 4) AS avg_streaks_per_user
FROM longest
GROUP BY max_streak
ORDER BY streak_days
"""


@graded("analytics_activity_streaks", oracle=_STREAKS_ORACLE)
def analytics_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of users' longest consecutive-day activity streaks
    via the gaps-and-islands constant (rationale above the oracle)."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("d"))
    isl = days.withColumn("rn", rn).select(
        "user_id", F.expr("date_sub(d, rn)").alias("anchor")
    )
    streaks = isl.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).cast("bigint").alias("len")
    )
    longest = streaks.groupBy("user_id").agg(
        F.max("len").alias("max_streak"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
    )
    return (
        longest.groupBy(F.col("max_streak").alias("streak_days"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.round(
                F.sum(F.col("n_streaks").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_streaks_per_user"),
        )
        .orderBy("streak_days")
    )


# --- EXT: Benjamini-Hochberg FDR over the per-source test family (r12) ---------------

# The multiple-comparisons closer for the classical readout family:
# with one Welch test PER SOURCE ("does this source's doc length
# differ from the rest of the corpus?"), 20 tests at alpha = 0.05
# expect a false positive; BH step-up controls the false-discovery
# rate instead. p-values use the Abramowitz-Stegun 7.1.26 erfc
# polynomial (|err| <= 1.5e-7) written with IDENTICAL expression text
# in both engines — every operand (Horner polynomial, exp(-x^2),
# shared literals) is the same IEEE op sequence, so the step-up
# comparisons agree bit-for-bit and no normal-quantile table or
# catalog-size hardcode is needed (m comes from the data). Plan: one
# doc-sized census (3 exact moments per source, squared moments
# DECIMAL(38,0) per the Welch recipe), then everything is
# source-manifest-sized: a 1-row corpus-totals attach, a manifest
# rank window, the step-up cutoff as a manifest MAX window.
_FDR_ALPHA = "0.05"

_FDR_ERFC = (
    "((((1.061405429 * {t} + -1.453152027) * {t} + 1.421413741) * {t}"
    " + -0.284496736) * {t} + 0.254829592) * {t} * EXP(-({x}) * ({x}))"
)

_FDR_BH_ORACLE = f"""
WITH tokc AS (
  SELECT source, CAST(LEN(string_split(text, ' ')) AS BIGINT) AS tok
  FROM documents
),
src AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(tok) AS BIGINT) AS s,
         CAST(SUM(CAST(tok AS DECIMAL(38,0)) * tok) AS DECIMAL(38,0)) AS q
  FROM tokc GROUP BY source
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_tot,
         CAST(SUM(s) AS BIGINT) AS s_tot,
         CAST(SUM(q) AS DECIMAL(38,0)) AS q_tot
  FROM src
),
z AS (
  SELECT source, n,
         (CAST(s AS DOUBLE) / n - CAST(s_tot - s AS DOUBLE) / (n_tot - n))
         / sqrt(
             ((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)) / n
             + ((CAST(q_tot - q AS DOUBLE)
                 - CAST(s_tot - s AS DOUBLE) * (s_tot - s) / (n_tot - n))
                / (n_tot - n - 1)) / (n_tot - n)
           ) AS zval
  FROM src, tot
),
p AS (
  SELECT source, n, zval,
         {_FDR_ERFC.format(t="(1.0 / (1.0 + 0.3275911 * (abs(zval) / sqrt(2.0))))", x="abs(zval) / sqrt(2.0)")} AS pval
  FROM z
),
ranked AS (
  SELECT source, n, zval, pval,
         ROW_NUMBER() OVER (ORDER BY pval, source) AS rnk,
         CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM p
),
cut AS (
  SELECT *,
         CAST(rnk AS DOUBLE) * CAST({_FDR_ALPHA} AS DOUBLE) / m AS bh_crit,
         MAX(CASE WHEN pval <= CAST(rnk AS DOUBLE)
                               * CAST({_FDR_ALPHA} AS DOUBLE) / m
                  THEN rnk END) OVER () AS kstar
  FROM ranked
)
SELECT source, n AS n_docs, CAST(rnk AS BIGINT) AS rnk,
       ROUND(zval, 4) AS z_welch,
       ROUND(pval, 6) AS p_value,
       ROUND(bh_crit, 6) AS bh_crit,
       rnk <= COALESCE(kstar, 0) AS rejected
FROM cut
ORDER BY rnk
"""


@graded("analytics_fdr_bh", oracle=_FDR_BH_ORACLE)
def analytics_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BH step-up FDR control over per-source Welch z-tests of doc
    length vs the rest of the corpus (rationale above the oracle)."""
    from ..operators import ranks as RK
    from ..session import load_table

    docs = load_table(spark, sf_dir, "documents")
    tokc = docs.select(
        "source", F.size(F.split("text", " ")).cast("bigint").alias("tok")
    )
    src = tokc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("tok").cast("bigint").alias("s"),
        F.sum(F.col("tok").cast("decimal(38,0)") * F.col("tok"))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    tot = src.agg(
        F.sum("n").cast("bigint").alias("n_tot"),
        F.sum("s").cast("bigint").alias("s_tot"),
        F.sum("q").cast("decimal(38,0)").alias("q_tot"),
    )
    zdf = src.crossJoin(F.broadcast(tot)).select(  # 1-row totals attach
        "source",
        "n",
        F.expr(
            "(CAST(s AS DOUBLE) / n - CAST(s_tot - s AS DOUBLE) / (n_tot - n))"
            " / sqrt("
            "   ((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)) / n"
            "   + ((CAST(q_tot - q AS DOUBLE)"
            "       - CAST(s_tot - s AS DOUBLE) * (s_tot - s) / (n_tot - n))"
            "      / (n_tot - n - 1)) / (n_tot - n)"
            " )"
        ).alias("zval"),
    )
    pdf = zdf.withColumn(
        "pval",
        F.expr(
            _FDR_ERFC.format(
                t="(1.0 / (1.0 + 0.3275911 * (abs(zval) / sqrt(2.0))))",
                x="abs(zval) / sqrt(2.0)",
            )
        ),
    )
    w = Window.partitionBy(RK.UNIT_GROUP)
    ranked = (
        RK.attach_unit_group(pdf)
        .withColumn(
            "rnk", F.row_number().over(w.orderBy("pval", "source"))
        )
        .withColumn("m", F.count(F.lit(1)).over(w).cast("bigint"))
    )
    crit = F.expr(f"CAST(rnk AS DOUBLE) * CAST({_FDR_ALPHA} AS DOUBLE) / m")
    cut = ranked.withColumn("bh_crit", crit).withColumn(
        "kstar",
        F.max(F.when(F.col("pval") <= crit, F.col("rnk"))).over(w),
    )
    return cut.select(
        "source",
        F.col("n").alias("n_docs"),
        F.col("rnk").cast("bigint").alias("rnk"),
        F.round("zval", 4).alias("z_welch"),
        F.round("pval", 6).alias("p_value"),
        F.round("bh_crit", 6).alias("bh_crit"),
        (F.col("rnk") <= F.coalesce(F.col("kstar"), F.lit(0))).alias(
            "rejected"
        ),
    ).orderBy("rnk")


# --- EXT: minimum-detectable-effect vs traffic curve (r13) ---------------------------

# analytics_power_analysis answers "is current traffic enough for a
# +2pp lift?" at one point; the planning conversation actually runs
# the other way — "what CAN we detect at 1x/2x/4x/8x of today's
# traffic, and is the runway worth it?". The equal-variance MDE
# approximation delta = (z_a + z_b) * sqrt(2 p0 (1-p0) / n_arm) prices
# each traffic multiple from the SAME observed baseline census as the
# power query (identical user collapse), so the two instruments can't
# drift. One 1-row census x a 4-row broadcast ladder; sqrt is
# safe shared-libm, the two z constants are shared literal text, and
# every MDE is transcendental (no ROUND-tie class).
_MDE_MULTIPLES = [1, 2, 4, 8]

_MDE_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' AND value > 200
                  THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(converted) AS BIGINT) AS n_conv
  FROM u
),
ladder AS (
  SELECT CAST(unnest([{", ".join(str(v) for v in _MDE_MULTIPLES)}])
              AS BIGINT) AS traffic_multiple
)
SELECT l.traffic_multiple,
       CAST(m.n_users // 2 * l.traffic_multiple AS BIGINT) AS n_per_arm,
       ROUND(m.n_conv * 1.0 / m.n_users, 6) AS p_baseline,
       ROUND(({_PWR_Z_A} + {_PWR_Z_B})
             * sqrt(2.0 * (m.n_conv * 1.0 / m.n_users)
                    * (1.0 - m.n_conv * 1.0 / m.n_users)
                    / (m.n_users // 2 * l.traffic_multiple)), 6) AS mde_abs,
       ROUND(({_PWR_Z_A} + {_PWR_Z_B})
             * sqrt(2.0 * (m.n_conv * 1.0 / m.n_users)
                    * (1.0 - m.n_conv * 1.0 / m.n_users)
                    / (m.n_users // 2 * l.traffic_multiple))
             / (m.n_conv * 1.0 / m.n_users), 6) AS mde_rel
FROM ladder l, m
ORDER BY l.traffic_multiple
"""


@graded("analytics_mde_curve", oracle=_MDE_ORACLE)
def analytics_mde_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable absolute/relative conversion lift at
    alpha=0.05 / power 0.8 per traffic multiple {1,2,4,8} — the
    experiment-runway planning curve off the same baseline census as
    analytics_power_analysis (rationale above the oracle)."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 200), 1
            ).otherwise(0)
        ).alias("converted")
    )
    m = u.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_conv"),
    )
    ladder = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(v).cast("bigint") for v in _MDE_MULTIPLES])
        ).alias("traffic_multiple")
    )
    za, zb = float(_PWR_Z_A), float(_PWR_Z_B)
    p0 = F.col("n_conv") * 1.0 / F.col("n_users")
    n_arm = F.expr("n_users DIV 2") * F.col("traffic_multiple")
    mde = (za + zb) * F.sqrt(2.0 * p0 * (1.0 - p0) / n_arm)
    return (
        ladder.crossJoin(F.broadcast(m))  # 1-row census attach
        .select(
            "traffic_multiple",
            n_arm.cast("bigint").alias("n_per_arm"),
            F.round(p0, 6).alias("p_baseline"),
            F.round(mde, 6).alias("mde_abs"),
            F.round(mde / p0, 6).alias("mde_rel"),
        )
        .orderBy("traffic_multiple")
    )


# --- EXT: Theil inequality index with between/within decomposition (r13) ------------

# The Gini row summarizes spend inequality with one number; Theil's T
# is the inequality measure that DECOMPOSES exactly — T_total =
# T_between + T_within over any partition — so it answers the next
# question: is customer-spend concentration a cross-segment story
# (some market segments simply buy more) or an in-segment one (whales
# inside each segment)? Weights collapse to exact integer mass ratios
# (N_g*mu_g / (N*mu) = S_g/S on cent sums), every ln term is
# decimal(38,9)-quantized before its sum (the Zipf recipe), and the
# segment stage is catalog-sized (5 rows). Plan: one customer
# collapse, one segment census, one 1-row totals attach, three
# quantized sums — a single scan + customer-keyed exchange at any
# corpus; the exact decomposition identity is pinned in tests.
_THEIL_ORACLE = """
WITH spend AS (
  SELECT c.c_mktsegment AS segment,
         CAST(SUM(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY o.o_custkey, c.c_mktsegment
),
pos AS (SELECT segment, cents FROM spend WHERE cents > 0),
seg AS (
  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(cents) AS BIGINT) AS s_g
  FROM pos GROUP BY segment
),
tot AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(SUM(s_g) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n_segments
  FROM seg
),
tterm AS (
  SELECT CAST(SUM(CAST((p.cents / (t.s * 1.0 / t.n))
                       * ln(p.cents / (t.s * 1.0 / t.n))
                       AS DECIMAL(38,9))) AS DOUBLE) AS st
  FROM pos p, tot t
),
wseg AS (
  SELECT p.segment,
         CAST(SUM(CAST((p.cents / (g.s_g * 1.0 / g.n_g))
                       * ln(p.cents / (g.s_g * 1.0 / g.n_g))
                       AS DECIMAL(38,9))) AS DOUBLE) AS st_g
  FROM pos p JOIN seg g ON g.segment = p.segment
  GROUP BY p.segment
),
parts AS (
  SELECT CAST(SUM(CAST((g.s_g * 1.0 / t.s) * (w.st_g / g.n_g)
                       AS DECIMAL(38,9))) AS DOUBLE) AS t_within,
         CAST(SUM(CAST((g.s_g * 1.0 / t.s)
                       * ln((g.s_g * 1.0 / g.n_g) / (t.s * 1.0 / t.n))
                       AS DECIMAL(38,9))) AS DOUBLE) AS t_between
  FROM seg g JOIN wseg w ON w.segment = g.segment, tot t
)
SELECT t.n AS n_customers, t.n_segments,
       ROUND(x.st / t.n, 6) AS theil_total,
       ROUND(p.t_between, 6) AS theil_between,
       ROUND(p.t_within, 6) AS theil_within
FROM tot t, tterm x, parts p
"""


@graded("analytics_theil_index", oracle=_THEIL_ORACLE)
def analytics_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T of per-customer spend with its exact between/within
    market-segment decomposition (rationale above the oracle)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    spend = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy("o_custkey", F.col("c_mktsegment").alias("segment"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
        .where(F.col("cents") > 0)
        .select("segment", "cents")
        # r14 §2.4: spend is consumed three times (seg census, total
        # term, within-segment term) and each evaluation re-ran the
        # orders⋈customer aggregation — three fact-table passes. The
        # frame is customer-cardinality (segment, cents); the lazy
        # checkpoint computes it once.
        .localCheckpoint(eager=False)
    )
    seg = spend.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("cents").cast("bigint").alias("s_g"),
    )
    tot = seg.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
    )
    mu = F.col("s") * 1.0 / F.col("n")
    tterm = (
        spend.crossJoin(F.broadcast(tot))  # 1-row totals attach
        .select(
            ((F.col("cents") / mu) * F.log(F.col("cents") / mu)).alias("term")
        )
        .agg(F.sum(F.col("term").cast("decimal(38,9)")).cast("double").alias("st"))
    )
    mu_g = F.col("s_g") * 1.0 / F.col("n_g")
    wseg = (
        spend.join(F.broadcast(seg), "segment")
        .select(
            "segment",
            ((F.col("cents") / mu_g) * F.log(F.col("cents") / mu_g)).alias(
                "term_g"
            ),
        )
        .groupBy("segment")
        .agg(
            F.sum(F.col("term_g").cast("decimal(38,9)"))
            .cast("double")
            .alias("st_g")
        )
    )
    parts = (
        seg.join(wseg, "segment")
        .crossJoin(F.broadcast(tot))  # 1-row totals attach
        .select(
            ((F.col("s_g") * 1.0 / F.col("s")) * (F.col("st_g") / F.col("n_g")))
            .alias("w_term"),
            (
                (F.col("s_g") * 1.0 / F.col("s"))
                * F.log(mu_g / (F.col("s") * 1.0 / F.col("n")))
            ).alias("b_term"),
        )
        .agg(
            F.sum(F.col("w_term").cast("decimal(38,9)"))
            .cast("double")
            .alias("t_within"),
            F.sum(F.col("b_term").cast("decimal(38,9)"))
            .cast("double")
            .alias("t_between"),
        )
    )
    return (
        tot.crossJoin(F.broadcast(tterm))
        .crossJoin(F.broadcast(parts))
        .select(
            F.col("n").alias("n_customers"),
            "n_segments",
            F.round(F.col("st") / F.col("n"), 6).alias("theil_total"),
            F.round("t_between", 6).alias("theil_between"),
            F.round("t_within", 6).alias("theil_within"),
        )
    )
