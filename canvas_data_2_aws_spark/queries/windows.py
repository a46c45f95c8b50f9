"""Window functions (SURVEY §2.5 W1–W5).

Every window orderBy ends with a unique key (event_id / o_orderkey) —
rank and offset functions are otherwise tie-nondeterministic across
engines (SURVEY §8.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators import ranks as R
from ..registry import graded
from ..session import load_table

# --- W1/W2: ranking + top-k per group -----------------------------------------

_TOPK_GROUP_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS rn
  FROM orders
) t
WHERE rn <= 3
"""


@graded("window_topk_per_group", oracle=_TOPK_GROUP_ORACLE)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: rank-then-filter, written so Spark's
    WindowGroupLimit rule (≥3.5) prunes per-partition heaps instead of
    fully sorting every customer's orders."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


# --- W3/W5: lag/lead offsets + first/last with explicit frame -------------------

_LAG_ORACLE = """
SELECT
  user_id,
  event_id,
  event_type,
  value,
  LAG(value, 1) OVER w AS prev_value,
  value - LAG(value, 1) OVER w AS delta,
  LEAD(event_type, 1) OVER w AS next_type,
  FIRST_VALUE(event_id) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
  ) AS first_event_id,
  LAST_VALUE(event_id) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
  ) AS last_event_id
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@graded("window_lag_delta", oracle=_LAG_ORACLE)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event deltas (lag/lead) + first/last event ids.

    first/last use an explicit unbounded frame — the default frame
    stops at CURRENT ROW, which silently breaks last_value (SURVEY
    §2.5 W5).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.lag("value", 1).over(w).alias("prev_value"),
        (F.col("value") - F.lag("value", 1).over(w)).alias("delta"),
        F.lead("event_type", 1).over(w).alias("next_type"),
        F.first("event_id").over(w_full).alias("first_event_id"),
        F.last("event_id").over(w_full).alias("last_event_id"),
    )


# --- W4: frame aggregates (running sum) ------------------------------------------

_RUNNING_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS DOUBLE) AS running_spend,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
  ) AS DOUBLE) / COUNT(*) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
  ) AS moving_avg3
FROM orders
"""


@graded("window_running_sum", oracle=_RUNNING_ORACLE)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running + moving-window aggregates with explicit ROWS frames.

    Sums run in DECIMAL(18,6) so per-frame accumulation is exact in
    both engines. Moving avg is decimal-sum ÷ frame-count as doubles —
    native DECIMAL AVG picks different intermediate scales per engine
    (last-ulp drift, measured).
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dec = F.col("o_totalprice").cast("decimal(18,6)")
    frame3 = w.rowsBetween(-2, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_spend"),
        (F.sum(dec).over(frame3).cast("double") / F.count("*").over(frame3)).alias(
            "moving_avg3"
        ),
    )


# --- W4 completion: value-range frame (interval window) -------------------------

_RANGE_FRAME_ORACLE = """
SELECT event_id, user_id,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS hour_cents
FROM events
"""


@graded("window_range_frame", oracle=_RANGE_FRAME_ORACLE)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-hour rolling sum via a RANGE frame (value-based, not
    row-count-based — peers with equal timestamps share a frame, which
    is why range frames stay deterministic under ties). Order key is
    integer µs, the summand integer cents: exact in any engine."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return ev.select(
        "event_id", "user_id", F.sum(cents).over(w).alias("hour_cents")
    )


# --- EXT: finite-impulse-response weighted moving average -----------------------

# Linear-decay 6-tap FIR written as an explicit lag chain: both engines
# evaluate the identical left-associated IEEE expression on identical
# operands, so the unrounded doubles hash-match (no ROUND needed —
# rounding near-ties would be riskier than none). Rows without a full
# 6-deep history are excluded via row_number, same filter both sides.
_WMA_ORACLE = """
SELECT user_id, event_id, ts,
       (6 * value
        + 5 * lag(value, 1) OVER w
        + 4 * lag(value, 2) OVER w
        + 3 * lag(value, 3) OVER w
        + 2 * lag(value, 4) OVER w
        + 1 * lag(value, 5) OVER w) / 21 AS wma6
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
QUALIFY row_number() OVER w > 5
"""


@graded("window_weighted_ma", oracle=_WMA_ORACLE)
def window_weighted_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-tap linear-decay weighted moving average per user — the FIR
    smoothing primitive (EWMA's bounded-memory cousin; a true EWMA is
    an infinite recurrence and not expressible as a frame aggregate).
    One window shuffle serves all six lags and the row_number."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wma = (
        F.col("value") * 6
        + F.lag("value", 1).over(w) * 5
        + F.lag("value", 2).over(w) * 4
        + F.lag("value", 3).over(w) * 3
        + F.lag("value", 4).over(w) * 2
        + F.lag("value", 5).over(w) * 1
    ) / 21
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("wma6", wma)
        .where(F.col("rn") > 5)
        .select("user_id", "event_id", "ts", "wma6")
    )


# --- W2 with ties: rank-based top-k (keeps all tied rows) -----------------------

# row_number top-k needs a total tie-break (SURVEY §8.4); the
# rank-with-ties form is the OTHER deterministic spelling — the result
# SET is well-defined under ties because every tied row is kept.
_TOPK_TIES_ORACLE = """
SELECT o_orderpriority, o_orderkey, o_totalprice, rnk
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         RANK() OVER (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice DESC) AS rnk
  FROM orders
) t
WHERE rnk <= 3
"""


@graded("window_topk_ties", oracle=_TOPK_TIES_ORACLE)
def window_topk_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 order prices per priority INCLUDING ties: rank() without
    a unique tie-break is still hash-safe because tied rows are all
    emitted, never chosen between. WindowGroupLimit prunes per
    partition exactly as in the row_number form."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).cast("long").alias("rnk"),
        )
        .where(F.col("rnk") <= 3)
    )


# --- W5 explicit: first_value / last_value / nth_value --------------------------

# Full-partition frame everywhere: the default window frame stops at
# the CURRENT row, which silently breaks last_value/nth_value — the
# classic window bug, pinned here with the correct explicit frame.
_VALUE_FNS_ORACLE = """
SELECT o_orderkey, o_orderpriority,
       first_value(o_orderkey) OVER w AS first_key,
       last_value(o_orderkey)  OVER w AS last_key,
       nth_value(o_orderkey, 3) OVER w AS third_key
FROM orders
WHERE o_orderkey % 16 = 0
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


@graded("window_value_functions", oracle=_VALUE_FNS_ORACLE)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value with the explicit full-partition frame
    (ordering ends on the unique PK per SURVEY §8.4)."""
    o = load_table(spark, sf_dir, "orders").where("o_orderkey % 16 = 0")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w).alias("last_key"),
        F.nth_value("o_orderkey", 3).over(w).alias("third_key"),
    )


# --- gaps-and-islands: consecutive-run detection --------------------------------

_GAPS_ISLANDS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn_all,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn_type
  FROM events
),
islands AS (
  SELECT user_id, event_type, rn_all - rn_type AS grp,
         COUNT(*) AS streak
  FROM seq GROUP BY user_id, event_type, grp
)
SELECT user_id, event_type,
       COUNT(*) AS n_islands,
       CAST(MAX(streak) AS BIGINT) AS max_streak,
       CAST(SUM(streak) AS BIGINT) AS n_events
FROM islands
GROUP BY user_id, event_type
"""


@graded("window_gaps_islands", oracle=_GAPS_ISLANDS_ORACLE)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: runs of consecutive same-type events per user
    via the two-row_number difference trick (the streak / uptime /
    consecutive-day primitive). Both windows share one partition-by-
    user sort prefix, so Catalyst evaluates them in a single exchange
    + sort per user partition; ordering ends on the unique event_id
    (SURVEY §8.4)."""
    ev = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    seq = ev.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias(
            "grp"
        ),
    )
    islands = seq.groupBy("user_id", "event_type", "grp").agg(
        F.count("*").alias("streak")
    )
    return islands.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n_islands"),
        F.max("streak").alias("max_streak"),
        F.sum("streak").alias("n_events"),
    )


# --- running distinct count over a window ---------------------------------------

_RUNNING_DISTINCT_ORACLE = """
SELECT event_id, user_id,
       CAST(COUNT(DISTINCT event_type) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS INTEGER) AS n_types_seen
FROM events
"""


@graded("window_distinct_running", oracle=_RUNNING_DISTINCT_ORACLE)
def window_distinct_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-count per user (how many event types has this
    user touched so far — the engagement-breadth signal). Spark has no
    DISTINCT window aggregate; the equivalent is
    ``size(collect_set() OVER w)``, which keeps one hash set per
    (user, frame) in the window operator. Bounded: the set holds
    distinct event TYPES (small domain), not rows — the trick is only
    safe when the distinct domain is bounded, which is exactly when a
    running distinct count is meaningful."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).alias("n_types_seen"),
    )


# --- rolling median over a trailing frame ---------------------------------------

# Exact rolling median in integer cents: both engines collect the
# trailing 7-value frame, sort it, and interpolate the middle in cent
# space — (a+b)/2.0 on integers is IEEE-exact, so the double output
# grades unrounded (the robust-stats recipe applied to a moving frame).
_ROLLING_MEDIAN_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY d
),
framed AS (
  SELECT d, cents,
         list_sort(list(cents) OVER (
           ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS f
  FROM daily
)
SELECT d, cents,
       CASE WHEN LEN(f) % 2 = 1
            THEN CAST(f[(LEN(f) + 1) // 2] AS DOUBLE) / 100.0
            ELSE (CAST(f[LEN(f) // 2] AS DOUBLE)
                  + CAST(f[LEN(f) // 2 + 1] AS DOUBLE)) / 2.0 / 100.0
       END AS rolling_median
FROM framed
"""


@graded("window_rolling_median", oracle=_ROLLING_MEDIAN_ORACLE)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day median of daily revenue: collect_list over a ROWS
    frame + array_sort + middle pick — the robust rolling statistic
    SQL windows lack natively. Frame size is a constant, so per-row
    cost is O(7 log 7) and the state never grows; at 100 TB the window
    partitions by series key exactly like the interpolation spine."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents")
    )
    w = (
        Window.partitionBy(R.UNIT_GROUP)  # daily aggregate: calendar-sized
        .orderBy("d")
        .rowsBetween(-6, 0)
    )
    framed = R.attach_unit_group(daily).withColumn("f", F.array_sort(F.collect_list("cents").over(w)))
    n = F.size("f")
    odd = F.element_at("f", ((n + 1) / 2).cast("int")).cast("double") / 100.0
    even = (
        F.element_at("f", (n / 2).cast("int")).cast("double")
        + F.element_at("f", (n / 2 + 1).cast("int")).cast("double")
    ) / 2.0 / 100.0
    return framed.select(
        "d",
        "cents",
        F.when(n % 2 == 1, odd).otherwise(even).alias("rolling_median"),
    )


# --- EXT: rolling z-score anomaly flags ----------------------------------------

# The trailing-20 frame statistics come from exact BIGINT power sums of
# integer cents (cents ≤ ~10^5 → Σx² over 20 rows ≪ 2^63), so mean and
# sample variance are closed-form doubles over identical operands in
# both engines; the z-score then runs the same IEEE op sequence →
# bit-identical before ROUND(,4). Rows without a full 20-row history
# are excluded by row_number, same filter both sides.
_ANOMALY_ORACLE = """
WITH framed AS (
  SELECT event_id, user_id,
         CAST(round(value * 100, 0) AS BIGINT) AS cents,
         SUM(CAST(round(value * 100, 0) AS BIGINT)) OVER w20 AS sx,
         SUM(CAST(round(value * 100, 0) AS BIGINT)
             * CAST(round(value * 100, 0) AS BIGINT)) OVER w20 AS sxx,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
  WINDOW w20 AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id,
       ROUND((cents - sx / 20.0)
             / sqrt((sxx - sx * sx / 20.0) / 19.0), 4) AS z,
       (abs((cents - sx / 20.0)
            / sqrt((sxx - sx * sx / 20.0) / 19.0)) > 2.0) AS is_anomaly
FROM framed
WHERE rn >= 20
"""


@graded("timeseries_anomaly_zscore", oracle=_ANOMALY_ORACLE)
def timeseries_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 20-event z-score per user with |z| > 2 anomaly flags —
    the streaming outlier monitor in batch form. One window shuffle on
    user_id serves the two power sums and the row_number; per-row state
    is two BIGINTs regardless of history length, so the operator is
    O(1)-memory per row at any scale."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w20 = w_ord.rowsBetween(-19, 0)
    framed = ev.select(
        "event_id",
        "user_id",
        cents.alias("cents"),
        F.sum(cents).over(w20).alias("sx"),
        F.sum(cents * cents).over(w20).alias("sxx"),
        F.row_number().over(w_ord).alias("rn"),
    ).where(F.col("rn") >= 20)
    z = (F.col("cents") - F.col("sx") / 20.0) / F.sqrt(
        (F.col("sxx") - F.col("sx") * F.col("sx") / 20.0) / 19.0
    )
    return framed.select(
        "event_id",
        "user_id",
        F.round(z, 4).alias("z"),
        (F.abs(z) > 2.0).alias("is_anomaly"),
    )


# --- EXT: longest consecutive-day streak per user --------------------------------

# The engagement-streak leaderboard: longest run of consecutive active
# days per user (two-row_number gaps-and-islands on the distinct
# active-day grid, integer day arithmetic), top-20 with id tie-break.
_STREAK_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
isl AS (
  SELECT user_id, d,
         date_diff('day', DATE '1970-01-01', d)
           - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS BIGINT)
           AS grp
  FROM days
),
streaks AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len
  FROM isl GROUP BY user_id, grp
),
best AS (
  SELECT user_id, MAX(len) AS longest_streak
  FROM streaks GROUP BY user_id
)
SELECT user_id, longest_streak
FROM best
ORDER BY longest_streak DESC, user_id
LIMIT 20
"""


@graded("window_longest_streak", oracle=_STREAK_ORACLE)
def window_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 longest consecutive-day activity streaks. One user-keyed
    window for the island key, two map-side-combinable aggs, then
    TakeOrdered — the engagement metric at any user count."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn(
        "grp",
        F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
        - F.row_number().over(w).cast("long"),
    )
    streaks = isl.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    best = streaks.groupBy("user_id").agg(F.max("len").alias("longest_streak"))
    return best.orderBy(F.col("longest_streak").desc(), "user_id").limit(20)
