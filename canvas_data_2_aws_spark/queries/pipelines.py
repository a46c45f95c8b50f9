"""Event-pipeline analytics: ordered funnel, cohort retention,
calendar gap-fill, and SCD2 history derivation.

These are the downstream shapes a Canvas-replica's analytics consumers
run over the event/log tables (SURVEY §2.9 time-series surface + §2.8
replication semantics): conversion funnels and retention cohorts over
the change stream, a date-spine gap-fill (time-series completeness for
training pipelines), and a type-2 slowly-changing-dimension history —
the temporal generalization of the M1 merge (instead of overwriting a
key's row, every change closes the previous validity interval).

All four are DuckDB-oracle-checked; determinism notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.numeric import dsum_col
from ..registry import graded
from ..session import load_table

# --- ordered conversion funnel (view → click → purchase) -----------------------

_FUNNEL_ORACLE = """
WITH fv AS (
  SELECT user_id, MIN(ts) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
fc AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN fv ON e.user_id = fv.user_id AND e.ts > fv.t_view
  WHERE e.event_type = 'click'
  GROUP BY e.user_id
),
fp AS (
  SELECT e.user_id, MIN(e.ts) AS t_buy
  FROM events e JOIN fc ON e.user_id = fc.user_id AND e.ts > fc.t_click
  WHERE e.event_type = 'purchase'
  GROUP BY e.user_id
)
SELECT 1 AS stage, 'view' AS step, COUNT(*) AS n_users FROM fv
UNION ALL
SELECT 2 AS stage, 'click_after_view' AS step, COUNT(*) AS n_users FROM fc
UNION ALL
SELECT 3 AS stage, 'purchase_after_click' AS step, COUNT(*) AS n_users FROM fp
"""


@graded("analytics_funnel", oracle=_FUNNEL_ORACLE)
def analytics_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose first view precedes a click that
    precedes a purchase. Each stage is a tiny per-user MIN aggregate
    joined to the next stage's events — strictly-ordered MIN chains
    are integer-exact (µs timestamps), no float drift possible. The
    per-user aggregates are pre-shuffled on user_id, so the three
    stage joins reuse one hash partitioning; stage tables shrink
    monotonically and broadcast at any scale."""
    ev = load_table(spark, sf_dir, "events")
    fv = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    fc = (
        ev.where(F.col("event_type") == "click")
        .join(fv, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .join(fc, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )

    def stage(df: DataFrame, n: int, step: str) -> DataFrame:
        return df.agg(
            F.lit(n).alias("stage"),
            F.lit(step).alias("step"),
            F.count("*").alias("n_users"),
        )

    return (
        stage(fv, 1, "view")
        .unionByName(stage(fc, 2, "click_after_view"))
        .unionByName(stage(fp, 3, "purchase_after_click"))
    )


# --- weekly cohort retention ----------------------------------------------------

# Week offsets via integer day arithmetic: date_trunc('week') is
# Monday-based in BOTH engines, and datediff of two Mondays is an exact
# multiple of 7 — integer DIV, no float involved anywhere.
_RETENTION_ORACLE = """
WITH cohort AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
  FROM events
)
SELECT c.cohort_week,
       date_diff('day', c.cohort_week, a.active_week) // 7 AS week_offset,
       COUNT(*) AS n_active
FROM cohort c JOIN active a ON c.user_id = a.user_id
GROUP BY c.cohort_week, week_offset
"""


@graded("analytics_retention", oracle=_RETENTION_ORACLE)
def analytics_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    counted in each later active week. Two aggregates over the same
    user_id shuffle + one co-partitioned join; the (cohort, offset)
    matrix is tiny at any scale (weeks², not users)."""
    ev = load_table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("active_week")
    ).distinct()
    return (
        cohort.join(active, "user_id")
        .groupBy(
            "cohort_week",
            F.expr("datediff(active_week, cohort_week) DIV 7").alias("week_offset"),
        )
        .agg(F.count("*").alias("n_active"))
    )


# --- calendar date-spine gap-fill ----------------------------------------------

# DuckDB generate_series over DATEs yields TIMESTAMPs — cast back; both
# spines are the same inclusive [min_day, max_day] range derived from
# the data, so the zero-filled rows agree exactly.
_GAPFILL_ORACLE = """
WITH bounds AS (
  SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1 FROM events
),
spine AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
),
daily AS (
  SELECT CAST(ts AS DATE) AS day,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
  FROM events WHERE event_type = 'purchase'
  GROUP BY day
)
SELECT s.day,
       COALESCE(d.n_events, 0) AS n_events,
       COALESCE(d.total_value, 0.0) AS total_value
FROM spine s LEFT JOIN daily d ON s.day = d.day
"""


@graded("timeseries_gapfill", oracle=_GAPFILL_ORACLE)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled daily purchase series over a generated calendar
    spine — the completeness primitive for training-data time series
    (a missing day must be an explicit 0, not an absent row). The
    spine is sequence()-generated from a 1-row bounds aggregate
    (broadcast), so the only shuffle is the daily rollup."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    daily = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            dsum_col(F.col("value"), "total_value"),
        )
    )
    return spine.join(daily, "day", "left").select(
        "day",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
    )


# --- SCD2 history derivation (temporal merge) -----------------------------------

_SCD2_ORACLE = """
SELECT user_id, event_id, event_type,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         AS is_current
FROM events
WHERE user_id % 7 = 0
"""


@graded("merge_scd2_history", oracle=_SCD2_ORACLE)
def merge_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history from a change stream: each change opens a
    validity interval [valid_from, valid_to) closed by the key's next
    change; the open interval is the current row. This is M1's
    temporal dual — replicas that must answer "as of" queries keep
    this instead of overwrite-in-place. One window over the natural
    (user_id, ts) shuffle; ties broken by the unique event_id
    (SURVEY §8.4)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") % 7 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    valid_to = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )
