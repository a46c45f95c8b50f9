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
from ..operators import ranks as R
from ..operators.ranks import exact_ntile
from ..registry import graded
from ..session import load_table
from .shared_sql import SIMHASH_SH_CTES as _SIMHASH_SH_CTES

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
    # r14 §2.4: fv and fc are each consumed twice (the next stage's
    # join and that stage's own count row) and each evaluation re-ran
    # its events pass — six fact scans in one plan (three after). Both
    # frames are user-sized MIN tables; lazy checkpoints compute each
    # stage once.
    fv = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
        .localCheckpoint(eager=False)
    )
    fc = (
        ev.where(F.col("event_type") == "click")
        .join(fv, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
        .localCheckpoint(eager=False)
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


# --- corpus-curation funnel (quality → dedup → split, composed) -----------------

# The end-to-end training-data preparation shape: quality-gate the
# corpus, keep one canonical doc per SimHash bucket, assign the stable
# hash split, and report the surviving token budget per (lang, split).
# Every stage is an operator graded elsewhere (text_quality,
# dedup_keep_canonical, sample_train_test_split); this query proves
# they COMPOSE — one plan, no materialization between stages.
_CURATION_ORACLE = _SIMHASH_SH_CTES + """,
quality AS (
  SELECT d.doc_id, d.lang,
         LEN(string_split(d.text, ' ')) AS n_tokens,
         CAST(LEN(list_distinct(string_split(d.text, ' '))) AS DOUBLE)
           / LEN(string_split(d.text, ' ')) AS uniq_ratio
  FROM documents d
),
gated AS (
  SELECT q.doc_id, q.lang, q.n_tokens, s.simhash
  FROM quality q JOIN sh s ON s.doc_id = q.doc_id
  WHERE q.n_tokens >= 8 AND q.uniq_ratio >= 0.3
),
canonical AS (
  SELECT doc_id, lang, n_tokens
  FROM (SELECT doc_id, lang, n_tokens,
               MIN(doc_id) OVER (PARTITION BY simhash) AS keeper
        FROM gated) t
  WHERE doc_id = keeper
)
SELECT lang,
       CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
            THEN 'test' ELSE 'train' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM canonical
GROUP BY lang, split
"""


@graded("pipeline_corpus_curation", oracle=_CURATION_ORACLE)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate → SimHash canonical dedup → stable hash split →
    per-(lang, split) doc/token budget: the full corpus-curation
    funnel as ONE Catalyst plan. At 100 TB each stage keeps its scale
    path (quality is a map, dedup shuffles on the 63-bit md5 SimHash
    bucket, split is a stateless hash) — composing them adds no extra
    wide exchange beyond the dedup shuffle.

    Round 10 (judge task): the canonical stage is a groupBy(simhash)
    ``min_by`` aggregate, not a window-min + self-filter — the
    survivor's (doc_id, lang, n_tokens) IS the group's min_by on the
    unique doc_id, so the per-partition window sort and the
    post-filter pass over all gated rows both disappear (two fewer
    plan legs, same rows). The hash frame is the session-shared
    checkpoint: SimHash is a pure function of the text, so hashing the
    full corpus once and equi-joining the gated subset on doc_id gives
    byte-identical hashes to hashing the gated subset directly."""
    from ..operators import text as T

    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens()
    n_tokens = F.size(toks)
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    gated = (
        docs.where((n_tokens >= 8) & (uniq_ratio >= 0.3))
        .select("doc_id", "lang", n_tokens.alias("n_tokens"))
    )
    sh = T.simhash_sh_cached(spark, sf_dir)
    canonical = (
        gated.join(sh, "doc_id")
        .groupBy("simhash")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("lang", "doc_id").alias("lang"),
            F.min_by("n_tokens", "doc_id").alias("n_tokens"),
        )
    )
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "1a", "test"
    ).otherwise("train")
    return (
        canonical.groupBy("lang", split.alias("split"))
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
    )


# --- month-over-month growth + share-of-total -----------------------------------

# Revenue per month is an exact decimal sum; growth and share divide
# those exact doubles pairwise (identical operands both engines), so
# only the final ratios are rounded. ORDER inside the window ends on
# the unique month key.
_MOM_ORACLE = """
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
  FROM orders
  GROUP BY month
)
SELECT month, revenue,
       ROUND(revenue / lag(revenue) OVER (ORDER BY month) - 1, 6) AS mom_growth,
       ROUND(revenue / SUM(revenue) OVER (), 6) AS share_of_total
FROM monthly
"""


@graded("analytics_mom_growth", oracle=_MOM_ORACLE)
def analytics_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed aggregates OVER an aggregate: monthly revenue with
    month-over-month growth (lag) and share-of-total (unpartitioned
    frame) — the dashboard time-series shape. The window input is the
    already-tiny monthly rollup, so the global window's single
    partition holds months, not orders (safe at any scale)."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("revenue")
    )
    w_ord = Window.partitionBy(R.UNIT_GROUP).orderBy("month")  # months: tiny
    monthly = R.attach_unit_group(monthly)
    return monthly.select(
        "month",
        "revenue",
        F.round(F.col("revenue") / F.lag("revenue").over(w_ord) - 1, 6).alias(
            "mom_growth"
        ),
        F.round(
            F.col("revenue")
            / F.sum("revenue").over(Window.partitionBy(R.UNIT_GROUP)),
            6,
        ).alias("share_of_total"),
    )


# --- per-user behavioral feature vector ------------------------------------------

_USER_FEATURES_ORACLE = """
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'view') AS n_views,
       COUNT(*) FILTER (WHERE event_type = 'click') AS n_clicks,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
       COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
       CAST(SUM(CAST(value AS DECIMAL(18,6)))
            FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase_value,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS DOUBLE)
         / GREATEST(COUNT(*) FILTER (WHERE event_type = 'view'), 1)
         AS click_through
FROM events
GROUP BY user_id
"""


@graded("analytics_user_features", oracle=_USER_FEATURES_ORACLE)
def analytics_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity feature extraction: event-type counts, decimal spend,
    and a guarded ratio in ONE conditional-aggregation pass — the
    feature-engineering shape feeding a training table (wide features
    per key, single shuffle). Ratio is exact: int ÷ int with a
    GREATEST(,1) zero-guard, identical IEEE division both engines."""
    ev = load_table(spark, sf_dir, "events")

    def n_of(t: str):
        return F.count(F.when(F.col("event_type") == t, 1))

    return ev.groupBy("user_id").agg(
        n_of("view").alias("n_views"),
        n_of("click").alias("n_clicks"),
        n_of("purchase").alias("n_purchases"),
        n_of("error").alias("n_errors"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(18,6)"),
            )
        )
        .cast("double")
        .alias("purchase_value"),
        (
            n_of("click").cast("double")
            / F.greatest(n_of("view"), F.lit(1))
        ).alias("click_through"),
    )


# --- benchmark decontamination: n-gram overlap against a held-out set -----------

# The held-out "benchmark" slice is doc_id % 10 = 0; a training doc is
# contaminated when it shares ANY distinct word 4-gram with any
# benchmark doc (the n-gram-overlap decontamination rule used by
# pretraining pipelines; 4 stands in for the usual 13 at fixture doc
# lengths). Output = the removal list with evidence strength.
_DECONTAMINATE_ORACLE = """
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, GREATEST(LEN(w) - 2, 1)),
           i -> concat_ws(' ', list_extract(w, i), list_extract(w, i + 1),
                          list_extract(w, i + 2), list_extract(w, i + 3))
         )) AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
),
bench AS (SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 10 = 0),
train AS (SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id % 10 <> 0)
SELECT t.doc_id, COUNT(*) AS n_matched
FROM train t JOIN bench b ON t.s = b.s
GROUP BY t.doc_id
"""


@graded("pipeline_decontaminate", oracle=_DECONTAMINATE_ORACLE)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: drop training docs sharing any
    4-gram with the held-out slice. The benchmark shingle set is tiny
    relative to the corpus (it's a benchmark), so it broadcasts — the
    train-side explode never shuffles: explode → broadcast-hash semi
    probe → per-doc count. At 100 TB the train shingle stream is the
    scan itself; only matches (rare) reach the aggregation."""
    from ..operators import text as T

    docs = load_table(spark, sf_dir, "documents")
    # two-projection form: inlining split() into the transform lambda
    # replicates it per slice and bloats codegen; repartition first —
    # the fixture parquet is one row group, and without it the whole
    # shingle HOF runs in a single task (measured 4.4 s → 1.1 s at
    # sf0.1 for the two fixes together)
    words = docs.repartition("doc_id").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    # materialize the shingle table once: bench and train branches both
    # consume it, and without the checkpoint Catalyst compiles + runs
    # the HOF subtree per branch (cold wall 4.4 s → 2.0 s at sf0.1)
    sh = words.select(
        "doc_id",
        F.array_distinct(T.ngrams_from_words("w", 4)).alias("shingles"),
    ).localCheckpoint()
    bench = (
        sh.where(F.col("doc_id") % 10 == 0)
        .select(F.explode("shingles").alias("s"))
        .distinct()
    )
    train = sh.where(F.col("doc_id") % 10 != 0).select(
        "doc_id", F.explode("shingles").alias("s")
    )
    return (
        train.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matched"))
    )


# --- sequence packing: greedy capacity-reset fill per shard ---------------------

# Greedy packing is inherently sequential (each doc's bin depends on
# the running fill), so it shards by source — parallel across shards,
# ordered fold within (exactly how a 100 TB packing job runs: one
# sequential pass per partition, partitions in parallel). The fold is
# applyInPandas; the oracle replays it as a DuckDB recursive CTE over
# the same md5-shuffled order — hash-matched despite being beyond
# single-statement SQL on the Spark side.
_PACK_BUDGET = 256

_PACK_ORACLE = f"""
WITH RECURSIVE rows_ AS (
  SELECT source, LEN(string_split(text, ' ')) AS tok,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
),
packed AS (
  SELECT source, rn, tok, 0 AS seq_id, tok AS acc
  FROM rows_ WHERE rn = 1
  UNION ALL
  SELECT r.source, r.rn, r.tok,
         CASE WHEN p.acc + r.tok > {_PACK_BUDGET}
              THEN p.seq_id + 1 ELSE p.seq_id END,
         CASE WHEN p.acc + r.tok > {_PACK_BUDGET}
              THEN r.tok ELSE p.acc + r.tok END
  FROM packed p JOIN rows_ r ON r.source = p.source AND r.rn = p.rn + 1
)
SELECT source, CAST(seq_id AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS seq_tokens
FROM packed
GROUP BY source, seq_id
"""


@graded("pipeline_pack_sequences", oracle=_PACK_ORACLE)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: md5-shuffle docs within each source
    shard, then greedily fill fixed token-budget sequences, opening a
    new sequence when the next doc would overflow. One shuffle (by
    source), one ordered Arrow-batch fold per shard, aggregation done
    inside the fold — no second shuffle."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        F.md5(F.col("doc_id").cast("string")).alias("shuffle_key"),
        F.col("doc_id"),
        F.size(F.split("text", " ")).cast("long").alias("tok"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["shuffle_key", "doc_id"])
        seq_ids, seq, acc = [], 0, 0
        for tok in pdf["tok"]:
            if acc > 0 and acc + tok > _PACK_BUDGET:
                seq, acc = seq + 1, tok
            else:
                acc += tok
            seq_ids.append(seq)
        pdf = pdf.assign(seq_id=seq_ids)
        out = (
            pdf.groupby("seq_id", as_index=False)
            .agg(n_docs=("tok", "size"), seq_tokens=("tok", "sum"))
        )
        out.insert(0, "source", pdf["source"].iloc[0])
        return out

    return docs.groupBy("source").applyInPandas(
        pack,
        "source string, seq_id long, n_docs long, seq_tokens long",
    )


# --- linear interpolation over an hourly spine ----------------------------------

# Hourly purchase revenue has genuine gaps (~47 of 720 fixture hours
# are empty); a gap hour gets the straight line between its nearest
# observed neighbors. Every arithmetic step is identical-operand IEEE
# (int hour-diff ratio, one multiply, one add over decimal-summed
# observations), so the doubles grade unrounded.
_INTERPOLATE_ORACLE = """
WITH b AS (
  SELECT date_trunc('hour', MIN(ts)) AS t0, date_trunc('hour', MAX(ts)) AS t1
  FROM events
),
spine AS (
  SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS hr FROM b
),
obs AS (
  SELECT date_trunc('hour', ts) AS hr,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
  FROM events WHERE event_type = 'purchase'
  GROUP BY hr
),
j AS (SELECT s.hr, o.v FROM spine s LEFT JOIN obs o ON s.hr = o.hr),
n AS (
  SELECT hr, v,
    last_value(v IGNORE NULLS) OVER (ORDER BY hr
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
      OVER (ORDER BY hr
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
    first_value(v IGNORE NULLS) OVER (ORDER BY hr
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
      OVER (ORDER BY hr
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM j
)
SELECT hr, v AS observed, (v IS NULL) AS is_gap,
  CASE WHEN v IS NOT NULL THEN v
       WHEN pv IS NULL THEN nv
       WHEN nv IS NULL THEN pv
       ELSE pv + (nv - pv) *
         (CAST(date_diff('hour', pt, hr) AS DOUBLE)
          / CAST(date_diff('hour', pt, nt) AS DOUBLE))
  END AS filled
FROM n
"""


@graded("timeseries_interpolate", oracle=_INTERPOLATE_ORACLE)
def timeseries_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap repair by linear interpolation over a generated hourly
    spine: ignore-nulls window scans carry the nearest observed value
    and its hour in both directions, then one fused projection draws
    the line. Leading/trailing gaps clamp to the nearest endpoint.
    The global window is fine here because the spine is
    calendar-sized, not data-sized; at 100 TB the same plan partitions
    by series key and the window never sees more than one series."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(t0, t1, interval 1 hour)")).alias("hr")
    )
    obs = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("hr"))
        .agg(dsum_col(F.col("value"), "v"))
    )
    j = R.attach_unit_group(spine.join(obs, "hr", "left"))
    wp = Window.partitionBy(R.UNIT_GROUP).orderBy("hr").rowsBetween(
        Window.unboundedPreceding, 0
    )  # hourly aggregate
    wn = Window.partitionBy(R.UNIT_GROUP).orderBy("hr").rowsBetween(
        0, Window.unboundedFollowing
    )
    v = F.col("v")
    marked = j.select(
        "hr",
        v,
        F.last(v, ignorenulls=True).over(wp).alias("pv"),
        F.last(F.when(v.isNotNull(), F.col("hr")), ignorenulls=True)
        .over(wp)
        .alias("pt"),
        F.first(v, ignorenulls=True).over(wn).alias("nv"),
        F.first(F.when(v.isNotNull(), F.col("hr")), ignorenulls=True)
        .over(wn)
        .alias("nt"),
    )
    dh = lambda a, b: F.expr(f"timestampdiff(HOUR, {a}, {b})")  # noqa: E731
    filled = (
        F.when(v.isNotNull(), v)
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (
                dh("pt", "hr").cast("double")
                / dh("pt", "nt").cast("double")
            )
        )
    )
    return marked.select(
        "hr",
        v.alias("observed"),
        v.isNull().alias("is_gap"),
        filled.alias("filled"),
    )


# --- equal-frequency feature binning (decile stats) -----------------------------

_BINNING_ORACLE = """
WITH binned AS (
  SELECT o_totalprice, o_orderstatus,
         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
SELECT decile, COUNT(*) AS n,
       MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
         AS mean_price,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_finished
FROM binned
GROUP BY decile
"""


@graded("analytics_feature_binning", oracle=_BINNING_ORACLE)
def analytics_feature_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency binning (deciles) of a numeric feature with
    per-bin target stats — the discretization step before WOE/monotone
    encodings in feature pipelines. The decile comes from
    ``operators.ranks.exact_ntile`` (range-partitioned distributed
    rank, bit-identical to NTILE): no single-task global sort, so the
    assignment stays exact at 100 TB with bounded per-task memory."""
    o = load_table(spark, sf_dir, "orders")
    binned = exact_ntile(
        o.select("o_totalprice", "o_orderstatus", "o_orderkey"),
        10,
        ["o_totalprice", "o_orderkey"],
        out="decile",
    )
    return binned.groupBy("decile").agg(
        F.count("*").alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("mean_price"),
        F.sum(
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
        ).alias("n_finished"),
    )


# --- training-mix budget allocation (largest-remainder apportionment) -----------

_MIX_BUDGET = 100_000  # tokens to allocate across languages

_MIX_ORACLE = f"""
WITH counts AS (
  SELECT lang, CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS toks
  FROM documents GROUP BY lang
),
tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS total FROM counts),
quota AS (
  SELECT lang, toks,
         ({_MIX_BUDGET} * toks) // total AS base,
         ({_MIX_BUDGET} * toks) % total AS rem
  FROM counts, tot
),
ranked AS (
  SELECT lang, toks, base, rem,
         ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rk,
         CAST({_MIX_BUDGET} - SUM(base) OVER () AS BIGINT) AS leftover
  FROM quota
)
SELECT lang, toks, CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                        AS BIGINT) AS alloc
FROM ranked
"""


@graded("pipeline_mix_allocation", oracle=_MIX_ORACLE)
def pipeline_mix_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mix apportionment: allocate a global token budget across
    languages proportionally, distributing the rounding leftover to
    the largest remainders (Hamilton's method) — Σalloc == budget
    exactly, all integer arithmetic, no float anywhere. The per-lang
    rollup is the only data-scale pass; apportionment runs on the
    lang-cardinality table (broadcast-sized at any corpus scale)."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).alias("toks")
    )
    tot = counts.agg(F.sum("toks").alias("total"))
    quota = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "toks",
        F.expr(f"({_MIX_BUDGET} * toks) DIV total").alias("base"),
        F.expr(f"({_MIX_BUDGET} * toks) % total").alias("rem"),
    )
    w_all = Window.partitionBy(R.UNIT_GROUP)
    w_rk = Window.partitionBy(R.UNIT_GROUP).orderBy(
        F.col("rem").desc(), "lang"
    )  # per-language quotas: tiny
    ranked = R.attach_unit_group(quota).select(
        "lang",
        "toks",
        "base",
        F.row_number().over(w_rk).alias("rk"),
        (F.lit(_MIX_BUDGET) - F.sum("base").over(w_all)).alias("leftover"),
    )
    return ranked.select(
        "lang",
        "toks",
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        ).alias("alloc"),
    )


# --- EXT: RFM customer scoring (recency / frequency / monetary quintiles) ------

# ntile ties are broken by the window ORDER BY, so every ordering ends
# with the unique c_custkey (SURVEY §8.4); Spark emits int32 ntile vs
# DuckDB int64 → cast to long on the Spark side (ADVICE r1 law).
# Monetary is an exact decimal-cents sum; recency orders by DATE then
# key — no floats anywhere before the scores.
_RFM_ORACLE = """
WITH base AS (
  SELECT o_custkey AS custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders
  GROUP BY o_custkey
)
SELECT custkey,
       CAST(ntile(5) OVER (ORDER BY last_order DESC, custkey) AS BIGINT) AS r_score,
       CAST(ntile(5) OVER (ORDER BY n_orders DESC, custkey) AS BIGINT)   AS f_score,
       CAST(ntile(5) OVER (ORDER BY cents DESC, custkey) AS BIGINT)      AS m_score
FROM base
"""


@graded("analytics_rfm_scores", oracle=_RFM_ORACLE)
def analytics_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic RFM segmentation: quintile scores for recency, frequency
    and monetary value per customer. The agg is one map-side-combinable
    pass over orders; each quintile is a range-partitioned distributed
    rank (``operators.ranks.exact_ntile`` — bit-identical to NTILE, no
    single-task sort), so the op survives a customer table that
    doesn't fit one executor."""
    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents"),
    )
    scored = exact_ntile(
        base, 5, [F.col("last_order").desc(), "custkey"], out="r_score"
    )
    scored = exact_ntile(
        scored, 5, [F.col("n_orders").desc(), "custkey"], out="f_score"
    )
    scored = exact_ntile(
        scored, 5, [F.col("cents").desc(), "custkey"], out="m_score"
    )
    return scored.select("custkey", "r_score", "f_score", "m_score")


# --- EXT: first-order Markov transition matrix over event streams --------------

# Transition counts are exact; the probability is one division of two
# BIGINTs — the identical IEEE operation on identical operands in both
# engines — then ROUND(,4). lead() ordering ends with unique event_id.
_MARKOV_ORACLE = """
WITH hops AS (
  SELECT event_type AS cur,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS nxt
  FROM events
)
SELECT cur, nxt, COUNT(*) AS n_trans,
       ROUND(COUNT(*) / CAST(SUM(COUNT(*)) OVER (PARTITION BY cur) AS DOUBLE),
             4) AS p
FROM hops
WHERE nxt IS NOT NULL
GROUP BY cur, nxt
"""


@graded("analytics_markov_transitions", oracle=_MARKOV_ORACLE)
def analytics_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types per user
    stream — the session-behavior model behind next-action prediction.
    One window shuffle on user_id produces the (cur, next) pairs; the
    count agg and the per-cur normalizing window both run on the tiny
    |types|² matrix, so scale cost is the single user_id exchange."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hops = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    counts = hops.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n_trans"))
    w_cur = Window.partitionBy("cur")
    return counts.select(
        "cur",
        "nxt",
        "n_trans",
        F.round(
            F.col("n_trans") / F.sum("n_trans").over(w_cur).cast("double"), 4
        ).alias("p"),
    )


# --- EXT: deterministic epoch shuffle --------------------------------------------

# Training-order assignment: each epoch permutes the corpus by an
# md5(seed, doc_id) sort key and materializes the global position via
# the distributed rank — reproducible across runs AND engines, no
# RNG. Emits both epochs' positions per doc (the manifest a data
# loader consumes).
_EPOCH_SHUFFLE_ORACLE = """
WITH e0 AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY md5('0_' || CAST(doc_id AS VARCHAR)),
                                 doc_id) AS BIGINT) AS pos0
  FROM documents
),
e1 AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY md5('1_' || CAST(doc_id AS VARCHAR)),
                                 doc_id) AS BIGINT) AS pos1
  FROM documents
)
SELECT e0.doc_id, e0.pos0, e1.pos1
FROM e0 JOIN e1 ON e0.doc_id = e1.doc_id
"""


@graded("pipeline_epoch_shuffle", oracle=_EPOCH_SHUFFLE_ORACLE)
def pipeline_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two deterministic epoch permutations of the corpus (md5 sort
    keys → distributed global row_number). The shuffle key is a hash,
    so re-runs and resumes see the identical order — and the rank uses
    operators/ranks.py, so assigning positions to 10⁹ docs never
    single-task sorts."""
    from ..operators.ranks import global_row_number

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    k0 = F.md5(F.concat(F.lit("0_"), F.col("doc_id").cast("string")))
    k1 = F.md5(F.concat(F.lit("1_"), F.col("doc_id").cast("string")))
    e0 = global_row_number(
        docs.withColumn("_k0", k0), ["_k0", "doc_id"], out="pos0"
    ).select("doc_id", "pos0")
    e1 = global_row_number(
        docs.withColumn("_k1", k1), ["_k1", "doc_id"], out="pos1"
    ).select("doc_id", "pos1")
    return e0.join(e1, "doc_id")


# --- weekly stickiness (DAU/WAU) ------------------------------------------------

# Engagement-intensity rollup: average daily actives over weekly
# actives per week. Both numerators are exact distinct counts; the
# one double division runs on identical integer operands in both
# engines, so no rounding is needed.
_STICKINESS_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('week', ts) AS DATE) AS wk, CAST(ts AS DATE) AS d,
         COUNT(DISTINCT user_id) AS dau
  FROM events GROUP BY wk, d
),
weekly AS (
  SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
         COUNT(DISTINCT user_id) AS wau
  FROM events GROUP BY wk
)
SELECT d.wk, CAST(COUNT(*) AS BIGINT) AS n_days, w.wau,
       CAST(SUM(d.dau) AS BIGINT) AS sum_dau,
       CAST(SUM(d.dau) AS DOUBLE) / COUNT(*) / w.wau AS stickiness
FROM daily d JOIN weekly w USING (wk)
GROUP BY d.wk, w.wau
"""


@graded("analytics_stickiness", oracle=_STICKINESS_ORACLE)
def analytics_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per week: two distinct-count aggregates over
    the same (user, time-bucket) projection + a weeks-sized join. At
    100 TB both distincts are partial-aggregated on (bucket, user)
    before the exchange; the final frame is calendar-sized."""
    ev = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", "ts").cast("date").alias("wk")
    daily = ev.select(wk, F.col("ts").cast("date").alias("d"), "user_id").groupBy(
        "wk", "d"
    ).agg(F.countDistinct("user_id").alias("dau"))
    weekly = ev.select(wk, "user_id").groupBy("wk").agg(
        F.countDistinct("user_id").alias("wau")
    )
    return (
        daily.join(F.broadcast(weekly), "wk")
        .groupBy("wk", "wau")
        .agg(
            F.count("*").alias("n_days"),
            F.sum("dau").alias("sum_dau"),
        )
        .select(
            "wk",
            "n_days",
            "wau",
            "sum_dau",
            (
                F.col("sum_dau").cast("double") / F.col("n_days") / F.col("wau")
            ).alias("stickiness"),
        )
    )


# --- cohort lifetime value curve ------------------------------------------------

# The revenue companion to analytics_retention: purchases attributed to
# each user's first-activity-week cohort, accumulated over week
# offsets. Money stays in integer cents until the output edge
# (SURVEY §8 decimal rule), so the running sum is exact.
_COHORT_LTV_ORACLE = """
WITH cohort AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
),
buys AS (
  SELECT e.user_id, c.cohort_week,
         date_diff('day', c.cohort_week, CAST(date_trunc('week', e.ts) AS DATE)) // 7
           AS week_offset,
         CAST(round(e.value * 100, 0) AS BIGINT) AS cents
  FROM events e JOIN cohort c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase'
),
wk AS (
  SELECT cohort_week, week_offset,
         CAST(COUNT(*) AS BIGINT) AS n_purchases,
         CAST(SUM(cents) AS BIGINT) AS cents
  FROM buys GROUP BY cohort_week, week_offset
)
SELECT cohort_week, week_offset, n_purchases,
       CAST(SUM(cents) OVER (PARTITION BY cohort_week ORDER BY week_offset)
            AS DOUBLE) / 100.0 AS cum_value
FROM wk
"""


@graded("analytics_cohort_ltv", oracle=_COHORT_LTV_ORACLE)
def analytics_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative purchase value by cohort age: first-activity cohorts,
    purchase cents aggregated per (cohort, offset), then a running sum
    over the cohorts×weeks matrix (tiny at any scale — the window
    partitions by cohort_week, so no global sort)."""
    ev = load_table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    buys = (
        ev.where(F.col("event_type") == "purchase")
        .join(cohort, "user_id")
        .select(
            "cohort_week",
            F.expr(
                "datediff(CAST(date_trunc('week', ts) AS DATE), cohort_week)"
                " DIV 7"
            ).alias("week_offset"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
    )
    wk = buys.groupBy("cohort_week", "week_offset").agg(
        F.count("*").alias("n_purchases"), F.sum("cents").alias("cents")
    )
    w = Window.partitionBy("cohort_week").orderBy("week_offset")
    return wk.select(
        "cohort_week",
        "week_offset",
        "n_purchases",
        (F.sum("cents").over(w).cast("double") / 100.0).alias("cum_value"),
    )


# --- leakage-safe train/test split (cluster-atomic assignment) ------------------

# Near-duplicate documents split across train and test leak training
# content into evaluation — the canonical contamination failure in LLM
# data pipelines. The fix: assign splits per NEAR-DUP CLUSTER, not per
# document. With equality-SimHash clustering, a document's cluster is
# exactly its simhash group (one hash per doc ⇒ groups are disjoint ⇒
# groups ARE the connected components of the same-hash pair graph), so
# the cluster root is the group's minimum doc_id and assignment is
# md5(root) bucketing — every member inherits the root's split.
# n_reassigned counts docs whose naive per-doc hash split would have
# disagreed with their cluster's split (each one a leak prevented).

_LEAKAGE_SPLIT_ORACLE = (
    _SIMHASH_SH_CTES
    + """,
hubs AS (
  SELECT simhash, MIN(doc_id) AS hub FROM sh GROUP BY simhash
),
assign AS (
  SELECT s.doc_id, h.hub,
         CASE WHEN substring(md5(CAST(h.hub AS VARCHAR)), 1, 2) < '1a'
              THEN 'test' ELSE 'train' END AS split,
         CASE WHEN substring(md5(CAST(s.doc_id AS VARCHAR)), 1, 2) < '1a'
              THEN 'test' ELSE 'train' END AS naive_split
  FROM sh s JOIN hubs h ON h.simhash = s.simhash
)
SELECT split,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT hub) AS n_clusters,
       CAST(SUM(CASE WHEN split <> naive_split THEN 1 ELSE 0 END) AS BIGINT)
         AS n_reassigned
FROM assign
GROUP BY split
"""
)


@graded("pipeline_leakage_safe_split", oracle=_LEAKAGE_SPLIT_ORACLE)
def pipeline_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-atomic ~10% test split: md5 bucketing on the near-dup
    cluster root (simhash-group min doc_id) so no near-duplicate pair
    ever straddles train/test. Same hash-of-key reproducibility
    contract as sample_train_test_split — assignment survives reruns,
    repartitions, and incremental appends; appends can only join an
    EXISTING cluster's split or found a new cluster.

    Round 10 (judge task): one groupBy(simhash) aggregation cascade
    instead of window-min hub attach + countDistinct(hub) expand. Per
    simhash group the hub (min doc_id), member count, and the count of
    members whose naive per-doc hash lands in 'test' are all plain
    aggregates; the group's split is then a function of the hub, the
    reassigned count is ``n − n_naive_test`` or ``n_naive_test``
    depending on that split, and — because each doc has exactly one
    simhash — groups are disjoint, so hubs are distinct across groups
    and ``n_clusters = COUNT(*)`` of groups, no distinct expand. Two
    exchanges total after the shared hash frame (simhash, then the
    2-row split key) where the window form spent four."""
    from ..operators import text as T

    sh = T.simhash_sh_cached(spark, sf_dir)
    naive_test = (
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "1a"
    )
    groups = sh.groupBy("simhash").agg(
        F.min("doc_id").alias("hub"),
        F.count("*").alias("n_docs_g"),
        F.sum(naive_test.cast("int")).alias("n_naive_test"),
    )
    split = F.when(
        F.substring(F.md5(F.col("hub").cast("string")), 1, 2) < "1a", "test"
    ).otherwise("train")
    reassigned = F.when(
        F.col("split") == "test",
        F.col("n_docs_g") - F.col("n_naive_test"),
    ).otherwise(F.col("n_naive_test"))
    return (
        groups.select(
            split.alias("split"), "n_docs_g", "n_naive_test"
        )
        .groupBy("split")
        .agg(
            F.sum("n_docs_g").alias("n_docs"),
            F.count("*").alias("n_clusters"),
            F.sum(reassigned).cast("bigint").alias("n_reassigned"),
        )
    )


# --- leakage-safe split keyed on banded-MinHash component roots -----------------

# The wide-cluster-id variant the SimHash split's docstring promises:
# equality-SimHash clusters only capture essentially-identical docs,
# so for broader near-duplication the cluster id must come from the
# REAL near-dup graph — banded-MinHash
# verified pairs (jaccard ≥ 0.5) closed under connectivity. The root is
# each connected component's minimum doc_id (operators/graph.py
# min-label propagation); docs in no pair are singleton clusters.
# Assignment stays md5(root) bucketing, so the same invariants hold:
# reproducible under reruns/repartition/appends, and no verified
# near-dup pair ever straddles train/test. The oracle runs the same
# closure as a recursive CTE — full hash-match, including the
# iterative component resolution.

from .shared_sql import MINHASH_BANDED_ORACLE as _MB_SQL

_MINHASH_SPLIT_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({_MB_SQL}) q WHERE jaccard >= 0.5
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
cc AS (
  SELECT a AS node, a AS comp FROM edges
  UNION
  SELECT e.a AS node, cc.comp AS comp
  FROM edges e JOIN cc ON cc.node = e.b
),
roots AS (SELECT node, MIN(comp) AS root FROM cc GROUP BY node),
assign AS (
  SELECT d.doc_id, COALESCE(r.root, d.doc_id) AS root
  FROM documents d LEFT JOIN roots r ON r.node = d.doc_id
),
lab AS (
  SELECT doc_id, root,
         CASE WHEN substring(md5(CAST(root AS VARCHAR)), 1, 2) < '1a'
              THEN 'test' ELSE 'train' END AS split,
         CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
              THEN 'test' ELSE 'train' END AS naive_split
  FROM assign
)
SELECT split,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT root) AS n_clusters,
       CAST(SUM(CASE WHEN split <> naive_split THEN 1 ELSE 0 END) AS BIGINT)
         AS n_reassigned
FROM lab
GROUP BY split
"""


@graded("pipeline_leakage_split_minhash", oracle=_MINHASH_SPLIT_ORACLE)
def pipeline_leakage_split_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-atomic split keyed on banded-MinHash connected-component
    roots — the corpus-scale leakage split (see module comment above).
    Verified pairs (jaccard ≥ 0.5, bit-identical division both engines)
    feed min-label-propagation connected components; every doc inherits
    its component root's md5 bucket, singletons root at themselves. The
    component closure is O(log diameter) joins on the duplication-sized
    pair graph, never corpus²."""
    from ..operators.graph import connected_components
    from .dedup import dedup_minhash_banded

    pairs = (
        dedup_minhash_banded(spark, sf_dir)
        .where(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b")
    )
    comps = connected_components(pairs, src="doc_a", dst="doc_b").select(
        F.col("node").alias("doc_id"), F.col("comp")
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    assign = docs.join(comps, "doc_id", "left").select(
        "doc_id", F.coalesce("comp", "doc_id").alias("root")
    )
    bucket = lambda c: F.when(  # noqa: E731
        F.substring(F.md5(F.col(c).cast("string")), 1, 2) < "1a", "test"
    ).otherwise("train")
    return (
        assign.select(
            "doc_id",
            "root",
            bucket("root").alias("split"),
            bucket("doc_id").alias("naive_split"),
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("root").alias("n_clusters"),
            F.sum(
                F.when(F.col("split") != F.col("naive_split"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_reassigned"),
        )
    )


# --- DSIR-style importance weighting (hashed n-gram features) -------------------

# Data Selection via Importance Resampling (Xie et al. 2023, public):
# score each raw document by the log importance ratio of a target
# distribution over hashed features vs the raw-corpus distribution,
# then keep the top-weighted docs. Features are md5-bucketed unigrams
# (256 buckets via the first md5 hex byte — the only cross-engine hash,
# SURVEY §8), both distributions add-1 smoothed. The bucket table is
# 256 rows at ANY corpus size, so the scoring join is always broadcast
# and the whole pipeline is two token-stream scans + one per-doc agg —
# the same shape as the unigram LM. Target = lang='en' (stand-in for
# "looks like the curated reference corpus").
_DSIR_ORACLE = """
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents
),
f AS (SELECT doc_id, lang, substring(md5(token), 1, 2) AS fb FROM tok),
stats AS (
  SELECT fb, COUNT(*) AS cs,
         COUNT(*) FILTER (WHERE lang = 'en') AS ct
  FROM f GROUP BY fb
),
tot AS (SELECT SUM(cs) AS ts, SUM(ct) AS tt FROM stats),
lr AS (
  SELECT fb,
         LN(((CAST(ct AS DOUBLE) + 1.0) / (CAST(tot.tt AS DOUBLE) + 256.0))
            / ((CAST(cs AS DOUBLE) + 1.0) / (CAST(tot.ts AS DOUBLE) + 256.0)))
           AS lr
  FROM stats, tot
),
w AS (
  SELECT f.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tok,
         ROUND(CAST(SUM(CAST(lr.lr AS DECIMAL(38,9))) AS DOUBLE), 4)
           AS dsir_logweight
  FROM f JOIN lr USING (fb)
  GROUP BY f.doc_id
)
SELECT doc_id, n_tok, dsir_logweight
FROM w
ORDER BY dsir_logweight DESC, doc_id
LIMIT 100
"""


@graded("pipeline_dsir_weights", oracle=_DSIR_ORACLE)
def pipeline_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 documents by DSIR importance log-weight (see module
    comment): hashed-unigram bucket distributions for target (lang=en)
    and raw corpus computed in ONE token-stream agg (count + filtered
    count per bucket), log ratios broadcast back onto the stream, one
    doc-keyed decimal-exact sum, TakeOrdered top-100. Two corpus scans
    total; the feature table is 256 rows at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
    )
    f = tok.select(
        "doc_id", "lang", F.substring(F.md5("token"), 1, 2).alias("fb")
    )
    # 256 rows; checkpointed so `tot` and `lr` reuse ONE materialization
    # of the token-stream agg instead of re-tokenizing the corpus each
    # (which would make the docstring's "two corpus scans" three).
    stats = (
        f.groupBy("fb")
        .agg(
            F.count(F.lit(1)).alias("cs"),
            F.count(F.when(F.col("lang") == "en", 1)).alias("ct"),
        )
        .localCheckpoint(eager=False)
    )
    tot = stats.agg(F.sum("cs").alias("ts"), F.sum("ct").alias("tt"))
    lr = stats.crossJoin(F.broadcast(tot)).select(
        "fb",
        F.log(
            ((F.col("ct").cast("double") + 1.0) / (F.col("tt").cast("double") + 256.0))
            / ((F.col("cs").cast("double") + 1.0) / (F.col("ts").cast("double") + 256.0))
        ).alias("lr"),
    )
    w = (
        f.join(F.broadcast(lr), "fb")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tok"),
            F.round(
                F.sum(F.col("lr").cast("decimal(38,9)")).cast("double"), 4
            ).alias("dsir_logweight"),
        )
    )
    return w.orderBy(F.col("dsir_logweight").desc(), "doc_id").limit(100)


# --- EXT: Rocchio pseudo-relevance feedback (query expansion) --------------------

# The second retrieval stage after search_hybrid_rrf: run the seed
# query under BM25, treat its top-10 docs as pseudo-relevant (Rocchio
# 1971 / classic PRF), lift the 3 strongest non-seed terms from that
# slice as expansion terms at half the seed weight (α=2, β=1 in
# Rocchio's integer-scaled form), and re-rank the corpus under the
# expanded query. Shares _BM25_CTES / bm25_scores with text_bm25 so
# the scoring function cannot drift. Every rank step carries a
# composite unique key and every score is a DECIMAL(18,6) sum —
# order-independent, bit-equal across engines.
_ROCCHIO_SEED = ("join", "hash")
_ROCCHIO_STOP = ("a", "the")

from .shared_sql import BM25_CTES as _BM25_CTES

_ROCCHIO_ORACLE = f"""
WITH {_BM25_CTES},
seed(token, w) AS (VALUES ('join', 2), ('hash', 2)),
q0 AS (
  SELECT doc_id, SUM(CAST(bm25 AS DECIMAL(18,6))) AS s
  FROM bm25 JOIN seed USING (token)
  GROUP BY doc_id ORDER BY s DESC, doc_id LIMIT 10
),
expand AS (
  SELECT token, SUM(CAST(bm25 AS DECIMAL(18,6))) AS mass
  FROM bm25 JOIN q0 USING (doc_id)
  WHERE token NOT IN ('join', 'hash', 'a', 'the')
  GROUP BY token ORDER BY mass DESC, token LIMIT 3
),
terms AS (
  SELECT token, CAST(w AS BIGINT) AS w FROM seed
  UNION ALL SELECT token, CAST(1 AS BIGINT) AS w FROM expand
),
scored AS (
  SELECT b.doc_id, SUM(CAST(b.bm25 AS DECIMAL(18,6)) * t.w) AS s
  FROM bm25 b JOIN terms t USING (token)
  GROUP BY b.doc_id
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS BIGINT) AS rnk,
       doc_id, CAST(s AS DOUBLE) AS score
FROM (SELECT * FROM scored ORDER BY s DESC, doc_id LIMIT 20)
"""


@graded("search_rocchio_expand", oracle=_ROCCHIO_ORACLE)
def search_rocchio_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rocchio pseudo-relevance-feedback retrieval: BM25 seed query →
    top-10 pseudo-relevant docs → top-3 expansion terms by BM25 mass →
    re-rank under the α=2/β=1 expanded query. The shared score table
    is checkpointed once (consumed by all three stages); both rank
    cuts are TakeOrdered (10- and 20-row driver results), the
    expansion stage runs on a broadcast 10-doc slice, and the re-rank
    joins a broadcast 5-term table — so the only corpus-sized work is
    the one tf aggregation inside bm25_scores, exactly like a
    production two-pass retrieval."""
    from .text import bm25_scores

    sc = bm25_scores(spark, sf_dir).localCheckpoint(eager=False)
    dec = F.col("bm25").cast("decimal(18,6)")
    top10 = (
        sc.where(F.col("token").isin(*_ROCCHIO_SEED))
        .groupBy("doc_id")
        .agg(F.sum(dec).alias("s"))
        .orderBy(F.col("s").desc(), "doc_id")
        .limit(10)
    )
    expand = (
        sc.join(F.broadcast(top10.select("doc_id")), "doc_id")
        .where(~F.col("token").isin(*(_ROCCHIO_SEED + _ROCCHIO_STOP)))
        .groupBy("token")
        .agg(F.sum(dec).alias("mass"))
        .orderBy(F.col("mass").desc(), "token")
        .limit(3)
    )
    seed_df = spark.createDataFrame(
        [(t, 2) for t in _ROCCHIO_SEED], "token string, w long"
    )
    terms = seed_df.unionByName(
        expand.select("token", F.lit(1).cast("long").alias("w"))
    )
    scored = (
        sc.join(F.broadcast(terms), "token")
        .groupBy("doc_id")
        .agg(F.sum(dec * F.col("w")).alias("s"))
        .orderBy(F.col("s").desc(), "doc_id")
        .limit(20)
    )
    ranked = R.attach_unit_group(scored)
    w = Window.partitionBy(R.UNIT_GROUP).orderBy(F.col("s").desc(), "doc_id")
    return ranked.select(
        F.row_number().over(w).cast("long").alias("rnk"),
        "doc_id",
        F.col("s").cast("double").alias("score"),
    )


# --- hard-negative mining for contrastive training ------------------------------

# For each query vector, the top-k most-similar vectors with a
# DIFFERENT label: exactly the "confusable negatives" a contrastive
# trainer (DPR / SimCSE style) mines to replace random in-batch
# negatives. The label plays the positive-set role; at 100 TB the
# broadcast-BLAS corpus is swapped for the bucketed ANN operators with
# the same different-label mask.
_HARD_NEG_ORACLE = """
SELECT query_id, label, neighbor_id, neighbor_label, score, rn
FROM (
  SELECT a.vec_id AS query_id, a.label, b.vec_id AS neighbor_id,
         b.label AS neighbor_label,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 4) AS score,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                 CAST(b.embedding AS DOUBLE[])), 4) DESC,
                    b.vec_id
         ) AS rn
  FROM embeddings a JOIN embeddings b
    ON a.vec_id <> b.vec_id AND a.label <> b.label
  WHERE a.vec_id < 32
) t
WHERE rn <= 5
ORDER BY query_id, rn
"""


@graded("search_hard_negatives", oracle=_HARD_NEG_ORACLE)
def search_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 hard negatives (nearest different-label vectors) for each
    of 32 query vectors, via the broadcast-corpus BLAS kernel with the
    different-block mask applied INSIDE the matmul scoring (the
    same-label columns never reach the top-k heap). Rounded-score +
    id ordering keeps ranks cross-engine stable; the per-query rank
    window runs on ≤5·32 rows."""
    from ..operators.similarity import cosine_blas

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 32)
    scored = cosine_blas(
        queries, emb, mode="knn", k=5, block_col="label",
        corpus_key=f"emb:{sf_dir}",
    )
    lbl = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.join(F.broadcast(lbl), "neighbor_id")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .select("query_id", "label", "neighbor_id", "neighbor_label", "score", "rn")
        .orderBy("query_id", "rn")
    )


# --- MMR diversified re-rank ----------------------------------------------------

# Maximal Marginal Relevance (Carbonell & Goldstein 1998): greedily
# pick k=5 of the top-20 candidates per query, trading relevance
# against redundancy: mmr(d) = λ·sim(d,q) − (1−λ)·max_{s∈S} sim(d,s),
# λ=0.5. All similarities are 4dp-rounded doubles BEFORE any
# comparison (SURVEY §8.5); 0.5·x is exact power-of-two scaling, so
# the greedy argmax sequence is cross-engine deterministic (ties →
# smaller id). The oracle unrolls the 5 greedy steps as CTE stages —
# the same pattern as the BPE merge unroll.
_MMR_STAGE = """
s{i} AS (
  SELECT q, d, CAST({i} AS BIGINT) AS rk, mmr FROM (
    SELECT c.q, c.d,
           0.5 * c.simq - 0.5 * MAX(pr.s) AS mmr
    FROM c
    JOIN pair pr ON pr.q = c.q AND pr.d1 = c.d
    JOIN sel{p} w ON w.q = pr.q AND w.d = pr.d2
    WHERE NOT EXISTS (SELECT 1 FROM sel{p} x WHERE x.q = c.q AND x.d = c.d)
    GROUP BY c.q, c.d, c.simq
  ) QUALIFY ROW_NUMBER() OVER (PARTITION BY q ORDER BY mmr DESC, d) = 1
),
sel{i} AS MATERIALIZED (SELECT * FROM sel{p} UNION ALL SELECT * FROM s{i})"""

_MMR_ORACLE = (
    """
WITH cand AS (
  SELECT a.vec_id AS q, b.vec_id AS d,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 4) AS simq,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                 CAST(b.embedding AS DOUBLE[])), 4) DESC,
                    b.vec_id
         ) AS rn
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < 8
),
c AS MATERIALIZED (SELECT q, d, simq FROM cand WHERE rn <= 20),
pair AS MATERIALIZED (
  SELECT x.q, x.d AS d1, y.d AS d2,
         ROUND(list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]),
                                      CAST(e2.embedding AS DOUBLE[])), 4) AS s
  FROM c x JOIN c y ON x.q = y.q AND x.d <> y.d
  JOIN embeddings e1 ON e1.vec_id = x.d
  JOIN embeddings e2 ON e2.vec_id = y.d
),
s1 AS (
  SELECT q, d, CAST(1 AS BIGINT) AS rk, 0.5 * simq AS mmr
  FROM c QUALIFY ROW_NUMBER() OVER (PARTITION BY q ORDER BY simq DESC, d) = 1
),
sel1 AS MATERIALIZED (SELECT * FROM s1),"""
    + ",".join(_MMR_STAGE.format(i=i, p=i - 1) for i in range(2, 6))
    + """
SELECT q AS query_id, rk, d AS neighbor_id, mmr
FROM sel5
ORDER BY query_id, rk
"""
)


@graded("search_mmr_rerank", oracle=_MMR_ORACLE)
def search_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR re-rank: per-query greedy diversification of the top-20
    cosine candidates down to 5 (λ=0.5). The candidate fetch is the
    broadcast-BLAS knn; the greedy loop runs inside one applyInPandas
    kernel per query group — O(k'²)=400 pairwise sims per query, NO
    cross-query work, so the stage shuffles once on query_id and
    scales linearly in query count (candidates per query are bounded
    by construction, the re-rank-stage contract)."""
    import numpy as np
    import pandas as pd

    from ..operators.similarity import cosine_blas, mmr_select

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8)
    cand = cosine_blas(
        queries, emb, mode="knn", k=20, corpus_key=f"emb:{sf_dir}"
    )
    # Fetch candidate vectors with a plain key join — the candidate
    # side is |queries|·20 rows, so the corpus side must NOT be
    # broadcast (an uncapped full-corpus broadcast would undo the
    # _np_corpus row cap that bounds the BLAS stage).
    withv = cand.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        "neighbor_id",
    ).select("query_id", "neighbor_id", F.col("score").alias("simq"), "embedding")

    def mmr_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("neighbor_id", ignore_index=True)
        ids = pdf["neighbor_id"].to_numpy(np.int64)
        simq = pdf["simq"].to_numpy(np.float64)
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
        sims = np.round((mat @ mat.T) / (norms[:, None] * norms[None, :]), 4)
        # No re-round inside the greedy: 0.5·x is exact power-of-two
        # scaling of a 4dp-rounded double, and rounding the difference
        # to 4dp would create systematic .00005 ties where Python
        # (half-even) and DuckDB (half-away) disagree — the raw IEEE
        # double is the deterministic form.
        qid = int(pdf["query_id"].iloc[0])
        out = [
            (qid, rk, int(d), mmr)
            for rk, d, mmr in mmr_select(ids, simq, sims, k=5, lam=0.5)
        ]
        return pd.DataFrame(
            out, columns=["query_id", "rk", "neighbor_id", "mmr"]
        )

    res = withv.groupBy("query_id").applyInPandas(
        mmr_kernel, "query_id long, rk long, neighbor_id long, mmr double"
    )
    return res.orderBy("query_id", "rk")


# --- top principal component via power iteration --------------------------------

# Embedding decorrelation/whitening needs the leading eigenvector of
# the covariance matrix. Covariance NUMERATORS (n·Σxy − Σx·Σy over
# 1e-4 integer ticks) are exact BIGINTs that fit a double exactly
# (≤~1e14), so C is cross-engine identical; each of the 8 power
# iterations quantizes its matvec through DECIMAL(38,9) (order-free
# sums) and re-normalizes by a correctly-rounded sqrt, with the
# iterate rounded to 6dp — every stage is deterministic, so 8
# identical iterations land on the identical vector in both engines.
# AS MATERIALIZED: each stage is referenced twice downstream; without
# the hint DuckDB may inline CTEs, re-evaluating the whole upstream
# chain 2^8 times.
_PCA_ITER = """
w{k} AS MATERIALIZED (
  SELECT c.d1 AS dim,
         CAST(SUM(CAST(c.c * v.v AS DECIMAL(38,9))) AS DOUBLE) AS w
  FROM c JOIN v{p} v ON c.d2 = v.dim GROUP BY 1
),
n{k} AS MATERIALIZED (
  SELECT sqrt(CAST(SUM(CAST(w * w AS DECIMAL(38,9))) AS DOUBLE)) AS nrm
  FROM w{k}
),
v{k} AS MATERIALIZED (SELECT dim, ROUND(w / nrm, 6) AS v FROM w{k}, n{k})"""

# Shared CTE prefix: tick table -> covariance -> 8 iterations (v8/n8).
# Reused by vector_pca_power (loadings) and vector_pca_project
# (projection stats) so the iteration lives in exactly one place.
_PCA_CTES = (
    """t AS (
  SELECT vec_id, i AS dim,
         CAST(round(CAST(list_extract(embedding, i + 1) AS DOUBLE) * 10000)
              AS BIGINT) AS xi
  FROM embeddings, range(0, 64) r(i)
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
s1 AS (SELECT dim, CAST(SUM(xi) AS BIGINT) AS s FROM t GROUP BY dim),
s12 AS MATERIALIZED (
  SELECT a.dim AS d1, b.dim AS d2, CAST(SUM(a.xi * b.xi) AS BIGINT) AS s12
  FROM t a JOIN t b USING (vec_id) GROUP BY 1, 2
),
c AS MATERIALIZED (
  SELECT s12.d1, s12.d2,
         CAST(nn.n * s12.s12 - sa.s * sb.s AS DOUBLE)
         / (CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE)) AS c
  FROM s12
  JOIN s1 sa ON sa.dim = s12.d1
  JOIN s1 sb ON sb.dim = s12.d2
  CROSS JOIN nn
),
v0 AS (SELECT i AS dim, 0.125 AS v FROM range(0, 64) r(i)),"""
    + ",".join(_PCA_ITER.format(k=k, p=k - 1) for k in range(1, 9))
)

_PCA_ORACLE = f"""
WITH {_PCA_CTES}
SELECT v8.dim, v8.v AS loading, (SELECT ROUND(nrm, 4) FROM n8) AS eig
FROM v8 ORDER BY v8.dim
"""


def _pca_top_component(spark: SparkSession, sf_dir: str):
    """Shared PCA stage: returns (ticks, vloc, nrm) — the 1e-4 integer
    tick table (DataFrame), the 64-entry {dim: loading} iterate after
    8 power iterations, and the final pre-normalization norm
    (eigenvalue estimate; None on an empty corpus). The iterate and
    norm are plain driver values (the covariance is <= 64x64 at any
    corpus — see the loop comment below); consumers build whatever
    tiny frame they need from them. Mirrors _PCA_CTES exactly."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    ticks = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " x -> cast(round(cast(x as double) * 10000) as bigint))"
        ).alias("tk"),
    )

    def gram_partials(batches):
        acc = np.zeros((64, 64), dtype=np.int64)
        any_rows = False
        for pdf in batches:
            m = np.stack(pdf["tk"].to_numpy()).astype(np.int64)
            acc += m.T @ m
            any_rows = True
        if any_rows:
            d1, d2 = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
            yield pd.DataFrame(
                {"d1": d1.ravel(), "d2": d2.ravel(), "p": acc.ravel()}
            )

    s12 = (
        ticks.mapInPandas(gram_partials, "d1 int, d2 int, p long")
        .groupBy("d1", "d2")
        .agg(F.sum("p").cast("bigint").alias("s12"))
    )
    s1 = (
        ticks.select(F.posexplode("tk").alias("dim", "xi"))
        .groupBy("dim")
        .agg(F.sum("xi").cast("bigint").alias("s"))
    )
    nn = emb.agg(F.count("*").cast("bigint").alias("n"))
    sa = s1.select(F.col("dim").alias("d1"), F.col("s").alias("sa"))
    sb = s1.select(F.col("dim").alias("d2"), F.col("s").alias("sb"))
    c = (
        s12.join(F.broadcast(sa), "d1")
        .join(F.broadcast(sb), "d2")
        .crossJoin(F.broadcast(nn))  # scalar broadcast
        .select(
            "d1",
            "d2",
            (
                (F.col("n") * F.col("s12") - F.col("sa") * F.col("sb"))
                .cast("double")
                / (F.col("n").cast("double") * F.col("n").cast("double"))
            ).alias("c"),
        )
    )
    # The covariance matrix is <= 64x64 rows at ANY corpus size (the
    # same bounded-fetch class as the IVF centroid collect), but the 8
    # power iterations over it as 64-row DataFrames cost ~17 scheduled
    # jobs + broadcasts of nothing — measured ~5 s of the 5.5 s warm
    # wall at sf0.1 vs 0.4 s for the corpus-scale Gramian pass (r13,
    # guide §1.2/§5: the driver may do O(1)-bounded math; Spark should
    # not schedule it). The loop below replicates the retired Spark
    # expression tree operation-for-operation: double products, CAST
    # to DECIMAL(38,9) (BigDecimal.valueOf = Double.toString + HALF_UP
    # setScale — repr() is the Python equivalent), exact decimal sums,
    # correctly-rounded casts back to double, IEEE sqrt/division, and
    # ROUND(,6) = the same string-based HALF_UP quantize. Verified
    # value-identical against the Spark-side ladder and hash-matched
    # at both SFs.
    cvals: dict[int, list] = {}
    for r in c.collect():  # <= 64x64 rows, corpus-size-independent
        cvals.setdefault(r.d1, []).append((r.d2, r.c))
    vloc, nrm = _pca_power_iterations(cvals)
    return ticks, vloc, nrm


def _pca_power_iterations(
    cvals: dict[int, list], n_iter: int = 8
) -> tuple[dict[int, float], float | None]:
    """The 8-step driver-side power iteration over the collected
    covariance rows ``{d1: [(d2, c), ...]}`` — an exact replication of
    the retired _PCA_ITER Spark ladder (see the loop note in
    _pca_top_component). Factored out so the equivalence against the
    live Spark expressions is PINNED by a unit test
    (tests/test_pipelines.py::test_pca_decimal_ladder_matches_spark_
    expressions, ADVICE r13) instead of asserted in a comment."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    q9, q6 = Decimal("1e-9"), Decimal("1e-6")

    def dec(x: float, q: Decimal) -> Decimal:
        return Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP)

    vloc = {d: 0.125 for d in range(64)}
    nrm = None
    for _ in range(n_iter):
        w = {}
        for d1, pairs in cvals.items():
            # inner join c.d2 == v.dim: unmatched d2 rows drop out
            terms = [dec(cv * vloc[d2], q9) for d2, cv in pairs if d2 in vloc]
            if terms:
                w[d1] = float(sum(terms))
        if w:
            nrm = math.sqrt(float(sum((dec(x * x, q9) for x in w.values()), Decimal(0))))
            vloc = {d1: float(dec(x / nrm, q6)) for d1, x in w.items()}
        else:  # empty corpus: SUM over no rows is NULL, sqrt(NULL) NULL
            nrm = None
            vloc = {}
    return vloc, nrm


@graded("vector_pca_power", oracle=_PCA_ORACLE)
def vector_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading principal component of the embedding covariance by 8
    power iterations. The only corpus-scale pass computes integer
    outer-product partials (64×64 int64 matmul per Arrow batch inside
    mapInPandas — map-side combined, shuffle is 4096 rows per
    partition regardless of corpus size); the iterations run on the
    64-row eigenvector frame. At 1000 executors this is the textbook
    tree-aggregated Gramian, not an n×4096 explode."""
    from decimal import ROUND_HALF_UP, Decimal

    _, vloc, nrm = _pca_top_component(spark, sf_dir)
    # ROUND(nrm, 4) — same string-based HALF_UP quantize as the
    # retired Spark expression (see the _pca_top_component loop note).
    eig = (
        float(Decimal(repr(nrm)).quantize(Decimal("1e-4"), ROUND_HALF_UP))
        if nrm is not None
        else None
    )
    return spark.createDataFrame(
        [(int(d), vloc[d], eig) for d in sorted(vloc)],
        "dim long, loading double, eig double",
    ).orderBy("dim")


# --- projection onto the top component: class-separation stats ------------------

# Whitening diagnostic: project every embedding onto the learned top
# component and roll up per-label mean/variance of the projection —
# "does the dominant variance direction encode label structure?".
# xi·v products have ≤6dp exactly (integer tick × 6dp loading), so the
# DECIMAL(18,6) cast recovers the exact per-vector projection; the
# moment sums are decimal-exact.
_PCA_PROJECT_ORACLE = f"""
WITH {{pca}},
proj AS MATERIALIZED (
  SELECT t.vec_id,
         CAST(SUM(CAST(t.xi * v.v AS DECIMAL(18,6))) AS DOUBLE) AS p
  FROM t JOIN v8 v ON t.dim = v.dim GROUP BY 1
)
SELECT label, n,
       ROUND(sp / n, 6) AS mean_proj,
       ROUND(sp2 / n - (sp / n) * (sp / n), 6) AS var_proj
FROM (
  SELECT e.label, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) AS sp,
         CAST(SUM(CAST(p * p AS DECIMAL(38,12))) AS DOUBLE) AS sp2
  FROM proj JOIN embeddings e USING (vec_id) GROUP BY 1
) s
ORDER BY label
""".replace("{pca}", _PCA_CTES)


@graded("vector_pca_project", oracle=_PCA_PROJECT_ORACLE)
def vector_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label moments of the embedding projections onto the top
    principal component (shared _pca_top_component stage). The
    projection is one broadcast join of the 64-row loading vector
    against the exploded tick stream + a per-vector sum — narrow at
    any corpus size; the rollup groups on the label key."""
    emb = load_table(spark, sf_dir, "embeddings")
    ticks, vloc, _ = _pca_top_component(spark, sf_dir)
    v = spark.createDataFrame(
        [(int(d), vloc[d]) for d in sorted(vloc)], "dim int, v double"
    )
    tk = ticks.select("vec_id", F.posexplode("tk").alias("dim", "xi"))
    proj = (
        tk.join(F.broadcast(v), "dim")
        .groupBy("vec_id")
        .agg(
            F.sum((F.col("xi") * F.col("v")).cast("decimal(18,6)"))
            .cast("double")
            .alias("p")
        )
    )
    return (
        proj.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("p").cast("decimal(18,6)")).cast("double").alias("sp"),
            F.sum((F.col("p") * F.col("p")).cast("decimal(38,12)"))
            .cast("double")
            .alias("sp2"),
        )
        .select(
            "label",
            "n",
            F.round(F.col("sp") / F.col("n"), 6).alias("mean_proj"),
            F.round(
                F.col("sp2") / F.col("n")
                - (F.col("sp") / F.col("n")) * (F.col("sp") / F.col("n")),
                6,
            ).alias("var_proj"),
        )
        .orderBy("label")
    )


# --- difference-in-differences readout ------------------------------------------

# Canonical 2×2 DiD panel: arms from stable user-id parity, periods
# from the exact integer midpoint of the event-time range, outcome =
# per-user purchase CENTS (integer-exact). The estimate
# (post−pre)_treat − (post−pre)_control is one mirrored IEEE
# expression over BIGINT cell sums — the panel-data sibling of
# analytics_ab_lift/analytics_ab_cuped.
_DID_ORACLE = """
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
arms AS (
  SELECT CAST(user_id % 2 AS INTEGER) AS arm,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy
  FROM u GROUP BY arm
),
did AS (
  SELECT (MAX(CASE WHEN arm = 1 THEN CAST(sy AS DOUBLE) / n_users END)
          - MAX(CASE WHEN arm = 1 THEN CAST(sx AS DOUBLE) / n_users END))
         - (MAX(CASE WHEN arm = 0 THEN CAST(sy AS DOUBLE) / n_users END)
            - MAX(CASE WHEN arm = 0 THEN CAST(sx AS DOUBLE) / n_users END))
           AS d
  FROM arms
)
SELECT arm, period, n_users, ROUND(mean_cents / 100.0, 4) AS mean_usd,
       ROUND(did.d / 100.0, 4) AS did_usd
FROM (
  SELECT arm, 'pre' AS period, n_users, CAST(sx AS DOUBLE) / n_users AS mean_cents
  FROM arms
  UNION ALL
  SELECT arm, 'post', n_users, CAST(sy AS DOUBLE) / n_users FROM arms
) cells, did
ORDER BY arm, period
"""


@graded("analytics_did_lift", oracle=_DID_ORACLE)
def analytics_did_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: 2×2 (arm × pre/post) cell means of
    per-user purchase cents plus the DiD estimate as a 1-row scalar
    attach. One user-keyed collapse then a 2-row arm rollup — the
    whole panel costs one scan + one exchange at any scale."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.expr("(unix_micros(min(ts)) + unix_micros(max(ts))) div 2")
        .cast("bigint")
        .alias("mid")
    )
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    u = (
        ev.crossJoin(F.broadcast(b))  # scalar broadcast
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
            .cast("bigint")
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
            .cast("bigint")
            .alias("y"),
        )
    )
    arms = u.groupBy(
        (F.col("user_id") % 2).cast("int").alias("arm")
    ).agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
    ).localCheckpoint(eager=False)  # consumed by cells AND the DiD scalar
    did = arms.agg(
        (
            (
                F.max(
                    F.when(
                        F.col("arm") == 1,
                        F.col("sy").cast("double") / F.col("n_users"),
                    )
                )
                - F.max(
                    F.when(
                        F.col("arm") == 1,
                        F.col("sx").cast("double") / F.col("n_users"),
                    )
                )
            )
            - (
                F.max(
                    F.when(
                        F.col("arm") == 0,
                        F.col("sy").cast("double") / F.col("n_users"),
                    )
                )
                - F.max(
                    F.when(
                        F.col("arm") == 0,
                        F.col("sx").cast("double") / F.col("n_users"),
                    )
                )
            )
        ).alias("d")
    )
    pre = arms.select(
        "arm",
        F.lit("pre").alias("period"),
        "n_users",
        (F.col("sx").cast("double") / F.col("n_users")).alias("mean_cents"),
    )
    post = arms.select(
        "arm",
        F.lit("post").alias("period"),
        "n_users",
        (F.col("sy").cast("double") / F.col("n_users")).alias("mean_cents"),
    )
    return (
        pre.unionByName(post)
        .crossJoin(F.broadcast(did))  # scalar broadcast
        .select(
            "arm",
            "period",
            "n_users",
            F.round(F.col("mean_cents") / 100.0, 4).alias("mean_usd"),
            F.round(F.col("d") / 100.0, 4).alias("did_usd"),
        )
        .orderBy("arm", "period")
    )


# --- leakage-safe target encoding ------------------------------------------------

# Out-of-fold mean target encoding (the Kaggle/feature-store standard):
# encode each category by the target mean computed WITHOUT the rows of
# the row's own fold, so the feature never sees its own label. Folds
# are md5-bucket-deterministic; targets are integer cents, so the OOF
# mean is one BIGINT-ratio division. Emitted at (category × fold)
# granularity — the encoding table a trainer would join back.
_TARGET_ENC_ORACLE = """
WITH o AS (
  SELECT n.n_name AS nation,
         ((strpos('0123456789abcdef',
                  substring(md5(CAST(o.o_orderkey AS VARCHAR)), 1, 1)) - 1) * 16
          + strpos('0123456789abcdef',
                   substring(md5(CAST(o.o_orderkey AS VARCHAR)), 2, 1)) - 1) % 5
           AS fold,
         CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
),
cf AS (
  SELECT nation, fold, CAST(COUNT(*) AS BIGINT) AS n_f,
         CAST(SUM(cents) AS BIGINT) AS s_f
  FROM o GROUP BY 1, 2
),
ct AS (
  SELECT nation, CAST(SUM(n_f) AS BIGINT) AS n_c,
         CAST(SUM(s_f) AS BIGINT) AS s_c
  FROM cf GROUP BY 1
)
SELECT cf.nation, cf.fold, cf.n_f,
       ROUND(CAST(ct.s_c - cf.s_f AS DOUBLE)
             / NULLIF(ct.n_c - cf.n_f, 0) / 100.0, 4)
         AS oof_mean_usd
FROM cf JOIN ct USING (nation)
ORDER BY nation, fold
"""


@graded("analytics_target_encoding", oracle=_TARGET_ENC_ORACLE)
def analytics_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold target encoding table: one fact scan → (category,
    fold) partial sums (integer cents) → category totals re-aggregated
    from the 125-row partial table; the leave-fold-out mean is
    (total − fold) ratios on that broadcast-sized table. Nothing
    data-scale happens after the first hash agg."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    hexpos = (
        "(instr('0123456789abcdef',"
        " substring(md5(cast(o_orderkey as string)), {i}, 1)) - 1)"
    )
    fold = F.expr(
        f"cast(({hexpos.format(i=1)} * 16 + {hexpos.format(i=2)}) % 5 as bigint)"
    )
    o = (
        # customer is NOT broadcast: it scales with the fact side (a
        # key-partitioned shuffle join is the 100 TB shape); nation
        # (25 rows) is the only hinted broadcast here.
        orders.join(
            cust.select("c_custkey", "c_nationkey"),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            fold.alias("fold"),
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
        )
    )
    cf = (
        o.groupBy("nation", "fold")
        .agg(
            F.count("*").cast("bigint").alias("n_f"),
            F.sum("cents").cast("bigint").alias("s_f"),
        )
        .localCheckpoint(eager=False)  # consumed by ct and the final join
    )
    ct = cf.groupBy("nation").agg(
        F.sum("n_f").cast("bigint").alias("n_c"),
        F.sum("s_f").cast("bigint").alias("s_c"),
    )
    return (
        cf.join(F.broadcast(ct), "nation")
        .select(
            "nation",
            "fold",
            "n_f",
            # NULLIF guard: if every order of a nation lands in one fold,
            # n_c == n_f and Spark's non-ANSI 0-division would yield NULL
            # while DuckDB's IEEE division yields inf — nullif makes both
            # engines emit NULL on that (data-dependent) edge.
            F.round(
                (F.col("s_c") - F.col("s_f")).cast("double")
                / F.nullif(F.col("n_c") - F.col("n_f"), F.lit(0))
                / 100.0,
                4,
            ).alias("oof_mean_usd"),
        )
        .orderBy("nation", "fold")
    )


# --- Mann-Whitney U (rank-sum) test ----------------------------------------------

# Nonparametric arm comparison for heavy-tailed metrics where the
# t/z-family (analytics_ab_lift) is wrong: rank-based U with the
# standard tie correction. Everything up to z is BIGINT-exact: average
# ranks enter only as 2·R1 = Σ n1_v·(2·below + t + 1) over VALUE
# groups (so ties never produce a float), and the tie term Σ(t³−t) is
# an integer sum. The rank prefix comes from the distributed
# global_cumsum over the value-distinct table — no single-task sort.
_MANN_WHITNEY_ORACLE = """
WITH u AS (
  SELECT user_id, CAST(user_id % 2 AS INTEGER) AS arm,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
              THEN CAST(round(value * 100, 0) AS BIGINT) END), 0) AS BIGINT)
           AS cents
  FROM events GROUP BY user_id
),
vals AS (
  SELECT cents, CAST(SUM(arm) AS BIGINT) AS n1_v,
         CAST(COUNT(*) AS BIGINT) AS nt_v
  FROM u GROUP BY cents
),
cumv AS (
  SELECT cents, n1_v, nt_v,
         SUM(nt_v) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM vals
),
s AS (
  SELECT CAST(SUM(n1_v * (2 * (cum - nt_v) + nt_v + 1)) AS BIGINT) AS r1x2,
         CAST(SUM(n1_v) AS BIGINT) AS n1,
         CAST(SUM(nt_v) AS BIGINT) AS n,
         CAST(SUM(nt_v * nt_v * nt_v - nt_v) AS BIGINT) AS ties
  FROM cumv
)
SELECT n1, n - n1 AS n2, CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2, ties,
       (CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2
        - CAST(n1 AS DOUBLE) * (n - n1) / 2)
       / sqrt(CAST(n1 AS DOUBLE) * (n - n1) / 12
              * ((n + 1) - CAST(ties AS DOUBLE)
                           / (CAST(n AS DOUBLE) * (n - 1)))) AS z
FROM s
"""


@graded("analytics_mann_whitney", oracle=_MANN_WHITNEY_ORACLE)
def analytics_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Mann-Whitney U between user-parity arms on
    per-user purchase cents. One user collapse → one value-distinct
    agg → distributed prefix sum (ranks.global_cumsum: range exchange
    + per-partition windows, no global single-task sort) → one 4-sum
    rollup; z is a single mirrored IEEE expression over exact
    integers."""
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
    vals = u.groupBy("cents").agg(
        F.sum("arm").cast("bigint").alias("n1_v"),
        F.count("*").cast("bigint").alias("nt_v"),
    )
    cumv = R.global_cumsum(vals, ["cents"], "nt_v", out="cum")
    s = cumv.agg(
        F.sum(
            F.col("n1_v")
            * (2 * (F.col("cum") - F.col("nt_v")) + F.col("nt_v") + 1)
        )
        .cast("bigint")
        .alias("r1x2"),
        F.sum("n1_v").cast("bigint").alias("n1"),
        F.sum("nt_v").cast("bigint").alias("n"),
        F.sum(
            F.col("nt_v") * F.col("nt_v") * F.col("nt_v") - F.col("nt_v")
        )
        .cast("bigint")
        .alias("ties"),
    )
    u1x2 = F.col("r1x2") - F.col("n1") * (F.col("n1") + 1)
    z = (
        u1x2.cast("double") / 2
        - F.col("n1").cast("double") * (F.col("n") - F.col("n1")) / 2
    ) / F.sqrt(
        F.col("n1").cast("double") * (F.col("n") - F.col("n1")) / 12
        * (
            (F.col("n") + 1)
            - F.col("ties").cast("double")
            / (F.col("n").cast("double") * (F.col("n") - 1))
        )
    )
    return s.select(
        "n1",
        (F.col("n") - F.col("n1")).cast("bigint").alias("n2"),
        u1x2.cast("bigint").alias("u1_x2"),
        "ties",
        z.alias("z"),
    )


# --- rendezvous-hash resharding: minimal-disruption re-shard (r10) ----------------

# Growing a training-data export from 8 to 9 shards with mod-hash
# (doc_id % N) moves ~8/9 of all keys — every downstream cache,
# resume-token, and dedup index invalidates. Rendezvous (HRW) hashing
# moves ONLY the keys the new shard wins: shard(k) = argmin over
# shards s of md5(s:k). This query grades the property itself: per
# old shard, how many keys depart — and `n_moved_elsewhere`, the
# count of keys that moved between OLD shards, which HRW guarantees
# is ZERO (a graded value, not a test assertion: if the hash family
# or tie-break broke the guarantee, the differential would fail).
# Everything is md5-string ranking — deterministic cross-engine; the
# argmin tie-break appends the shard id to the hash so min_by's key
# is unique.
_RENDEZVOUS_ORACLE = """
WITH scores AS (
  SELECT doc_id, s,
         md5(CAST(s AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR))
           || ':' || CAST(s AS VARCHAR) AS hk
  FROM documents, range(0, 9) t(s)
),
a8 AS (
  SELECT doc_id, arg_min(s, hk) AS shard_old
  FROM scores WHERE s < 8 GROUP BY doc_id
),
a9 AS (
  SELECT doc_id, arg_min(s, hk) AS shard_new
  FROM scores GROUP BY doc_id
)
SELECT CAST(a8.shard_old AS BIGINT) AS shard_old,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN a9.shard_new = 8 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_to_new,
       CAST(SUM(CASE WHEN a9.shard_new <> 8
                      AND a9.shard_new <> a8.shard_old
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_elsewhere
FROM a8 JOIN a9 ON a9.doc_id = a8.doc_id
GROUP BY a8.shard_old
"""


@graded("pipeline_rendezvous_resharding", oracle=_RENDEZVOUS_ORACLE)
def pipeline_rendezvous_resharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HRW resharding 8 → 9 (rationale above): per old shard, the keys
    that depart go ONLY to the new shard (n_moved_elsewhere = 0 by the
    rendezvous guarantee, graded as a value). Plan: one 9-way literal
    fan-out over doc ids (map-side), two groupBy(doc_id) argmins, one
    join on doc_id, final 8-row rollup — at 100 TB the fan-out factor
    is |shards|, the shuffles are all on doc_id, and nothing is
    corpus-broadcast."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    scores = docs.select(
        "doc_id",
        F.explode(F.array(*[F.lit(s) for s in range(9)])).alias("s"),
    ).select(
        "doc_id",
        "s",
        F.concat_ws(
            ":",
            F.md5(F.concat_ws(":", F.col("s").cast("string"),
                              F.col("doc_id").cast("string"))),
            F.col("s").cast("string"),
        ).alias("hk"),
    )
    a8 = (
        scores.where(F.col("s") < 8)
        .groupBy("doc_id")
        .agg(F.min_by("s", "hk").alias("shard_old"))
    )
    a9 = scores.groupBy("doc_id").agg(F.min_by("s", "hk").alias("shard_new"))
    return (
        a8.join(a9, "doc_id")
        .groupBy(F.col("shard_old").cast("bigint").alias("shard_old"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum((F.col("shard_new") == 8).cast("int"))
            .cast("bigint")
            .alias("n_to_new"),
            F.sum(
                ((F.col("shard_new") != 8)
                 & (F.col("shard_new") != F.col("shard_old"))).cast("int")
            )
            .cast("bigint")
            .alias("n_moved_elsewhere"),
        )
    )


# --- Kolmogorov–Smirnov two-sample test -------------------------------------------

# Distribution-shape counterpart of analytics_mann_whitney (location):
# KS asks whether URGENT and LOW order-value distributions differ
# ANYWHERE by comparing full ECDFs. D = max_v |F_a(v) − F_b(v)| needs
# a global prefix sum over the VALUE-DISTINCT table; both arms' prefix
# counts ride ONE distributed cumsum by packing (na_v, nb_v) into a
# single BIGINT (na_v·2³¹ + nb_v — exact while each arm < 2³¹ rows,
# i.e. ~2e9, far past any fixture and re-packable wider at need), so
# the range exchange happens once, not twice. Every ECDF value is an
# exact-integer ratio; D and the scaled statistic are identical-operand
# IEEE in both engines.
_KS_PACK = 1 << 31

_KS_ORACLE = """
WITH s AS (
  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_a
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
),
vals AS (
  SELECT cents, CAST(SUM(is_a) AS BIGINT) AS na_v,
         CAST(COUNT(*) - SUM(is_a) AS BIGINT) AS nb_v
  FROM s GROUP BY cents
),
cumv AS (
  SELECT SUM(na_v) OVER w AS cum_a, SUM(nb_v) OVER w AS cum_b
  FROM vals
  WINDOW w AS (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
),
t AS (SELECT CAST(MAX(cum_a) AS BIGINT) AS n_a,
             CAST(MAX(cum_b) AS BIGINT) AS n_b FROM cumv),
d AS (
  SELECT MAX(ABS(CAST(cum_a AS DOUBLE) / n_a
                 - CAST(cum_b AS DOUBLE) / n_b)) AS ks_d_raw
  FROM cumv, t
)
SELECT t.n_a, t.n_b,
       ROUND(d.ks_d_raw, 6) AS ks_d,
       ROUND(d.ks_d_raw * sqrt(CAST(t.n_a AS DOUBLE) * t.n_b
                               / (t.n_a + t.n_b)), 4) AS ks_stat
FROM t, d
"""


@graded("analytics_ks_test", oracle=_KS_ORACLE)
def analytics_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS statistic between URGENT and LOW order values.
    Plan: one row-scale agg to the value-distinct table, ONE
    distributed prefix sum (ranks.global_cumsum — range exchange +
    per-partition windows, no single-task global sort) carrying both
    arms in a packed BIGINT, then a scalar max. The oracle unpacks
    nothing: DuckDB runs two plain window sums, and the final doubles
    agree because every operand is an exact integer."""
    o = load_table(spark, sf_dir, "orders")
    s = o.where(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("is_a"),
    )
    vals = s.groupBy("cents").agg(
        F.sum("is_a").cast("bigint").alias("na_v"),
        (F.count("*") - F.sum("is_a")).cast("bigint").alias("nb_v"),
    )
    packed = vals.select(
        "cents", (F.col("na_v") * _KS_PACK + F.col("nb_v")).alias("comb")
    )
    cumv = (
        R.global_cumsum(packed, ["cents"], "comb", out="cum")
        .select(
            F.expr(f"cum DIV {_KS_PACK}").alias("cum_a"),
            (F.col("cum") % _KS_PACK).alias("cum_b"),
        )
        # r14 §2.4: cumv is consumed twice (the arm totals and the D
        # scan) and each evaluation re-ran the whole distributed
        # prefix-sum pipeline. Value-distinct-sized; computed once.
        .localCheckpoint(eager=False)
    )
    totals = cumv.agg(
        F.max("cum_a").cast("bigint").alias("n_a"),
        F.max("cum_b").cast("bigint").alias("n_b"),
    )
    d = (
        cumv.crossJoin(F.broadcast(totals))
        .agg(
            F.max(
                F.abs(
                    F.col("cum_a").cast("double") / F.col("n_a")
                    - F.col("cum_b").cast("double") / F.col("n_b")
                )
            ).alias("ks_d_raw"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
    )
    return d.select(
        "n_a",
        "n_b",
        F.round("ks_d_raw", 6).alias("ks_d"),
        F.round(
            F.col("ks_d_raw")
            * F.sqrt(
                F.col("n_a").cast("double")
                * F.col("n_b")
                / (F.col("n_a") + F.col("n_b"))
            ),
            4,
        ).alias("ks_stat"),
    )


# --- EXT: water-filling token-budget allocation (r11) -------------------------------

# The third mixing primitive next to temperature reweighting
# (pipeline_mix_temperature) and DSIR importance weights: given a
# total token budget B, give every source as much as it has UP TO a
# common cap L chosen so the allocations exactly exhaust B — the
# classic water-filling solution to "spend the budget as uniformly as
# possible without over-asking small sources". L has a closed form
# per sorted prefix: sources ascending by supply, the level sits in
# the first position k where supply_k >= (B - prefix_{k-1}) / (n-k+1),
# i.e. remaining budget spread over remaining sources stops exceeding
# the next supply. Everything is exact integer arithmetic (prefix sums
# BIGINT, the level an integer division) over the SOURCE MANIFEST —
# rows = number of sources, so the single-group window is deliberate
# manifest scale; the only data-sized work is the per-source token
# count.
_WATERFILL_BUDGET = 120_000

_WATERFILL_ORACLE = f"""
WITH supply AS (
  SELECT source,
         CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS tokens
  FROM documents GROUP BY source
),
ranked AS (
  SELECT source, tokens,
         ROW_NUMBER() OVER (ORDER BY tokens, source) AS rn,
         CAST(SUM(tokens) OVER (ORDER BY tokens, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS BIGINT) AS prefix_below,
         CAST(COUNT(*) OVER () AS BIGINT) AS n_sources
  FROM supply
),
lvl AS (
  -- The level is the candidate at the FIRST qualifying rank. Once the
  -- qualifying condition holds it holds for every later rank, and the
  -- candidate values are non-increasing across the qualifying suffix
  -- (removing a >=-average element can only lower the average), so
  -- MAX selects the first-rank candidate; MIN would pick the LAST
  -- (and goes negative once prefix_below exceeds the budget).
  SELECT MAX(CASE WHEN tokens * (n_sources - rn + 1)
                       >= {_WATERFILL_BUDGET} - COALESCE(prefix_below, 0)
             THEN ({_WATERFILL_BUDGET} - COALESCE(prefix_below, 0))
                  // (n_sources - rn + 1) END) AS level
  FROM ranked
)
SELECT r.source, r.tokens AS tokens_available,
       CAST(LEAST(r.tokens, COALESCE(l.level, r.tokens)) AS BIGINT)
         AS tokens_allocated,
       CAST(COALESCE(l.level, -1) AS BIGINT) AS fill_level,
       ROUND(CAST(LEAST(r.tokens, COALESCE(l.level, r.tokens)) AS DOUBLE)
             / r.tokens, 4) AS take_share
FROM ranked r, lvl l
ORDER BY r.source
"""


@graded("pipeline_water_filling", oracle=_WATERFILL_ORACLE)
def pipeline_water_filling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling allocation of a 120k-token budget across sources:
    every source contributes min(supply, L) with the level L chosen by
    the sorted-prefix closed form so small sources are never
    over-asked (rationale above the oracle)."""
    from ..operators import ranks as RK

    docs = load_table(spark, sf_dir, "documents")
    supply = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("bigint").alias("tokens")
    )
    w = Window.partitionBy(RK.UNIT_GROUP).orderBy("tokens", "source")
    ranked = (
        RK.attach_unit_group(supply)
        .withColumn("rn", F.row_number().over(w))
        .withColumn(
            "prefix_below",
            F.sum("tokens")
            .over(w.rowsBetween(Window.unboundedPreceding, -1))
            .cast("bigint"),
        )
        .withColumn(
            "n_sources",
            F.count(F.lit(1))
            .over(Window.partitionBy(RK.UNIT_GROUP))
            .cast("bigint"),
        )
    )
    remaining = F.lit(_WATERFILL_BUDGET) - F.coalesce(
        F.col("prefix_below"), F.lit(0)
    )
    slots = F.col("n_sources") - F.col("rn") + 1
    # MAX = first qualifying rank's candidate (non-increasing across
    # the qualifying suffix) — see the oracle's lvl CTE comment.
    lvl = ranked.agg(
        F.max(
            F.when(
                F.col("tokens") * slots >= remaining,
                F.expr(
                    f"({_WATERFILL_BUDGET} - COALESCE(prefix_below, 0))"
                    " DIV (n_sources - rn + 1)"
                ),
            )
        ).alias("level")
    )
    alloc = F.least(
        F.col("tokens"), F.coalesce(F.col("level"), F.col("tokens"))
    )
    return (
        ranked.crossJoin(F.broadcast(lvl))  # 1-row level attach
        .select(
            "source",
            F.col("tokens").alias("tokens_available"),
            alloc.cast("bigint").alias("tokens_allocated"),
            F.coalesce(F.col("level"), F.lit(-1))
            .cast("bigint")
            .alias("fill_level"),
            F.round(alloc.cast("double") / F.col("tokens"), 4).alias(
                "take_share"
            ),
        )
        .orderBy("source")
    )


# --- EXT: curation stage-order sensitivity eval (r11) --------------------------------

# A real curation-design question the funnel alone can't answer: does
# it matter whether the quality gate runs BEFORE dedup (canonical doc
# = min gated member of each SimHash group) or AFTER it (canonical =
# min member of the FULL group, then gated)? The orders diverge
# exactly on groups whose minimum doc fails quality while another
# member passes: quality-first keeps the best-effort survivor,
# dedup-first silently drops the whole group. This query runs both
# orders off the one session-shared hash frame and grades the
# divergence (docs unique to each order, token deltas) as exact
# integers — the measurement that justifies the funnel's
# quality-first ordering. No extra shuffle beyond the two
# simhash-keyed aggregates.
_ORDER_EVAL_ORACLE = _SIMHASH_SH_CTES + """,
quality AS (
  SELECT d.doc_id,
         LEN(string_split(d.text, ' ')) AS n_tokens,
         CASE WHEN LEN(string_split(d.text, ' ')) >= 8
               AND CAST(LEN(list_distinct(string_split(d.text, ' ')))
                        AS DOUBLE) / LEN(string_split(d.text, ' ')) >= 0.3
              THEN 1 ELSE 0 END AS passes
  FROM documents d
),
qf AS (
  SELECT MIN(q.doc_id) AS doc_id
  FROM sh s JOIN quality q ON q.doc_id = s.doc_id
  WHERE q.passes = 1
  GROUP BY s.simhash
),
df_surv AS (
  SELECT MIN(doc_id) AS doc_id FROM sh GROUP BY simhash
),
df AS (
  SELECT d.doc_id
  FROM df_surv d JOIN quality q ON q.doc_id = d.doc_id
  WHERE q.passes = 1
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM qf) AS n_quality_first,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM df) AS n_dedup_first,
  (SELECT CAST(SUM(q.n_tokens) AS BIGINT) FROM qf
     JOIN quality q ON q.doc_id = qf.doc_id) AS tokens_quality_first,
  (SELECT CAST(SUM(q.n_tokens) AS BIGINT) FROM df
     JOIN quality q ON q.doc_id = df.doc_id) AS tokens_dedup_first,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM qf
     WHERE doc_id NOT IN (SELECT doc_id FROM df)) AS only_quality_first,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM df
     WHERE doc_id NOT IN (SELECT doc_id FROM qf)) AS only_dedup_first
"""


@graded("pipeline_stage_order_eval", oracle=_ORDER_EVAL_ORACLE)
def pipeline_stage_order_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-first vs dedup-first funnel orders compared on one
    shared SimHash frame: surviving doc/token budgets per order and
    the docs unique to each (rationale above the oracle)."""
    from ..operators import text as T
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    sh = T.simhash_sh_cached(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    quality = docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.when(
            (F.size(toks) >= 8)
            & (
                F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
                >= 0.3
            ),
            1,
        )
        .otherwise(0)
        .alias("passes"),
    ).localCheckpoint()
    qf = (
        sh.join(quality, "doc_id")
        .where(F.col("passes") == 1)
        .groupBy("simhash")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    df_surv = sh.groupBy("simhash").agg(F.min("doc_id").alias("doc_id")).select(
        "doc_id"
    )
    dfq = df_surv.join(quality, "doc_id").where(F.col("passes") == 1).select(
        "doc_id"
    )

    def count_of(d: DataFrame, name: str) -> DataFrame:
        return d.agg(F.count(F.lit(1)).cast("bigint").alias(name))

    def tokens_of(d: DataFrame, name: str) -> DataFrame:
        return (
            d.join(quality, "doc_id")
            .agg(F.sum("n_tokens").cast("bigint").alias(name))
        )

    only_qf = count_of(qf.join(dfq, "doc_id", "left_anti"), "only_quality_first")
    only_df = count_of(dfq.join(qf, "doc_id", "left_anti"), "only_dedup_first")
    out = (
        count_of(qf, "n_quality_first")
        .crossJoin(F.broadcast(count_of(dfq, "n_dedup_first")))
        .crossJoin(F.broadcast(tokens_of(qf, "tokens_quality_first")))
        .crossJoin(F.broadcast(tokens_of(dfq, "tokens_dedup_first")))
        .crossJoin(F.broadcast(only_qf))
        .crossJoin(F.broadcast(only_df))
    )
    return out.select(
        "n_quality_first",
        "n_dedup_first",
        "tokens_quality_first",
        "tokens_dedup_first",
        "only_quality_first",
        "only_dedup_first",
    )


# --- EXT: decontamination n-gram-size sensitivity sweep (r12) ------------------------

# pipeline_decontaminate applies ONE rule (any shared 4-gram); the
# policy question every pretraining pipeline answers before committing
# is the SWEEP — how much training data does each n-gram size cost?
# Small n is aggressive (common phrases collide; heavy false-positive
# removal), large n is surgical (verbatim leakage only); the published
# pipelines picked 13 by exactly this curve. Four rule sizes
# n in {3, 4, 6, 8} are each graded with the production plan shape
# (benchmark gram set broadcast, train-side explode never shuffles)
# and reported as flagged-doc / flagged-token mass against the shared
# train totals. Gram sets of different n share nothing, so each n's
# grams are honestly computed in full; what IS shared (r13) is the
# plumbing — the four exploded streams union into one (n_gram, s)
# frame so a single broadcast build + probe join + grouped aggregate
# grades all four cells. Production sweeps run this on a sample; the
# unioned stream is sample-bounded exactly as the per-leg plans were.
_DECON_SWEEP_NS = [3, 4, 6, 8]


def _decon_sweep_leg_sql(n: int) -> str:
    gram = ", ".join(f"list_extract(w, i + {k})" for k in range(n))
    return f"""
sh{n} AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, GREATEST(LEN(w) - {n - 2}, 1)),
           i -> concat_ws(' ', {gram}))) AS shingles
  FROM wbase
),
bench{n} AS (
  SELECT DISTINCT unnest(shingles) AS s FROM sh{n} WHERE doc_id % 10 = 0
),
flag{n} AS (
  SELECT t.doc_id, COUNT(*) AS n_matched
  FROM (SELECT doc_id, unnest(shingles) AS s
        FROM sh{n} WHERE doc_id % 10 <> 0) t
  JOIN bench{n} b ON t.s = b.s
  GROUP BY t.doc_id
),
leg{n} AS (
  SELECT CAST({n} AS BIGINT) AS n_gram,
         CAST(COUNT(*) AS BIGINT) AS n_flagged_docs,
         CAST(COALESCE(SUM(f.n_matched), 0) AS BIGINT) AS n_matched_total,
         CAST(COALESCE(SUM(tc.n_tokens), 0) AS BIGINT) AS flagged_tokens
  FROM flag{n} f JOIN tokc tc ON tc.doc_id = f.doc_id
)"""


_DECON_SWEEP_ORACLE = (
    """
WITH wbase AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
tokc AS (
  SELECT doc_id, CAST(LEN(w) AS BIGINT) AS n_tokens FROM wbase
),
train_tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_train_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS train_tokens
  FROM tokc WHERE doc_id % 10 <> 0
),"""
    + ",".join(_decon_sweep_leg_sql(n) for n in _DECON_SWEEP_NS)
    + f""",
legs AS ({" UNION ALL ".join(f"SELECT * FROM leg{n}" for n in _DECON_SWEEP_NS)})
SELECT l.n_gram, l.n_flagged_docs, l.n_matched_total, l.flagged_tokens,
       t.n_train_docs, t.train_tokens,
       ROUND(CAST(l.n_flagged_docs AS DOUBLE) / t.n_train_docs, 4)
         AS flagged_doc_share,
       ROUND(CAST(l.flagged_tokens AS DOUBLE) / t.train_tokens, 4)
         AS flagged_token_share
FROM legs l, train_tot t
ORDER BY l.n_gram
"""
)


@graded("pipeline_decontam_sweep", oracle=_DECON_SWEEP_ORACLE)
def pipeline_decontam_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data cost of the n-gram decontamination rule per gram
    size n in {3,4,6,8}: flagged docs / matched grams / token mass vs
    the shared train totals (rationale above the oracle)."""
    from ..operators import text as T

    docs = load_table(spark, sf_dir, "documents")
    words = docs.repartition("doc_id").select(
        "doc_id", F.split("text", " ").alias("w")
    ).localCheckpoint()  # consumed by every leg + the token counts
    tokc = words.select(
        "doc_id", F.size("w").cast("bigint").alias("n_tokens")
    ).localCheckpoint()
    train_tot = tokc.where(F.col("doc_id") % 10 != 0).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_train_docs"),
        F.sum("n_tokens").cast("bigint").alias("train_tokens"),
    )

    # r13 (guide §2.4): the four per-n legs used to run 4 independent
    # broadcast builds + probe joins + 8 aggregates (one chain per gram
    # size). The per-n gram SETS share nothing, but the PLUMBING does:
    # tagging every gram with its rule size and unioning the four
    # exploded streams lets ONE distinct/broadcast build, ONE probe
    # join keyed on (n_gram, s) and ONE grouped aggregate grade all
    # four cells — per-n values are untouched because n_gram rides the
    # join and group keys. The 4-row manifest left join reproduces the
    # oracle's always-one-row-per-leg semantics (a zero-flag rule size
    # still reports 0s, as each leg's grouping-free aggregate did).
    def branch(n: int) -> DataFrame:
        return words.select(
            "doc_id",
            F.lit(n).cast("bigint").alias("n_gram"),
            F.explode(
                F.array_distinct(T.ngrams_from_words("w", n))
            ).alias("s"),
        )

    pairs = branch(_DECON_SWEEP_NS[0])
    for n in _DECON_SWEEP_NS[1:]:
        pairs = pairs.unionByName(branch(n))
    pairs = pairs.localCheckpoint()  # bench + train branches share it
    bench = (
        pairs.where(F.col("doc_id") % 10 == 0).select("n_gram", "s").distinct()
    )
    train = pairs.where(F.col("doc_id") % 10 != 0)
    flagged = (
        train.join(F.broadcast(bench), ["n_gram", "s"])
        .groupBy("n_gram", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    legs = (
        flagged.join(tokc, "doc_id")
        .groupBy("n_gram")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_flagged_docs"),
            F.sum("n_matched").cast("bigint").alias("n_matched_total"),
            F.sum("n_tokens").cast("bigint").alias("flagged_tokens"),
        )
    )
    man = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(n).cast("bigint") for n in _DECON_SWEEP_NS])
        ).alias("n_gram")
    )
    return (
        man.join(legs, "n_gram", "left")
        .crossJoin(F.broadcast(train_tot))  # 1-row totals attach
        .select(
            "n_gram",
            F.coalesce("n_flagged_docs", F.lit(0))
            .cast("bigint")
            .alias("n_flagged_docs"),
            F.coalesce("n_matched_total", F.lit(0))
            .cast("bigint")
            .alias("n_matched_total"),
            F.coalesce("flagged_tokens", F.lit(0))
            .cast("bigint")
            .alias("flagged_tokens"),
            "n_train_docs",
            "train_tokens",
            F.round(
                F.coalesce("n_flagged_docs", F.lit(0)).cast("double")
                / F.col("n_train_docs"),
                4,
            ).alias("flagged_doc_share"),
            F.round(
                F.coalesce("flagged_tokens", F.lit(0)).cast("double")
                / F.col("train_tokens"),
                4,
            ).alias("flagged_token_share"),
        )
        .orderBy("n_gram")
    )


# --- EXT: context-length trade-off sweep (r13) ---------------------------------------

# Choosing max_seq_len for a one-doc-per-sequence training run is a
# two-sided loss: every token past L is TRUNCATED away (information
# loss), every slot short of L is PADDING (compute waste). This table
# prices both sides for L in {32, 64, 96, 128} (the ladder straddles
# the fixture's token-length quartiles; a production corpus swaps in
# its own literals): truncated-token mass and share, padding mass and
# share of the n_docs*L slot budget, and the count of documents that
# get cut at all. One single-scan token-length projection x a 4-row
# broadcast ladder -> one map-side-combinable aggregate + a 1-row
# census attach; exact BIGINT everywhere. The two shares round in the
# INTEGER domain — (a*2e6 + d) intdiv (2d), i.e. half-up millionths —
# because the slot budget n_docs*L is 2-smooth, so a/(n_docs*L) can
# terminate at EXACTLY 7 decimal digits and double-ROUND(,6) then
# splits the tie differently across engines (measured: 8078/32000 =
# 0.2524375). Overflow bound a*2e6 < 2^63 holds to ~4.6e12 padding
# tokens — far past this eval family's documented sample sizes.
# (pipeline_pack_sequences grades the concat-and-pack alternative
# that trades these losses for cross-doc attention bleed — together
# they bound the preprocessing design space.)
_SEQLEN_LADDER = [32, 64, 96, 128]

_SEQLEN_SWEEP_ORACLE = f"""
WITH base AS (
  SELECT CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS tokens_total
  FROM base
),
ladder AS (
  SELECT CAST(unnest([{", ".join(str(v) for v in _SEQLEN_LADDER)}])
              AS BIGINT) AS max_seq_len
),
cells AS (
  SELECT l.max_seq_len,
         CAST(SUM(GREATEST(b.n_tokens - l.max_seq_len, 0)) AS BIGINT)
           AS tokens_truncated,
         CAST(SUM(l.max_seq_len - LEAST(b.n_tokens, l.max_seq_len))
              AS BIGINT) AS tokens_padding,
         CAST(SUM(CASE WHEN b.n_tokens > l.max_seq_len THEN 1 ELSE 0 END)
              AS BIGINT) AS docs_truncated
  FROM base b, ladder l
  GROUP BY l.max_seq_len
)
SELECT c.max_seq_len, c.tokens_truncated, c.tokens_padding,
       c.docs_truncated, t.n_docs, t.tokens_total,
       CAST((c.tokens_truncated * 2000000 + t.tokens_total)
            // (2 * t.tokens_total) AS DOUBLE) / 1000000.0 AS trunc_share,
       CAST((c.tokens_padding * 2000000 + t.n_docs * c.max_seq_len)
            // (2 * t.n_docs * c.max_seq_len) AS DOUBLE) / 1000000.0
         AS pad_share
FROM cells c, tot t
ORDER BY c.max_seq_len
"""


@graded("pipeline_seqlen_tradeoff_sweep", oracle=_SEQLEN_SWEEP_ORACLE)
def pipeline_seqlen_tradeoff_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Truncation loss vs padding waste per candidate max_seq_len —
    one token-length scan, a 4-row broadcast ladder, exact integer
    masses (rationale above the oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("tokens_total"),
    )
    ladder = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(v).cast("bigint") for v in _SEQLEN_LADDER])
        ).alias("max_seq_len")
    )
    cells = (
        base.crossJoin(F.broadcast(ladder))  # 4-row length ladder
        .groupBy("max_seq_len")
        .agg(
            F.sum(F.greatest(F.col("n_tokens") - F.col("max_seq_len"), F.lit(0)))
            .cast("bigint")
            .alias("tokens_truncated"),
            F.sum(
                F.col("max_seq_len")
                - F.least(F.col("n_tokens"), F.col("max_seq_len"))
            )
            .cast("bigint")
            .alias("tokens_padding"),
            F.sum(
                F.when(F.col("n_tokens") > F.col("max_seq_len"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("docs_truncated"),
        )
    )
    return (
        cells.crossJoin(F.broadcast(tot))  # 1-row census attach
        .select(
            "max_seq_len",
            "tokens_truncated",
            "tokens_padding",
            "docs_truncated",
            "n_docs",
            "tokens_total",
            (
                F.expr(
                    "CAST((tokens_truncated * 2000000 + tokens_total)"
                    " DIV (2 * tokens_total) AS DOUBLE)"
                )
                / 1000000.0
            ).alias("trunc_share"),
            (
                F.expr(
                    "CAST((tokens_padding * 2000000 + n_docs * max_seq_len)"
                    " DIV (2 * n_docs * max_seq_len) AS DOUBLE)"
                )
                / 1000000.0
            ).alias("pad_share"),
        )
        .orderBy("max_seq_len")
    )
