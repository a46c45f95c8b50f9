"""Graded sketch/approximate-structure queries (EXT beyond SURVEY §2.4
A4): bitmap-exact distinct, Apache DataSketches HLL with union-merge,
and a deterministic count-min sketch.

Why these exist at 100 TB: COUNT(DISTINCT) over a high-cardinality key
shuffles every distinct value; all three structures here shrink the
shuffle to fixed-size partial states that merge associatively —
map-side combine does almost all the work and the reduce stage moves
kilobytes. The bitmap variant stays EXACT (dense int keyspace), HLL is
the unbounded-keyspace estimate, count-min bounds per-item frequency
error. The CMS uses an md5 hash family so both engines compute the
identical sketch — a full SQL hash-match grade on an approximate
structure."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators import text as T
from ..registry import graded
from ..session import load_table

# --- bitmap-exact distinct count ------------------------------------------------

_BITMAP_ORACLE = """
SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_distinct_custs
FROM orders GROUP BY o_orderpriority
"""


@graded("agg_bitmap_distinct", oracle=_BITMAP_ORACLE)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count via roaring-style bitmaps:
    ``bitmap_construct_agg(bitmap_bit_position(key))`` per 32k-bucket,
    then sum of ``bitmap_count`` per group. Unlike COUNT(DISTINCT) —
    which shuffles every distinct (group, key) pair — the partial state
    is a fixed ≤4 KiB bitmap per (group, bucket): the map side
    compresses miles of keys into OR-able bitmaps, and the final agg
    is a sum of popcounts. The scale path for dense integer keys."""
    o = load_table(spark, sf_dir, "orders")
    per_bucket = o.groupBy(
        "o_orderpriority",
        F.expr("bitmap_bucket_number(o_custkey)").alias("bkt"),
    ).agg(
        F.expr(
            "bitmap_count(bitmap_construct_agg(bitmap_bit_position(o_custkey)))"
        ).alias("cnt")
    )
    return per_bucket.groupBy("o_orderpriority").agg(
        F.sum("cnt").alias("n_distinct_custs")
    )


# --- HLL sketch with union merge (rows-only: DuckDB has no DataSketches) --------


@graded("agg_hll_sketch_merge", oracle=None)
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-token estimate via DataSketches HLL, plus a
    corpus-wide row computed by ``hll_union_agg`` over the per-source
    sketches — the re-aggregation property that makes sketches the
    100 TB answer: per-partition sketches union without re-reading
    data. Deterministic given the data (no RNG), but DuckDB cannot
    reproduce the estimator ⇒ rows-only grade; the ±5%-of-exact bound
    is asserted in tests/test_sketches.py."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(T.tokens()).alias("token"))
    sketches = tok.groupBy("source").agg(
        F.expr("hll_sketch_agg(token, 14)").alias("sk")
    )
    per_source = sketches.select(
        "source",
        F.expr("hll_sketch_estimate(sk)").cast("long").alias("est_tokens"),
    )
    merged = sketches.agg(
        F.lit("__all__").alias("source"),
        F.expr("hll_sketch_estimate(hll_union_agg(sk, false))")
        .cast("long")
        .alias("est_tokens"),
    )
    return per_source.unionByName(merged)


# --- count-min sketch, deterministic md5 hash family (SQL hash-match) -----------

_CMS_W = 512  # buckets per row
_CMS_D = 4  # hash rows

_CMS_ORACLE = f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
seeds AS (SELECT unnest(range(0, {_CMS_D})) AS j),
hashed AS (
  SELECT token, j,
         CAST(concat('0x', substring(md5(CAST(j AS VARCHAR) || ':' || token),
                                     1, 8)) AS BIGINT) % {_CMS_W} AS bucket
  FROM tok, seeds
),
cms AS (
  SELECT j, bucket, COUNT(*) AS cnt FROM hashed GROUP BY j, bucket
),
exact AS (
  SELECT token, COUNT(*) AS exact_cnt FROM tok GROUP BY token
  ORDER BY exact_cnt DESC, token LIMIT 20
),
probes AS (
  SELECT e.token, e.exact_cnt, s.j,
         CAST(concat('0x', substring(md5(CAST(s.j AS VARCHAR) || ':' ||
                                         e.token), 1, 8)) AS BIGINT)
           % {_CMS_W} AS bucket
  FROM exact e, seeds s
)
SELECT p.token, p.exact_cnt,
       MIN(c.cnt) AS cms_est,
       MIN(c.cnt) - p.exact_cnt AS overcount
FROM probes p JOIN cms c ON c.j = p.j AND c.bucket = p.bucket
GROUP BY p.token, p.exact_cnt
"""


@graded("agg_cms_freq", oracle=_CMS_ORACLE)
def agg_cms_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the token stream: d=4 md5-derived hash
    rows × w=512 buckets, probe = min over rows of the bucket count.
    The sketch is a fixed d×w count grid — partial grids add
    elementwise, so the map side reduces an unbounded token stream to
    a 4×512 matrix regardless of scale. Estimates only ever OVER-count
    (asserted per row via ``overcount >= 0`` in tests). The md5 family
    makes the whole sketch engine-deterministic ⇒ full SQL hash-match
    grade — rare for an approximate structure."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(T.tokens()).alias("token"))
    seeds = spark.range(_CMS_D).select(F.col("id").alias("j"))

    def bucket(token_col: str):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("j").cast("string"), F.col(token_col))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _CMS_W
        )

    cms = (
        tok.crossJoin(F.broadcast(seeds))
        .groupBy("j", bucket("token").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )
    exact = (
        tok.groupBy("token")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "token")
        .limit(20)
    )
    probes = exact.crossJoin(F.broadcast(seeds)).select(
        "token", "exact_cnt", "j", bucket("token").alias("bucket")
    )
    return (
        probes.join(cms, ["j", "bucket"])
        .groupBy("token", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "token",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
        )
    )


# --- EXT: exact distinct-set algebra via bitmaps ---------------------------------

# Audience overlap without a COUNT(DISTINCT) pair shuffle: per-segment
# 32k-bucket bitmaps OR-merge map-side (the agg_bitmap_distinct
# machinery); the intersection falls out of inclusion–exclusion over
# three exact counts. Jaccard is an integer-operand division,
# unrounded.
_BITMAP_SET_ORACLE = """
WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
u AS (SELECT user_id FROM a UNION SELECT user_id FROM b)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS n_purchasers,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_clickers,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM u) AS n_union,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM a)
         + (SELECT CAST(COUNT(*) AS BIGINT) FROM b)
         - (SELECT CAST(COUNT(*) AS BIGINT) FROM u) AS n_both,
       CAST((SELECT CAST(COUNT(*) AS BIGINT) FROM a)
            + (SELECT CAST(COUNT(*) AS BIGINT) FROM b)
            - (SELECT CAST(COUNT(*) AS BIGINT) FROM u) AS DOUBLE)
         / (SELECT CAST(COUNT(*) AS BIGINT) FROM u) AS jaccard
"""


@graded("agg_bitmap_set_algebra", oracle=_BITMAP_SET_ORACLE)
def agg_bitmap_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact audience overlap (purchasers ∩ clickers) from mergeable
    bitmap partials: |A|, |B|, |A∪B| each cost one fixed-size bitmap
    agg; |A∩B| and Jaccard are inclusion–exclusion arithmetic. At
    100 TB the shuffle carries ≤4 KiB per (segment, bucket) instead of
    every distinct (segment, user) pair."""
    ev = load_table(spark, sf_dir, "events")
    seg = ev.select(
        "user_id",
        (F.col("event_type") == "purchase").alias("is_a"),
        (F.col("event_type") == "click").alias("is_b"),
    ).where(F.col("is_a") | F.col("is_b"))
    bucketed = seg.select(
        "is_a",
        "is_b",
        F.expr("user_id DIV 32768").alias("bkt"),
        F.expr("user_id % 32768 + 1").alias("pos"),
    )

    def count_of(flag):
        per_bucket = (
            bucketed.where(flag)
            .groupBy("bkt")
            .agg(F.expr("bitmap_count(bitmap_construct_agg(pos))").alias("c"))
        )
        return per_bucket.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("n"))

    na = count_of(F.col("is_a")).withColumnRenamed("n", "n_purchasers")
    nb = count_of(F.col("is_b")).withColumnRenamed("n", "n_clickers")
    nu = count_of(F.lit(True)).withColumnRenamed("n", "n_union")
    both = (
        F.col("n_purchasers") + F.col("n_clickers") - F.col("n_union")
    )
    return (
        na.crossJoin(nb)
        .crossJoin(nu)
        .select(
            "n_purchasers",
            "n_clickers",
            "n_union",
            both.alias("n_both"),
            (both.cast("double") / F.col("n_union")).alias("jaccard"),
        )
    )


# --- deterministic HLL: md5 registers, integer-exact accumulation (r9) -----------

# The hash-matched twin that closes the sketch family's last rows-only
# gap (agg_hll_sketch_merge stays rows-only because DataSketches
# registers aren't reproducible in DuckDB) — the same move that closed
# the IVF gap with ann_ivf_deterministic. Classic HLL with m = 256
# registers, every step cross-engine exact:
#   bucket  = first 2 md5 hex chars (the house 256-bucket STRING key);
#   rho     = leading-zero count of the next 8 hex chars + 1, derived
#             by STRING arithmetic (leading-'0' run ×4 + a per-nibble
#             lookup), capped at 32 so 2^(32-rho) stays integral;
#   S       = Σ 2^(32-R_j) accumulated as BIGINT (≤ 257·2³² < 2⁴¹ —
#             order-independent by construction, no float sum);
#   raw     = α·m²·2³² / S with α·m²·2³² embedded as ONE literal both
#             engines parse to the same double;
#   est     = m·ln(m/V) (linear counting) when raw ≤ 2.5 m and V > 0
#             zero registers remain, else raw — identical-operand IEEE.
# Registers merge associatively (MAX), so the partial state is 256
# bytes per group at any scale — the whole point of the sketch.
_HLL_ALPHA_M2_2_32 = "202175761456818.41"  # 0.7213/(1+1.079/256)·256²·2³²

_HLL_DET_ORACLE = f"""
WITH hashed AS (
  SELECT o_orderpriority AS grp, md5(CAST(o_custkey AS VARCHAR)) AS h
  FROM orders
),
rho AS (
  SELECT grp, substring(h, 1, 2) AS bucket,
         CASE WHEN ltrim(substring(h, 3, 8), '0') = '' THEN 32
              ELSE LEAST(
                (8 - length(ltrim(substring(h, 3, 8), '0'))) * 4
                + CASE substring(ltrim(substring(h, 3, 8), '0'), 1, 1)
                    WHEN '1' THEN 3
                    WHEN '2' THEN 2 WHEN '3' THEN 2
                    WHEN '4' THEN 1 WHEN '5' THEN 1
                    WHEN '6' THEN 1 WHEN '7' THEN 1
                    ELSE 0 END
                + 1, 32) END AS rho
  FROM hashed
),
regs AS (
  SELECT grp, bucket, MAX(rho) AS r FROM rho GROUP BY grp, bucket
),
acc AS (
  SELECT grp,
         CAST(COUNT(*) AS BIGINT) AS n_present,
         CAST(SUM(CAST(1 AS BIGINT) << (32 - r)) AS BIGINT) AS s_present
  FROM regs GROUP BY grp
),
est AS (
  SELECT grp,
         CAST(256 - n_present AS BIGINT) AS n_zero_registers,
         {_HLL_ALPHA_M2_2_32}
           / (s_present + (256 - n_present) * 4294967296) AS raw
  FROM acc
),
exact AS (
  SELECT o_orderpriority AS grp,
         COUNT(DISTINCT o_custkey) AS n_exact
  FROM orders GROUP BY grp
)
SELECT e.grp, x.n_exact, e.n_zero_registers,
       ROUND(CASE WHEN e.raw <= 640.0 AND e.n_zero_registers > 0
                  THEN 256.0 * ln(256.0 / e.n_zero_registers)
                  ELSE e.raw END, 4) AS hll_estimate
FROM est e JOIN exact x ON x.grp = e.grp
"""


@graded("agg_hll_deterministic", oracle=_HLL_DET_ORACLE)
def agg_hll_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog distinct-count estimate per order
    priority (md5-derived 256-register sketch, rationale above the
    oracle), with the exact count alongside for error inspection. Two
    hash aggs: (grp, bucket) MAX(rho) then per-grp integer fold — the
    shuffle carries ≤ 256 registers per group at any corpus size."""
    o = load_table(spark, sf_dir, "orders")
    hashed = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.md5(F.col("o_custkey").cast("string")).alias("h"),
    )
    rho = hashed.select(
        "grp",
        F.substring("h", 1, 2).alias("bucket"),
        F.expr(
            """CASE WHEN ltrim('0', substring(h, 3, 8)) = '' THEN 32
               ELSE LEAST(
                 (8 - length(ltrim('0', substring(h, 3, 8)))) * 4
                 + CASE substring(ltrim('0', substring(h, 3, 8)), 1, 1)
                     WHEN '1' THEN 3
                     WHEN '2' THEN 2 WHEN '3' THEN 2
                     WHEN '4' THEN 1 WHEN '5' THEN 1
                     WHEN '6' THEN 1 WHEN '7' THEN 1
                     ELSE 0 END
                 + 1, 32) END"""
        ).alias("rho"),
    )
    regs = rho.groupBy("grp", "bucket").agg(F.max("rho").alias("r"))
    acc = regs.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n_present"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 32 - r)"))
        .cast("bigint")
        .alias("s_present"),
    )
    est = acc.select(
        "grp",
        (F.lit(256) - F.col("n_present")).cast("bigint").alias("n_zero_registers"),
        (
            F.lit(float(_HLL_ALPHA_M2_2_32))
            / (
                F.col("s_present")
                + (F.lit(256) - F.col("n_present")) * F.lit(4294967296)
            )
        ).alias("raw"),
    )
    exact = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.countDistinct("o_custkey").alias("n_exact")
    )
    hll = F.when(
        (F.col("raw") <= 640.0) & (F.col("n_zero_registers") > 0),
        256.0 * F.log(256.0 / F.col("n_zero_registers")),
    ).otherwise(F.col("raw"))
    return est.join(exact, "grp").select(
        "grp", "n_exact", "n_zero_registers", F.round(hll, 4).alias("hll_estimate")
    )


# --- KMV set-overlap sketch: Jaccard from k-minimum values (r9) -------------------

# The sketch capability HLL does NOT have: set OVERLAP estimation.
# K-minimum-values keeps each set's k lexicographically-smallest
# md5(key) values (md5 order is uniform, so the k smallest of the
# UNION are a uniform sample of it); the fraction of that sample
# belonging to both sets estimates Jaccard. Everything is string
# ranking + integer counts — no hex-to-float parsing anywhere, so the
# whole sketch is trivially cross-engine. The exact Jaccard rides
# along for error inspection (same eval-next-to-sketch pattern as
# agg_hll_deterministic). The top-k is TakeOrderedAndProject — never
# a global sort — and the sketch state is k strings per set:
# mergeable (union = k smallest of concatenation), constant-size at
# any corpus.
_KMV_K = 256

_KMV_ORACLE = f"""
WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders
           WHERE o_orderpriority = '1-URGENT'),
b AS (SELECT DISTINCT o_custkey AS k FROM orders
      WHERE o_orderpriority = '5-LOW'),
u AS (
  SELECT k,
         CASE WHEN k IN (SELECT k FROM a) THEN 1 ELSE 0 END AS in_a,
         CASE WHEN k IN (SELECT k FROM b) THEN 1 ELSE 0 END AS in_b
  FROM (SELECT k FROM a UNION SELECT k FROM b) t
),
topk AS (
  SELECT in_a, in_b
  FROM (SELECT in_a, in_b,
               ROW_NUMBER() OVER (ORDER BY md5(CAST(k AS VARCHAR)), k) AS rn
        FROM u) r
  WHERE rn <= {_KMV_K}
),
sk AS (
  SELECT CAST(SUM(in_a * in_b) AS BIGINT) AS kmv_hits FROM topk
),
ex AS (
  SELECT CAST(SUM(in_a * in_b) AS BIGINT) AS n_inter,
         CAST(COUNT(*) AS BIGINT) AS n_union
  FROM u
)
SELECT CAST({_KMV_K} AS BIGINT) AS k,
       ex.n_inter, ex.n_union,
       ROUND(CAST(ex.n_inter AS DOUBLE) / ex.n_union, 4) AS j_exact,
       sk.kmv_hits,
       ROUND(CAST(sk.kmv_hits AS DOUBLE) / LEAST({_KMV_K}, ex.n_union), 4)
         AS j_kmv
FROM ex, sk
"""


@graded("agg_kmv_jaccard", oracle=_KMV_ORACLE)
def agg_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard similarity of two customer sets (URGENT vs LOW order
    priorities) estimated from a k=256 KMV sketch, with the exact
    value alongside (rationale above the oracle). Plan: two distinct
    aggs → full-outer flag join → TakeOrdered top-256 by md5 → two
    1-row aggregates cross-joined (bounded scalar attach)."""
    o = load_table(spark, sf_dir, "orders")

    def keys(prio: str, flag: str) -> DataFrame:
        return (
            o.where(F.col("o_orderpriority") == prio)
            .select(F.col("o_custkey").alias("k"))
            .distinct()
            .withColumn(flag, F.lit(1))
        )

    u = (
        keys("1-URGENT", "fa")
        .join(keys("5-LOW", "fb"), "k", "full_outer")
        .select(
            "k",
            F.coalesce("fa", F.lit(0)).alias("in_a"),
            F.coalesce("fb", F.lit(0)).alias("in_b"),
        )
        # MEASURED NEGATIVE (r14): a lazy checkpoint of u (consumed by
        # the KMV top-k and the exact census; saves one 2-scan distinct
        # +flag-join pass) benched 0.48/0.49 s old vs 0.55/0.55 s new
        # over two alternating process pairs (never crossed) — the
        # distinct-key materialization costs more than the saved pass
        # here. Do not re-try without new evidence.
    )
    topk = (
        u.select(
            "in_a", "in_b", F.md5(F.col("k").cast("string")).alias("h"), "k"
        )
        .orderBy("h", "k")
        .limit(_KMV_K)
    )
    sk = topk.agg(
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("kmv_hits")
    )
    ex = u.agg(
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("n_inter"),
        F.count("*").cast("bigint").alias("n_union"),
    )
    return (
        ex.crossJoin(F.broadcast(sk))  # 1-row sketch attach
        .select(
            F.lit(_KMV_K).cast("bigint").alias("k"),
            "n_inter",
            "n_union",
            F.round(F.col("n_inter").cast("double") / F.col("n_union"), 4).alias(
                "j_exact"
            ),
            "kmv_hits",
            # LEAST(k, n_union) denominator (ADVICE r9): when the union
            # is smaller than k the "sample" is the whole union and
            # dividing by the fixed k would bias the estimate low; with
            # n_union >= k this is exactly k.
            F.round(
                F.col("kmv_hits").cast("double")
                / F.least(F.lit(_KMV_K), F.col("n_union")),
                4,
            ).alias("j_kmv"),
        )
    )


# --- KMV-sample quantile sketch: mergeable percentiles, deterministic (r10) -------

# The quantile capability approx_percentile provides only rows-only:
# a DETERMINISTIC mergeable quantile estimate. The sketch state is the
# k = 256 rows with the smallest md5(key) — a uniform random-but-fixed
# sample of the table (md5 order is uniform in the keys), mergeable
# exactly like the KMV overlap sketch (union = k smallest of the
# concatenation, constant size at any corpus). The q-th percentile
# estimate is the DISCRETE percentile of the sample; discrete (index
# ((m-1)·q) DIV 100, pure integer arithmetic) rather than
# interpolated, so no float blending exists to diverge between
# engines — both sides select stored values verbatim. The exact
# discrete percentile rides along (distributed global ranks — never a
# single-task sort) so the row shows sketch error directly.
_QSK_K = 256
_QSK_QS = (25, 50, 75, 90, 99)

_QSK_ORACLE = f"""
WITH base AS (
  SELECT o_totalprice AS v, o_orderkey AS k FROM orders
),
nn AS (SELECT COUNT(*) AS n FROM base),
qs(q) AS (VALUES (25), (50), (75), (90), (99)),
ranked AS MATERIALIZED (
  SELECT v, ROW_NUMBER() OVER (ORDER BY v, k) AS rn FROM base
),
exact AS (
  SELECT qs.q, r.v AS exact_v
  FROM qs, nn
  JOIN ranked r ON r.rn = ((nn.n - 1) * qs.q) // 100 + 1
),
samp AS MATERIALIZED (
  SELECT v, k
  FROM (SELECT v, k,
               ROW_NUMBER() OVER (ORDER BY md5(CAST(k AS VARCHAR)), k) AS sr
        FROM base) t
  WHERE sr <= {_QSK_K}
),
mm AS (SELECT COUNT(*) AS m FROM samp),
sranked AS (
  SELECT v, ROW_NUMBER() OVER (ORDER BY v, k) AS srn FROM samp
),
est AS (
  SELECT qs.q, s.v AS kmv_v
  FROM qs, mm
  JOIN sranked s ON s.srn = ((mm.m - 1) * qs.q) // 100 + 1
)
SELECT CAST(e.q AS BIGINT) AS q, x.exact_v, e.kmv_v,
       ROUND(ABS(e.kmv_v - x.exact_v) / x.exact_v, 4) AS rel_err
FROM est e JOIN exact x ON x.q = e.q
"""


@graded("agg_quantile_sketch", oracle=_QSK_ORACLE)
def agg_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mergeable quantile sketch (rationale above): the
    256-smallest-md5 sample's discrete percentiles vs the exact
    discrete percentiles of o_totalprice, with relative error. Plan:
    sample side is TakeOrderedAndProject(256) + a 256-row local rank;
    exact side is the distributed global rank (operators/ranks.py) —
    no single-task sort anywhere; the 5-row q table is a literal
    fan-out and every attach is broadcast-bounded."""
    from ..operators.ranks import global_row_number

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("v"), F.col("o_orderkey").alias("k")
    )
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in _QSK_QS])).alias("q")
    )
    nn = o.agg(F.count("*").alias("n"))
    targets = F.broadcast(
        qs.crossJoin(F.broadcast(nn)).select(
            "q", F.expr("((n - 1) * q) DIV 100 + 1").alias("rn_t")
        )
    )
    ranked = global_row_number(o, ["v", "k"], out="rn")
    exact = ranked.join(targets, F.col("rn") == F.col("rn_t")).select(
        "q", F.col("v").alias("exact_v")
    )
    samp = (
        o.select("v", "k", F.md5(F.col("k").cast("string")).alias("h"))
        .orderBy("h", "k")
        .limit(_QSK_K)
    )
    mm = samp.agg(F.count("*").alias("m"))
    st = F.broadcast(
        qs.crossJoin(F.broadcast(mm)).select(
            "q", F.expr("((m - 1) * q) DIV 100 + 1").alias("srn_t")
        )
    )
    from pyspark.sql import Window

    # 256-row frame: the single-task sort is the intended plan here
    # (the sketch IS driver-sized by construction), declared via the
    # unit-group pattern so the plan audit sees a bounded window.
    from ..operators.ranks import UNIT_GROUP, attach_unit_group

    sranked = attach_unit_group(samp).withColumn(
        "srn",
        F.row_number().over(Window.partitionBy(UNIT_GROUP).orderBy("v", "k")),
    )
    est = sranked.join(st, F.col("srn") == F.col("srn_t")).select(
        "q", F.col("v").alias("kmv_v")
    )
    return (
        est.join(exact, "q")
        .select(
            F.col("q").cast("bigint").alias("q"),
            "exact_v",
            "kmv_v",
            F.round(
                F.abs(F.col("kmv_v") - F.col("exact_v")) / F.col("exact_v"), 4
            ).alias("rel_err"),
        )
    )


# --- join-cardinality estimation from count sketches ------------------------------

# The optimizer question at 100 TB: how big is A ⋈ B going to be,
# without scanning either side twice? The inner product of two
# count-min rows upper-bounds Σ_k cntA(k)·cntB(k) (Cormode &
# Muthukrishnan's join-size estimate); for a SELF join that is the
# second frequency moment F₂ = Σ_k cnt(k)² — the quantity that decides
# whether a key is safe to shuffle on or needs salting. Sketch state:
# d×w integers per side, mergeable, built in one pass. The md5 family
# keeps the whole estimate engine-deterministic, so even the
# approximation error is hash-graded; collisions only ADD cross terms,
# so est ≥ exact always (one-sided, pinned in tests).
_JC_ORACLE = f"""
WITH keys AS (
  SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY o_custkey
),
exact AS (
  -- cnt² accumulates as DECIMAL(38,0) ((19,0)×(19,0) product), not
  -- BIGINT: Spark's non-ANSI long sum wraps silently at ~9.2e18 while
  -- DuckDB widens to HUGEINT — decimal keeps both engines exact and
  -- identical; the final BIGINT cast is loud (null/error) on overflow.
  SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(CAST(cnt AS DECIMAL(19,0)) * CAST(cnt AS DECIMAL(19,0)))
              AS BIGINT) AS f2_exact
  FROM keys
),
seeds AS (SELECT unnest(range(0, {_CMS_D})) AS j),
cms AS (
  SELECT j,
         CAST(concat('0x', substring(md5(CAST(j AS VARCHAR) || ':' ||
                                         CAST(k AS VARCHAR)), 1, 8))
              AS BIGINT) % {_CMS_W} AS bucket,
         CAST(SUM(cnt) AS BIGINT) AS c
  FROM keys, seeds
  GROUP BY 1, 2
),
est AS (
  SELECT MIN(s) AS f2_cms
  FROM (SELECT j,
               SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) AS s
        FROM cms GROUP BY j) per_row
)
SELECT exact.n_rows, exact.n_keys, exact.f2_exact,
       CAST(est.f2_cms AS BIGINT) AS f2_cms,
       CAST(est.f2_cms - exact.f2_exact AS BIGINT) AS overcount,
       ROUND(CAST(est.f2_cms AS DOUBLE) / exact.f2_exact, 4) AS ratio
FROM exact, est
"""


@graded("validate_join_cardinality", oracle=_JC_ORACLE)
def validate_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join cardinality (F₂) of orders on o_custkey, exact AND
    from a 4×512 md5 count-min sketch — the shuffle-planning estimate
    next to its ground truth. One key collapse (map-side combinable),
    a broadcast 4-row seed axis, and two metadata-sized reductions;
    the sketch never exceeds d·w integers regardless of key
    cardinality."""
    o = load_table(spark, sf_dir, "orders")
    keys = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    # Squared moments accumulate as DECIMAL(38,0) (the (19,0)×(19,0)
    # product recipe) — a BIGINT sum of cnt² wraps silently in Spark's
    # non-ANSI mode at ~9.2e18 while DuckDB widens to HUGEINT.
    cnt19 = F.col("cnt").cast("decimal(19,0)")
    exact = keys.agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum(cnt19 * cnt19).cast("bigint").alias("f2_exact"),
    )
    seeds = spark.range(_CMS_D).select(F.col("id").alias("j"))
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(":", F.col("j").cast("string"), F.col("k").cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _CMS_W
    )
    cms = (
        keys.crossJoin(F.broadcast(seeds))
        .groupBy("j", bucket.alias("bucket"))
        .agg(F.sum("cnt").cast("bigint").alias("c"))
    )
    c19 = F.col("c").cast("decimal(19,0)")
    est = (
        cms.groupBy("j")
        .agg(F.sum(c19 * c19).alias("s"))
        .agg(F.min("s").cast("bigint").alias("f2_cms"))
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "n_rows",
        "n_keys",
        "f2_exact",
        "f2_cms",
        (F.col("f2_cms") - F.col("f2_exact")).cast("bigint").alias("overcount"),
        F.round(
            F.col("f2_cms").cast("double") / F.col("f2_exact"), 4
        ).alias("ratio"),
    )


# --- AMS (Tug-of-War) sign sketch: unbiased F2 ------------------------------------

# The two-sided companion to validate_join_cardinality: the CMS inner
# product can only OVER-estimate F₂; the Alon–Matias–Szegedy sign
# sketch is unbiased — each key pulls ±cnt(k) on a counter per hash
# row, and E[(Σ ±cnt)²] = F₂ exactly. The estimator here is the MEAN
# of d=8 independent rows (each row's (Σ±cnt)² is ~F₂·χ²₁, so a
# median-of-rows would sit near 0.455·F₂ — the textbook
# median-of-MEANS needs groups of rows, which at d=8 degenerates to
# the plain mean anyway); variance 2F₂²/d keeps the fixture estimates
# within ~2× (pinned loosely in tests), and the VALUES are
# engine-deterministic via the md5 sign family, so the grade is a
# full hash-match. Sketch state: d BIGINTs — the smallest mergeable
# summary in the repo.
_AMS_D = 8

_AMS_ORACLE = f"""
WITH keys AS (
  SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY o_custkey
),
exact AS (
  -- DECIMAL(38,0) accumulation ((19,0)×(19,0)): see validate_join_cardinality.
  SELECT CAST(SUM(CAST(cnt AS DECIMAL(19,0)) * CAST(cnt AS DECIMAL(19,0)))
              AS BIGINT) AS f2_exact
  FROM keys
),
seeds AS (SELECT unnest(range(0, {_AMS_D})) AS j),
signed AS (
  SELECT j,
         CASE WHEN substring(md5('ams:' || CAST(j AS VARCHAR) || ':'
                                  || CAST(k AS VARCHAR)), 1, 1) < '8'
              THEN cnt ELSE -cnt END AS pull
  FROM keys, seeds
),
rows_est AS (
  -- Σ±cnt accumulates as DECIMAL(38,0) and the square is the
  -- (19,0)×(19,0) product — a BIGINT Σ wraps silently in Spark while
  -- DuckDB widens, and the square overflows BIGINT at |Σ| > ~3e9.
  SELECT j,
         CAST(SUM(CAST(pull AS DECIMAL(38,0))) AS DECIMAL(19,0))
           * CAST(SUM(CAST(pull AS DECIMAL(38,0))) AS DECIMAL(19,0)) AS est
  FROM signed GROUP BY j
),
med AS (
  SELECT CAST(CAST(SUM(est) AS BIGINT) // {_AMS_D} AS BIGINT) AS f2_ams
  FROM rows_est
)
SELECT exact.f2_exact, med.f2_ams,
       ROUND(CAST(med.f2_ams AS DOUBLE) / exact.f2_exact, 4) AS ratio
FROM exact, med
"""


@graded("validate_f2_ams_sketch", oracle=_AMS_ORACLE)
def validate_f2_ams_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased F₂ estimate from an 8-row AMS sign sketch over the
    orders key distribution, next to the exact moment. One key
    collapse, an 8-way broadcast seed fan-out, and an 8-row tail; the
    d BIGINT counters merge by addition — the minimal distributed
    sketch. Estimator error is data-dependent (tests pin a loose
    band), but the VALUE is engine-deterministic, so the grade is a
    full hash-match."""
    o = load_table(spark, sf_dir, "orders")
    keys = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    cnt19 = F.col("cnt").cast("decimal(19,0)")
    exact = keys.agg(F.sum(cnt19 * cnt19).cast("bigint").alias("f2_exact"))
    seeds = spark.range(_AMS_D).select(F.col("id").alias("j"))
    signed = keys.crossJoin(F.broadcast(seeds)).select(
        "j",
        F.when(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit("ams"), F.col("j").cast("string"), F.col("k").cast("string")
                    )
                ),
                1,
                1,
            )
            < "8",
            F.col("cnt"),
        )
        .otherwise(-F.col("cnt"))
        .alias("pull"),
    )
    s19 = F.sum(F.col("pull").cast("decimal(38,0)")).cast("decimal(19,0)")
    rows_est = signed.groupBy("j").agg((s19 * s19).alias("est"))
    med = rows_est.agg(
        F.expr(f"CAST(SUM(est) AS BIGINT) DIV {_AMS_D}")
        .cast("bigint")
        .alias("f2_ams")
    )
    return exact.crossJoin(F.broadcast(med)).select(
        "f2_exact",
        "f2_ams",
        F.round(
            F.col("f2_ams").cast("double") / F.col("f2_exact"), 4
        ).alias("ratio"),
    )


# --- theta-sketch set-operation cardinalities (r11) --------------------------------

# agg_kmv_jaccard grades the OVERLAP ratio; the remaining sketch
# algebra a query planner actually consumes is cardinalities of
# union / intersection / difference from one constant-size summary.
# This is the KMV/theta construction on a NUMERIC hash: v = first 13
# md5 hex digits / 2^52 (the house uniform), keep the k smallest v of
# the union; theta = v_(k) (the k-th smallest), the retained sample is
# the k-1 below it, and any subset X estimates as |retained ∩ X| /
# theta (est_union = (k-1)/theta falls out as the X = everything
# case). Below k the sample IS the union (theta = 1, estimates exact —
# same degeneracy rule the KMV denominator fix pinned). Deterministic:
# md5 order with key tiebreak, identical-operand doubles both engines.
# Plan: two distinct collapses, full-outer flag join,
# TakeOrderedAndProject top-k (never a global sort), one 256-row
# manifest aggregate.
_THETA_K = 256

_THETA_ORACLE = f"""
WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders
           WHERE o_orderpriority = '1-URGENT'),
b AS (SELECT DISTINCT o_custkey AS k FROM orders
      WHERE o_orderpriority = '5-LOW'),
u AS (
  SELECT k,
         CASE WHEN k IN (SELECT k FROM a) THEN 1 ELSE 0 END AS in_a,
         CASE WHEN k IN (SELECT k FROM b) THEN 1 ELSE 0 END AS in_b,
         CAST(CAST(concat('0x', substring(md5(CAST(k AS VARCHAR)), 1, 13))
                   AS BIGINT) AS DOUBLE) / 4503599627370496.0 AS v
  FROM (SELECT k FROM a UNION SELECT k FROM b) t
),
ranked AS (
  SELECT in_a, in_b, v, ROW_NUMBER() OVER (ORDER BY v, k) AS rn FROM u
),
sk AS (
  SELECT CAST(SUM(CASE WHEN rn < {_THETA_K} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ret,
         CAST(SUM(CASE WHEN rn < {_THETA_K} AND in_a = 1 AND in_b = 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS h_inter,
         CAST(SUM(CASE WHEN rn < {_THETA_K} AND in_a = 1 AND in_b = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS h_a_only,
         CAST(SUM(CASE WHEN rn < {_THETA_K} AND in_a = 0 AND in_b = 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS h_b_only,
         COALESCE(MAX(CASE WHEN rn = {_THETA_K} THEN v END), 1.0) AS theta
  FROM ranked WHERE rn <= {_THETA_K}
),
ex AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_union,
         CAST(SUM(in_a * in_b) AS BIGINT) AS n_inter
  FROM u
)
SELECT CAST({_THETA_K} AS BIGINT) AS k,
       ex.n_union, ex.n_inter,
       ROUND(CAST(sk.n_ret AS DOUBLE) / sk.theta, 4) AS est_union,
       ROUND(CAST(sk.h_inter AS DOUBLE) / sk.theta, 4) AS est_inter,
       ROUND(CAST(sk.h_a_only AS DOUBLE) / sk.theta, 4) AS est_a_only,
       ROUND(CAST(sk.h_b_only AS DOUBLE) / sk.theta, 4) AS est_b_only
FROM ex, sk
"""


@graded("agg_theta_sketch_setops", oracle=_THETA_ORACLE)
def agg_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union/intersection/difference cardinalities of two customer
    sets from one k=256 theta sketch, exact values alongside
    (rationale above the oracle)."""
    from ..operators import ranks as RK

    o = load_table(spark, sf_dir, "orders")

    def keys(prio: str, flag: str) -> DataFrame:
        return (
            o.where(F.col("o_orderpriority") == prio)
            .select(F.col("o_custkey").alias("k"))
            .distinct()
            .withColumn(flag, F.lit(1))
        )

    v = (
        F.conv(F.substring(F.md5(F.col("k").cast("string")), 1, 13), 16, 10)
        .cast("long")
        .cast("double")
        / 4503599627370496.0
    )
    u = (
        keys("1-URGENT", "fa")
        .join(keys("5-LOW", "fb"), "k", "full_outer")
        .select(
            "k",
            F.coalesce("fa", F.lit(0)).alias("in_a"),
            F.coalesce("fb", F.lit(0)).alias("in_b"),
            v.alias("v"),
        )
    )
    # TakeOrderedAndProject top-k, then a K-row manifest window for the
    # rank (attach_unit_group: 256 rows by construction, never data).
    topk = u.orderBy("v", "k").limit(_THETA_K)
    ranked = RK.attach_unit_group(topk).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(RK.UNIT_GROUP).orderBy("v", "k")
        ),
    )
    ret = F.col("rn") < _THETA_K

    def hits(cond):
        return F.sum(F.when(ret & cond, 1).otherwise(0)).cast("bigint")

    sk = ranked.agg(
        F.sum(F.when(ret, 1).otherwise(0)).cast("bigint").alias("n_ret"),
        hits((F.col("in_a") == 1) & (F.col("in_b") == 1)).alias("h_inter"),
        hits((F.col("in_a") == 1) & (F.col("in_b") == 0)).alias("h_a_only"),
        hits((F.col("in_a") == 0) & (F.col("in_b") == 1)).alias("h_b_only"),
        F.coalesce(
            F.max(F.when(F.col("rn") == _THETA_K, F.col("v"))), F.lit(1.0)
        ).alias("theta"),
    )
    ex = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_union"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("n_inter"),
    )
    return ex.crossJoin(F.broadcast(sk)).select(
        F.lit(_THETA_K).cast("bigint").alias("k"),
        "n_union",
        "n_inter",
        F.round(F.col("n_ret").cast("double") / F.col("theta"), 4).alias(
            "est_union"
        ),
        F.round(F.col("h_inter").cast("double") / F.col("theta"), 4).alias(
            "est_inter"
        ),
        F.round(F.col("h_a_only").cast("double") / F.col("theta"), 4).alias(
            "est_a_only"
        ),
        F.round(F.col("h_b_only").cast("double") / F.col("theta"), 4).alias(
            "est_b_only"
        ),
    )


# --- EXT: quantile-sketch size/accuracy sweep (r12) -----------------------------------

# agg_quantile_sketch grades ONE sketch size (k = 256); the sizing
# question is the CURVE — how much accuracy does each doubling buy?
# Every smaller KMV sample is a PREFIX of the larger one (the k
# smallest md5 keys contain the k/2 smallest), so the whole sweep
# derives from the k = 512 sample computed once: a 4-row size ladder
# re-ranks the <= 512-row sketch manifest per size (bounded windows on
# a manifest, never the table) and each size's discrete percentile
# estimates are compared against the ONE exact distributed-rank side.
# Per-(k, q) relative errors are ROUND(,4) like the single-point eval;
# the per-k mean is decimal-quantized before its single division.
_QSK_SWEEP_KS = (64, 128, 256, 512)

_QSK_SWEEP_ORACLE = f"""
WITH base AS (
  SELECT o_totalprice AS v, o_orderkey AS sk FROM orders
),
nn AS (SELECT COUNT(*) AS n FROM base),
qs(q) AS (VALUES (25), (50), (75), (90), (99)),
ranked AS MATERIALIZED (
  SELECT v, ROW_NUMBER() OVER (ORDER BY v, sk) AS rn FROM base
),
exact AS (
  SELECT qs.q, r.v AS exact_v
  FROM qs, nn
  JOIN ranked r ON r.rn = ((nn.n - 1) * qs.q) // 100 + 1
),
samp AS MATERIALIZED (
  SELECT v, sk, sr
  FROM (SELECT v, sk,
               ROW_NUMBER() OVER (ORDER BY md5(CAST(sk AS VARCHAR)), sk) AS sr
        FROM base) t
  WHERE sr <= {max(_QSK_SWEEP_KS)}
),
ks AS (SELECT CAST(unnest([{", ".join(map(str, _QSK_SWEEP_KS))}]) AS BIGINT)
         AS kk),
lad AS (
  SELECT ks.kk, s.v, s.sk,
         ROW_NUMBER() OVER (PARTITION BY ks.kk ORDER BY s.v, s.sk) AS srn,
         COUNT(*) OVER (PARTITION BY ks.kk) AS m
  FROM ks JOIN samp s ON s.sr <= ks.kk
),
est AS (
  SELECT l.kk, qs.q, l.v AS est_v
  FROM lad l, qs
  WHERE l.srn = ((l.m - 1) * qs.q) // 100 + 1
),
err AS (
  SELECT e.kk, e.q,
         ROUND(ABS(e.est_v - x.exact_v) / x.exact_v, 4) AS rel_err
  FROM est e JOIN exact x ON x.q = e.q
)
SELECT kk AS k,
       CAST(COUNT(*) AS BIGINT) AS n_quantiles,
       MAX(rel_err) AS max_rel_err,
       ROUND(CAST(SUM(CAST(rel_err AS DECIMAL(38,12))) AS DOUBLE)
             / COUNT(*), 4) AS mean_rel_err
FROM err
GROUP BY kk
ORDER BY kk
"""


@graded("agg_quantile_sketch_sweep", oracle=_QSK_SWEEP_ORACLE)
def agg_quantile_sketch_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-size accuracy curve: max/mean relative error of the KMV
    quantile sketch's 5 discrete percentiles per size k in
    {64,128,256,512}, all from one 512-row sample and one exact rank
    side (rationale above the oracle)."""
    from pyspark.sql import Window

    from ..operators.ranks import UNIT_GROUP, attach_unit_group, global_row_number

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("v"), F.col("o_orderkey").alias("sk")
    )
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in _QSK_QS])).alias("q")
    )
    nn = o.agg(F.count("*").alias("n"))
    targets = F.broadcast(
        qs.crossJoin(F.broadcast(nn)).select(
            "q", F.expr("((n - 1) * q) DIV 100 + 1").alias("rn_t")
        )
    )
    ranked = global_row_number(o, ["v", "sk"], out="rn")
    exact = ranked.join(targets, F.col("rn") == F.col("rn_t")).select(
        "q", F.col("v").alias("exact_v")
    )
    kmax = max(_QSK_SWEEP_KS)
    samp = (
        o.select("v", "sk", F.md5(F.col("sk").cast("string")).alias("h"))
        .orderBy("h", "sk")
        .limit(kmax)
    )
    sr_ranked = attach_unit_group(samp).withColumn(
        "sr",
        F.row_number().over(Window.partitionBy(UNIT_GROUP).orderBy("h", "sk")),
    )
    ks = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(k).cast("bigint") for k in _QSK_SWEEP_KS])
        ).alias("kk")
    )
    # <=4x512-row ladder over the sketch manifest: per-size value rank
    # + size via bounded windows (the sketch IS manifest-sized).
    lad = (
        sr_ranked.crossJoin(F.broadcast(ks))
        .where(F.col("sr") <= F.col("kk"))
        .withColumn(
            "srn",
            F.row_number().over(
                Window.partitionBy("kk").orderBy("v", "sk")
            ),
        )
        .withColumn("m", F.count(F.lit(1)).over(Window.partitionBy("kk")))
    )
    est = lad.crossJoin(F.broadcast(qs)).where(
        F.expr("srn = ((m - 1) * q) DIV 100 + 1")
    ).select("kk", "q", F.col("v").alias("est_v"))
    err = est.join(F.broadcast(exact), "q").select(
        "kk",
        "q",
        F.round(
            F.abs(F.col("est_v") - F.col("exact_v")) / F.col("exact_v"), 4
        ).alias("rel_err"),
    )
    return (
        err.groupBy("kk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_quantiles"),
            F.max("rel_err").alias("max_rel_err"),
            F.round(
                F.sum(F.col("rel_err").cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("mean_rel_err"),
        )
        .select(F.col("kk").alias("k"), "n_quantiles", "max_rel_err", "mean_rel_err")
        .orderBy("k")
    )
