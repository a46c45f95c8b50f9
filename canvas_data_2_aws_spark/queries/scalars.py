"""Scalar function families (SURVEY §2.7 F1–F8).

Every expression here is a built-in ``pyspark.sql.functions`` call —
JVM-side, inside whole-stage codegen; no Python touches the hot path.
Cross-engine dialect traps (verified by probe this session):

- DuckDB ``epoch(ts)`` returns fractional DOUBLE → ``FLOOR`` + cast to
  match Spark's truncating ``unix_timestamp``.
- Spark ``ceil/floor(double)`` → LONG, DuckDB → DOUBLE → cast both.
- Spark ``signum`` → DOUBLE, DuckDB ``sign`` → TINYINT → cast both.
- DuckDB ``regexp_extract`` returns '' on no-match, same as Spark (RE2
  syntax only — no backrefs/lookahead in graded patterns).
- posexplode is 0-based, DuckDB ordinality trick (lateral ``range``)
  is 1-based → emit 1-based both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import graded
from ..session import load_table

# --- F1: strings --------------------------------------------------------------

_STRING_ORACLE = """
SELECT
  doc_id,
  UPPER(lang) AS lang_upper,
  CAST(LENGTH(text) AS INTEGER) AS text_len,
  SUBSTRING(text, 1, 10) AS first10,
  CONCAT(lang, '-', source) AS tag,
  LPAD(lang, 5, '_') AS padded,
  TRIM(CONCAT(' ', lang, ' ')) AS trimmed,
  CAST(LEN(string_split(text, ' ')) AS INTEGER) AS n_tokens,
  CAST(text LIKE '%join%' AS INTEGER) AS has_join,
  regexp_extract(text, '^([a-z]+)', 1) AS first_word,
  REPLACE(CONCAT(lang, '-', source), '-', '_') AS tag_underscore
FROM documents
"""


@graded("scalar_string", oracle=_STRING_ORACLE)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface: case, length, substring (1-based both engines),
    concat, pad, trim, split+size, LIKE, RE2-safe regexp, replace."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.upper("lang").alias("lang_upper"),
        F.length("text").alias("text_len"),
        F.substring("text", 1, 10).alias("first10"),
        F.concat_ws("-", "lang", "source").alias("tag"),
        F.lpad("lang", 5, "_").alias("padded"),
        F.trim(F.concat(F.lit(" "), F.col("lang"), F.lit(" "))).alias("trimmed"),
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.col("text").like("%join%").cast("int").alias("has_join"),
        F.regexp_extract("text", r"^([a-z]+)", 1).alias("first_word"),
        F.replace(
            F.concat_ws("-", "lang", "source"), F.lit("-"), F.lit("_")
        ).alias("tag_underscore"),
    )


# --- F2: date/time -------------------------------------------------------------

_DATE_ORACLE = """
SELECT
  o_orderkey,
  CAST(o_orderdate AS DATE) AS order_date,
  CAST(YEAR(o_orderdate) AS INTEGER) AS yr,
  CAST(MONTH(o_orderdate) AS INTEGER) AS mo,
  CAST(DAY(o_orderdate) AS INTEGER) AS dy,
  CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
  CAST(o_orderdate AS DATE) + 30 AS plus30,
  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER)
    AS days_to_2002,
  CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS epoch_s
FROM orders
"""


@graded("scalar_date", oracle=_DATE_ORACLE)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time surface. Note the operand-order flip: Spark
    ``datediff(end, start)`` = DuckDB ``date_diff('day', start, end)``;
    UTC session TZ makes unix_timestamp equal DuckDB's epoch."""
    orders = load_table(spark, sf_dir, "orders")
    order_date = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        order_date.alias("order_date"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.date_add(order_date, 30).alias("plus30"),
        F.datediff(F.lit("2002-01-01").cast("date"), order_date).alias(
            "days_to_2002"
        ),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


# --- F3 + F4: math + conditional/null ------------------------------------------

_MATH_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  ABS(l_discount - 0.05) AS abs_dev,
  CAST(CEIL(l_extendedprice) AS DOUBLE) AS ceil_price,
  CAST(FLOOR(l_quantity) AS DOUBLE) AS floor_qty,
  SQRT(l_quantity) AS sqrt_qty,
  POWER(l_quantity, 2.0) AS qty_sq,
  l_orderkey % 7 AS mod7,
  CAST(SIGN(l_discount - 0.05) AS INTEGER) AS sgn,
  CASE WHEN l_quantity < 10 THEN 'low'
       WHEN l_quantity < 30 THEN 'mid'
       ELSE 'high' END AS qty_band,
  COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_or_neg,
  LEAST(l_quantity, l_extendedprice / 1000.0) AS best
FROM lineitem
"""


@graded("scalar_math", oracle=_MATH_ORACLE)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + conditional surface on IEEE-exact operations only: sqrt
    and integer-argument power are bit-deterministic; ln/log10/round on
    arbitrary doubles are NOT graded (HALF_UP vs binary divergence —
    SURVEY §2.7 F3)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_dev"),
        F.ceil("l_extendedprice").cast("double").alias("ceil_price"),
        F.floor(q).cast("double").alias("floor_qty"),
        F.sqrt(q).alias("sqrt_qty"),
        F.pow(q, 2.0).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("mod7"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("sgn"),
        F.when(q < 10, "low").when(q < 30, "mid").otherwise("high").alias("qty_band"),
        F.coalesce(F.nullif("l_discount", F.lit(0.0)), F.lit(-1.0)).alias(
            "disc_or_neg"
        ),
        F.least(q, F.col("l_extendedprice") / 1000.0).alias("best"),
    )


# --- F5: arrays / higher-order functions ----------------------------------------

_ARRAY_ORACLE = """
SELECT
  vec_id,
  CAST(LEN(embedding) AS INTEGER) AS dim,
  ROUND(SQRT(list_sum(list_transform(embedding,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
  ROUND(CAST(embedding[1] AS DOUBLE), 4) + 0.0 AS first_val,
  ROUND(CAST(embedding[2] AS DOUBLE), 4) + 0.0 AS second_val,
  ROUND(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 4) + 0.0 AS max_val
FROM embeddings
"""


@graded("scalar_array", oracle=_ARRAY_ORACLE)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface via higher-order functions (transform/aggregate) —
    the vector-math basis for KNN. Element-wise float32→double
    promotion BEFORE accumulation + ROUND(,4) on every float output
    (SURVEY §8.5)."""
    emb = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.expr(
        "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(sq_sum), 4).alias("l2_norm"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_val"),
        F.round(F.element_at("embedding", 2).cast("double"), 4).alias("second_val"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("max_val"),
    )


# --- F6 + F7: JSON + map shaping -------------------------------------------------

_JSON_ORACLE = """
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
  COALESCE(array_to_string(list_sort(json_keys(props)), ','), '') AS prop_keys,
  CAST(LEN(json_keys(props)) AS INTEGER) AS n_keys
FROM events
"""


@graded("scalar_json", oracle=_JSON_ORACLE)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column surface (the reference keeps Canvas jsonb payloads as
    serialized JSON strings — SURVEY §1.1). get_json_object pairs with
    DuckDB json_extract_STRING (plain json_extract returns quoted JSON
    and never hash-matches). Map shaping: parse→keys→sort, never emit
    MapType in a graded schema (F6)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.array_join(F.array_sort(F.map_keys(parsed)), ",").alias("prop_keys"),
        F.size(F.map_keys(parsed)).alias("n_keys"),
    )


# --- F8: explode / UDTF-shape 1→N expansion ---------------------------------------

_EXPLODE_ORACLE = """
SELECT
  vec_id,
  pos,
  ROUND(CAST(list_extract(embedding, pos) AS DOUBLE), 4) + 0.0 AS val
FROM embeddings, range(1, 5) t(pos)
"""


@graded("explode_array", oracle=_EXPLODE_ORACLE)
def explode_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of the first 4 embedding elements, emitted 1-based to
    align with the oracle's lateral range (SURVEY §2.7 F8)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.posexplode(F.slice("embedding", 1, 4))
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("long").alias("pos"),
        F.round(F.col("col").cast("double"), 4).alias("val"),
    )


# --- F1 extension: split_part/translate/reverse/repeat/instr/regexp-count -------

_STRING_EXT_ORACLE = """
SELECT doc_id,
       split_part(text, ' ', 2)                      AS second_word,
       translate(lang, 'aeiou', 'AEIOU')             AS lang_t,
       reverse(source)                               AS source_rev,
       repeat(lang, 2)                               AS lang2,
       strpos(text, 'join')                          AS join_pos,
       len(regexp_extract_all(text, 'join'))         AS join_count
FROM documents
WHERE doc_id % 4 = 0
"""


@graded("scalar_string_extended", oracle=_STRING_EXT_ORACLE)
def scalar_string_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 long tail: split_part, translate, reverse, repeat, instr
    (≡ strpos), regexp match counting (RE2-safe literal pattern)."""
    docs = load_table(spark, sf_dir, "documents").where("doc_id % 4 = 0")
    return docs.select(
        "doc_id",
        F.expr("split_part(text, ' ', 2)").alias("second_word"),
        F.translate("lang", "aeiou", "AEIOU").alias("lang_t"),
        F.reverse("source").alias("source_rev"),
        F.repeat("lang", 2).alias("lang2"),
        F.instr("text", "join").cast("long").alias("join_pos"),
        F.size(F.expr("regexp_extract_all(text, 'join', 0)"))
        .cast("long")
        .alias("join_count"),
    )


# --- F5 extension: higher-order filter / exists / array_min-max ----------------

_ARRAY_EXT_ORACLE = """
SELECT vec_id,
       LEN(list_filter(CAST(embedding AS DOUBLE[]), v -> v > 0)) AS n_pos,
       LEN(list_filter(CAST(embedding AS DOUBLE[]), v -> v > 0.3)) > 0 AS has_big,
       ROUND(list_min(CAST(embedding AS DOUBLE[])), 4) AS min_v,
       ROUND(list_max(CAST(embedding AS DOUBLE[])), 4) AS max_v
FROM embeddings
WHERE vec_id % 4 = 0
"""


@graded("scalar_array_extended", oracle=_ARRAY_EXT_ORACLE)
def scalar_array_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 long tail: higher-order filter + exists, array_min/max.
    Element comparisons run on identical float→double promotions, so
    counts/booleans are exact; min/max rounded per §8.5."""
    emb = load_table(spark, sf_dir, "embeddings").where("vec_id % 4 = 0")
    d = "transform(embedding, v -> CAST(v AS DOUBLE))"
    return emb.select(
        "vec_id",
        F.expr(f"size(filter({d}, v -> v > 0))").cast("long").alias("n_pos"),
        F.expr(f"exists({d}, v -> v > 0.3)").alias("has_big"),
        F.round(F.expr(f"array_min({d})"), 4).alias("min_v"),
        F.round(F.expr(f"array_max({d})"), 4).alias("max_v"),
    )


# --- F6: map construction + entry explosion ------------------------------------

_MAP_ORACLE = """
SELECT doc_id, 'lang' AS k, lang AS v FROM documents WHERE doc_id % 8 = 0
UNION ALL
SELECT doc_id, 'source' AS k, source AS v FROM documents WHERE doc_id % 8 = 0
"""


@graded("scalar_map_entries", oracle=_MAP_ORACLE)
def scalar_map_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: build a MapType column, explode via map_entries to (k, v)
    rows — MapType never appears in a graded schema (cross-engine map
    semantics differ; SURVEY §2.7 F6), entries do."""
    docs = load_table(spark, sf_dir, "documents").where("doc_id % 8 = 0")
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return docs.select(
        "doc_id", F.explode(F.map_entries(m)).alias("e")
    ).select("doc_id", F.col("e.key").alias("k"), F.col("e.value").alias("v"))


# --- F1 extension: edit distance (fuzzy matching primitive) ---------------------

_LEVENSHTEIN_ORACLE = """
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       levenshtein(a.p_name, b.p_name) AS edit_dist,
       levenshtein(a.p_brand, b.p_brand) AS brand_dist
FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
WHERE a.p_partkey % 8 = 0
"""


@graded("scalar_levenshtein", oracle=_LEVENSHTEIN_ORACLE)
def scalar_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein edit distance over adjacent-key name pairs — the
    string-similarity primitive fuzzy entity matching builds on
    (integer-exact, same DP definition in both engines). Quadratic in
    string length, linear in pairs: at scale pair generation must be
    blocked (sorted-neighborhood here via the key-adjacency join)."""
    p = load_table(spark, sf_dir, "part")
    a = p.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        F.col("p_brand").alias("brand_a"),
    ).where("key_a % 8 = 0")
    b = p.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        F.col("p_brand").alias("brand_b"),
    )
    return (
        a.join(b, F.col("key_b") == F.col("key_a") + 1)
        .select(
            "key_a",
            "key_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("edit_dist"),
            F.levenshtein("brand_a", "brand_b").cast("long").alias("brand_dist"),
        )
    )


# --- F3 extension: bitwise operators (bucket math / bitmap primitives) ----------

# Dialect deltas live in the oracle: DuckDB spells xor as xor() (its ^
# is exponentiation) and shifts as <</>>; Spark uses ^ and
# shiftleft/shiftright. bit_count is shared.
_BITWISE_ORACLE = """
SELECT o_orderkey,
       o_orderkey & 255 AS low_byte,
       o_orderkey | 4096 AS with_flag,
       xor(o_orderkey, 255) AS flipped,
       o_orderkey << 2 AS shl2,
       o_orderkey >> 3 AS shr3,
       CAST(bit_count(o_orderkey) AS INTEGER) AS popcount
FROM orders
WHERE o_orderkey % 16 = 0
"""


@graded("scalar_bitwise", oracle=_BITWISE_ORACLE)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR/shifts/popcount — the integer kernel under
    hash bucketing, bitmap indexes, and the SimHash/bit-sampling
    family. Pure int64 ops, bit-identical everywhere."""
    o = load_table(spark, sf_dir, "orders").where("o_orderkey % 16 = 0")
    return o.select(
        "o_orderkey",
        F.expr("o_orderkey & 255").alias("low_byte"),
        F.expr("o_orderkey | 4096").alias("with_flag"),
        F.expr("o_orderkey ^ 255").alias("flipped"),
        F.shiftleft("o_orderkey", 2).alias("shl2"),
        F.shiftright("o_orderkey", 3).alias("shr3"),
        F.bit_count("o_orderkey").alias("popcount"),
    )


# --- F1 extension: regexp_extract_all (multi-match extraction) ------------------

# RE2-safe pattern (no backrefs/lookahead — SURVEY §2.7 F1): word
# tokens ending in 'e'. Arrays are order-preserving in both engines
# (match order), joined to one string for the graded schema. DuckDB's
# array_to_string([]) is NULL where Spark's array_join is '' —
# COALESCE aligns the no-match rows.
_REGEX_ALL_ORACLE = r"""
SELECT doc_id,
       COALESCE(array_to_string(regexp_extract_all(text, '\b[a-z]+e\b'), '|'),
                '') AS e_words,
       LEN(regexp_extract_all(text, '\b[a-z]+e\b')) AS n_e_words
FROM documents
WHERE doc_id % 16 = 0
"""


@graded("scalar_regexp_extract_all", oracle=_REGEX_ALL_ORACLE)
def scalar_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""regexp_extract_all: every match, in match order (both engines
    scan left-to-right, so the joined string is deterministic)."""
    docs = load_table(spark, sf_dir, "documents").where("doc_id % 16 = 0")
    pat = r"\b[a-z]+e\b"
    return docs.select(
        "doc_id",
        F.array_join(F.regexp_extract_all("text", F.lit(pat), 0), "|").alias(
            "e_words"
        ),
        F.size(F.regexp_extract_all("text", F.lit(pat), 0)).cast("long").alias(
            "n_e_words"
        ),
    )


# --- F4 extension: error-safe evaluation (try_*) --------------------------------

# ANSI-mode-safe arithmetic: malformed casts, div-by-zero, and int64
# overflow yield NULL instead of failing the job — the semantics a
# fault-tolerant ingest pipeline needs. Oracle spellings differ:
# DuckDB has TRY_CAST but no try_divide/try_add, so the oracle uses
# NULLIF guards and an explicit overflow CASE (key + INT64_MAX
# overflows for every key > 0; key 0 — which the fixture contains —
# adds exactly).
_TRY_OPS_ORACLE = """
SELECT o_orderkey,
       TRY_CAST(o_orderpriority AS INTEGER) AS bad_int,
       TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_digit,
       o_totalprice / NULLIF(o_orderkey % 3, 0) AS safe_div,
       CASE WHEN o_orderkey > 0 THEN CAST(NULL AS BIGINT)
            ELSE 9223372036854775807 + o_orderkey END AS overflow_add,
       TRY_CAST(o_orderpriority AS TIMESTAMP) AS bad_ts
FROM orders
WHERE o_orderkey % 16 = 0
"""


@graded("scalar_try_ops", oracle=_TRY_OPS_ORACLE)
def scalar_try_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_cast / try_divide / try_add: NULL-on-error evaluation.
    o_orderpriority is '1-URGENT'-style, so its first char try_casts
    to a digit while the whole string does not; div-by-zero hits every
    third key; try_add overflows int64 for every positive key."""
    o = load_table(spark, sf_dir, "orders").where("o_orderkey % 16 = 0")
    return o.select(
        "o_orderkey",
        F.expr("try_cast(o_orderpriority AS INT)").alias("bad_int"),
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").alias(
            "prio_digit"
        ),
        F.expr("try_divide(o_totalprice, o_orderkey % 3)").alias("safe_div"),
        F.expr("try_add(o_orderkey, 9223372036854775807)").alias("overflow_add"),
        F.expr("try_cast(o_orderpriority AS TIMESTAMP)").alias("bad_ts"),
    )


# --- F2 extension: date/time formatting -----------------------------------------

# Formatting dialects differ (Java SimpleDateFormat vs strftime) but
# the same numeric patterns exist in both; only locale-dependent names
# (month/day words) are ungradable and excluded.
_DATE_FORMAT_ORACLE = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m') AS ym,
       strftime(o_orderdate, '%Y-%m-%d %H:%M') AS ymdhm,
       strftime(o_orderdate, '%j') AS day_of_year,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS iso_date
FROM orders
WHERE o_orderkey % 16 = 0
"""


@graded("scalar_date_format", oracle=_DATE_FORMAT_ORACLE)
def scalar_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_format surface: numeric patterns only (Spark 'yyyy-MM' ≡
    strftime '%Y-%m'; 'DDD' zero-padded ≡ '%j'); ISO date via the
    string cast both engines share."""
    o = load_table(spark, sf_dir, "orders").where("o_orderkey % 16 = 0")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm").alias("ymdhm"),
        F.date_format("o_orderdate", "DDD").alias("day_of_year"),
        F.col("o_orderdate").cast("date").cast("string").alias("iso_date"),
    )


# --- F5 completion: zip_with (element-wise binary HOF) --------------------------

_ZIP_DOT_ORACLE = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                              CAST(b.embedding AS DOUBLE[])), 4) AS dot
FROM embeddings a
JOIN embeddings b ON b.vec_id = a.vec_id + 1
WHERE a.vec_id % 4 = 0
"""


@graded("scalar_zip_dot", oracle=_ZIP_DOT_ORACLE)
def scalar_zip_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zip_with + aggregate dot product over adjacent-key vector pairs
    — the element-wise binary HOF (transform/aggregate cover the unary
    side in scalar_array). ROUND(,4) per SURVEY §8.5."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    dot = F.expr(
        "aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    return (
        a.where("vec_a % 4 = 0")
        .join(b, F.col("vec_b") == F.col("vec_a") + 1)
        .select("vec_a", "vec_b", F.round(dot, 4).alias("dot"))
    )


# --- F8 completion: null-preserving explode (explode_outer) ---------------------

# Rows whose filtered array is EMPTY must survive as a NULL row —
# the left-join semantics batch feature extraction needs (a document
# with no matches still exists downstream). Oracle: LEFT JOIN LATERAL
# unnest (verified: DuckDB emits the NULL row for empty lists).
_EXPLODE_OUTER_ORACLE = """
SELECT e.vec_id, ROUND(CAST(u.v AS DOUBLE), 4) AS big_val
FROM embeddings e
LEFT JOIN LATERAL (
  SELECT unnest(list_filter(e.embedding, x -> x > 0.25)) AS v
) u ON true
WHERE e.vec_id % 4 = 0
"""


@graded("explode_outer_sparse", oracle=_EXPLODE_OUTER_ORACLE)
def explode_outer_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer over a sparse higher-order filter (~20% of rows
    filter to empty at this threshold) — inner explode would silently
    drop those vectors."""
    emb = load_table(spark, sf_dir, "embeddings").where("vec_id % 4 = 0")
    big = F.expr("filter(embedding, x -> x > CAST(0.25 AS FLOAT))")
    return emb.select(
        "vec_id", F.explode_outer(big).alias("raw")
    ).select("vec_id", F.round(F.col("raw").cast("double"), 4).alias("big_val"))


# --- F1 extension: binary encodings (base64 / hex) ------------------------------

# Dialect deltas: DuckDB base64 takes a BLOB (encode()); to_hex of an
# integer omits leading zeros and upcases — Spark hex() matches the
# integer form exactly; md5 hex is lowercase in both.
_ENCODE_ORACLE = """
SELECT doc_id,
       base64(encode(lang)) AS lang_b64,
       to_hex(doc_id) AS id_hex,
       md5(lang) AS lang_md5
FROM documents
WHERE doc_id % 16 = 0
"""


@graded("scalar_binary_encode", oracle=_ENCODE_ORACLE)
def scalar_binary_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """base64 / hex / md5 encodings — content-addressing and wire-safe
    transport primitives (the payload-digest path multimodal columns
    use at scale)."""
    docs = load_table(spark, sf_dir, "documents").where("doc_id % 16 = 0")
    return docs.select(
        "doc_id",
        F.base64(F.encode("lang", "UTF-8")).alias("lang_b64"),
        F.hex("doc_id").alias("id_hex"),
        F.md5(F.encode("lang", "UTF-8")).alias("lang_md5"),
    )


# --- F3 extension: transcendental functions -------------------------------------

# libm implementations may differ in the last ulp across engines →
# ROUND(,4) on every output, the same policy as ln in text_tfidf;
# atan2/exp/sin/cos inputs are exact fixture doubles.
_TRIG_ORACLE = """
SELECT l_orderkey, l_linenumber,
       ROUND(sin(l_quantity), 4) AS sin_q,
       ROUND(cos(l_discount), 4) AS cos_d,
       ROUND(atan2(l_quantity, l_extendedprice / 1000), 4) AS angle,
       ROUND(exp(l_discount), 4) AS exp_d,
       ROUND(ln(l_quantity + 1), 4) AS ln_q1
FROM lineitem
WHERE l_orderkey % 64 = 0
"""


@graded("scalar_trig", oracle=_TRIG_ORACLE)
def scalar_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sin/cos/atan2/exp/ln — the transcendental tail of F3 (rounded
    per the libm policy above)."""
    li = load_table(spark, sf_dir, "lineitem").where("l_orderkey % 64 = 0")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin("l_quantity"), 4).alias("sin_q"),
        F.round(F.cos("l_discount"), 4).alias("cos_d"),
        F.round(
            F.atan2(F.col("l_quantity"), F.col("l_extendedprice") / 1000), 4
        ).alias("angle"),
        F.round(F.exp("l_discount"), 4).alias("exp_d"),
        F.round(F.log(F.col("l_quantity") + 1), 4).alias("ln_q1"),
    )


# --- Spark 4 collations: case-insensitive semantics without lower() wrapping ----

# Mixed-case column synthesized deterministically; the oracle expresses
# the collation as lower() (DuckDB has no collation-typed strings —
# UTF8_LCASE equality/distinctness is definitionally lowercase-equality
# for ASCII fixture data).
_COLLATION_ORACLE = """
SELECT CAST(p_size % 5 AS BIGINT) AS size_bucket,
       COUNT(DISTINCT CASE WHEN p_partkey % 2 = 0 THEN lower(p_brand)
                           ELSE p_brand END) AS n_raw,
       COUNT(DISTINCT lower(CASE WHEN p_partkey % 2 = 0 THEN lower(p_brand)
                                 ELSE p_brand END)) AS n_ci
FROM part
GROUP BY size_bucket
"""


@graded("scalar_collation", oracle=_COLLATION_ORACLE)
def scalar_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collated strings (Spark 4): DISTINCT under UTF8_LCASE merges
    case variants at the type level — the hash agg itself compares
    case-insensitively, no lower() projection in the plan. The raw
    count sees the synthesized case split; the collated count undoes
    it."""
    p = load_table(spark, sf_dir, "part")
    mixed = F.expr(
        "CASE WHEN p_partkey % 2 = 0 THEN lower(p_brand) ELSE p_brand END"
    )
    return (
        p.select(
            (F.col("p_size") % 5).cast("long").alias("size_bucket"),
            mixed.alias("mix"),
        )
        .groupBy("size_bucket")
        .agg(
            F.countDistinct("mix").alias("n_raw"),
            F.countDistinct(F.expr("collate(mix, 'UTF8_LCASE')")).alias("n_ci"),
        )
    )


# --- map higher-order functions: build → filter → transform → explode -----------

_MAP_HOF_ORACLE = """
SELECT p_type AS ptype, p_brand AS brand,
       CAST(COUNT(*) * 2 AS BIGINT) AS boosted
FROM part
GROUP BY p_type, p_brand
HAVING COUNT(*) >= 3
"""


@graded("scalar_map_hof", oracle=_MAP_HOF_ORACLE)
def scalar_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed HOF pipeline: per-type brand histogram packed into a
    map column (map_from_entries), pruned with map_filter, rescaled
    with transform_values, then exploded back to rows for grading —
    the round-trip every map-valued feature column takes. The oracle
    states the same result relationally (DuckDB's map surface can't
    express the HOF chain). Map build is one hash agg; the HOFs are
    per-row codegen over driver-bounded map sizes (≤ brand count)."""
    p = load_table(spark, sf_dir, "part")
    counts = p.groupBy("p_type", "p_brand").agg(F.count("*").alias("cnt"))
    packed = counts.groupBy("p_type").agg(
        F.map_from_entries(
            F.collect_list(F.struct("p_brand", "cnt"))
        ).alias("brand_counts")
    )
    boosted = packed.select(
        "p_type",
        F.transform_values(
            F.map_filter("brand_counts", lambda _, v: v >= 3),
            lambda _, v: v * 2,
        ).alias("m"),
    )
    return boosted.select(
        F.col("p_type").alias("ptype"), F.explode("m").alias("brand", "boosted")
    )
