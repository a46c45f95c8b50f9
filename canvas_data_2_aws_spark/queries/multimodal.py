"""Graded multimodal-column queries (SURVEY §1.3 / §2.8 EXT).

Payload bytes are opaque; the graded surface proves (a) binary
columns + typed metadata structs flow through scan → filter → project
→ hash untouched, and (b) the mapInPandas decode plumbing
(operators/multimodal.py) produces a stable frame-row schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import multimodal as MM
from ..registry import graded
from ..session import load_table

# --- binary payload + metadata: oracle-checked ---------------------------------

_BINARY_META_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS payload_sha,
       lang AS media_lang,
       length(text) AS content_length
FROM documents
WHERE lang IN ('en', 'zh')
"""


@graded("multimodal_binary_meta", oracle=_BINARY_META_ORACLE)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BinaryType payload with typed metadata: filter on metadata
    (never touching payload bytes), project byte length + SHA-256.
    Spark ``sha2(binary)`` ≡ DuckDB ``sha256(varchar)`` over the same
    UTF-8 bytes (both lowercase hex)."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload(docs)
    return media.where(F.col("meta.media_lang").isin("en", "zh")).select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha"),
        F.col("meta.media_lang").alias("media_lang"),
        F.col("meta.content_length").cast("long").alias("content_length"),
    )


# --- decode / frame-sample plumbing: rows-only (decoder is stubbed) -------------


@graded("multimodal_decode_frames", oracle=None)
def multimodal_decode_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N frame sampling through the mapInPandas decode path with the
    deterministic fake codec (real codec libs absent — see
    operators/multimodal.py). Rows-only: DuckDB has no analog of the
    decode stage."""
    docs = load_table(spark, sf_dir, "documents").where("doc_id % 20 = 0")
    media = MM.attach_payload(docs)
    frames = MM.decode_media(media, codec=MM.fake_codec)
    return frames.select(
        "doc_id",
        "frame_idx",
        "width",
        "height",
        F.round("mean_byte", 4).alias("mean_byte"),
    ).orderBy("doc_id", "frame_idx")


# --- decode path, oracle-checked: the fake codec is SQL-reproducible ------------

# The stand-in codec is a pure function of the payload bytes, and the
# fixture payloads are ASCII — so the oracle re-derives every frame
# (substring slices + ascii sums) and checks the ENTIRE mapInPandas
# decode path against DuckDB. Aggregates are integer-exact: widths and
# FLOOR(mean_byte) — floor of the same IEEE quotient is identical in
# every engine, unlike ROUND of a raw double (SURVEY §8.3 trap).
_DECODE_STATS_ORACLE = """
WITH f AS (
  SELECT doc_id, lang, text, length(text) AS n,
         least(3, greatest(1, length(text) // 64)) AS n_frames
  FROM documents WHERE doc_id % 4 = 0
),
frames AS (
  SELECT doc_id, lang, i.i AS frame_idx,
         64 + (n % 64) AS width,
         substring(text, i.i * (n // n_frames) + 1, n // n_frames) AS chunk
  FROM f, range(0, 3) i(i)
  WHERE i.i < n_frames
),
means AS (
  SELECT doc_id, lang, frame_idx, width,
         CASE WHEN length(chunk) = 0 THEN CAST(0 AS DOUBLE)
              ELSE CAST(list_sum(list_transform(
                     range(1, length(chunk) + 1),
                     j -> ascii(substring(chunk, j, 1)))) AS DOUBLE)
                   / length(chunk)
         END AS mean_byte
  FROM frames
)
SELECT lang,
       COUNT(*) AS n_frames,
       CAST(SUM(width) AS BIGINT) AS sum_width,
       CAST(SUM(CAST(FLOOR(mean_byte) AS BIGINT)) AS BIGINT) AS sum_floor_mean
FROM means
GROUP BY lang
"""


@graded("multimodal_decode_stats", oracle=_DECODE_STATS_ORACLE)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stats over DECODED frames — the full binary →
    mapInPandas(codec) → frame rows → aggregate pipeline with a hash
    oracle: the fake codec's features are re-derived in SQL, so a
    drift anywhere (payload encoding, Arrow batch shape, frame
    slicing, 1→N expansion) breaks the match. With a real codec this
    becomes the rows-only path (multimodal_decode_frames); the
    Spark-side plumbing is identical."""
    docs = load_table(spark, sf_dir, "documents").where("doc_id % 4 = 0")
    media = MM.attach_payload(docs)
    frames = MM.decode_media(media, codec=MM.fake_codec)
    lang = docs.select("doc_id", "lang")
    return (
        frames.join(lang, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_frames"),
            F.sum("width").alias("sum_width"),
            F.sum(F.floor("mean_byte").cast("long")).alias("sum_floor_mean"),
        )
    )


# --- resize plumbing: SQL-graded geometry, byte content pinned in tests ---------

# The fake resize keeps every k-th byte, k = ceil(n/1024) → output
# length ceil(n/k) is pure integer arithmetic on octet_length, which
# DuckDB reproduces exactly. Byte-level equality against the Python
# reference is asserted in
# tests/test_approx.py::test_resize_bytes_match_python_reference.
_RESIZE_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS orig_bytes,
       32 AS out_w, 32 AS out_h,
       CAST(CASE WHEN octet_length(encode(text)) <= 1024
                 THEN octet_length(encode(text))
                 ELSE (octet_length(encode(text))
                       + CAST(CEIL(octet_length(encode(text)) / 1024.0) AS BIGINT)
                       - 1)
                      // CAST(CEIL(octet_length(encode(text)) / 1024.0) AS BIGINT)
            END AS BIGINT) AS resized_bytes
FROM documents
"""


@graded("multimodal_resize_stats", oracle=_RESIZE_ORACLE)
def multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail/resize plumbing end-to-end: payloads stream through a
    mapInPandas resize stage (operators/multimodal.resize_media) and
    the graded output checks the geometry contract — original size,
    target dims, resized size — against the oracle's closed-form
    arithmetic. The resize runs in the same scan-parallel narrow stage
    a real thumbnailer would."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload(docs)
    resized = MM.resize_media(media, resizer=MM.fake_resize)
    orig = media.select("doc_id", F.octet_length("payload").cast("long").alias("orig_bytes"))
    return orig.join(resized, "doc_id").select(
        "doc_id",
        "orig_bytes",
        F.col("out_w").cast("int").alias("out_w"),
        F.col("out_h").cast("int").alias("out_h"),
        F.octet_length("resized").cast("long").alias("resized_bytes"),
    )


# --- storage accounting over the binary column -----------------------------------

# The capacity-planning rollup a multimodal lakehouse runs per
# (source, modality-language): object counts, byte totals, mean
# object size, and each group's share of the corpus — all computed
# from metadata + octet_length without ever decoding payload bytes.
_STORAGE_ORACLE = """
WITH m AS (
  SELECT source AS media_source, lang AS media_lang,
         octet_length(encode(text)) AS n_bytes
  FROM documents
),
t AS (SELECT CAST(SUM(n_bytes) AS BIGINT) AS total FROM m)
SELECT m.media_source, m.media_lang,
       CAST(COUNT(*) AS BIGINT) AS n_objects,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(SUM(n_bytes) AS DOUBLE) / COUNT(*) AS mean_bytes,
       CAST(SUM(n_bytes) AS DOUBLE) / t.total AS byte_share
FROM m, t
GROUP BY m.media_source, m.media_lang, t.total
"""


@graded("multimodal_storage_budget", oracle=_STORAGE_ORACLE)
def multimodal_storage_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, language) storage budget of the binary column:
    counts, bytes, mean size, corpus share. Pure metadata arithmetic —
    payload bytes never leave the scan — so the rollup costs one
    column-pruned scan at any corpus size; shares are integer-operand
    divisions, unrounded."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload(docs)
    m = media.select(
        F.col("meta.media_source").alias("media_source"),
        F.col("meta.media_lang").alias("media_lang"),
        F.octet_length("payload").cast("long").alias("n_bytes"),
    )
    t = m.agg(F.sum("n_bytes").alias("total"))
    return (
        m.groupBy("media_source", "media_lang")
        .agg(
            F.count(F.lit(1)).alias("n_objects"),
            F.sum("n_bytes").alias("total_bytes"),
            (F.sum("n_bytes").cast("double") / F.count(F.lit(1))).alias(
                "mean_bytes"
            ),
        )
        .crossJoin(F.broadcast(t))
        .withColumn(
            "byte_share", F.col("total_bytes").cast("double") / F.col("total")
        )
        .drop("total")
    )
