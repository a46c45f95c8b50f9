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
        F.octet_length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha"),
        F.col("meta.media_lang").alias("media_lang"),
        F.col("meta.content_length").alias("content_length"),
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
