"""Graded semi-structured queries (EXT beyond SURVEY §2.7 F7): VARIANT
(Spark 4 binary JSON), XML decode, URL parsing, PII redaction.

The reference's envelope files carry change payloads as JSON text
(SURVEY §1.1); a Spark-4-native engine upgrades that path to VARIANT —
binary JSON with typed-path extraction that Parquet can shred into
columns, so ``variant_get`` reads only the referenced paths instead of
re-parsing the whole string per expression. At 100 TB that is the
difference between a scan-bound and a parse-bound pipeline.

Every query here synthesizes its semi-structured input deterministically
from fixture columns, so the DuckDB oracle can either parse the same
string or recompute the expected value straight from the base columns
(round-trip identity — the stronger check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import graded
from ..session import load_table

# --- VARIANT: typed-path extraction from binary JSON ----------------------------

# Build a nested JSON doc from event columns, then extract typed paths.
# The oracle parses the identical string with DuckDB's JSON functions.
_VARIANT_JSON = (
    "'{\"u\":' || user_id || ',\"t\":\"' || event_type || '\",\"n\":{\"k\":' ||"
    " get_json_object(props, '$.k') || '},\"tags\":[\"t1\",\"' || event_type"
    " || '\"]}'"
)

_VARIANT_ORACLE = """
SELECT event_id,
       CAST(json_extract_string(j, '$.u') AS BIGINT) AS u,
       json_extract_string(j, '$.t') AS t,
       CAST(json_extract_string(j, '$.n.k') AS BIGINT) AS k_nested,
       CAST(json_array_length(j, '$.tags') AS BIGINT) AS n_tags
FROM (
  SELECT event_id,
         '{"u":' || user_id || ',"t":"' || event_type || '","n":{"k":' ||
         json_extract_string(props, '$.k') || '},"tags":["t1","' ||
         event_type || '"]}' AS j
  FROM events WHERE event_id % 8 = 0
) s
"""


@graded("scalar_variant", oracle=_VARIANT_ORACLE)
def scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``parse_json`` → VARIANT → ``variant_get`` typed extraction
    (scalar long/string paths, nested object path, array cast + size).
    One parse per row feeds every extraction — the plan keeps the
    variant in a single projection instead of N string re-parses."""
    ev = load_table(spark, sf_dir, "events").where("event_id % 8 = 0")
    v = ev.select(
        "event_id", F.parse_json(F.expr(_VARIANT_JSON)).alias("v")
    )
    return v.select(
        "event_id",
        F.expr("variant_get(v, '$.u', 'long')").alias("u"),
        F.expr("variant_get(v, '$.t', 'string')").alias("t"),
        F.expr("variant_get(v, '$.n.k', 'long')").alias("k_nested"),
        F.expr("size(variant_get(v, '$.tags', 'array<string>'))")
        .cast("long")
        .alias("n_tags"),
    )


# --- XML: schema-applied decode + XPath -----------------------------------------

# Money goes through the XML as integer cents: raw double→string is
# engine-dependent (shortest-repr vs %g), integers are exact everywhere.
_XML_ORACLE = """
SELECT o_orderkey,
       o_orderkey AS xml_id,
       o_orderstatus AS st,
       CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
       o_orderstatus AS xp_st
FROM orders WHERE o_orderkey % 16 = 0
"""


@graded("scalar_xml", oracle=_XML_ORACLE)
def scalar_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``from_xml`` with an explicit schema (attribute → ``_id``) plus
    ``xpath_string`` — the two XML read paths. The oracle recomputes
    the expected values from the base columns, so the grade asserts a
    full encode→decode round-trip identity, not just parser parity."""
    o = load_table(spark, sf_dir, "orders").where("o_orderkey % 16 = 0")
    xml = F.expr(
        "'<o id=\"' || o_orderkey || '\"><st>' || o_orderstatus ||"
        " '</st><cents>' || CAST(round(o_totalprice * 100, 0) AS BIGINT) ||"
        " '</cents></o>'"
    )
    built = o.select("o_orderkey", xml.alias("xml"))
    parsed = built.select(
        "o_orderkey",
        F.from_xml("xml", "_id BIGINT, st STRING, cents BIGINT").alias("s"),
        F.xpath_string("xml", F.lit("/o/st")).alias("xp_st"),
    )
    return parsed.select(
        "o_orderkey",
        F.col("s._id").alias("xml_id"),
        F.col("s.st").alias("st"),
        F.col("s.cents").alias("cents"),
        "xp_st",
    )


# --- URL parsing ----------------------------------------------------------------

# Deterministic URL synthesized per document; the oracle recomputes
# host/path/params from the base columns (ground truth), so the grade
# checks Spark's parse_url against the URL's construction, not against
# another regex.
_URL_ORACLE = """
SELECT doc_id,
       source || '.example.org' AS host,
       '/' || lang || '/doc/' || doc_id AS path,
       source AS ref,
       CAST(doc_id % 7 AS BIGINT) AS page
FROM documents
"""


@graded("text_url_parse", oracle=_URL_ORACLE)
def text_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``parse_url`` component + query-parameter extraction (the log/
    clickstream normalization primitive)."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.expr(
        "'https://' || source || '.example.org/' || lang || '/doc/' ||"
        " doc_id || '?ref=' || source || '&page=' || (doc_id % 7)"
    )
    built = docs.select("doc_id", url.alias("url"))
    return built.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("ref")).alias("ref"),
        F.parse_url("url", F.lit("QUERY"), F.lit("page"))
        .cast("long")
        .alias("page"),
    )


# --- PII redaction --------------------------------------------------------------

# Same regexes on both sides; patterns stay inside the Java∩RE2 common
# subset (char classes, bounded repeats — no lookaround, no backrefs).
_EMAIL_RE = r"[a-z0-9.+-]+@[a-z0-9-]+\.com"
_PHONE_RE = r"\+1-555-[0-9]{4}"

_PII_ORACLE = f"""
SELECT doc_id,
       CAST(LEN(regexp_extract_all(pii, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(LEN(regexp_extract_all(pii, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(
             regexp_replace(pii, '{_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
FROM (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@mail-' || source ||
         '.com or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         || ' end' AS pii
  FROM documents
) s
"""


@graded("text_pii_redact", oracle=_PII_ORACLE)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over the corpus: count email/phone
    hits, then regexp_replace them out; graded on the md5 of the
    redacted text (hashes keep the graded payload small while pinning
    every byte). Training-data pipelines run exactly this shape as a
    pre-release compliance gate."""
    docs = load_table(spark, sf_dir, "documents")
    pii = F.expr(
        "text || ' contact user' || doc_id || '@mail-' || source ||"
        " '.com or +1-555-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0')"
        " || ' end'"
    )
    built = docs.select("doc_id", pii.alias("pii"))
    redacted = F.regexp_replace(
        F.regexp_replace("pii", _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return built.select(
        "doc_id",
        F.size(F.regexp_extract_all("pii", F.lit(_EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("pii", F.lit(_PHONE_RE), 0))
        .cast("long")
        .alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )
