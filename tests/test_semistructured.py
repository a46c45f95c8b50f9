"""Semantic invariants for the semi-structured family
(queries/semistructured.py): round-trip identities and redaction
completeness — properties beyond the oracle hash."""

from __future__ import annotations

from pyspark.sql import functions as F

from canvas_data_2_aws_spark import registry
from canvas_data_2_aws_spark.session import load_table

registry.load_all()


def test_variant_roundtrip_matches_source_columns(spark, sf_dir):
    """Values extracted from the VARIANT equal the base columns they
    were built from (encode→parse→extract identity)."""
    out = registry.QUERIES["scalar_variant"](spark, sf_dir).alias("v")
    ev = load_table(spark, sf_dir, "events").alias("e")
    joined = out.join(ev, "event_id")
    bad = joined.where(
        (F.col("u") != F.col("user_id"))
        | (F.col("t") != F.col("event_type"))
        | (F.col("k_nested") != F.get_json_object("props", "$.k").cast("long"))
        | (F.col("n_tags") != 2)
    ).count()
    assert bad == 0


def test_xml_decode_recovers_all_fields(spark, sf_dir):
    """from_xml recovers attribute and element fields exactly; XPath
    agrees with the schema-applied decode."""
    rows = registry.QUERIES["scalar_xml"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.xml_id == r.o_orderkey
        assert r.xp_st == r.st
        assert r.cents >= 0


def test_url_parse_components(spark, sf_dir):
    """parse_url components reassemble into the source columns."""
    out = registry.QUERIES["text_url_parse"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    joined = out.join(docs, "doc_id")
    bad = joined.where(
        (F.col("host") != F.concat("source", F.lit(".example.org")))
        | (F.col("ref") != F.col("source"))
        | (F.col("page") != F.col("doc_id") % 7)
    ).count()
    assert bad == 0


def test_pii_redaction_is_complete(spark, sf_dir):
    """After redaction, zero email/phone patterns survive anywhere in
    the corpus — the compliance-gate property."""
    docs = load_table(spark, sf_dir, "documents")
    pii = F.expr(
        "text || ' contact user' || doc_id || '@mail-' || source ||"
        " '.com or +1-555-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0')"
        " || ' end'"
    )
    email_re = r"[a-z0-9.+-]+@[a-z0-9-]+\.com"
    phone_re = r"\+1-555-[0-9]{4}"
    redacted = docs.select(
        F.regexp_replace(
            F.regexp_replace(pii, email_re, "<EMAIL>"), phone_re, "<PHONE>"
        ).alias("clean")
    )
    survivors = redacted.where(
        F.col("clean").rlike(email_re) | F.col("clean").rlike(phone_re)
    ).count()
    assert survivors == 0
    # and every doc had at least one of each injected
    out = registry.QUERIES["text_pii_redact"](spark, sf_dir)
    assert out.where((F.col("n_emails") < 1) | (F.col("n_phones") < 1)).count() == 0
