"""Graded merge + exact-dedup queries (SURVEY §2.8 M1, M4).

The changeset is derived deterministically from ``orders`` inside the
query (FIXTURES.md — no changeset file exists on disk): updates for
keys %10==0 (excluding delete keys), deletes for %97==0, plus 100
fresh inserts cloned from the smallest keys. Both the Spark plan and
the DuckDB oracle build the identical changeset, so the merged replica
hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators.merge import apply_changeset
from ..registry import graded
from ..session import load_table

_ORDER_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)

_MERGE_ORACLE = """
WITH mx AS (SELECT MAX(o_orderkey) AS m FROM orders),
ins AS (
  SELECT mx.m + ROW_NUMBER() OVER (ORDER BY s.o_orderkey) AS o_orderkey,
         s.o_custkey, s.o_orderstatus, s.o_totalprice, s.o_orderdate,
         s.o_orderpriority, 'U' AS action
  FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 100) s, mx
),
changeset AS (
  SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
         o_totalprice + 1.0 AS o_totalprice, o_orderdate, o_orderpriority,
         'U' AS action
  FROM orders WHERE o_orderkey % 10 = 0 AND o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         o_orderpriority, 'D' AS action
  FROM orders WHERE o_orderkey % 97 = 0
  UNION ALL
  SELECT * FROM ins
)
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority
FROM orders
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM changeset)
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority
FROM changeset WHERE action = 'U'
"""


def derive_changeset(orders: DataFrame) -> DataFrame:
    """Deterministic synthetic changeset over ``orders`` (FIXTURES.md)."""
    key = F.col("o_orderkey")
    updates = (
        orders.where((key % 10 == 0) & (key % 97 != 0))
        .withColumn("o_orderstatus", F.lit("X"))
        .withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
        .withColumn("action", F.lit("U"))
    )
    deletes = orders.where(key % 97 == 0).withColumn("action", F.lit("D"))
    max_key = orders.agg(F.max("o_orderkey").alias("m"))
    smallest = orders.orderBy("o_orderkey").limit(100)
    inserts = (
        smallest.withColumn(
            "_rn", F.row_number().over(Window.orderBy("o_orderkey"))
        )
        .crossJoin(F.broadcast(max_key))
        .withColumn("o_orderkey", F.col("m") + F.col("_rn"))
        .withColumn("action", F.lit("U"))
        .select(*_ORDER_COLS, "action")
    )
    return (
        updates.select(*_ORDER_COLS, "action")
        .unionByName(deletes.select(*_ORDER_COLS, "action"))
        .unionByName(inserts)
    )


@graded("merge_upsert_apply", oracle=_MERGE_ORACLE)
def merge_upsert_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core syncdb semantics: apply a keyed changeset to the replica
    via the join-based merge plan (operators/merge.py)."""
    orders = load_table(spark, sf_dir, "orders")
    changeset = derive_changeset(orders)
    return apply_changeset(orders, changeset, keys=["o_orderkey"])


# --- M4: exact dedup (aggregate-stable form) ----------------------------------

_DEDUP_ORACLE = """
SELECT
  lang,
  COUNT(*) AS n_rows,
  COUNT(DISTINCT text) AS n_distinct_texts,
  COUNT(DISTINCT source) AS n_sources,
  CAST(COUNT(*) - COUNT(DISTINCT text) AS BIGINT) AS n_exact_dups
FROM documents
GROUP BY lang
"""


@graded("dedup_exact", oracle=_DEDUP_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate accounting per language.

    ``dropDuplicates`` row *choice* is nondeterministic, so the graded
    form aggregates (SURVEY §2.8 M4): rows vs distinct texts. Fixture
    texts are globally unique, so n_exact_dups is 0 — the invariant the
    oracle verifies; real dedup row-selection is exercised in unit
    tests via groupBy().agg(min(...)).
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("text").alias("n_distinct_texts"),
        F.countDistinct("source").alias("n_sources"),
        (F.count("*") - F.countDistinct("text")).alias("n_exact_dups"),
    )


# --- S2: JSONL envelope codec round-trip ---------------------------------------

_ENVELOPE_ORACLE = """
WITH mx AS (SELECT MAX(o_orderkey) AS m FROM orders),
ins AS (
  SELECT mx.m + ROW_NUMBER() OVER (ORDER BY s.o_orderkey) AS o_orderkey,
         s.o_custkey, s.o_orderstatus, s.o_totalprice, s.o_orderdate,
         s.o_orderpriority, 'U' AS action
  FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 100) s, mx
),
changeset AS (
  SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
         o_totalprice + 1.0 AS o_totalprice, o_orderdate, o_orderpriority,
         'U' AS action
  FROM orders WHERE o_orderkey % 10 = 0 AND o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey, CAST(NULL AS BIGINT) AS o_custkey,
         CAST(NULL AS VARCHAR) AS o_orderstatus,
         CAST(NULL AS DOUBLE) AS o_totalprice,
         CAST(NULL AS TIMESTAMP) AS o_orderdate,
         CAST(NULL AS VARCHAR) AS o_orderpriority, 'D' AS action
  FROM orders WHERE o_orderkey % 97 = 0
  UNION ALL
  SELECT * FROM ins
)
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority,
       action
FROM changeset
"""


@graded("jsonl_envelope_roundtrip", oracle=_ENVELOPE_ORACLE)
def jsonl_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: the CD2 incremental envelope codec, proven by round-trip —
    derive the changeset, serialize every record to the
    {key,value,meta} JSONL wire shape, parse it back with the strict
    server-declared schema (sources/envelope.py), and emit the typed
    rows. The oracle sees only the changeset definition: a codec bug
    (field drop, type drift, double mangling) breaks the hash.

    o_orderdate is excluded from the graded projection: timestamps
    round-trip through ISO JSON strings exactly, but exercising that
    here would tie the test to JSON timestamp formatting instead of
    envelope structure; tests/test_envelope.py covers it."""
    from ..sources.envelope import decode_envelope, encode_envelope

    orders = load_table(spark, sf_dir, "orders")
    changeset = derive_changeset(orders).drop("o_orderdate")
    wire = encode_envelope(changeset, key_cols=["o_orderkey"])
    decoded = decode_envelope(wire, table="orders", key_cols=["o_orderkey"])
    return decoded.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority", "action",
    )
