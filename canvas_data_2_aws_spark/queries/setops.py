"""Sort / limit / set operations (SURVEY §2.6 O1–O6).

Key sets: customers with finished ('F') vs open ('O') orders —
verified non-trivial union/intersection/difference at every fixture
scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import graded
from ..session import load_table


def _status_keys(spark: SparkSession, sf_dir: str, status: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.where(F.col("o_orderstatus") == status).select(
        F.col("o_custkey").alias("custkey")
    )


# --- O2: global top-k (TakeOrderedAndProject, no full sort) -------------------

_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@graded("sort_limit_topk", oracle=_TOPK_ORACLE)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT k: each partition keeps a k-heap, driver merges
    k·p rows (TakeOrderedAndProject) — no global sort materialization,
    which is the only plan that survives 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# --- O3/O4: union all (multiplicity-preserving proof via counts) --------------

_UNION_ORACLE = """
SELECT custkey, COUNT(*) AS n_occurrences
FROM (
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
  UNION ALL
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
) t
GROUP BY custkey
"""


@graded("set_union", oracle=_UNION_ORACLE)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics proven by per-key multiplicities); the
    group-by output is simultaneously the distinct union (O4)."""
    f = _status_keys(spark, sf_dir, "F")
    o = _status_keys(spark, sf_dir, "O")
    return f.unionByName(o).groupBy("custkey").agg(F.count("*").alias("n_occurrences"))


# --- O5: intersect -------------------------------------------------------------

_INTERSECT_ORACLE = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
"""


@graded("set_intersect", oracle=_INTERSECT_ORACLE)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (distinct) — customers with both order kinds."""
    f = _status_keys(spark, sf_dir, "F")
    o = _status_keys(spark, sf_dir, "O")
    return f.intersect(o)


# --- O6: except ----------------------------------------------------------------

_EXCEPT_ORACLE = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
"""


@graded("set_except", oracle=_EXCEPT_ORACLE)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (distinct) — customers with only finished orders."""
    f = _status_keys(spark, sf_dir, "F")
    o = _status_keys(spark, sf_dir, "O")
    return f.subtract(o)


# --- O5/O6 bag semantics: INTERSECT ALL / EXCEPT ALL ----------------------------

# Multiplicity-preserving set ops: a customer with 3 'F' orders and
# 1 'O' order contributes min(3,1)=1 row to INTERSECT ALL and
# 3−1=2 rows to EXCEPT ALL — semantics the distinct forms erase.
_BAG_OPS_ORACLE = """
WITH ia AS (
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
  INTERSECT ALL
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
),
ea AS (
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
  EXCEPT ALL
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
)
SELECT custkey, COUNT(*) AS n, 'intersect_all' AS op FROM ia GROUP BY custkey
UNION ALL
SELECT custkey, COUNT(*) AS n, 'except_all' AS op FROM ea GROUP BY custkey
"""


@graded("set_bag_ops", oracle=_BAG_OPS_ORACLE)
def set_bag_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersectAll / exceptAll with per-key multiplicities (counted,
    since the raw bags are order-free duplicate rows)."""
    f = _status_keys(spark, sf_dir, "F")
    o = _status_keys(spark, sf_dir, "O")
    ia = (
        f.intersectAll(o)
        .groupBy("custkey")
        .agg(F.count("*").alias("n"))
        .withColumn("op", F.lit("intersect_all"))
    )
    ea = (
        f.exceptAll(o)
        .groupBy("custkey")
        .agg(F.count("*").alias("n"))
        .withColumn("op", F.lit("except_all"))
    )
    return ia.unionByName(ea)
