"""Graded Python-UDF surface (SURVEY §2.10 U1–U5).

UDFs are the slow path (Arrow round-trip out of the JVM — lifecycle
§3.2), so the engine keeps them OFF analytic hot paths; these queries
exist to prove the full vectorized-UDF surface works and stays
deterministic. Determinism notes per query:

- Pure +,-,*,/,sqrt chains are IEEE-754 correctly rounded → executing
  the identical expression order in pandas (float64) and DuckDB
  (DOUBLE) is bit-identical. U1/U5 rely on this.
- Group statistics (mean/std) are summation-order-dependent across
  engines; U2 rounds the z-score to 4 dp (SURVEY §8.5) — verified
  hash-stable on the fixed seed=42 fixtures at sf0.001 + sf0.01.
- pandas ``std()`` is ddof=1 ⇒ the oracle must use STDDEV_SAMP
  (SURVEY §8.6).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..registry import graded
from ..session import load_table

# --- U1: scalar pandas UDF — vectorized Arrow arithmetic ------------------------

_SCALAR_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                 AS DECIMAL(18,6)) AS DOUBLE) AS charge
FROM lineitem
WHERE l_orderkey % 32 = 0
"""


@pandas_udf(DoubleType())
def _charge(ep: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
    # Fixed evaluation order; +,*,- are correctly rounded → cross-engine exact.
    return ep * (1 - disc) * (1 + tax)


@graded("udf_scalar_charge", oracle=_SCALAR_ORACLE)
def udf_scalar_charge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: Arrow-vectorized scalar pandas UDF computing the TPC-H
    charge expression. One Python worker round-trip per batch; the
    filter still pushes down to the Parquet scan because it references
    only non-UDF columns."""
    li = load_table(spark, sf_dir, "lineitem").where("l_orderkey % 32 = 0")
    # The raw product is bit-identical across engines (fixed IEEE op
    # order); the DECIMAL(18,6) cast recovers the exact ≤6-dp value on
    # both sides (functions/numeric.py rationale) — never ROUND a raw
    # double, the .5-boundary direction differs per engine.
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _charge("l_extendedprice", "l_discount", "l_tax")
        .cast("decimal(18,6)")
        .cast("double")
        .alias("charge"),
    )


# --- U2: grouped-map applyInPandas — per-group z-score --------------------------

_GROUPED_ORACLE = """
SELECT event_id, event_type,
       ROUND((value - AVG(value) OVER (PARTITION BY event_type))
             / STDDEV_SAMP(value) OVER (PARTITION BY event_type), 4) AS zscore
FROM events
"""


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # Sort first: rows arrive in shuffle order, and pandas pairwise
    # summation is order-sensitive in the last ulp — sorting pins the
    # mean/std bit pattern run-to-run (same rule as SURVEY §8.4 for
    # anything order-sensitive).
    pdf = pdf.sort_values("event_id", ignore_index=True)
    z = (pdf["value"] - pdf["value"].mean()) / pdf["value"].std(ddof=1)
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "zscore": z.round(4),
        }
    )


@graded("udf_grouped_zscore", oracle=_GROUPED_ORACLE)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: canonical per-group normalization via ``applyInPandas``.
    One shuffle on the group key; each group materializes as one
    pandas frame (at 100 TB: groups must fit an executor — salt or
    pre-aggregate wider groups first)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").applyInPandas(
        _zscore_group, "event_id long, event_type string, zscore double"
    )


# --- U3: grouped-agg pandas UDAF ------------------------------------------------

_RANGE_ORACLE = """
SELECT event_type,
       MAX(value) - MIN(value) AS value_range
FROM events
GROUP BY event_type
"""


@pandas_udf(DoubleType())
def _value_range(v: pd.Series) -> float:
    # max - min: order-independent and IEEE-exact → no rounding needed.
    return float(v.max() - v.min())


@graded("udf_grouped_agg_range", oracle=_RANGE_ORACLE)
def udf_grouped_agg_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: pandas GROUPED_AGG UDAF (series → scalar per group) inside
    a normal ``groupBy().agg()`` — partial aggregation is disabled for
    Python UDAFs, so the full group ships to one worker; fine for
    low-cardinality keys, use built-ins otherwise."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(_value_range("value").alias("value_range"))


# --- U4: Python UDTF (1→N table function, Spark ≥3.5) — rows-only ---------------


_BIGRAMS_ORACLE = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE doc_id % 50 = 0
)
SELECT d.doc_id, CAST(t.i AS INTEGER) AS pos,
       d.w[t.i + 1] || ' ' || d.w[t.i + 2] AS bigram
FROM d, LATERAL (SELECT unnest(range(GREATEST(LEN(d.w) - 1, 0))) AS i) t
"""


@graded("udf_udtf_bigrams", oracle=_BIGRAMS_ORACLE)
def udf_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: Python UDTF expanding each document into its word bigrams
    via a lateral join. DuckDB has no UDTF, but the expansion is a
    deterministic function of the text, so the oracle re-derives it
    relationally (LATERAL unnest over the split array) — a full
    hash-match on a Python-UDTF path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, bigram string")
    class Bigrams:
        def eval(self, text: str):
            words = text.split(" ")
            for i in range(len(words) - 1):
                yield i, words[i] + " " + words[i + 1]

    docs = load_table(spark, sf_dir, "documents").where("doc_id % 50 = 0")
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("doc_bigrams", Bigrams)
    return spark.sql(
        """
        SELECT d.doc_id, b.pos, b.bigram
        FROM udtf_docs d, LATERAL doc_bigrams(d.text) b
        ORDER BY d.doc_id, b.pos
        """
    )


# --- U5: mapInPandas — partition-wise Arrow batch stream ------------------------

_MAPINPANDAS_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       ROUND(SQRT(CAST(n_chars AS DOUBLE)), 4) AS root_chars
FROM documents
"""


def _doc_stats(batches):
    import numpy as np

    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["text"].str.encode("utf-8").str.len(),
                # np.sqrt is IEEE correctly rounded (matches DuckDB SQRT
                # bit-for-bit); round(4) verified stable on the fixtures.
                "root_chars": np.sqrt(pdf["n_chars"].astype("float64")).round(4),
            }
        )


@graded("udf_map_in_pandas", oracle=_MAPINPANDAS_ORACLE)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5: ``mapInPandas`` — per-partition iterator of Arrow batches,
    the narrow (no-shuffle) UDF shape used for feature extraction at
    scale. Per-row pure functions keep it deterministic and
    oracle-checkable."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.mapInPandas(
        _doc_stats, "doc_id long, n_bytes long, root_chars double"
    )


# --- U2 at depth: true sequential recurrence (EWMA) -----------------------------

# EWMA is an infinite-memory recurrence (window_weighted_ma's FIR
# cousin): e₁ = v₁, eₙ = 0.5·vₙ + 0.5·eₙ₋₁. No frame aggregate can
# express it; Spark-side it is a per-group pandas loop, oracle-side a
# recursive CTE walking rn → rn+1. α = 0.5 keeps every coefficient
# dyadic and both engines run the identical multiply-add per step, so
# the raw doubles are BIT-IDENTICAL and graded unrounded — adding
# ROUND(,6) actually broke the match (Python round is decimal-correct,
# DuckDB rounds via a ×10⁶ multiply; ~1/700 values straddled the grid:
# identical-op-sequence beats rounding, SURVEY §8.3 corollary).
_EWMA_ORACLE = """
WITH RECURSIVE ev AS (
  SELECT user_id, ts, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE user_id % 11 = 0
),
r(user_id, rn, ewma) AS (
  SELECT user_id, rn, value FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn,
         CAST(0.5 AS DOUBLE) * e.value + CAST(0.5 AS DOUBLE) * r.ewma
  FROM r JOIN ev e ON e.user_id = r.user_id AND e.rn = r.rn + 1
)
SELECT e.user_id, e.event_id, r.ewma AS ewma
FROM r JOIN ev e ON e.user_id = r.user_id AND e.rn = r.rn
"""


@graded("udf_ewma_recurrence", oracle=_EWMA_ORACLE)
def udf_ewma_recurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA via applyInPandas — the shape that justifies the
    grouped-map UDF: a genuinely sequential recurrence no built-in
    window expresses. The explicit Python loop (not pandas .ewm) pins
    the exact multiply-add order the oracle's recursive CTE replays."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").where("user_id % 11 = 0")

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        out, acc = [], None
        for v in pdf["value"].to_numpy():
            acc = float(v) if acc is None else 0.5 * float(v) + 0.5 * acc
            out.append(acc)
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy(),
                "event_id": pdf["event_id"].to_numpy(),
                "ewma": out,
            }
        )

    return ev.select("user_id", "ts", "event_id", "value").groupBy(
        "user_id"
    ).applyInPandas(ewma, "user_id long, event_id long, ewma double")


# --- U6 (r13): mapInArrow — zero-copy RecordBatch iterator ----------------------

# ``mapInArrow`` is the lowest-overhead Python crossing Spark offers:
# the worker receives pyarrow.RecordBatch objects straight off the
# Arrow IPC stream — no pandas materialization, no index, no object
# boxing — the shape for batch-level columnar kernels (tokenizers,
# codec shims, vector math) where even the pandas conversion tax
# matters. Determinism: the kernel chain multiply/subtract/add runs
# the IDENTICAL IEEE-754 op order as the oracle's expression, so the
# raw doubles are bit-identical; the DECIMAL(18,6) recovery cast
# happens JVM-side after return (same recipe as U1).
_MAPINARROW_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                 AS DECIMAL(18,6)) AS DOUBLE) AS charge,
       CAST(CAST(l_quantity AS BIGINT) % 7 AS BIGINT) AS qty_bucket
FROM lineitem
WHERE l_orderkey % 48 = 0
"""


def _arrow_charge(batches):
    """RecordBatch-level kernel: charge + a quantity bucket, computed
    with pyarrow.compute (vectorized C++, never touches Python rows)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for b in batches:
        ep = b.column("l_extendedprice")
        charge = pc.multiply(
            pc.multiply(ep, pc.subtract(pa.scalar(1.0), b.column("l_discount"))),
            pc.add(pa.scalar(1.0), b.column("l_tax")),
        )
        # pyarrow.compute has no mod kernel: q % 7 == q - 7*(q // 7)
        # (integer divide truncates; quantities are non-negative).
        q = pc.cast(b.column("l_quantity"), pa.int64())
        qty_bucket = pc.subtract(
            q, pc.multiply(pa.scalar(7), pc.divide(q, pa.scalar(7)))
        )
        yield pa.RecordBatch.from_arrays(
            [
                b.column("l_orderkey"),
                b.column("l_linenumber"),
                charge,
                qty_bucket,
            ],
            names=["l_orderkey", "l_linenumber", "charge", "qty_bucket"],
        )


@graded("udf_map_in_arrow", oracle=_MAPINARROW_ORACLE)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U6: ``mapInArrow`` — per-partition iterator of raw Arrow
    RecordBatches (no pandas layer at all). Narrow (no shuffle), the
    key-range filter still pushes to the Parquet scan, and the batch
    shape is whatever ``spark.sql.execution.arrow.maxRecordsPerBatch``
    yields — the kernel never assumes batch boundaries."""
    li = load_table(spark, sf_dir, "lineitem").where("l_orderkey % 48 = 0")
    out = li.mapInArrow(
        _arrow_charge,
        "l_orderkey long, l_linenumber int, charge double, qty_bucket long",
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.col("charge").cast("decimal(18,6)").cast("double").alias("charge"),
        "qty_bucket",
    )
