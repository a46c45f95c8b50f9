"""Scans / projection / filter / sinks (SURVEY §2.1 S1–S5, §2.2 P1–P2)
plus the flagship aggregation ``agg_group_sum`` (§2.4 A1, = ``entry()``).

The reference's analytics surface is delegated to its replica store
(SURVEY §3.1); here the same surface is expressed directly as Catalyst
plans. Filters and projections in these queries reach the Parquet scan
(verify: ``.explain`` shows PushedFilters + pruned ReadSchema).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.numeric import davg, dsum, oracle_davg, oracle_dsum
from ..registry import graded
from ..session import load_table, materialize_outliving

# --- S1/S4 + P1/P2: scan with pushdown, project, filter ---------------------

_SCAN_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  CAST(l_shipdate AS DATE) AS ship_date,
  l_quantity,
  l_extendedprice * (1 - l_discount) AS disc_price
FROM lineitem
WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 30
"""


@graded("scan_project_filter", oracle=_SCAN_ORACLE)
def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar scan + conjunctive filter + computed projection.

    Per-row double arithmetic is IEEE-deterministic across engines (only
    aggregation order varies), so ``disc_price`` needs no decimal cast.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ship_date = F.col("l_shipdate").cast("date")
    return (
        li.where(
            ship_date.between(F.lit("1996-01-01"), F.lit("1997-12-31"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 30)
        ).select(
            "l_orderkey",
            "l_linenumber",
            ship_date.alias("ship_date"),
            "l_quantity",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        )
    )


# --- A1 flagship: TPC-H Q1-shape pricing summary -----------------------------

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {oracle_dsum('l_quantity', 'sum_qty')},
  {oracle_dsum('l_extendedprice', 'sum_base_price')},
  {oracle_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
  {oracle_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
  {oracle_davg('l_quantity', 'avg_qty')},
  {oracle_davg('l_extendedprice', 'avg_price')},
  {oracle_davg('l_discount', 'avg_disc')},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@graded("agg_group_sum", oracle=_Q1_ORACLE)
def agg_group_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: hash group-by with partial (map-side) aggregation.

    Flagship ``entry()`` query. Decimal-cast recipe (SURVEY §8.3) makes
    every SUM/AVG bit-identical to the DuckDB oracle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price"),
            dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --- S5/M2: partitioned parquet sink roundtrip (rows-only) -------------------


_SINK_ROUNDTRIP_ORACLE = """
SELECT o_orderstatus, COUNT(*) AS n_rows
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@graded("sink_roundtrip", oracle=_SINK_ROUNDTRIP_ORACLE)
def sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replica-at-rest write: partitioned parquet snapshot, then re-read.

    Models the reference's snapshot load / ``initdb`` (replace-all) —
    ``mode('overwrite')`` + ``partitionBy`` so partition pruning (DPP at
    scale) bites on the read side. DuckDB can't observe the sink, but
    it CAN state what a lossless round-trip must re-aggregate to — the
    per-partition-value counts against the source (upgraded from
    rows-only in round 6).
    """
    orders = load_table(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="cda2_sink_")
    try:
        (
            orders.write.mode("overwrite")
            .partitionBy("o_orderstatus")
            .parquet(path)
        )
        back = spark.read.parquet(path)
        # Materialize counts per partition value before the temp dir dies
        # — parquet-persist + checkpoint, never a driver collect.
        out = (
            back.groupBy("o_orderstatus")
            .agg(F.count("*").alias("n_rows"))
            .orderBy("o_orderstatus")
        )
        return materialize_outliving(out, path)
    finally:
        shutil.rmtree(path, ignore_errors=True)


# --- S3: CSV/TSV decode smoke (no CSV fixture → synthesize one) --------------


_TSV_DECODE_ORACLE = """
SELECT n_nationkey, n_name, n_regionkey FROM nation
"""


@graded("csv_decode_smoke", oracle=_TSV_DECODE_ORACLE)
def csv_decode_smoke(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-format decode: gzipped TSV with explicit schema.

    The reference's snapshot downloads arrive as gzipped CSV/TSV parts
    decoded against the server-declared schema (SURVEY §2.1 S3); no
    CSV fixture exists, so round-trip nation through TSV and grade the
    decoded rows against the source table — a full value hash on every
    column (upgraded from rows-only in
    round 6: quoting/escape drift through the TSV codec breaks it).
    """
    nation = load_table(spark, sf_dir, "nation")
    path = tempfile.mkdtemp(prefix="cda2_tsv_")
    try:
        (
            nation.write.mode("overwrite")
            .option("sep", "\t")
            .option("compression", "gzip")
            .option("header", "false")
            .csv(path)
        )
        back = spark.read.csv(path, sep="\t", schema=nation.schema, header=False)
        return materialize_outliving(back.orderBy("n_nationkey"), path)
    finally:
        shutil.rmtree(path, ignore_errors=True)


# --- S3 oracle-checked: typed gzipped-CSV round-trip ----------------------------

_CSV_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE o_orderkey % 8 = 0
"""


@graded("csv_roundtrip_typed", oracle=_CSV_ORACLE)
def csv_roundtrip_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gzipped-CSV decode with a full hash oracle: write an orders
    slice as compressed CSV, read it back against the server-declared
    schema, grade the typed rows against the source selection — any
    formatting/parse/type drift (doubles don't round-trip, quoting
    bugs, gzip issues) breaks the hash. Doubles survive because Spark
    writes shortest-repr decimal and IEEE parse restores the exact
    bits; the chosen columns carry no delimiters."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    orders = load_table(spark, sf_dir, "orders").where("o_orderkey % 8 = 0")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderpriority", StringType()),
        ]
    )
    path = tempfile.mkdtemp(prefix="cda2_csv_")
    try:
        (
            orders.select(*cols)
            .write.mode("overwrite")
            .option("compression", "gzip")
            .option("header", "true")
            .csv(path)
        )
        back = spark.read.csv(path, schema=schema, header=True)
        # Executor-block checkpoint (not a driver collect): the frame is
        # table-sized and only needs to outlive the tempdir cleanup.
        return back.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


# --- S4 counterpart: schema evolution across snapshot versions ------------------

_EVOLUTION_ORACLE = """
SELECT o_orderkey, o_totalprice,
       CAST(NULL AS VARCHAR) AS sync_origin
FROM orders WHERE o_orderkey % 10 = 3
UNION ALL
SELECT o_orderkey, o_totalprice,
       'v2' AS sync_origin
FROM orders WHERE o_orderkey % 10 = 7
"""


@graded("schema_evolution_merge", oracle=_EVOLUTION_ORACLE)
def schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-version bump across landed snapshot parts: a v1 part
    (old schema) and a v2 part (adds ``sync_origin``) read together
    with ``mergeSchema`` — v1 rows surface NULL for the new column,
    exactly how the replica absorbs a CD2 schema-version increment
    without rewriting history (SURVEY §1.1: client regenerates DDL on
    version bump; strict per-version reads stay the default — S4
    rejects drift unless evolution is explicit like here)."""
    orders = load_table(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="cda2_evo_")
    try:
        v1 = orders.where("o_orderkey % 10 = 3").select("o_orderkey", "o_totalprice")
        v2 = (
            orders.where("o_orderkey % 10 = 7")
            .select("o_orderkey", "o_totalprice")
            .withColumn("sync_origin", F.lit("v2"))
        )
        v1.write.mode("overwrite").parquet(f"{path}/p1")
        v2.write.mode("overwrite").parquet(f"{path}/p2")
        merged = spark.read.option("mergeSchema", "true").parquet(
            f"{path}/p1", f"{path}/p2"
        )
        # Full-result frame: persist + checkpoint so it outlives the
        # tempdir without shipping every row through the driver (the
        # r6-verdict collect→createDataFrame site, now purged).
        return materialize_outliving(merged, path)
    finally:
        shutil.rmtree(path, ignore_errors=True)


# --- S4 counterpart 2: server JSON-Schema -> StructType -> evolution ------------

_COMPILED_EVOLUTION_ORACLE = """
SELECT o_orderkey, o_totalprice,
       CAST(NULL AS VARCHAR) AS sync_origin
FROM orders WHERE o_orderkey % 10 = 2
UNION ALL
SELECT o_orderkey, o_totalprice,
       'v2' AS sync_origin
FROM orders WHERE o_orderkey % 10 = 8
"""

_ORDERS_SCHEMA_V1 = {
    "tableName": "orders_slim",
    "schemaVersion": 1,
    "schema": {
        "type": "object",
        "properties": {
            "o_orderkey": {"type": "integer"},
            "o_totalprice": {"type": "number"},
        },
        "required": ["o_orderkey"],
    },
}

_ORDERS_SCHEMA_V2 = {
    "tableName": "orders_slim",
    "schemaVersion": 2,
    "schema": {
        "type": "object",
        "properties": {
            "o_orderkey": {"type": "integer"},
            "o_totalprice": {"type": "number"},
            "sync_origin": {"type": ["string", "null"]},
        },
        "required": ["o_orderkey"],
    },
}


@graded("schema_compiled_evolution", oracle=_COMPILED_EVOLUTION_ORACLE)
def schema_compiled_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full server-schema lifecycle (SURVEY §1.1): two versions of
    a table's JSON-Schema document are COMPILED to StructTypes
    (sources/schema_compiler.py), the migration plan is derived from
    the version bump (additive column ``sync_origin``), a part is
    landed under each compiled schema, and the replica reads both
    parts under the regenerated v2 schema — v1 rows surface NULL for
    the added column. This is ``get_table_schema`` → DDL-regeneration
    → evolution, with the schema never inferred at any step."""
    from ..sources.schema_compiler import compile_json_schema, migrate

    st1 = compile_json_schema(_ORDERS_SCHEMA_V1)
    # migrate() forces added columns nullable in the returned
    # StructType (historical parts surface NULL for them), so it IS
    # the read schema — no manual nullable rebuild needed.
    st2, added = migrate(_ORDERS_SCHEMA_V1, _ORDERS_SCHEMA_V2)
    assert added == ["sync_origin"], added
    orders = load_table(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="cda2_cevo_")
    try:
        v1 = orders.where("o_orderkey % 10 = 2").select(
            *[F.col(f.name).cast(f.dataType) for f in st1.fields]
        )
        v2 = (
            orders.where("o_orderkey % 10 = 8")
            .withColumn("sync_origin", F.lit("v2"))
            .select(*[F.col(f.name).cast(f.dataType) for f in st2.fields])
        )
        v1.write.mode("overwrite").parquet(f"{path}/p1")
        v2.write.mode("overwrite").parquet(f"{path}/p2")
        # Strict schema-applied read under the regenerated migration
        # schema; materialize (executor-block checkpoint, no driver
        # collect) so the frame outlives the tempdir cleanup.
        merged = spark.read.schema(st2).parquet(f"{path}/p1", f"{path}/p2")
        return merged.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


# --- S5 oracle-checked: partitioned sink + partition-pruned read ----------------

_PARTITIONED_SINK_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
"""


@graded("sink_partitioned_pruned", oracle=_PARTITIONED_SINK_ORACLE)
def sink_partitioned_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned replica write (partitionBy status) + a pruned
    read-back of ONE partition, aggregated and hash-checked against
    the source — the at-rest layout §1 of SCALE.md prescribes, proven
    lossless through the write/prune/read cycle. The status filter
    resolves at planning time to a single directory (partition
    pruning; no data-file scan outside it)."""
    orders = load_table(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="cda2_psink_")
    try:
        orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
        back = spark.read.parquet(path).where(F.col("o_orderstatus") == "F")
        out = back.groupBy("o_orderpriority").agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("revenue"),
        )
        return materialize_outliving(out, path)
    finally:
        shutil.rmtree(path, ignore_errors=True)


# --- S5 variant: ORC sink/source round-trip --------------------------------------

# Same direct-aggregate oracle pattern as sink_partitioned_pruned: the
# oracle aggregates the SOURCE table, the Spark side aggregates the
# ORC read-back — any loss/drift through the columnar round-trip
# (type mapping, compression, predicate pushdown on read) breaks the
# hash. ORC is Spark-native (no extra package); DuckDB never sees the
# ORC files.
_ORC_SINK_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       MIN(o_orderdate) AS first_day,
       MAX(o_orderdate) AS last_day
FROM orders
WHERE o_orderkey % 4 = 1
GROUP BY o_orderstatus
"""


@graded("sink_orc_roundtrip", oracle=_ORC_SINK_ORACLE)
def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write + filtered read-back (the predicate reaches the ORC
    reader as a pushed filter, same as parquet), aggregated and
    hash-checked against the source — proves the second columnar
    format in §2.1 S5 lossless for longs, doubles, strings, dates."""
    orders = load_table(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="cda2_orcsink_")
    try:
        orders.write.mode("overwrite").orc(path)
        back = spark.read.orc(path).where(F.col("o_orderkey") % 4 == 1)
        out = back.groupBy("o_orderstatus").agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("revenue"),
            F.min("o_orderdate").alias("first_day"),
            F.max("o_orderdate").alias("last_day"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)
