"""CD2/DAP incremental-record envelope codec (SURVEY §1.1, §2.1 S2).

The reference's incremental files carry JSONL records shaped
``{"key": {...pk cols...}, "value": {...non-pk cols...},
"meta": {"action": "U"|"D", "ts": ...}}`` — upserts carry the full
row, deletes only the key (tombstone). This module is the Spark-native
codec for that wire format: typed ``StructType`` parse via
``from_json`` (never ``inferSchema`` — the schema is server-declared,
SURVEY §1.1), flattened to columns ready for the M1 merge
(operators/merge.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..schemas import TABLES


def envelope_schema(table: str, key_cols: list[str]) -> StructType:
    """Server-declared envelope schema for one table: key/value split
    on the PK columns, plus the action/ts meta block."""
    base = TABLES[table]
    key_fields = [f for f in base.fields if f.name in key_cols]
    val_fields = [f for f in base.fields if f.name not in key_cols]
    return StructType(
        [
            StructField("key", StructType(key_fields), False),
            StructField("value", StructType(val_fields), True),
            StructField(
                "meta",
                StructType(
                    [
                        StructField("action", StringType(), False),
                        StructField("ts", LongType(), True),
                    ]
                ),
                False,
            ),
        ]
    )


def encode_envelope(
    df: DataFrame, key_cols: list[str], action_col: str = "action", ts=None
) -> DataFrame:
    """Serialize typed rows into envelope JSONL strings (the inverse
    codec — used to publish a changeset and to round-trip-test the
    parser without fixture change files)."""
    data_cols = [c for c in df.columns if c != action_col]
    key = F.struct(*[F.col(c) for c in key_cols])
    # Deletes are key-only tombstones on the wire (the value block is
    # absent); to_json drops the null struct, from_json restores nulls.
    value = F.when(F.col(action_col) == "D", F.lit(None)).otherwise(
        F.struct(*[F.col(c) for c in data_cols if c not in key_cols])
    )
    meta = F.struct(
        F.col(action_col).alias("action"),
        (F.lit(ts) if ts is not None else F.lit(0)).cast("long").alias("ts"),
    )
    return df.select(
        F.to_json(F.struct(key.alias("key"), value.alias("value"), meta.alias("meta")))
        .alias("record")
    )


def decode_envelope(
    records: DataFrame,
    table: str,
    key_cols: list[str],
    record_col: str = "record",
    ts_col: str | None = None,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Parse envelope JSONL into typed flat columns + ``action``.

    Strict schema application (S4): unknown fields are dropped, type
    drift surfaces as nulls that the merge's compaction stage rejects —
    the Spark analog of the reference regenerating DDL on a schema
    version bump.

    ``ts_col`` surfaces ``meta.ts`` under that name (aliased, never
    bare ``ts`` — value blocks may carry their own ``ts`` column) so
    callers can compact multi-change-per-PK batches by arrival time
    (M3). ``passthrough`` forwards caller-added columns (e.g. a file
    sequence number) unchanged.
    """
    schema = envelope_schema(table, key_cols)
    extra = list(passthrough or [])
    parsed = records.select(
        *[F.col(c) for c in extra],
        F.from_json(F.col(record_col), schema).alias("env"),
    )
    cols = ["env.key.*", "env.value.*", "env.meta.action"]
    out = parsed.select(*cols, *extra)
    if ts_col is not None:
        out = parsed.select(
            *cols, F.col("env.meta.ts").alias(ts_col), *extra
        )
    return out


def read_changeset_jsonl(
    spark: SparkSession,
    path: str,
    table: str,
    key_cols: list[str],
    ts_col: str | None = None,
    seq_col: str | None = None,
) -> DataFrame:
    """Read an incremental JSONL change file from disk (S2+S6 batch
    form; the streaming twin is ``spark.readStream.text`` + the same
    ``decode_envelope``).

    ``seq_col`` attaches a monotonically increasing id BEFORE the
    decode — for text sources Spark's splits follow file offsets, so
    the id is consistent with line order and serves as the in-file
    tie-break when two changes to one PK share a ``meta.ts``.
    """
    records = spark.read.text(path)
    passthrough = []
    if seq_col is not None:
        records = records.withColumn(seq_col, F.monotonically_increasing_id())
        passthrough = [seq_col]
    return decode_envelope(
        records,
        table,
        key_cols,
        record_col="value",
        ts_col=ts_col,
        passthrough=passthrough,
    )
