"""Streaming-maintained additive rollup (partial-aggregate appends).

The lakehouse "ingest + rollup" shape: each micro-batch writes its own
map-side-combinable partial (n, sum) rows; readers re-aggregate. The
checkpoint + Trigger.AvailableNow make replays exactly-once — a second
run against the same work dir writes NOTHING (pinned in tests) — and
the batch_id-keyed overwrite (streaming/replay.py retry contract)
makes a foreachBatch RETRY replace its failed attempt's partial
instead of double-counting it into the read-side sums.
"""

from __future__ import annotations

import os
from functools import partial

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .replay import run_replay, write_state_batch
from .windows import read_event_stream


def process_rollup_batch(
    batch_df: DataFrame, batch_id: int, parts_dir: str
) -> None:
    """One micro-batch of additive partials (module-level so tests can
    re-invoke it to simulate a foreachBatch RETRY)."""
    write_state_batch(
        batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100, 0).cast("bigint"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("cents"),
        ),
        parts_dir,
        batch_id,
    )


def rollup_replay(
    spark: SparkSession, source_glob: str, work_dir: str
) -> DataFrame:
    """Replay ``source_glob`` (one micro-batch per file), writing
    per-batch (user_id, n_events, cents) partials under ``work_dir``;
    return the read-side re-aggregated rollup."""
    parts_dir = os.path.join(work_dir, "partials")
    run_replay(
        read_event_stream(spark, source_glob),
        os.path.join(work_dir, "ckpt"),
        partial(process_rollup_batch, parts_dir=parts_dir),
    )
    return (
        spark.read.parquet(parts_dir)
        .groupBy("user_id")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
    )
