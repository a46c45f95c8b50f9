"""Streaming-maintained additive rollup (partial-aggregate appends).

The lakehouse "ingest + rollup" shape: each micro-batch appends its own
map-side-combinable partial (n, sum) rows; readers re-aggregate. The
checkpoint + Trigger.AvailableNow make replays exactly-once — a second
run against the same work dir appends NOTHING (pinned in tests), so
the materialization is idempotent under restart, the same contract as
streaming/merge_sink.py but for additive state instead of upserts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .windows import read_event_stream


def rollup_replay(
    spark: SparkSession, source_glob: str, work_dir: str
) -> DataFrame:
    """Replay ``source_glob`` (one micro-batch per file), appending
    per-batch (user_id, n_events, cents) partials under ``work_dir``;
    return the read-side re-aggregated rollup."""
    parts_dir = os.path.join(work_dir, "partials")
    ckpt_dir = os.path.join(work_dir, "ckpt")
    stream = read_event_stream(spark, source_glob)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.round(F.col("value") * 100, 0).cast("bigint"),
                    ).otherwise(0)
                )
                .cast("bigint")
                .alias("cents"),
            )
            .write.mode("append")
            .parquet(parts_dir)
        )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(parts_dir)
        .groupBy("user_id")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
    )
