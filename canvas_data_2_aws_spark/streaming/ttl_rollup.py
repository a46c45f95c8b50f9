"""Streaming-maintained rollup with event-time TTL eviction.

The sixth maintained-state class in the replay family, and the first
whose state SHRINKS: a per-(day, user) additive rollup that only ever
answers questions about the trailing ``horizon_days`` of event time —
the production "30-day active users" / "trailing-week revenue" shape.
Each micro-batch

1. writes its own map-side-combinable (day, user_id, n, cents) partial,
   batch_id-keyed AND day-partitioned (``write_state_batch`` with
   ``partition_by=("day",)``), and
2. EVICTS every ``day=<d>`` state subdirectory older than the horizon
   anchored at the batch's own max event day.

Because the replay is time-ordered (streaming/replay.py split_ordered),
event-time high water only advances, so an evicted day can never
receive a later partial; and because the eviction cutoff is a pure
function of the batch's OWN rows, a foreachBatch RETRY recomputes the
identical cutoff and re-deletes the same (already-deleted) directories
— eviction is idempotent by construction, and the write half of the
retry contract is the usual batch_id-keyed overwrite. No accumulated
state is ever READ during a batch (the rollup is additive and the
cutoff is batch-local), so retry contract point 2 is vacuously
satisfied.

Why this is a genuinely distinct state class: the capped/uncapped pair
indexes grow with admissions, the additive rollup and novelty index
grow with keys/grams ever seen, and the A-ES sample is capped at k —
none of them ever releases state. Here the state is bounded by
``horizon_days × |active users in horizon|`` REGARDLESS of how much
history streams through: replaying a year keeps seven days of
partials. At 100 TB the eviction is a partition drop (here a
directory delete; on a lakehouse table, ``DROP PARTITION`` /
metadata-only delete) — never a rewrite of surviving state, which is
why the partials are day-partitioned in the first place.

Determinism / gradeability: bucket-granular retention makes the final
answer order-free — the surviving state re-aggregates to exactly the
batch ``GROUP BY`` over ``day >= max_day - (horizon_days - 1)``, a
full SQL hash-match (no arrival-order collapse needed; day cutoffs are
event-time, not processing-time).
"""

from __future__ import annotations

import datetime as _dt
import os
import shutil
from functools import partial

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .replay import run_replay, write_state_batch
from .windows import read_event_stream


def _evict_expired_days(parts_dir: str, cutoff_day: str) -> int:
    """Delete every ``day=<d>`` state subdirectory with d < cutoff_day
    (ISO date strings compare lexicographically). Returns the number of
    directories removed. Directory-manifest-sized: the walk touches one
    entry per (batch, day) partition, never data files; idempotent, so
    a retried batch re-deleting already-evicted days is a no-op."""
    n = 0
    if not os.path.isdir(parts_dir):
        return n
    for batch_dir in os.listdir(parts_dir):
        if not batch_dir.startswith("batch="):
            continue
        bpath = os.path.join(parts_dir, batch_dir)
        for day_dir in os.listdir(bpath):
            if not day_dir.startswith("day="):
                continue
            if day_dir[len("day="):] < cutoff_day:
                shutil.rmtree(os.path.join(bpath, day_dir), ignore_errors=True)
                n += 1
    return n


def process_ttl_rollup_batch(
    batch_df: DataFrame, batch_id: int, parts_dir: str, horizon_days: int
) -> None:
    """One micro-batch: day-grained additive partial + horizon eviction
    (module-level so tests can re-invoke it to simulate a RETRY)."""
    part = batch_df.groupBy(
        F.date_format(F.col("ts"), "yyyy-MM-dd").alias("day"),
        "user_id",
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100, 0).cast("bigint"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("cents"),
    ).localCheckpoint(eager=True)  # consumed 2x: state write + max-day
    write_state_batch(part, parts_dir, batch_id, partition_by=("day",))
    # Eviction cutoff from the batch's OWN event-time high water — a
    # retry recomputes the same cutoff (idempotent); time-ordered
    # replay means global high water == the latest batch's high water.
    mx = part.agg(F.max("day").alias("mx")).collect()[0]["mx"]  # 1 row
    if mx is not None:
        cutoff = (
            _dt.date.fromisoformat(mx) - _dt.timedelta(days=horizon_days - 1)
        ).isoformat()
        _evict_expired_days(parts_dir, cutoff)


def ttl_rollup_replay(
    spark: SparkSession,
    source_glob: str,
    work_dir: str,
    horizon_days: int = 7,
) -> DataFrame:
    """Replay ``source_glob`` (one micro-batch per file) through the
    TTL rollup; return the trailing-horizon per-user re-aggregation
    from the surviving (post-eviction) day partials."""
    parts_dir = os.path.join(work_dir, "partials")
    run_replay(
        read_event_stream(spark, source_glob),
        os.path.join(work_dir, "ckpt"),
        partial(
            process_ttl_rollup_batch,
            parts_dir=parts_dir,
            horizon_days=horizon_days,
        ),
    )
    state = spark.read.parquet(parts_dir)
    # Read-side horizon filter: redundant with eviction when the replay
    # ran to the end of the log (eviction already kept exactly the
    # horizon), but it makes the result well-defined mid-log too.
    mx = state.agg(F.max(F.to_date("day")).alias("mx"))
    return (
        state.join(F.broadcast(mx))  # 1-row scalar attach
        .where(F.to_date("day") >= F.date_sub(F.col("mx"), horizon_days - 1))
        .groupBy("user_id")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
    )
