"""Shared micro-batch replay driver (r13 — one copy of the machinery).

Five streaming-runtime graded queries (SimHash pair indexes capped and
uncapped, additive rollup, first-seen novelty, A-ES priority sample)
replay a corpus through ``foreachBatch`` with identical plumbing: a
range-split source directory with ascending mtime stamps, a
one-file-per-trigger ``AvailableNow`` stream, a checkpoint, and
retry-idempotent ``batch=<id>``-keyed state writes. This module is the
ONE copy of that plumbing, so a new maintained-state class costs only
its per-batch state logic — and so the retry contract below is
enforced structurally rather than re-derived per module.

Retry contract (ADVICE r12, both halves):

1. **Writes**: every per-batch state write OVERWRITES a
   ``batch=<id>``-keyed subdirectory (:func:`write_state_batch`),
   never appends — a ``foreachBatch`` retry replaces its failed
   attempt's output instead of doubling it.
2. **Reads**: every accumulated-state read goes through
   :func:`read_prior_state`, which filters the discovered ``batch``
   partition column to ``< batch_id`` — a retry can never observe its
   OWN failed attempt's write. Without this filter a retried novelty
   batch sees all its grams as already "seen" (writing n_novel = 0 and
   an empty index partition), a retried uncapped pair batch joins
   against its own rows (emitting doc_a == doc_b self-pairs), and a
   retried capped batch inflates its admission counts with its own
   rows (wrongly truncating the admitted set). Each failure mode is
   pinned by a re-invoke-process() test in tests/test_streaming.py.

Readers of a state directory must select explicit columns: partition
discovery adds the ``batch`` column to every read.
"""

from __future__ import annotations

import os
import tempfile
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def split_ordered(
    df: DataFrame, order_col: str, n_files: int = 3, prefix: str = "cda2_replay_"
) -> str:
    """Write ``df`` as ``n_files`` range-partitioned parquet files whose
    modification times ascend in ``order_col`` order; return the dir.

    Fully distributed: one range exchange gives each output file a
    contiguous ``order_col`` slice (part-00000 = smallest), written
    straight from the executors — no driver-side collect, so the same
    replay synthesis works at any volume. FileStreamSource orders
    micro-batches by modification time, but the parallel write finishes
    tasks in arbitrary order — the mtime stamping (a metadata-only
    touch; the data never visits the driver) makes replay order equal
    range order, which is what lets arrival-order semantics grade as
    order-free SQL (SURVEY §8 r11 erratum 3).
    """
    path = tempfile.mkdtemp(prefix=prefix)
    (
        df.repartitionByRange(n_files, order_col)
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .parquet(path)
    )
    files = sorted(
        f for f in os.listdir(path)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    base_t = time.time() - len(files)
    for i, f in enumerate(files):
        os.utime(os.path.join(path, f), (base_t + i, base_t + i))
    return path


def file_stream(spark: SparkSession, source_dir: str, schema=None) -> DataFrame:
    """One-file-per-micro-batch stream over a replay directory — the
    file-source analog of one incremental API pull per trigger."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )


def run_replay(
    stream: DataFrame,
    ckpt_dir: str,
    process: Callable[[DataFrame, int], None],
) -> None:
    """Drive ``process`` over every pending micro-batch and return when
    the log is drained (``Trigger.AvailableNow`` + checkpoint = a
    bounded, exactly-once replay; a second run processes nothing)."""
    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def write_state_batch(
    df: DataFrame,
    base_dir: str,
    batch_id: int,
    partition_by: tuple[str, ...] = (),
) -> None:
    """Retry-idempotent per-batch state write: overwrite the batch's
    own ``batch=<id>`` subdirectory (retry contract point 1).

    ``partition_by`` sub-partitions the batch's state by the named
    columns (e.g. an event-time bucket), so horizon-based EVICTION can
    later delete whole ``<col>=<value>`` subdirectories without
    rewriting any surviving state (streaming/ttl_rollup.py)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(os.path.join(base_dir, f"batch={batch_id}"))


def read_prior_state(
    sess: SparkSession, base_dir: str, batch_id: int
) -> DataFrame | None:
    """Accumulated state from batches STRICTLY BEFORE ``batch_id``, or
    ``None`` when no state directory exists yet (retry contract point
    2 — the filter on the discovered ``batch`` partition column is what
    blinds a retry to its own failed attempt's write)."""
    if not os.path.isdir(base_dir):
        return None
    return sess.read.parquet(base_dir).where(F.col("batch") < F.lit(batch_id))
