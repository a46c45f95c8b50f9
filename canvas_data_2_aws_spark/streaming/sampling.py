"""Streaming-maintained weighted sample (A-ES top-k under ingest).

The Efraimidis–Spirakis key is stateless per row, so the k-largest-keys
sample is a MERGEABLE bounded summary: top-k(union of per-batch
top-ks) == top-k(corpus). Each micro-batch therefore contributes at
most k candidate rows — the maintained state after B batches is <= k*B
rows (compactable back to k at any point by rewriting the store with
its own top-k), and the read-side refresh is a top-k over that
k*B-row store, never over the corpus. This is the streaming shape of
"keep a running weighted sample of everything ingested so far": the
batch sampler re-scans the corpus per refresh; this path pays each
document exactly once.

Unlike the novelty replay (corpus-sized monotone state) and the
additive rollup (key-bounded partials), the maintained state here is
CONSTANT-bounded per batch by construction — the third distinct state
class graded as a full hash-match, order-free because the key stream
is deterministic per row (no arrival-order collapse needed: ANY replay
split yields the same sample).
"""

from __future__ import annotations

import os
from functools import partial

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import priority_keys
from .replay import file_stream, run_replay, write_state_batch


def process_sample_batch(
    batch_df: DataFrame, batch_id: int, cand_dir: str, k: int
) -> None:
    """One micro-batch of A-ES top-k candidates (module-level so tests
    can re-invoke it to simulate a foreachBatch RETRY). No accumulated
    state is read — the sampler is stateless per batch — so the
    batch_id-keyed overwrite alone makes a retry a no-op."""
    write_state_batch(
        priority_keys(batch_df)
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(k),
        cand_dir,
        batch_id,
    )


def priority_sample_replay(
    spark: SparkSession, docs_dir: str, work_dir: str, k: int
) -> DataFrame:
    """Replay ``docs_dir`` (one micro-batch per file), writing each
    batch's k largest A-ES keys; return the merged top-k candidate
    store (callers rank it — the store holds <= k rows per batch)."""
    cand_dir = os.path.join(work_dir, "candidates")
    run_replay(
        file_stream(spark, docs_dir),
        os.path.join(work_dir, "ckpt"),
        partial(process_sample_batch, cand_dir=cand_dir, k=k),
    )
    return spark.read.parquet(cand_dir).select("doc_id", "weight", "es_key")
