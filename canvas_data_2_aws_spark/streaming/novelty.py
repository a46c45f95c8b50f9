"""Incremental corpus-novelty maintenance under Structured Streaming.

The batch novelty curve (queries/text.py text_novelty_curve) asks "what
share of each document's distinct 3-grams has never been seen before?"
with first-seen attribution = MIN(doc_id) per gram. That statistic is
MONOTONE under append — once a gram's first document is known, no later
batch can change it — so it is exactly-once maintainable by streaming
ingest: each micro-batch anti-joins its batch-local first occurrences
against the accumulated SEEN-GRAM index, credits the batch's novel
grams to their batch-local minimum doc_id, appends one per-doc partial
row per document, and adds only the NOVEL grams to the index (the index
is therefore precisely the distinct-gram census, never larger).

Replayed in ascending-doc_id ranges (the graded query's recipe),
"first arrival" == "smallest doc_id", so the accumulated partials equal
the batch derivation row-for-row and the replay grades as a FULL SQL
hash-match — the third streaming-runtime query after the SimHash pair
replays and the additive rollup, and the first that maintains a
CORPUS-SIZED state table (the gram index) rather than key-bounded
partials.

Per-batch cost: one shingle explode over the batch, one batch-local
MIN, one gram-keyed anti-join against the index (equi-join, fan-out 1
per gram), two bounded writes. The full retry contract lives in
streaming/replay.py: both writes overwrite their batch_id-keyed
subdirectory, and the index read is filtered to PRIOR batches — a
retry that could see its failed attempt's own index partition would
find every batch gram already "seen", write n_novel = 0 partials, and
overwrite its index partition empty, re-crediting those grams to later
batches (the ADVICE r12 finding, pinned by a re-invoke test).
"""

from __future__ import annotations

import os
from functools import partial

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as T
from .replay import file_stream, read_prior_state, run_replay, write_state_batch


def process_novelty_batch(
    batch_df: DataFrame, batch_id: int, parts_dir: str, index_dir: str
) -> None:
    """One micro-batch of first-seen gram accounting (module-level so
    tests can re-invoke it to simulate a foreachBatch RETRY)."""
    sess = batch_df.sparkSession
    # two-projection shingle form (r13, guide §1.2): split once per
    # doc — identical grams to the batch derivation's rewritten form.
    g = batch_df.select("doc_id", T.tokens("text").alias("w")).select(
        "doc_id",
        F.explode(F.array_distinct(T.ngrams_from_words("w", 3))).alias("gram"),
    ).localCheckpoint(eager=True)  # consumed 2x: first-occ + per-doc
    first_in_batch = g.groupBy("gram").agg(
        F.min("doc_id").alias("first_doc")
    )
    seen = read_prior_state(sess, index_dir, batch_id)
    if seen is not None:
        novel = first_in_batch.join(seen.select("gram"), "gram", "left_anti")
    else:
        novel = first_in_batch
    # consumed 2x below (per-doc credit + index append) — without
    # the checkpoint the anti-join would re-run per consumer.
    novel = novel.localCheckpoint(eager=True)
    nov = novel.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_novel")
    )
    per = (
        g.groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_grams"))
        .join(nov, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
        )
    )
    write_state_batch(per, parts_dir, batch_id)
    write_state_batch(novel.select("gram"), index_dir, batch_id)


def novelty_replay(
    spark: SparkSession, docs_dir: str, work_dir: str
) -> DataFrame:
    """Replay ``docs_dir`` (one micro-batch per file) through the
    incremental first-seen gram accounting; return the accumulated
    per-document (doc_id, n_grams, n_novel) frame.

    Documents with no 3-gram (fewer than three tokens) emit no partial
    row — the same shape as the batch derivation, whose per-doc frame
    comes from grouping the exploded gram stream.
    """
    parts_dir = os.path.join(work_dir, "partials")
    index_dir = os.path.join(work_dir, "gram_index")
    run_replay(
        file_stream(spark, docs_dir),
        os.path.join(work_dir, "ckpt"),
        partial(process_novelty_batch, parts_dir=parts_dir, index_dir=index_dir),
    )
    return spark.read.parquet(parts_dir).select("doc_id", "n_grams", "n_novel")
