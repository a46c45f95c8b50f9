"""Incremental SimHash near-dup pairing under Structured Streaming.

The batch pair derivation (queries/dedup.simhash_pairs) is a banded
equi-join over the whole corpus. The streaming form this module adds
is the shape a 100 TB ingest pipeline actually runs: documents arrive
in micro-batches, each batch is hashed once, joined against the
ACCUMULATED band index (new-vs-seen) and against itself (new-vs-new),
and the verified pairs + the batch's band rows are appended — so every
unordered pair is emitted in exactly one micro-batch (the batch of its
later-arriving member) and the per-batch work is bounded by the batch
size times the band-group fan-out, never by corpus size.

foreachBatch, not a stream-stream self-join: the hash itself is an
aggregation (explode + 63 vote sums per doc), and an aggregation
followed by a join is not expressible in a single append-mode
streaming plan. foreachBatch gives each micro-batch full batch
semantics while the file source + AvailableNow trigger + checkpoint
keep the replay exactly-once. The band index accumulates as plain
parquet appends here (a lakehouse table in production — same contract:
append-only, partitioned by the (b, bv) band key so the probe join
prunes).

Equivalence contract (tests/test_streaming.py): replaying the corpus
in N micro-batches must yield EXACTLY the batch ``simhash_pairs`` set.
This holds verbatim in the uncapped regime (no band group larger than
``group_cap``); under capping the hub-star edges depend on global
group membership, so the streaming twin asserts the uncapped
precondition rather than silently diverging.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as T

# Same 4×16 banding and exact-verify threshold as the batch builder —
# one source of truth so the equivalence contract can't drift
# (queries/shared_sql.py is non-registering, safe to import here).
from ..queries.shared_sql import SIMHASH_HAM_MAX


def _band_rows(sh: DataFrame) -> DataFrame:
    """(doc_id, simhash, b, bv) — one row per (doc, 16-bit band)."""
    return sh.select(
        "doc_id",
        "simhash",
        F.explode(F.array(*[F.lit(b) for b in range(4)])).alias("b"),
    ).select(
        "doc_id",
        "simhash",
        "b",
        F.expr("CAST((simhash >> (b * 16)) & 65535 AS BIGINT)").alias("bv"),
    )


def _verified_pairs(cand: DataFrame) -> DataFrame:
    """Canonicalize to doc_a < doc_b and apply the exact Hamming gate."""
    return (
        cand.where(F.expr(f"bit_count(sim_x ^ sim_y) <= {SIMHASH_HAM_MAX}"))
        .select(
            F.least("dx", "dy").alias("doc_a"),
            F.greatest("dx", "dy").alias("doc_b"),
        )
        .distinct()
    )


def simhash_pairs_replay(
    spark: SparkSession, docs_dir: str, work_dir: str
) -> DataFrame:
    """Replay ``docs_dir`` (one micro-batch per file) through the
    incremental band-index pairing; return the accumulated verified
    pair set as a DataFrame.

    ``work_dir`` holds the band index, the emitted pairs, and the
    streaming checkpoint — all executor-written parquet; nothing
    corpus-sized visits the driver.
    """
    schema = spark.read.parquet(docs_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    index_dir = os.path.join(work_dir, "band_index")
    pairs_dir = os.path.join(work_dir, "pairs")
    ckpt_dir = os.path.join(work_dir, "ckpt")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        # Hash once per batch; the micro-batch is the natural cache
        # unit (the batch analog memoizes per session instead).
        bands = _band_rows(T.simhash64(batch_df)).localCheckpoint(eager=True)
        new_x = bands.select(
            "b", "bv", F.col("doc_id").alias("dx"), F.col("simhash").alias("sim_x")
        )
        new_y = bands.select(
            "b", "bv", F.col("doc_id").alias("dy"), F.col("simhash").alias("sim_y")
        )
        # new-vs-new: strict < so each in-batch pair appears once.
        legs = [new_x.join(new_y, ["b", "bv"]).where(F.col("dx") < F.col("dy"))]
        if os.path.isdir(index_dir):
            seen = sess.read.parquet(index_dir).select(
                "b",
                "bv",
                F.col("doc_id").alias("dy"),
                F.col("simhash").alias("sim_y"),
            )
            # new-vs-seen: every cross-batch pair meets exactly here,
            # in the later member's batch.
            legs.append(new_x.join(seen, ["b", "bv"]))
        cand = legs[0] if len(legs) == 1 else legs[0].unionByName(legs[1])
        _verified_pairs(cand).write.mode("append").parquet(pairs_dir)
        bands.select("doc_id", "simhash", "b", "bv").write.mode(
            "append"
        ).parquet(index_dir)

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # distinct: idempotence guard for a re-run against the same
    # work_dir (each pair is emitted once in a clean replay).
    return spark.read.parquet(pairs_dir).distinct()
