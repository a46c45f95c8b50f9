#!/usr/bin/env python
"""10x scale probe (SCALE.md §6): replicate the sf0.1 fact tables with
shifted keys, then time a set of graded queries at 1x and 10x to catch
super-linear wall-clock growth (hidden single-task stages, quadratic
candidate generation, unbounded state).

Usage:
    python tools/scale_probe.py [query ...]      # default: round-4 set

Replication is key-shifted, not byte-copied: each replica k gets
``id + k * (max_id + 1)`` so joins/self-joins see distinct entities
while text/payload columns stay identical — deliberately the WORST
case for dedup-family operators (10x true duplication), matching how
the round-2 MinHash probe was constructed.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from canvas_data_2_aws_spark import registry, session  # noqa: E402
from canvas_data_2_aws_spark.session import load_table  # noqa: E402

DEFAULT_QUERIES = [
    # round-4 families (VERDICT r04 task 4): skyline, RAKE, HITS,
    # CDC chunking, pHash dedup, shard index, session paths
    "analytics_skyline",
    "text_rake_keyphrases",
    "graph_hits",
    "dedup_content_chunks",
    "multimodal_phash_dedup",
    "multimodal_shard_index",
    "analytics_session_paths",
]

REPLICATED = {
    "documents": "doc_id",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "events": "event_id",
    "embeddings": "vec_id",
    "part": "p_partkey",
}


def build_10x(
    spark, sf_dir: str, out_dir: str, factor: int = 10,
    only: set[str] | None = None,
) -> None:
    """Materialize the replicated fixture set under ``out_dir``.

    ``only`` restricts which tables are replicated (others are copied
    1x) — at factor=100 replicating the fact tables a documents-only
    probe never reads would dominate the build.
    """
    from canvas_data_2_aws_spark import schemas

    for name in schemas.TABLE_NAMES:
        dst = f"{out_dir}/{name}.parquet"
        if name not in REPLICATED or (only is not None and name not in only):
            shutil.copyfile(f"{sf_dir}/{name}.parquet", dst)
            continue
        df = load_table(spark, sf_dir, name)
        key = REPLICATED[name]
        span = df.agg(F.max(key)).collect()[0][0] + 1
        reps = [
            df.withColumn(key, F.col(key) + F.lit(k * span)) for k in range(factor)
        ]
        if name == "part":
            # Byte-identical p_name replicas would make the fuzzy
            # family's OUTPUT quadratic (every replica is a dist-0 dup
            # of the original → ~100x pairs at 10x), drowning the
            # candidate-generation signal the probe exists to measure
            # in output materialization. A 5-char distinct prefix per
            # replica k>0 keeps within-replica distances exact
            # (identical prefixes factor out of the levenshtein DP)
            # while cross-replica pairs land at dist >= 5 > threshold 4
            # — so output scales exactly 10x (verified by row count)
            # and the probe isolates the within-block pair-scan cost.
            reps = [
                r if k == 0
                else r.withColumn(
                    "p_name", F.concat(F.lit(chr(97 + k) * 5 + " "), F.col("p_name"))
                )
                for k, r in enumerate(reps)
            ]
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        # events.ts round-trips as timestamp[us]; lineitem keeps its
        # l_orderkey join alignment because orders shifts by ITS span —
        # so re-align: lineitem must shift by the ORDERS span.
        out.write.mode("overwrite").parquet(dst)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factor = int(os.environ.get("SPARK_GRAFT_PROBE_FACTOR", "10"))
    names = sys.argv[1:] or DEFAULT_QUERIES
    registry.load_all()
    spark = session.get_spark(app="scale-probe", shuffle_partitions=8)

    probe_dir = tempfile.mkdtemp(prefix="cda2_probe10x_")
    try:
        # keep orders/lineitem join keys aligned: shift both by the
        # orders span (build_10x uses per-table spans; overwrite
        # lineitem with the orders-span shift here)
        only_env = os.environ.get("SPARK_GRAFT_PROBE_TABLES")
        only = set(only_env.split(",")) if only_env else None
        build_10x(spark, sf_dir, probe_dir, factor=factor, only=only)
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        o_span = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
        if only is not None and "lineitem" not in only:
            o_span = None  # lineitem not replicated; skip the re-shift
        if o_span is not None:
            li_reps = [
                li.withColumn(
                    "l_orderkey", F.col("l_orderkey") + F.lit(k * o_span)
                )
                for k in range(factor)
            ]
            out = li_reps[0]
            for r in li_reps[1:]:
                out = out.unionByName(r)
            out.write.mode("overwrite").parquet(f"{probe_dir}/lineitem.parquet")

        print(f"probe dir: {probe_dir}", file=sys.stderr)
        print(f"| query | 1x | {factor}x | scaling |", flush=True)
        print("|---|---|---|---|", flush=True)
        for name in names:
            fn = registry.QUERIES[name]
            # Warm BOTH sf_dirs: the session-shared memoized frames
            # (simhash_sh/pairs, fuzzy edges, IVF index) key on
            # (applicationId, sf_dir), so a 1x-only warmup would charge
            # the 10x side a cold cache build the 1x side never pays —
            # a phantom super-linear ratio (caught round 10 when the
            # post-memoization dedup_simhash probe read 23.8x). The
            # probe compares warm plans, like bench.py.
            fn(spark, sf_dir).toPandas()
            fn(spark, probe_dir).toPandas()
            t0 = time.perf_counter()
            n1 = len(fn(spark, sf_dir).toPandas())
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            n10 = len(fn(spark, probe_dir).toPandas())
            t10 = time.perf_counter() - t0
            print(
                f"| `{name}` | {t1:.2f} s ({n1} rows) |"
                f" {t10:.2f} s ({n10} rows) | {t10 / t1:.1f}x |",
                flush=True,
            )
    finally:
        shutil.rmtree(probe_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
