"""Weighted-sampling primitives shared by batch and streaming paths.

Efraimidis–Spirakis A-ES keys: item i gets key ln(u_i)/w_i (the
monotone log form of u_i^(1/w_i)); the k LARGEST keys are a provably
exact weighted sample without replacement. The key is a STATELESS
per-row expression, which is what makes the sample mergeable: top-k of
per-partition (or per-micro-batch) top-ks equals the global top-k —
the property both `sample_weighted_priority` (batch, one
TakeOrderedAndProject) and `stream_priority_sample_replay`
(incremental, k-bounded per-batch appends) rely on. u is the house
deterministic uniform ((md5 13-hex + 1) / 2^52; the +1 keeps ln away
from 0), weights GREATEST(n_chars, 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def priority_keys(docs: DataFrame) -> DataFrame:
    """(doc_id, weight, es_key) for a documents frame — the A-ES key
    stream both the batch sampler and the streaming replay rank."""
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("wps:"), F.col("doc_id").cast("string"))),
                1,
                13,
            ),
            16,
            10,
        )
        .cast("long")
        .cast("double")
    )
    weight = F.greatest(F.col("n_chars"), F.lit(1)).cast("bigint")
    return docs.select(
        "doc_id",
        weight.alias("weight"),
        (F.log((h + 1.0) / 4503599627370496.0) / F.col("weight")).alias(
            "es_key"
        ),
    )
