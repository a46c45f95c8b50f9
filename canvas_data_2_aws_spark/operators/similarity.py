"""Vector similarity search operators (SURVEY §2.8 M6–M7, §4).

Three tiers, trading recall for scale:

1. ``cosine_pairs`` — exact all-pairs within optional blocking keys.
   The ``id_a < id_b`` predicate halves the cross join; a blocking
   column (label, LSH bucket, shingle band) turns O(n²) into
   O(Σ per-block²). This is the brute-force baseline and re-rank step.
2. ``knn_brute_force`` — exact top-k neighbors per query against a
   broadcast corpus (right side small or pre-filtered).
3. ``ann_lsh_neighbors`` — MLlib BucketedRandomProjectionLSH: hash
   once, bucket-join, exact re-rank inside buckets. The 100 TB path:
   cost O(n·bucket) instead of O(n²).

All exact math runs JVM-side via higher-order functions
(functions/vectors.py) — floats promoted element-wise to double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.vectors import cosine_similarity


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact cosine for every unordered pair (optionally block-local).

    Returns (id_a, id_b, score) with id_a < id_b.
    """
    keep = [id_col, vec_col, *block_cols]
    a = df.select(*[F.col(c).alias(f"{c}_a") for c in keep])
    b = df.select(*[F.col(c).alias(f"{c}_b") for c in keep])
    cond = F.col(f"{id_col}_a") < F.col(f"{id_col}_b")
    for c in block_cols:
        cond = cond & (F.col(f"{c}_a") == F.col(f"{c}_b"))
    return a.join(b, cond).select(
        F.col(f"{id_col}_a"),
        F.col(f"{id_col}_b"),
        cosine_similarity(f"{vec_col}_a", f"{vec_col}_b").alias("score"),
        *[F.col(f"{c}_a").alias(c) for c in block_cols],
    )


def knn_brute_force(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Corpus is broadcast (the common shape: few queries × large corpus
    is flipped at scale — broadcast whichever side fits, or go LSH).
    Rank-then-filter so WindowGroupLimit keeps per-partition heaps.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = q.join(F.broadcast(c), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        cosine_similarity("_qv", "_cv").alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def ann_lsh_neighbors(
    df: DataFrame,
    query_vec,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
):
    """Approximate nearest neighbors via random-projection LSH (M7).

    Returns (model, neighbors DataFrame). Euclidean-LSH is the right
    family for unit-ish-norm embeddings (distance ≈ 2−2cos). Results
    are seed-deterministic within Spark but not reproducible in other
    engines → rows-only grading.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    vecs = df.select(
        F.col(id_col), array_to_vector(F.col(vec_col)).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(vecs)
    neighbors = model.approxNearestNeighbors(vecs, query_vec, k)
    return model, neighbors
