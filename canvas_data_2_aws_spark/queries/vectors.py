"""Graded vector similarity queries (SURVEY §2.8 M6–M7, §2.3 J7).

Determinism: graded outputs project ids + ROUND(score, 4); both engines
ORDER BY the *rounded* score (raw doubles differ in the last ulp across
engines — SURVEY §8.5). Oracles cast FLOAT[] → DOUBLE[] so DuckDB's
list_cosine_similarity computes in double like our HOF plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators.similarity import ann_lsh_neighbors, cosine_blas
from ..registry import graded
from ..session import load_table

# --- M6/J7: exact KNN top-20 pairs ---------------------------------------------

_KNN_ORACLE = """
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 4) AS score
FROM embeddings a
JOIN embeddings b ON a.vec_id < b.vec_id
ORDER BY score DESC, vec_id_a, vec_id_b
LIMIT 20
"""


@graded("knn_cosine_exact", oracle=_KNN_ORACLE)
def knn_cosine_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 most-similar pairs: broadcast corpus + BLAS batch
    matmul (operators/similarity.py cosine_blas), per-row top-20
    candidates (a superset of the global top-20), then TakeOrdered."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = cosine_blas(
        emb, emb, mode="pairs_topk", k=20, corpus_key=f"emb:{sf_dir}"
    )
    return pairs.orderBy(F.col("score").desc(), "vec_id_a", "vec_id_b").limit(20)


# --- M6 variant: top-k neighbors per query (similarity search shape) -------------

_KNN_PER_QUERY_ORACLE = """
SELECT query_id, neighbor_id, score, rn
FROM (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 4) AS score,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                 CAST(b.embedding AS DOUBLE[])), 4) DESC,
                    b.vec_id
         ) AS rn
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < 32
) t
WHERE rn <= 5
"""


@graded("knn_topk_per_query", oracle=_KNN_PER_QUERY_ORACLE)
def knn_topk_per_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 exact neighbors for each of 32 query vectors against the
    full corpus — the ANN baseline/re-rank shape (broadcast corpus +
    BLAS; per-query candidates already rank-ordered on rounded score,
    the window just re-derives the rn column on the tiny result)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 32)
    scored = cosine_blas(
        queries, emb, mode="knn", k=5, corpus_key=f"emb:{sf_dir}"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rn", F.row_number().over(w).cast("long")).where(
        F.col("rn") <= 5
    )


# --- EXT: embedding-cosine near-dup detection --------------------------------------

_NEARDUP_ORACLE = """
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, a.label,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 4) AS score
FROM embeddings a
JOIN embeddings b ON a.vec_id < b.vec_id AND a.label = b.label
WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 4) >= 0.3
"""


@graded("dedup_embedding_cosine", oracle=_NEARDUP_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate candidates: label-blocked pair scan, threshold on
    rounded cosine. Blocking turns O(n²) into O(Σ per-label²) — at
    100 TB the block key is an LSH bucket instead of a label. The scan
    is block-LOCAL (shuffle on label, per-block BLAS inside
    applyInPandas) so compute actually follows Σ per-label², not a
    dense corpus matrix masked afterward."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")

    def label_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id", ignore_index=True)
        ids = pdf["vec_id"].to_numpy(np.int64)
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
        sims = np.round((mat @ mat.T) / (norms[:, None] * norms[None, :]), 4)
        a_idx, b_idx = np.nonzero(np.triu(sims >= 0.3, k=1))
        return pd.DataFrame(
            {
                "vec_id_a": ids[a_idx],
                "vec_id_b": ids[b_idx],
                "label": np.full(
                    len(a_idx), int(pdf["label"].iloc[0]), np.int32
                ),
                "score": sims[a_idx, b_idx],
            }
        )

    return emb.groupBy("label").applyInPandas(
        label_pairs,
        "vec_id_a long, vec_id_b long, label int, score double",
    )


# --- M7: approximate NN via LSH (rows-only: hash seeds not portable) -----------------


@graded("ann_lsh", oracle=None)
def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection LSH ANN: top-10 approximate neighbors of
    vec_id=0. Seed-pinned (deterministic within Spark), rows-only
    for the oracle."""
    from pyspark.ml.functions import vector_to_array

    emb = load_table(spark, sf_dir, "embeddings")
    query_vec = emb.where(F.col("vec_id") == 0).head().embedding
    from pyspark.ml.linalg import Vectors

    _, neighbors = ann_lsh_neighbors(emb, Vectors.dense(query_vec), k=10)
    return neighbors.select(
        "vec_id", F.col("distCol").alias("approx_distance")
    ).orderBy("approx_distance", "vec_id")


# --- M7 variant: IVF ANN (k-means cells + in-cell exact re-rank) ----------------


@graded("ann_ivf", oracle=None)
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate NN: top-10 neighbors of vec_id=0 probing 4 of
    16 k-means cells (operators/similarity.ann_ivf_neighbors).
    Seed-pinned; rows-only (k-means init not reproducible in DuckDB);
    recall vs exact KNN asserted in tests/test_vectors.py."""
    from ..operators.similarity import ann_ivf_neighbors

    emb = load_table(spark, sf_dir, "embeddings")
    query_vec = emb.where(F.col("vec_id") == 0).head().embedding
    neighbors = ann_ivf_neighbors(
        emb.where(F.col("vec_id") != 0), query_vec, k=10
    )
    return neighbors


# --- EXT: per-label centroid + outlier distance (embedding QA shape) ------------

# dim is 1-based in the oracle (lateral range) and 0-based in Spark
# (posexplode); it is only an internal join key within each engine, so
# the offset never surfaces. Per-dim centroid sums use the decimal
# recipe (order-independent); the final distance is ROUND(,4) per §8.5.
_CENTROID_ORACLE = """
WITH pos AS (
  SELECT vec_id, label, pos AS dim,
         CAST(list_extract(embedding, pos) AS DOUBLE) AS v
  FROM embeddings, range(1, 65) t(pos)
),
cent AS (
  SELECT label, dim,
         CAST(SUM(CAST(v AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*) AS c
  FROM pos GROUP BY label, dim
),
dist AS (
  SELECT p.vec_id, p.label,
         ROUND(sqrt(CAST(SUM(CAST((p.v - c.c) * (p.v - c.c)
                                  AS DECIMAL(38,12))) AS DOUBLE)), 4) AS dist
  FROM pos p JOIN cent c ON p.label = c.label AND p.dim = c.dim
  GROUP BY p.vec_id, p.label
)
SELECT vec_id, label, dist, rn
FROM (SELECT vec_id, label, dist,
             ROW_NUMBER() OVER (PARTITION BY label
                                ORDER BY dist DESC, vec_id) AS rn
      FROM dist) t
WHERE rn <= 5
"""


@graded("vector_centroid_outliers", oracle=_CENTROID_ORACLE)
def vector_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 farthest-from-centroid vectors per label — the embedding
    quality-assurance shape (mislabeled/outlier sample pruning for
    training data). Plan: posexplode → per-(label,dim) decimal-sum
    centroid (640 rows, broadcast back) → per-vector L2 distance →
    WindowGroupLimit top-k. The explode stays parent-partition-local,
    so partial aggregation collapses each vector before any shuffle;
    at 100 TB the only wide exchange is the per-vector re-group."""
    emb = load_table(spark, sf_dir, "embeddings")
    # materialize the exploded view once: centroid and distance both
    # consume it, and the duplicate explode subtree costs ~0.4 s of
    # plan compile + compute per cold run at sf0.1
    pos = (
        emb.select(
            "vec_id", "label", F.posexplode("embedding").alias("dim", "v")
        )
        .withColumn("v", F.col("v").cast("double"))
        .localCheckpoint()
    )
    cent = pos.groupBy("label", "dim").agg(
        (
            F.sum(F.col("v").cast("decimal(38,10)")).cast("double") / F.count("*")
        ).alias("c")
    )
    dist = (
        pos.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.round(
                F.sqrt(
                    F.sum(F.expr("CAST((v - c) * (v - c) AS DECIMAL(38,12))")).cast(
                        "double"
                    )
                ),
                4,
            ).alias("dist")
        )
    )
    w = Window.partitionBy("label").orderBy(F.col("dist").desc(), "vec_id")
    return (
        dist.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 5)
        .select("vec_id", "label", "dist", "rn")
    )


# --- EXT: int8 scalar quantization (vector storage compression) -----------------

# Symmetric per-vector quantization: scale = 127/max|v|, q = floor of
# the scaled value clamped to [-127, 127]. FLOOR and comparisons on
# identical IEEE doubles are engine-exact (no ROUND-on-raw-double
# anywhere); the reconstruction error is decimal-summed then rounded.
_QUANTIZE_ORACLE = """
WITH prep AS (
  SELECT vec_id,
         CAST(embedding AS DOUBLE[]) AS e,
         list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS mx
  FROM embeddings WHERE vec_id % 8 = 0
),
q AS (
  SELECT vec_id, mx,
         list_transform(e, v -> GREATEST(-127, LEAST(127,
           CAST(FLOOR(v * 127 / mx) AS BIGINT)))) AS qv,
         e
  FROM prep
)
SELECT vec_id,
       ROUND(mx, 4) AS max_abs,
       CAST(list_sum(list_transform(qv, v -> abs(v))) AS BIGINT) AS l1_quantized,
       ROUND(CAST(list_sum(list_transform(
               range(1, LEN(e) + 1),
               i -> CAST(CAST((e[i] - qv[i] * mx / 127)
                    * (e[i] - qv[i] * mx / 127) AS DECIMAL(38,12)) AS DOUBLE)))
             AS DOUBLE), 6) AS mse_x_dim
FROM q
"""


@graded("vector_quantize_int8", oracle=_QUANTIZE_ORACLE)
def vector_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of embeddings + reconstruction
    error — the 4× storage compression a 100 TB vector corpus applies
    before ANN indexing (floats only re-materialize in the re-rank).
    Pure higher-order functions, one map stage, no shuffle."""
    emb = load_table(spark, sf_dir, "embeddings").where("vec_id % 8 = 0")
    prep = emb.select(
        "vec_id",
        F.expr("transform(embedding, v -> CAST(v AS DOUBLE))").alias("e"),
        F.expr(
            "array_max(transform(embedding, v -> abs(CAST(v AS DOUBLE))))"
        ).alias("mx"),
    )
    q = prep.withColumn(
        "qv",
        F.expr(
            "transform(e, v -> GREATEST(-127L, LEAST(127L,"
            " CAST(FLOOR(v * 127 / mx) AS BIGINT))))"
        ),
    )
    return q.select(
        "vec_id",
        F.round("mx", 4).alias("max_abs"),
        F.expr("aggregate(transform(qv, v -> abs(v)), 0L, (a, b) -> a + b)").alias(
            "l1_quantized"
        ),
        F.round(
            F.expr(
                "CAST(aggregate(transform(sequence(1, size(e)),"
                " i -> CAST(CAST((e[i-1] - qv[i-1] * mx / 127)"
                " * (e[i-1] - qv[i-1] * mx / 127) AS DECIMAL(38,12)) AS DOUBLE)),"
                " CAST(0.0 AS DOUBLE), (a, b) -> a + b) AS DOUBLE)"
            ),
            6,
        ).alias("mse_x_dim"),
    )


# --- deterministic k-means: 2 unrolled Lloyd iterations, hash-matched -----------

# Every numeric step is cross-engine exact: init centroids are
# decimal-mean per (vec_id % 4) bucket, distances are decimal sums of
# identical-IEEE (v−c)² terms, and argmin breaks (impossible) ties by
# cluster id — so the ASSIGNMENTS (pure integers) hash-match DuckDB,
# upgrading clustering from the usual rows-only check (ann_ivf's
# MLlib k-means has private seeds) to a full value match.
# CTE body shared with queries/curation.py (SemDeDup reuses the same
# deterministic assignment as its clustering stage).
#
# k GROWS WITH THE CORPUS: k = max(4, ceil(sqrt(n/50))) keeps cell
# sizes ~50·sqrt(n/50) so the SemDeDup pair scan is Σ|cell|² ≈ n^1.5,
# not n² (the round-5 probe measured 34.9× wall at 10× data with k
# fixed). The formula is engine-neutral IEEE (sqrt/ceil of the same
# double in Spark, DuckDB, and Python produce the same integer), so
# assignments still hash-match at every sf; at the graded sf0.01
# (n=500) it evaluates to the historical k=4.
# Defined once in queries/shared_sql.py (curation.py's SemDeDup oracle
# consumes the same CTEs without importing this registering module).
from .shared_sql import (  # noqa: E402
    KMEANS_CTES as _KMEANS_CTES,
    KMEANS_K_SQL as _KMEANS_K_SQL,
)

_KMEANS_ORACLE = f"""
WITH {_KMEANS_CTES}
SELECT a1.vec_id, CAST(a1.c1 AS BIGINT) AS c1, CAST(a2.c2 AS BIGINT) AS c2
FROM a1 JOIN a2 ON a1.vec_id = a2.vec_id
"""


# The (vec_id, c1, c2) assignment is an *index artifact*: built once,
# then profiled / probed / evaluated by several graded queries. Memoize
# the materialized (localCheckpoint) result per (session, sf_dir) so
# consumers share one build instead of re-running two Lloyd iterations
# each — the in-session analog of writing the IVF index to storage.
# Cache unified on operators/fuzzy_graph.memoized_checkpoint (r9,
# ADVICE r8): dead-applicationId entries evict on access and first
# builds are lock-serialized, instead of this module keeping its own
# never-evicting dict.


def _kmeans_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.fuzzy_graph import memoized_checkpoint

    return memoized_checkpoint(
        spark,
        sf_dir,
        "kmeans_assign",
        lambda: _build_kmeans_assignment(spark, sf_dir),
    )


# Above this corpus size the exact index build (two Lloyd iterations as
# exploded joins over EVERY vector, k ∝ √n ⇒ O(n^1.5) — the round-5
# probe measured 70.9 s cold at just 200 k×64d) switches to
# sample-train + BLAS-assign: centroids are trained on a deterministic
# md5-selected sample of ≈KMEANS_TRAIN_SAMPLE_ROWS vectors with the
# SAME decimal-exact plan, then the FULL corpus is assigned by an
# Arrow-batched numpy matmul against the collected k×64 centroid matrix
# (k ≈ ceil(√(n/50)): 4.5 k centroids × 64 d × 8 B ≈ 2.3 MB at 10⁹
# vectors — executor-closure-sized at any corpus). Train cost becomes
# O(sample^1.5) — constant in n — and assignment is one linear BLAS
# pass, so the cold build is sub-n^1.5 end to end. Below the cap the
# historical exact plan runs unchanged, so every oracle hash stands.
KMEANS_EXACT_BUILD_CAP = 1_000_000
KMEANS_TRAIN_SAMPLE_ROWS = 200_000


def _lloyd_assign(pos: DataFrame, cent: DataFrame) -> DataFrame:
    """One Lloyd assignment step, bit-identical to the historical
    all-decimal plan but without its per-(vec, centroid, dim)
    double→DECIMAL(38,12) cast (each such cast goes through
    Double.toString + BigDecimal — the measured dominant cost of
    ivf_assign_build, r13 profile; guide §1.2 per-task work).

    Two-phase certified argmin (r14): phase 1 computes plain-double
    distances ``dd`` (codegen'd arithmetic, no string path) and keeps
    every vector whose best-vs-second-best gap exceeds a conservative
    bound on |dd − dist_decimal|; phase 2 re-runs the EXACT historical
    decimal semantics only for the uncertified vectors. Bound
    derivation: the decimal cast quantizes each of the 64 double terms
    by ≤ 0.5e-12 absolute (≤ 3.2e-11 per sum) and the double
    summation adds ≤ 63·2⁻⁵³·Σ|terms| ≈ 7e-15·dd relative error, so
    |dd − dist| ≤ 3.3e-11 + 1e-14·dd; the guard
    ``gap > 1e-9 + 1e-12·(dd₀+dd₁)`` is ≥ 15× that for BOTH operands
    at any data magnitude (terms that would overflow DECIMAL(38,12)
    need |v−c| > 1e13 — not representable in these embedding tables).
    When the gap certifies, the decimal ordering is provably the
    double ordering and no tie exists, so MIN(struct(dd, j)) picks the
    identical cluster; otherwise the exact leg decides. Assignments
    are therefore value-identical on ANY input, and the oracle SQL
    (shared_sql.KMEANS_CTES) is untouched. Measured at sf0.1: zero
    uncertified vectors, build 3.5 → 1.8 s warm (interleaved A/B)."""
    d = (
        pos.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "j")
        .agg(
            F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))).alias(
                "dd"
            )
        )
    )
    # eager checkpoint: consumed twice (the emptiness probe + the fast
    # projection) — the r13 rule for multiply-consumed frames.
    per = (
        d.groupBy("vec_id")
        .agg(
            F.min(F.struct("dd", "j")).alias("best"),
            F.sort_array(F.collect_list("dd")).alias("ds"),
        )
        .localCheckpoint(eager=True)
    )
    gap_ok = (F.size("ds") < 2) | (
        F.col("ds")[1] - F.col("ds")[0]
        > 1e-9 + 1e-12 * (F.col("ds")[0] + F.col("ds")[1])
    )
    fast = per.where(gap_ok).select("vec_id", F.col("best.j").alias("c"))
    amb = per.where(~gap_ok).select("vec_id")
    if amb.isEmpty():
        return fast
    # Exact leg, usually empty: the unabridged historical decimal
    # argmin over just the uncertified vectors. argmin by (dist, j) as
    # MIN(struct): lexicographic struct ordering IS the
    # row_number(ORDER BY dist, j) = 1 pick (r10).
    exact = (
        pos.join(F.broadcast(amb), "vec_id", "left_semi")
        .join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "j")
        .agg(
            F.sum(F.expr("CAST((v - c) * (v - c) AS DECIMAL(38,12))")).alias(
                "dist"
            )
        )
        .groupBy("vec_id")
        .agg(F.min(F.struct("dist", "j"))["j"].alias("c"))
    )
    return fast.unionByName(exact)


def _build_kmeans_assignment(
    spark: SparkSession, sf_dir: str, exact_cap: int | None = None
) -> DataFrame:
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    # Same k formula as _KMEANS_K_SQL — IEEE sqrt/ceil give the same
    # integer in Python and DuckDB, so assignments hash-match.
    k = max(4, math.ceil(math.sqrt(n / 50.0)))
    cap = KMEANS_EXACT_BUILD_CAP if exact_cap is None else exact_cap
    if n > cap:
        return _sampled_kmeans_assignment(emb, n, k)
    pos = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim0", "vf")
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.col("vf").cast("double").alias("v"),
    )

    def centroids(assign: DataFrame | None) -> DataFrame:
        if assign is None:
            src = pos.withColumn("j", F.col("vec_id") % k)
        else:
            src = pos.join(assign, "vec_id").withColumnRenamed("c", "j")
        return src.groupBy("j", "dim").agg(
            (
                F.sum(F.col("v").cast("decimal(38,10)")).cast("double")
                / F.count("*")
            ).alias("c")
        )

    # eager checkpoint: a1 is consumed TWICE below (the centroid
    # re-fit and the c1/c2 join), and the r13 bench showed lazy
    # checkpoints duplicate a twice-consumed subtree inside the fused
    # job (the bfs/kcore regression); lazy here measured neutral at
    # best, so keep the materialized form. An array-HOF rewrite of
    # this plan (no explode, argmin via aggregate/zip_with decimals)
    # was measured SLOWER warm (4.3 s vs 3.0 s at sf0.1 — interpreted
    # decimal lambdas) and reverted; see OPTIMIZATION_r13.md. The
    # assignment step itself is the two-phase certified argmin
    # (_lloyd_assign, r14) — value-identical to the all-decimal plan.
    # MEASURED NEGATIVE (r14): spreading pos (hash on vec_id, value-
    # safe — the certificate bound holds for any summation order and
    # the decimal legs are order-independent) and spread+checkpoint
    # both benched neutral-to-worse over 4 interleaved warm pairs
    # (A 3.0/2.4/1.9/1.6 s vs B 3.3/1.9/2.1/1.7 vs C 3.5/2.5/2.2/1.8):
    # at the n ≤ cap scale this path ever runs (the >1M-vector corpus
    # takes _sampled_kmeans_assignment), the wall is ~8 sequential
    # small jobs of scheduling+codegen, not the single-task compute.
    a1 = _lloyd_assign(pos, centroids(None)).localCheckpoint(eager=True)
    a2 = _lloyd_assign(pos, centroids(a1))
    return (
        a1.withColumnRenamed("c", "c1")
        .join(a2.withColumnRenamed("c", "c2"), "vec_id")
        .select("vec_id", F.col("c1").cast("long"), F.col("c2").cast("long"))
    )


def _sampled_kmeans_assignment(emb: DataFrame, n: int, k: int) -> DataFrame:
    """Big-corpus index build: decimal-exact training on a deterministic
    sample, full-corpus assignment via Arrow-batched BLAS.

    Sample selection is md5-bucket (``conv(md5(vec_id)[:8]) % denom``):
    reproducible in any engine, stable under appends of new ids, no RNG.
    Training mirrors the exact path bit-for-bit on the sampled rows
    (same decimal centroid means, same decimal distances, same id
    tie-break); only the full-corpus assignment runs as float64 matmul,
    with argmin over ascending cluster ids so ties (measure-zero on
    real embeddings) still break low-id like the exact plan.
    """
    import numpy as np
    import pandas as pd

    denom = max(1, n // KMEANS_TRAIN_SAMPLE_ROWS)
    sample = emb.where(
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % denom == 0
    )
    pos = sample.select(
        "vec_id", F.posexplode("embedding").alias("dim0", "vf")
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.col("vf").cast("double").alias("v"),
    )

    def centroids(assign: DataFrame | None) -> DataFrame:
        if assign is None:
            src = pos.withColumn("j", F.col("vec_id") % k)
        else:
            src = pos.join(assign, "vec_id").withColumnRenamed("c", "j")
        return src.groupBy("j", "dim").agg(
            (
                F.sum(F.col("v").cast("decimal(38,10)")).cast("double")
                / F.count("*")
            ).alias("c")
        )

    cent0 = centroids(None)
    # Two-phase certified argmin (_lloyd_assign, r14) — value-identical
    # to the historical all-decimal training assignment.
    a1_s = _lloyd_assign(pos, cent0).localCheckpoint()
    cent1 = centroids(a1_s)

    def to_matrix(cent: DataFrame) -> tuple[np.ndarray, np.ndarray]:
        rows = cent.collect()  # ≤ k×64 rows — MBs at 10⁹-vector k
        js = np.array(sorted({r.j for r in rows}), dtype=np.int64)
        jpos = {int(j): i for i, j in enumerate(js)}
        dims = max(r.dim for r in rows)
        mat = np.zeros((len(js), dims), dtype=np.float64)
        for r in rows:
            mat[jpos[int(r.j)], r.dim - 1] = r.c
        return js, mat

    js0, c0 = to_matrix(cent0)
    js1, c1m = to_matrix(cent1)
    sq0 = (c0 * c0).sum(axis=1)
    sq1 = (c1m * c1m).sum(axis=1)

    def assign_batches(batches):
        for pdf in batches:
            x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            # ||x−c||² argmin ≡ (||c||² − 2x·c) argmin; js ascending →
            # np.argmin's first-occurrence rule breaks ties low-id.
            d0 = sq0[None, :] - 2.0 * (x @ c0.T)
            d1 = sq1[None, :] - 2.0 * (x @ c1m.T)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "c1": js0[np.argmin(d0, axis=1)],
                    "c2": js1[np.argmin(d1, axis=1)],
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        assign_batches, "vec_id long, c1 long, c2 long"
    )


@graded("vector_kmeans_assign", oracle=_KMEANS_ORACLE)
def vector_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (k=4), two iterations, fully deterministic:
    id-bucket init, decimal-exact distances, id tie-break. Per
    iteration the plan is: centroid table (k·64 rows — broadcast) ⋈
    exploded vectors → per-(vec, cluster) decimal distance agg →
    per-vec argmin. The vector side shuffles once per iteration on
    vec_id; centroids always broadcast, so iterations scale linearly
    in corpus size and the 100 TB path just adds iterations (or
    mini-batches) — same plan as ann_ivf's training loop, minus
    MLlib's private RNG. The materialized assignment is shared with
    every consumer via the session-scoped index cache."""
    return _kmeans_assignment(spark, sf_dir)


# --- EXT: Johnson-Lindenstrauss random projection --------------------------------

# 64 → 8 dim reduction with a deterministic ±1 projection matrix:
# sign(i,j) = parity of the first md5 hex digit of "i_j" — the same
# construction in both engines, no RNG. Inputs quantize to exact
# 1e-4 ticks (BIGINT), so each output coordinate is one integer dot
# product; only the final rescale is floating point.
_RANDPROJ_ORACLE = """
WITH pos AS (
  SELECT vec_id, pos AS i,
         CAST(round(CAST(list_extract(embedding, pos + 1) AS DOUBLE)
                    * 10000, 0) AS BIGINT) AS xi
  FROM embeddings, range(0, 64) t(pos)
),
pj AS (SELECT vec_id, i, xi, j FROM pos, range(0, 8) t2(j)),
y AS (
  SELECT vec_id, CAST(j AS INTEGER) AS j,
         SUM(CASE WHEN contains('02468ace',
                    substring(md5(CAST(i AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 1))
             THEN xi ELSE -xi END) AS y
  FROM pj GROUP BY vec_id, j
)
SELECT vec_id, j, ROUND(CAST(y AS DOUBLE) / 10000.0, 4) AS yv FROM y
"""


@graded("vector_random_projection", oracle=_RANDPROJ_ORACLE)
def vector_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss ±1 sketch of the embedding column
    (64 → 8 dims) — the cheap-distance-preserving compression stage
    before clustering/ANN at corpus scale. The projection matrix is a
    hash function, not a broadcast artifact, so executors need zero
    setup state; the explode stays parent-partition-local and partial
    aggregation collapses each vector's 512 terms map-side before the
    one per-vector shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    pos = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "x")
    ).withColumn(
        "xi", F.round(F.col("x").cast("double") * 10000, 0).cast("long")
    )
    pj = pos.select(
        "vec_id", "i", "xi", F.explode(F.sequence(F.lit(0), F.lit(7))).alias("j")
    )
    sgn_pos = F.expr(
        "contains('02468ace', substring(md5(concat(cast(i as string), '_',"
        " cast(j as string))), 1, 1))"
    )
    y = pj.groupBy("vec_id", "j").agg(
        F.sum(F.when(sgn_pos, F.col("xi")).otherwise(-F.col("xi"))).alias("y")
    )
    return y.select(
        "vec_id", "j", F.round(F.col("y").cast("double") / 10000.0, 4).alias("yv")
    )


# --- EXT: deterministic hyperplane LSH (cosine ANN, hash-matched) ----------------

# Random-hyperplane LSH made engine-deterministic: ±1 hyperplanes
# from the same md5-parity construction as the JL sketch; the sign
# pattern of the integer projections is the bucket. Candidates are
# bucket-local pairs; the exact rerank reuses the rounded-cosine
# recipe. Unlike MLlib MinHashLSH (seeded, rows-only), every stage
# here is reproducible in plain SQL — a full hash-match oracle for an
# ANN pipeline.
#
# The PLANE COUNT GROWS WITH THE CORPUS (integer threshold table — no
# float log, so Python and DuckDB trivially agree): 2^p buckets keep
# bucket sizes ≈64–128, so the bucket-local rerank stays Σ bucket²
# ≈ n·128 instead of n²/2^p with p fixed. At the graded sf0.01
# (n=500) it evaluates to the historical p=3.
_PLANE_STEPS = [(1024, 3), (4096, 5), (16384, 7), (65536, 9), (262144, 11)]
_PLANE_MAX = 13

_PLANES_SQL = "pcnt AS (SELECT CASE " + " ".join(
    f"WHEN COUNT(*) <= {lim} THEN {p}" for lim, p in _PLANE_STEPS
) + f" ELSE {_PLANE_MAX} END AS p FROM embeddings)"


def _n_planes(n: int) -> int:
    for lim, p in _PLANE_STEPS:
        if n <= lim:
            return p
    return _PLANE_MAX


_HYPERPLANE_ORACLE = f"""
WITH {_PLANES_SQL},
pos AS (
  SELECT vec_id, pos AS i,
         CAST(round(CAST(list_extract(embedding, pos + 1) AS DOUBLE)
                    * 10000, 0) AS BIGINT) AS xi
  FROM embeddings, range(0, 64) t(pos)
),
pj AS (SELECT vec_id, i, xi, j
       FROM pos, range(0, 16) t2(j)
       WHERE j < (SELECT p FROM pcnt)),
y AS (
  SELECT vec_id, j,
         SUM(CASE WHEN contains('02468ace',
                    substring(md5(CAST(i AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 1))
             THEN xi ELSE -xi END) AS y
  FROM pj GROUP BY vec_id, j
),
bkt AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN y > 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
  FROM y GROUP BY vec_id
)
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, ba.bucket,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 4) AS score
FROM bkt ba
JOIN bkt bb ON ba.bucket = bb.bucket AND ba.vec_id < bb.vec_id
JOIN embeddings a ON a.vec_id = ba.vec_id
JOIN embeddings b ON b.vec_id = bb.vec_id
WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 4) >= 0.2
"""


def _hyperplane_buckets(emb: DataFrame, n_planes: int | None = None) -> DataFrame:
    """(vec_id, bucket): sign pattern of the md5-parity integer
    projections — the shared bucketing stage of the hyperplane-LSH
    family (ANN + recall eval). ``n_planes`` defaults to the
    corpus-scaled threshold table (_n_planes), mirroring _PLANES_SQL."""
    if n_planes is None:
        n_planes = _n_planes(emb.count())
    pos = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "x")
    ).select(
        "vec_id",
        "i",
        F.round(F.col("x").cast("double") * 10000, 0).cast("long").alias("xi"),
    )
    pj = pos.select(
        "vec_id",
        "i",
        "xi",
        F.explode(F.sequence(F.lit(0), F.lit(n_planes - 1))).alias("j"),
    )
    sgn_pos = F.expr(
        "contains('02468ace', substring(md5(concat(cast(i as string), '_',"
        " cast(j as string))), 1, 1))"
    )
    y = pj.groupBy("vec_id", "j").agg(
        F.sum(F.when(sgn_pos, F.col("xi")).otherwise(-F.col("xi"))).alias("y")
    )
    return y.groupBy("vec_id").agg(
        F.sum(
            F.when(F.col("y") > 0, F.expr("CAST(1 << j AS BIGINT)")).otherwise(0)
        ).alias("bucket")
    )


@graded("ann_hyperplane_lsh", oracle=_HYPERPLANE_ORACLE)
def ann_hyperplane_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine ANN via deterministic random-hyperplane LSH: integer
    sign projections bucket the corpus (md5-derived planes — zero
    broadcast state), then the BLAS rerank runs bucket-locally.
    Candidate volume is Σ bucket² instead of n² — the scale path the
    exact-KNN docstrings point at, here as a first-class graded op."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    embb = emb.join(_hyperplane_buckets(emb), "vec_id")

    # Bucket-LOCAL rerank: one shuffle on the bucket key, then each
    # bucket scores its own |bucket|² BLAS block. The earlier
    # cosine_blas(block_col=...) form computed the dense n×n corpus
    # matrix and masked by bucket afterward — n² compute regardless of
    # bucketing. With the corpus-scaled plane count, per-task work is
    # ~128² floats at any corpus size.
    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id", ignore_index=True)
        ids = pdf["vec_id"].to_numpy(np.int64)
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
        sims = np.round((mat @ mat.T) / (norms[:, None] * norms[None, :]), 4)
        a_idx, b_idx = np.nonzero(np.triu(sims >= 0.2, k=1))
        return pd.DataFrame(
            {
                "vec_id_a": ids[a_idx],
                "vec_id_b": ids[b_idx],
                "bucket": np.full(len(a_idx), int(pdf["bucket"].iloc[0]), np.int64),
                "score": sims[a_idx, b_idx],
            }
        )

    return embb.groupBy("bucket").applyInPandas(
        bucket_pairs,
        "vec_id_a long, vec_id_b long, bucket long, score double",
    )


# --- EXT: IVF cell profile off the deterministic k-means ------------------------

# The observability table an IVF index ships with: per-cell size,
# label spread, and majority-label purity — how balanced the cells
# are decides probe cost, and purity is the clustering-quality proxy
# when labels exist. Reuses the graded deterministic k-means verbatim
# (same CTE text), so the stats inherit its hash-match.
_IVF_STATS_ORACLE = f"""
WITH assign AS ({_KMEANS_ORACLE}),
lab AS (
  SELECT a.c2 AS cell, e.label, COUNT(*) AS cnt
  FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id
  GROUP BY a.c2, e.label
),
tot AS (
  SELECT cell, CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_labels,
         CAST(MAX(cnt) AS BIGINT) AS top_cnt
  FROM lab GROUP BY cell
),
top AS (
  SELECT cell, label AS top_label FROM (
    SELECT cell, label,
           ROW_NUMBER() OVER (PARTITION BY cell
                              ORDER BY cnt DESC, label) AS rk
    FROM lab) t
  WHERE rk = 1
)
SELECT tot.cell, tot.n, tot.n_labels,
       CAST(top.top_label AS INTEGER) AS top_label,
       CAST(tot.top_cnt AS DOUBLE) / tot.n AS purity
FROM tot JOIN top USING (cell)
"""


@graded("vector_ivf_cell_stats", oracle=_IVF_STATS_ORACLE)
def vector_ivf_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell IVF index profile (size, label spread, majority
    purity) over the deterministic k-means assignment. The assignment
    comes from the session-scoped index cache (one materialized build
    shared with vector_kmeans_assign); the profile itself is two tiny
    hash aggs + a k-row window — metadata scale at any corpus size."""
    assign = _kmeans_assignment(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    lab = (
        assign.join(emb, "vec_id")
        .groupBy(F.col("c2").alias("cell"), "label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = lab.groupBy("cell").agg(
        F.sum("cnt").alias("n"),
        F.count(F.lit(1)).alias("n_labels"),
        F.max("cnt").alias("top_cnt"),
    )
    w = Window.partitionBy("cell").orderBy(F.col("cnt").desc(), "label")
    top = (
        lab.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("cell", F.col("label").cast("int").alias("top_label"))
    )
    return (
        tot.join(top, "cell")
        .select(
            "cell",
            "n",
            "n_labels",
            "top_label",
            (F.col("top_cnt").cast("double") / F.col("n")).alias("purity"),
        )
    )


# --- EXT: ANN recall evaluation (exact vs hyperplane LSH) ------------------------

# The eval harness as a query: recall@10 of the hyperplane-LSH
# candidate set against exact ground truth, per query vector
# (vec_id < 32). Both rankings order by the ROUNDED score with the
# neighbor-id tie-break, so set membership is identical cross-engine
# and the metric itself earns a hash-match oracle — an ANN quality
# gate you can run as part of the correctness suite.
_RECALL_ORACLE = f"""
WITH {_PLANES_SQL},
q AS (SELECT * FROM embeddings WHERE vec_id < 32),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
             ORDER BY ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                            CAST(b.embedding AS DOUBLE[])), 4) DESC,
                      b.vec_id) AS rn
    FROM q a JOIN embeddings b ON b.vec_id <> a.vec_id) t
  WHERE rn <= 10
),
pos AS (
  SELECT vec_id, pos AS i,
         CAST(round(CAST(list_extract(embedding, pos + 1) AS DOUBLE)
                    * 10000, 0) AS BIGINT) AS xi
  FROM embeddings, range(0, 64) t(pos)
),
pj AS (SELECT vec_id, i, xi, j
       FROM pos, range(0, 16) t2(j)
       WHERE j < (SELECT p FROM pcnt)),
y AS (
  SELECT vec_id, j,
         SUM(CASE WHEN contains('02468ace',
                    substring(md5(CAST(i AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 1))
             THEN xi ELSE -xi END) AS y
  FROM pj GROUP BY vec_id, j
),
bkt AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN y > 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
  FROM y GROUP BY vec_id
),
lsh AS (
  SELECT query_id, neighbor_id FROM (
    SELECT qa.vec_id AS query_id, nb.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY qa.vec_id
             ORDER BY ROUND(list_cosine_similarity(CAST(qa.embedding AS DOUBLE[]),
                            CAST(nb.embedding AS DOUBLE[])), 4) DESC,
                      nb.vec_id) AS rn
    FROM q qa
    JOIN bkt ba ON ba.vec_id = qa.vec_id
    JOIN bkt bb ON bb.bucket = ba.bucket AND bb.vec_id <> qa.vec_id
    JOIN embeddings nb ON nb.vec_id = bb.vec_id) t
  WHERE rn <= 10
)
SELECT e.query_id,
       CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hit,
       CAST(COUNT(l.neighbor_id) AS DOUBLE) / 10.0 AS recall_at_10
FROM exact e
LEFT JOIN lsh l ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
GROUP BY e.query_id
"""


@graded("vector_recall_eval", oracle=_RECALL_ORACLE)
def vector_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of hyperplane-LSH candidates vs exact top-10 per
    query — the index-quality gate an ANN deployment monitors. Exact
    side: BLAS broadcast KNN; LSH side: bucket-equi join + HOF cosine
    ranked per query. The metric join is query+neighbor keyed."""
    from ..functions.vectors import cosine_similarity

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 32)
    exact = cosine_blas(
        q, emb, mode="knn", k=10, corpus_key=f"emb:{sf_dir}"
    ).select(
        "query_id", "neighbor_id"
    )
    # r14 §2.4: bkt is consumed twice (query and corpus sides of the
    # bucket join) and each evaluation re-ran the hyperplane
    # projections over every vector. Doc-sized (vec_id, bucket);
    # computed once.
    bkt = _hyperplane_buckets(emb).localCheckpoint(eager=False)
    qb = q.join(bkt, "vec_id").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "bucket",
    )
    nb = emb.join(bkt, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("n_emb"),
        "bucket",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(cosine_similarity("q_emb", "n_emb"), 4).desc(), "neighbor_id"
    )
    lsh = (
        qb.join(nb, "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    )
    return (
        exact.join(lsh, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").alias("n_hit"),
            (F.count("hit").cast("double") / 10.0).alias("recall_at_10"),
        )
    )


# --- EXT: deterministic IVF ANN composite (cells → probe → exact rerank) ----------

# The end-to-end IVF search as ONE hash-matched query — closing the last
# closable rows-only gap (ann_ivf stays rows-only because MLlib k-means
# seeds privately; every piece here is the already-graded deterministic
# machinery): cells = the k-means c2 assignment (_KMEANS_CTES verbatim),
# probe = per query the nprobe nearest cells by the SAME decimal
# distance table (d2) that defined the assignment, rerank = exact cosine
# inside the probed cells only, top-10. nprobe = GREATEST(2, k // 4)
# scales with the √n cell count, so probed volume ≈ nprobe·n/k ≈ √n per
# query at any corpus size — the IVF cost law. The emitted score is
# ROUND(cos, 4); DuckDB appends `+ 0.0` because its ROUND preserves
# -0.0 while Spark's normalizes (§8 erratum r4).
_IVF_NPROBE_SQL = f"GREATEST(2, {_KMEANS_K_SQL} // 4)"

_IVF_DET_ORACLE = f"""
WITH {_KMEANS_CTES},
probe AS (
  SELECT vec_id AS query_id, j AS cell FROM (
    SELECT vec_id, j,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rk
    FROM d2 WHERE vec_id < 32) t
  WHERE rk <= {_IVF_NPROBE_SQL}
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probe p JOIN a2 a ON a.c2 = p.cell
  WHERE a.vec_id <> p.query_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         ROUND(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
                                      CAST(ne.embedding AS DOUBLE[])), 4)
           + 0.0 AS score
  FROM cand c
  JOIN embeddings qe ON qe.vec_id = c.query_id
  JOIN embeddings ne ON ne.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rn, score
FROM (SELECT query_id, neighbor_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rn
      FROM scored) t
WHERE rn <= 10
"""


@graded("ann_ivf_deterministic", oracle=_IVF_DET_ORACLE)
def ann_ivf_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end IVF ANN with a full SQL oracle: deterministic k-means
    cells (the session-cached index), nprobe-nearest-cell probe per
    query (decimal-exact centroid distances, id tie-break), exact
    cosine rerank inside probed cells, top-10 per query.

    Plan shape: the probe side is queries×k rows (tiny); candidates
    come from ONE equi join on the cell id (candidate volume =
    nprobe·n/k ≈ √n per query — never the corpus); the rerank joins
    the 32-row query embedding table broadcast against cell members.
    At 100 TB the cell centroids ship with the stored index instead of
    being re-derived, and the cell-member join is the same shape the
    bucketed hyperplane path uses."""
    import math

    from ..functions.vectors import cosine_similarity

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    k = max(4, math.ceil(math.sqrt(n / 50.0)))  # mirrors _KMEANS_K_SQL
    nprobe = max(2, k // 4)
    assign = _kmeans_assignment(spark, sf_dir)
    pos = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim0", "vf")
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.col("vf").cast("double").alias("v"),
    )
    # cent1 re-derived from the cached c1 assignment — identical decimal
    # expression to the builder's second-iteration centroid table.
    # Memoized with the assignment (it IS part of the stored index):
    # re-deriving it per query call scans pos (n×64 rows) and made the
    # warm query path O(n) — measured 1.65 → 5.5 s at a 10× corpus
    # before the r9 checkpoint, ~flat after.
    from ..operators.fuzzy_graph import memoized_checkpoint

    def _build_cent1() -> DataFrame:
        return (
            pos.join(assign.select("vec_id", F.col("c1").alias("j")), "vec_id")
            .groupBy("j", "dim")
            .agg(
                (
                    F.sum(F.col("v").cast("decimal(38,10)")).cast("double")
                    / F.count("*")
                ).alias("c")
            )
        )

    cent1 = memoized_checkpoint(spark, sf_dir, "ivf_cent1", _build_cent1)
    qd = (
        pos.where(F.col("vec_id") < 32)
        .join(F.broadcast(cent1), "dim")
        .groupBy("vec_id", "j")
        .agg(
            F.sum(F.expr("CAST((v - c) * (v - c) AS DECIMAL(38,12))")).alias(
                "dist"
            )
        )
    )
    w_probe = Window.partitionBy("vec_id").orderBy("dist", "j")
    probe = (
        qd.withColumn("rk", F.row_number().over(w_probe))
        .where(F.col("rk") <= nprobe)
        .select(F.col("vec_id").alias("query_id"), F.col("j").alias("cell"))
    )
    members = assign.select(
        F.col("vec_id").alias("neighbor_id"), F.col("c2").alias("cell")
    )
    cand = probe.join(members, "cell").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    qe = emb.where(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    ne = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb")
    )
    scored = (
        cand.join(F.broadcast(qe), "query_id")
        .join(ne, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity("q_emb", "n_emb"), 4).alias("score"),
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), "neighbor_id"
    )
    return (
        scored.withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") <= 10)
        .select("query_id", "neighbor_id", F.col("rn").cast("long"), "score")
    )


# --- EXT: hybrid retrieval — BM25 ⊕ cosine via reciprocal-rank fusion -----------

# The standard hybrid-search shape (lexical + dense legs fused with
# RRF, Cormack et al. 2009): each leg independently ranks its top-50
# candidates for the query document (doc 0), and the fused score is
# Σ 1/(60+rank) with a missing leg contributing 0. Both legs are
# deterministic under the house recipes — the BM25 per-term scores are
# ROUND(,4)-stable and summed as DECIMAL(18,6) (exact), the cosine leg
# is the ROUND(,4) list_cosine_similarity twin of knn_topk_per_query,
# and every rank breaks ties on doc_id. 1/(60+r) on integer ranks is
# identical-operand IEEE in both engines.
_HYBRID_RRF_ORACLE = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
stats AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
q AS (SELECT DISTINCT token FROM tok WHERE doc_id = 0),
st AS (
  SELECT tf.doc_id,
         CAST(SUM(CAST(ROUND(
           LN(1.0 + (CAST(stats.n - dfreq.df AS DOUBLE) + 0.5)
                    / (CAST(dfreq.df AS DOUBLE) + 0.5))
           * (CAST(tf.tf AS DOUBLE) * 2.2)
           / (CAST(tf.tf AS DOUBLE)
              + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) / stats.avgdl))),
           4) AS DECIMAL(18,6))) AS DOUBLE) AS s_text
  FROM tf
  JOIN dl USING (doc_id)
  JOIN dfreq USING (token)
  JOIN q USING (token), stats
  WHERE tf.doc_id <> 0
  GROUP BY tf.doc_id
),
tt AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s_text DESC, doc_id) AS rt
  FROM st QUALIFY rt <= 50
),
sv AS (
  SELECT b.vec_id AS doc_id,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 4) AS s_vec
  FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id <> 0
),
tv AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s_vec DESC, doc_id) AS rv
  FROM sv QUALIFY rv <= 50
)
SELECT COALESCE(tt.doc_id, tv.doc_id) AS doc_id,
       CAST(tt.rt AS BIGINT) AS rank_text,
       CAST(tv.rv AS BIGINT) AS rank_vec,
       ROUND(COALESCE(1.0 / (60.0 + tt.rt), 0.0)
             + COALESCE(1.0 / (60.0 + tv.rv), 0.0), 6) AS rrf
FROM tt FULL OUTER JOIN tv ON tt.doc_id = tv.doc_id
ORDER BY rrf DESC, doc_id
LIMIT 20
"""


@graded("search_hybrid_rrf", oracle=_HYBRID_RRF_ORACLE)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search for query doc 0: BM25 leg (query-term-filtered
    inverted scoring — the term filter broadcasts, so the leg costs one
    tf shuffle like text_bm25) and dense leg (BLAS cosine vs the
    corpus), each TakeOrdered to top-50, fused by reciprocal-rank
    fusion and TakeOrdered to top-20. Rank windows run on the 50-row
    leg results only — no data-scale sort anywhere; at 100 TB each leg
    is the already-scaled operator (inverted index / ANN) feeding the
    same 50-row fusion."""
    from ..operators.ranks import UNIT_GROUP, attach_unit_group

    from ..queries.text import bm25_postings_cached

    emb = load_table(spark, sf_dir, "embeddings")
    # r13 (guide §2.4): the BM25 leg used to re-run the token explode
    # + three hash aggs per invocation; the memoized posting frame
    # carries the identical exact counts (same whitespace tokenizer,
    # same tf/dl/df/n/avgdl aggregation expressions), so the leg is
    # now one broadcast-filtered projection of it. Score expression
    # unchanged — identical-operand IEEE.
    p = bm25_postings_cached(spark, sf_dir)
    qterms = p.where(F.col("doc_id") == 0).select("token").distinct()
    idf = F.log(
        F.lit(1.0)
        + ((F.col("n") - F.col("df")).cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
    )
    score = (
        idf
        * (F.col("tf").cast("double") * 2.2)
        / (
            F.col("tf").cast("double")
            + 1.2 * (0.25 + 0.75 * (F.col("dl").cast("double") / F.col("avgdl")))
        )
    )
    st = (
        p.where(F.col("doc_id") != 0)
        .join(F.broadcast(qterms), "token")
        .groupBy("doc_id")
        .agg(
            F.sum(F.round(score, 4).cast("decimal(18,6)"))
            .cast("double")
            .alias("s_text")
        )
    )
    top_t = attach_unit_group(
        st.orderBy(F.col("s_text").desc(), "doc_id").limit(50)
    )
    w_t = Window.partitionBy(UNIT_GROUP).orderBy(
        F.col("s_text").desc(), "doc_id"
    )
    tt = top_t.select(
        "doc_id", F.row_number().over(w_t).cast("long").alias("rank_text")
    )
    # Corpus = the FULL emb snapshot (shared corpus_key): knn mode
    # already masks ids == query id inside the kernel, so vec 0 can
    # never rank as its own neighbor — identical results to the
    # retired emb.where(vec_id != 0) corpus, one snapshot per session
    # instead of a private one.
    sv = cosine_blas(
        emb.where(F.col("vec_id") == 0),
        emb,
        mode="knn",
        k=50,
        corpus_key=f"emb:{sf_dir}",
    ).select(F.col("neighbor_id").alias("doc_id"), F.col("score").alias("s_vec"))
    top_v = attach_unit_group(sv)
    w_v = Window.partitionBy(UNIT_GROUP).orderBy(
        F.col("s_vec").desc(), "doc_id"
    )
    tv = top_v.select(
        "doc_id", F.row_number().over(w_v).cast("long").alias("rank_vec")
    )
    fused = tt.join(tv, "doc_id", "full_outer").select(
        "doc_id",
        "rank_text",
        "rank_vec",
        F.round(
            F.coalesce(1.0 / (60.0 + F.col("rank_text")), F.lit(0.0))
            + F.coalesce(1.0 / (60.0 + F.col("rank_vec")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(20)


# --- EXT: binary quantization + Hamming-gated exact rerank (r9) -------------------

# The current-generation embedding compression: 1 bit per dimension
# (the sign), 64d float32 → two 32-bit words = 32× smaller, distance
# by popcount. The search funnel is BQ-Hamming gate → exact rerank of
# survivors — same candidates-then-verify shape as the banded SimHash
# and hyperplane-LSH families, fully deterministic (float sign bits
# are exact in both engines) so the WHOLE funnel hash-matches, unlike
# seed-private PQ/LSH libraries. Two 32-bit words, not one 64-bit
# mask: bit 63 stays untouched (DuckDB range rule, SURVEY §8 r9) and
# both words stay positive. Gate at Hamming ≤ 24/64 keeps ~3 % of
# candidates on the fixture (measured: min observed distance 17).
_BQ_WORD = (
    "aggregate(sequence({lo}, {hi}), CAST(0 AS BIGINT),"
    " (acc, i) -> acc + IF(element_at(embedding, i + 1) > 0,"
    " shiftleft(CAST(1 AS BIGINT), i - {lo}), CAST(0 AS BIGINT)))"
)

_BQ_ORACLE = """
WITH bq AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN CAST(list_extract(embedding, i + 1) AS DOUBLE) > 0
                        AND i < 32
                       THEN CAST(1 AS BIGINT) << i ELSE 0 END) AS BIGINT) AS b0,
         CAST(SUM(CASE WHEN CAST(list_extract(embedding, i + 1) AS DOUBLE) > 0
                        AND i >= 32
                       THEN CAST(1 AS BIGINT) << (i - 32) ELSE 0 END) AS BIGINT) AS b1
  FROM embeddings, range(0, 64) t(i)
  GROUP BY vec_id
),
cand AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         CAST(bit_count(xor(q.b0, v.b0)) + bit_count(xor(q.b1, v.b1))
              AS INTEGER) AS hamming
  FROM bq q JOIN bq v ON v.vec_id <> q.vec_id
  WHERE q.vec_id < 32
    AND bit_count(xor(q.b0, v.b0)) + bit_count(xor(q.b1, v.b1)) <= 24
),
scored AS (
  SELECT c.query_id, c.neighbor_id, c.hamming,
         ROUND(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
                                      CAST(ne.embedding AS DOUBLE[])), 4)
           + 0.0 AS score
  FROM cand c
  JOIN embeddings qe ON qe.vec_id = c.query_id
  JOIN embeddings ne ON ne.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, hamming, score, CAST(rn AS BIGINT) AS rn
FROM (SELECT query_id, neighbor_id, hamming, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rn
      FROM scored) t
WHERE rn <= 5
"""


@graded("vector_bq_hamming_topk", oracle=_BQ_ORACLE)
def vector_bq_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized ANN: sign-bit codes (2×32-bit words per
    vector), Hamming ≤ 24 candidate gate against 32 broadcast query
    codes, exact-cosine rerank of the ~3 % survivors, top-5 per query.

    Plan shape: code derivation is a pure map (one aggregate HOF per
    word — no explode); the gate is a 32-row broadcast against the
    corpus codes (popcount per row, map-side); only survivors reach
    the window rerank. At 100 TB the codes table is 16 B/vector — the
    gate scans compressed codes, never raw embeddings, and the rerank
    reads full vectors for survivors only (the BQ promise)."""
    from ..functions.vectors import cosine_similarity

    emb = load_table(spark, sf_dir, "embeddings")
    bq = emb.select(
        "vec_id",
        "embedding",
        F.expr(_BQ_WORD.format(lo=0, hi=31)).alias("b0"),
        F.expr(_BQ_WORD.format(lo=32, hi=63)).alias("b1"),
    )
    # limit(32) after the filter makes the broadcast bound PROVABLE to
    # the plan audit (exactly 32 rows pass the filter anyway).
    q = (
        bq.where(F.col("vec_id") < 32)
        .limit(32)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("b0").alias("qb0"),
            F.col("b1").alias("qb1"),
        )
    )
    ham = F.expr("bit_count(qb0 ^ b0) + bit_count(qb1 ^ b1)")
    cand = (
        bq.join(
            F.broadcast(q),
            (F.col("vec_id") != F.col("query_id")) & (ham <= 24),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            ham.cast("int").alias("hamming"),
            F.round(cosine_similarity("q_emb", "embedding"), 4).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), "neighbor_id"
    )
    return (
        cand.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "hamming", "score", "rn")
    )


# --- BQ recall gate: does the Hamming funnel keep the exact top-5? ---------------

# Same index-quality-gate pattern as vector_recall_eval (hyperplane)
# and dedup_simhash_recall_eval (banded simhash): every approximate
# index in the repo ships with the recall evaluation a deployment
# monitors. Exact side = BLAS broadcast KNN; BQ side = the graded
# funnel above; the metric join is (query, neighbor)-keyed and the
# recall division is exact-int / 5.0.
_BQ_RECALL_ORACLE = (
    "WITH exact AS (\n"
    "  SELECT query_id, neighbor_id FROM (\n"
    "    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,\n"
    "           ROW_NUMBER() OVER (PARTITION BY a.vec_id\n"
    "             ORDER BY ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),\n"
    "                            CAST(b.embedding AS DOUBLE[])), 4) DESC,\n"
    "                      b.vec_id) AS rn\n"
    "    FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id\n"
    "    WHERE a.vec_id < 32) t\n"
    "  WHERE rn <= 5\n"
    "),\n"
    "bqt AS (\n"
    + _BQ_ORACLE
    + ")\n"
    "SELECT e.query_id,\n"
    "       CAST(COUNT(b.neighbor_id) AS BIGINT) AS n_hit,\n"
    "       CAST(COUNT(b.neighbor_id) AS DOUBLE) / 5.0 AS recall_at_5\n"
    "FROM exact e\n"
    "LEFT JOIN bqt b ON b.query_id = e.query_id AND b.neighbor_id = e.neighbor_id\n"
    "GROUP BY e.query_id\n"
)


@graded("vector_bq_recall_eval", oracle=_BQ_RECALL_ORACLE)
def vector_bq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of the binary-quantization funnel vs exact top-5 per
    query — the gate that decides whether the Hamming threshold (24)
    and code width (64 bits) are adequate before a BQ index replaces
    exact scoring in production. Measured 0.425 mean recall@5 on the
    fixture — i.e. the gate correctly REJECTS this configuration for
    recall-critical use (raise the threshold or rerank a wider
    candidate set); the eval existing and hash-matching is the
    deliverable, not a flattering number."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 32)
    exact = cosine_blas(
        q, emb, mode="knn", k=5, corpus_key=f"emb:{sf_dir}"
    ).select(
        "query_id", "neighbor_id"
    )
    bq = vector_bq_hamming_topk(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("bq_neighbor")
    )
    hit = exact.join(
        bq,
        (exact.query_id == bq.query_id)
        & (exact.neighbor_id == bq.bq_neighbor),
        "left",
    ).select(exact.query_id, "bq_neighbor")
    return hit.groupBy("query_id").agg(
        F.count("bq_neighbor").cast("bigint").alias("n_hit"),
        (F.count("bq_neighbor").cast("double") / 5.0).alias("recall_at_5"),
    )


# --- EXT: int8 scalar quantization (SQ8) distortion + recall funnel (r11) ----------

# The third standard ANN compression next to the graded PQ (codebooks)
# and BQ (sign bits): per-dimension min/max scalar quantization to
# uint8 — 4x smaller than float32, trivially SIMD-decodable, the
# default "cheap win" tier in FAISS/Lucene deployments. Codes are
# exact integers (round((v - min)/step), clamped to [0,255]) from
# exact per-dim min/max, so the whole funnel is engine-deterministic:
# approx scores are dot products against DEQUANTIZED values
# (min + code*step), the gate keeps the approx top-20, the exact
# rerank keeps 5, and recall@5 + mean absolute score distortion are
# graded as values. Every dot product is a posexplode equi-join with
# DECIMAL(38,12) per-term sums; per-dim stats are a 64-row broadcast.
_SQ8_GATE_K = 20
_SQ8_FINAL_K = 5

_SQ8_ORACLE = f"""
WITH pos AS (
  SELECT vec_id, pos AS dim,
         CAST(list_extract(embedding, pos) AS DOUBLE) AS v
  FROM embeddings, range(1, 65) t(pos)
  WHERE vec_id <> 0
),
qpos AS (
  SELECT pos AS dim, CAST(list_extract(embedding, pos) AS DOUBLE) AS qv
  FROM embeddings, range(1, 65) t(pos)
  WHERE vec_id = 0
),
stats AS (
  SELECT dim, MIN(v) AS mn, MAX(v) AS mx,
         (MAX(v) - MIN(v)) / 255.0 AS step
  FROM pos GROUP BY dim
),
codes AS (
  SELECT p.vec_id, p.dim, p.v,
         CASE WHEN s.step > 0
              THEN LEAST(GREATEST(CAST(round((p.v - s.mn) / s.step, 0)
                                       AS BIGINT), 0), 255)
              ELSE 0 END AS code,
         s.mn, s.step
  FROM pos p JOIN stats s ON s.dim = p.dim
),
scored AS (
  SELECT c.vec_id,
         CAST(SUM(CAST(q.qv * (c.mn + c.code * c.step)
                       AS DECIMAL(38,12))) AS DOUBLE) AS approx,
         CAST(SUM(CAST(q.qv * c.v AS DECIMAL(38,12))) AS DOUBLE) AS exact
  FROM codes c JOIN qpos q ON q.dim = c.dim
  GROUP BY c.vec_id
),
gate AS (
  SELECT vec_id, approx, exact
  FROM scored ORDER BY approx DESC, vec_id LIMIT {_SQ8_GATE_K}
),
rerank AS (
  SELECT vec_id FROM gate ORDER BY exact DESC, vec_id LIMIT {_SQ8_FINAL_K}
),
truth AS (
  SELECT vec_id FROM scored ORDER BY exact DESC, vec_id LIMIT {_SQ8_FINAL_K}
),
hit AS (SELECT r.vec_id FROM rerank r JOIN truth t ON t.vec_id = r.vec_id),
err AS (
  SELECT CAST(SUM(CAST(abs(approx - exact) AS DECIMAL(38,12))) AS DOUBLE)
           / {_SQ8_GATE_K} AS mean_abs_err
  FROM gate
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM scored) AS n_corpus,
       CAST({_SQ8_GATE_K} AS BIGINT) AS gate_k,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM hit) AS n_hit,
       ROUND((SELECT CAST(COUNT(*) AS DOUBLE) FROM hit)
             / {_SQ8_FINAL_K}, 4) AS recall_at_5,
       ROUND((SELECT mean_abs_err FROM err), 6) AS mean_abs_err
"""


@graded("vector_sq8_recall_eval", oracle=_SQ8_ORACLE)
def vector_sq8_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 funnel: uint8 per-dim quantization → approx-dot top-20 gate
    → exact rerank top-5; recall@5 vs exact truth plus mean absolute
    score distortion over the gate (rationale above the oracle)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pos = (
        emb.where(F.col("vec_id") != 0)
        .select("vec_id", F.posexplode("embedding").alias("dim", "v"))
        .withColumn("v", F.col("v").cast("double"))
        .localCheckpoint()
    )
    qpos = (
        emb.where(F.col("vec_id") == 0)
        .select(F.posexplode("embedding").alias("dim", "qv"))
        .withColumn("qv", F.col("qv").cast("double"))
    )
    stats = pos.groupBy("dim").agg(
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        ((F.max("v") - F.min("v")) / 255.0).alias("step"),
    )
    codes = pos.join(F.broadcast(stats), "dim").select(
        "vec_id",
        "dim",
        "v",
        "mn",
        "step",
        F.when(
            F.col("step") > 0,
            F.least(
                F.greatest(
                    F.round((F.col("v") - F.col("mn")) / F.col("step"), 0)
                    .cast("bigint"),
                    F.lit(0),
                ),
                F.lit(255),
            ),
        )
        .otherwise(0)
        .alias("code"),
    )
    scored = (
        codes.join(F.broadcast(qpos), "dim")
        .groupBy("vec_id")
        .agg(
            F.sum(
                (
                    F.col("qv") * (F.col("mn") + F.col("code") * F.col("step"))
                ).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("approx"),
            F.sum((F.col("qv") * F.col("v")).cast("decimal(38,12)"))
            .cast("double")
            .alias("exact"),
        )
        .localCheckpoint()
    )
    gate = scored.orderBy(F.col("approx").desc(), "vec_id").limit(_SQ8_GATE_K)
    rerank = gate.orderBy(F.col("exact").desc(), "vec_id").limit(_SQ8_FINAL_K)
    truth = scored.orderBy(F.col("exact").desc(), "vec_id").limit(_SQ8_FINAL_K)
    hit = rerank.select("vec_id").join(truth.select("vec_id"), "vec_id")
    n_corpus = scored.agg(F.count(F.lit(1)).cast("bigint").alias("n_corpus"))
    n_hit = hit.agg(F.count(F.lit(1)).cast("bigint").alias("n_hit"))
    err = gate.agg(
        (
            F.sum(F.abs(F.col("approx") - F.col("exact")).cast("decimal(38,12)"))
            .cast("double")
            / _SQ8_GATE_K
        ).alias("mean_abs_err")
    )
    return (
        n_corpus.crossJoin(F.broadcast(n_hit))  # scalar x scalar attaches
        .crossJoin(F.broadcast(err))
        .select(
            "n_corpus",
            F.lit(_SQ8_GATE_K).cast("bigint").alias("gate_k"),
            "n_hit",
            F.round(F.col("n_hit").cast("double") / _SQ8_FINAL_K, 4).alias(
                "recall_at_5"
            ),
            F.round("mean_abs_err", 6).alias("mean_abs_err"),
        )
    )


# --- EXT: IVF recall-vs-nprobe tuning curve (r11) -----------------------------------

# The IVF sibling of dedup_threshold_sweep: ann_ivf_deterministic
# grades ONE operating point (nprobe = k//4); the deployment question
# is the CURVE — how recall@10 grows with probed cells, against the
# exact top-10 truth, and what candidate volume each step costs. The
# whole sweep reuses the session-cached k-means index and the cached
# cent1 centroid table; per nprobe the candidate set is the SAME
# ranked (query, cell) frame filtered at rk <= nprobe, so the sweep
# costs one extra 3-row broadcast over the single-point query. Truth
# is the exact 32-query scan (the knn_cosine_exact shape). All scores
# ROUND(,4) cosines with id tie-breaks — deterministic end to end.
_NPROBE_LADDER = (1, 2, 4)
_IVF_CURVE_K = 10

_IVF_CURVE_ORACLE = f"""
WITH {_KMEANS_CTES},
ranks AS (
  SELECT vec_id AS query_id, j AS cell, rk FROM (
    SELECT vec_id, j,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rk
    FROM d2 WHERE vec_id < 32) t
),
cand AS (
  SELECT r.query_id, r.rk, a.vec_id AS neighbor_id
  FROM ranks r JOIN a2 a ON a.c2 = r.cell
  WHERE a.vec_id <> r.query_id
),
scored AS (
  SELECT c.query_id, c.rk, c.neighbor_id,
         ROUND(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
                                      CAST(ne.embedding AS DOUBLE[])), 4)
           + 0.0 AS score
  FROM cand c
  JOIN embeddings qe ON qe.vec_id = c.query_id
  JOIN embeddings ne ON ne.vec_id = c.neighbor_id
),
ps AS (SELECT unnest([{", ".join(str(p) for p in _NPROBE_LADDER)}]) AS nprobe),
topk AS (
  SELECT nprobe, query_id, neighbor_id FROM (
    SELECT p.nprobe, s.query_id, s.neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY p.nprobe, s.query_id
                              ORDER BY s.score DESC, s.neighbor_id) AS rn
    FROM ps p JOIN scored s ON s.rk <= p.nprobe) t
  WHERE rn <= {_IVF_CURVE_K}
),
truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
             ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(n.embedding AS DOUBLE[])), 4)
               DESC, n.vec_id) AS rn
    FROM embeddings q JOIN embeddings n ON n.vec_id <> q.vec_id
    WHERE q.vec_id < 32) t
  WHERE rn <= {_IVF_CURVE_K}
),
nq AS (SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries FROM ranks),
hits AS (
  SELECT k.nprobe, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM topk k JOIN truth t
    ON t.query_id = k.query_id AND t.neighbor_id = k.neighbor_id
  GROUP BY k.nprobe
),
vol AS (
  SELECT p.nprobe,
         CAST(SUM(CASE WHEN c.rk <= p.nprobe THEN 1 ELSE 0 END) AS BIGINT)
           AS n_candidates
  FROM ps p, cand c GROUP BY p.nprobe
)
SELECT v.nprobe, q.n_queries, v.n_candidates,
       COALESCE(h.n_hit, 0) AS n_hit,
       ROUND(CAST(COALESCE(h.n_hit, 0) AS DOUBLE)
             / ({_IVF_CURVE_K} * q.n_queries), 4) AS mean_recall
FROM vol v
LEFT JOIN hits h ON h.nprobe = v.nprobe, nq q
ORDER BY v.nprobe
"""


@graded("vector_ivf_nprobe_curve", oracle=_IVF_CURVE_ORACLE)
def vector_ivf_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 and candidate volume of the deterministic IVF index
    at nprobe = 1, 2, 4 against exact top-10 truth (rationale above
    the oracle). Reuses the session-cached assignment + centroid
    index; one ranked probe frame serves every ladder step."""
    from ..functions.vectors import cosine_similarity
    from ..operators.fuzzy_graph import memoized_checkpoint

    emb = load_table(spark, sf_dir, "embeddings")
    assign = _kmeans_assignment(spark, sf_dir)
    pos = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim0", "vf")
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.col("vf").cast("double").alias("v"),
    )

    def _build_cent1() -> DataFrame:
        return (
            pos.join(assign.select("vec_id", F.col("c1").alias("j")), "vec_id")
            .groupBy("j", "dim")
            .agg(
                (
                    F.sum(F.col("v").cast("decimal(38,10)")).cast("double")
                    / F.count("*")
                ).alias("c")
            )
        )

    cent1 = memoized_checkpoint(spark, sf_dir, "ivf_cent1", _build_cent1)
    qd = (
        pos.where(F.col("vec_id") < 32)
        .join(F.broadcast(cent1), "dim")
        .groupBy("vec_id", "j")
        .agg(
            F.sum(F.expr("CAST((v - c) * (v - c) AS DECIMAL(38,12))")).alias(
                "dist"
            )
        )
    )
    ranks = (
        qd.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy("dist", "j")
            ),
        )
        .select(
            F.col("vec_id").alias("query_id"), F.col("j").alias("cell"), "rk"
        )
        # consumed 2× (cand + the n_queries census) — lazy checkpoint
        # computes the probe ranking once (r13, guide §2.6)
        .localCheckpoint(eager=False)
    )
    members = assign.select(
        F.col("vec_id").alias("neighbor_id"), F.col("c2").alias("cell")
    )
    cand = (
        ranks.join(members, "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        # consumed 2× (scored + candidate-volume census) — the old plan
        # re-ran the probe join per consumer (r13, guide §2.6)
        .localCheckpoint(eager=False)
    )
    # .limit(32) is a no-op on the data (the filter admits exactly the
    # 32 query ids) but gives the truth leg's crossJoin a STATICALLY
    # provable build bound (GlobalLimit) for the plan audit's
    # bounded-nested-loop rule.
    qe = (
        emb.where(F.col("vec_id") < 32)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
        )
        .limit(32)
    )
    ne = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb")
    )
    scored = (
        cand.join(F.broadcast(qe), "query_id")
        .join(ne, "neighbor_id")
        .select(
            "query_id",
            "rk",
            "neighbor_id",
            F.round(cosine_similarity("q_emb", "n_emb"), 4).alias("score"),
        )
        # consumed once (topk) — the eager checkpoint here only added a
        # scheduled job; cand above now carries the shared-subtree
        # barrier (r13)
    )
    ps = spark.range(len(_NPROBE_LADDER)).select(
        F.element_at(
            F.array(*[F.lit(p) for p in _NPROBE_LADDER]),
            (F.col("id") + 1).cast("int"),
        ).alias("nprobe")
    )
    topk = (
        scored.crossJoin(F.broadcast(ps))  # 3-row ladder
        .where(F.col("rk") <= F.col("nprobe"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("nprobe", "query_id").orderBy(
                    F.col("score").desc(), "neighbor_id"
                )
            ),
        )
        .where(F.col("rn") <= _IVF_CURVE_K)
        .select("nprobe", "query_id", "neighbor_id")
    )
    # truth via the shared BLAS kernel (r14, guide §4.2): knn mode IS
    # this leg's semantics — per-query top-k among neighbor ≠ query,
    # score rounded to 4 dp BEFORE ranking, ties broken by ascending
    # neighbor id — and it reads the session-memoized corpus broadcast
    # instead of evaluating ~interpreted HOF cosines per (query,
    # corpus) pair. Same exactness class as the expression form (both
    # hash-match DuckDB's list_cosine_similarity at 4 dp; the exact-KNN
    # graded queries already grade this kernel directly).
    from ..operators.similarity import cosine_blas

    truth = cosine_blas(
        emb.where(F.col("vec_id") < 32),
        emb,
        mode="knn",
        k=_IVF_CURVE_K,
        corpus_key=f"emb:{sf_dir}",
    ).select("query_id", "neighbor_id")
    nq = ranks.agg(
        F.countDistinct("query_id").cast("bigint").alias("n_queries")
    )
    hits = topk.join(truth, ["query_id", "neighbor_id"]).groupBy("nprobe").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hit")
    )
    vol = (
        cand.crossJoin(F.broadcast(ps))
        .groupBy("nprobe")
        .agg(
            F.sum(F.when(F.col("rk") <= F.col("nprobe"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_candidates")
        )
    )
    return (
        vol.join(hits, "nprobe", "left")
        .crossJoin(F.broadcast(nq))  # 1-row denominator attach
        .select(
            "nprobe",
            "n_queries",
            "n_candidates",
            F.coalesce("n_hit", F.lit(0)).cast("bigint").alias("n_hit"),
            F.round(
                F.coalesce("n_hit", F.lit(0)).cast("double")
                / (_IVF_CURVE_K * F.col("n_queries")),
                4,
            ).alias("mean_recall"),
        )
        .orderBy("nprobe")
    )
