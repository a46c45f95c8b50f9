"""Cross-module DuckDB oracle fragments shared by graded queries.

This module registers NOTHING (no ``@graded``) and imports no query
module, so any query module may import it at top level without
perturbing ``registry.load_all``'s driver-sampling order (the driver
grades the FIRST 50 registered names; a top-level ``from .dedup import
X`` in pipelines used to drag dedup's 18 registrations into whatever
window pipelines sat in). One copy per fragment — the scoring /
bucketing SQL cannot drift between consumers.

Consumers: queries/dedup.py, text.py, vectors.py, curation.py,
enrichment.py, pipelines.py.
"""

from __future__ import annotations

# --- 63-bit md5 SimHash -----------------------------------------------------------
#
# Classic SimHash over md5-derived token bits: each token votes ±1 per
# bit (bit b of the token = bit (b % 4) of md5 hex nibble (b // 4));
# the sign of each bit's total sets that bit of the document hash.
# 63 bits, not 64: the sign bit stays clear so the BIGINT is always
# positive and ``1 << bit`` / ``xor`` stay in range in BOTH engines
# (DuckDB raises Out of Range on ``CAST(1 AS BIGINT) << 63``).
#
# md5 is the house cross-engine hash (SURVEY §8). The previous 16-bit
# ascii·31+length code saturated: 5 000 sf0.1 docs produced 4.32 M
# Hamming≤1 candidate pairs (35 % of all pairs — quadratic in
# disguise); the md5-63 code yields 95 (measured, round 9).
#
# Yields CTE ``sh(doc_id, simhash)``. Starts with WITH — append
# further CTEs after a comma.
SIMHASH_SH_CTES = """WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
nib AS (
  SELECT doc_id, md5(token) AS h FROM tok
),
bits AS (
  SELECT doc_id, bit,
         SUM(CASE WHEN ((strpos('0123456789abcdef', substring(h, 1 + bit // 4, 1)) - 1)
               // (1 << (bit % 4))) % 2 = 1 THEN 1 ELSE -1 END) AS s
  FROM nib, range(0, 63) t(bit)
  GROUP BY doc_id, bit
),
sh AS MATERIALIZED (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END)
              AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
)"""
# ``sh`` is AS MATERIALIZED: consumers reference it 2-3× (bands + hub
# join) and DuckDB re-evaluates plain CTEs per reference — the 63-bit
# vote scan is ~tokens×63 rows, so re-evaluation dominates oracle
# wall-clock (house rule, SURVEY §8).

# Near-dup pair derivation over the 63-bit SimHash — the banded scale
# shape: 4 bands of 16 bits generate candidates by band-key equi-join
# (any two hashes within Hamming distance 3 share a band by
# pigeonhole; moderately near docs usually do too), then exact
# ``bit_count(xor) <= SIMHASH_HAM_MAX`` verifies. Band groups above
# SIMHASH_GROUP_CAP members collapse to a hub-spoke star on the
# group's minimum doc_id (n-1 candidates instead of C(n,2)) — band
# values are 16-bit, so the (band, value) census is ≤ 4·2¹⁶ rows and
# always broadcastable regardless of corpus size.
#
# Yields CTE ``pairs(pa, pb)`` (pa < pb) on top of SIMHASH_SH_CTES;
# ends with a comma — append the consumer's CTEs/SELECT.
SIMHASH_GROUP_CAP = 64
SIMHASH_HAM_MAX = 8

SIMHASH_PAIRS_SQL = (
    SIMHASH_SH_CTES
    + f""",
bands AS MATERIALIZED (
  SELECT doc_id, simhash, b,
         CAST((simhash >> (b * 16)) & 65535 AS BIGINT) AS bv
  FROM sh, range(0, 4) t(b)
),
bgrp AS MATERIALIZED (
  SELECT b, bv, COUNT(*) AS n, MIN(doc_id) AS hub FROM bands GROUP BY b, bv
),
cand AS (
  SELECT a.doc_id AS ca, b.doc_id AS cb,
         a.simhash AS sim_a, b.simhash AS sim_b
  FROM bands a
  JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id
  JOIN bgrp g ON g.b = a.b AND g.bv = a.bv AND g.n <= {SIMHASH_GROUP_CAP}
  UNION ALL
  SELECT g.hub AS ca, s.doc_id AS cb, hs.simhash AS sim_a, s.simhash AS sim_b
  FROM bands s
  JOIN bgrp g ON g.b = s.b AND g.bv = s.bv AND g.n > {SIMHASH_GROUP_CAP}
             AND s.doc_id <> g.hub
  JOIN sh hs ON hs.doc_id = g.hub
),
pairs AS MATERIALIZED (
  SELECT DISTINCT ca AS pa, cb AS pb FROM cand
  WHERE bit_count(xor(sim_a, sim_b)) <= {SIMHASH_HAM_MAX}
),"""
)

# --- banded MinHash ---------------------------------------------------------------
#
# 8 MinHash permutations grouped into 4 bands × 2 rows. Two md5 digests
# per shingle ("0:"/"1:" seeds), each split into four 8-hex (32-bit)
# slices → 8 independent hash functions for a quarter of the md5 work —
# md5 dominates the signature map stage, so this is a direct 4× CPU cut
# on the pipeline's hottest operator at any scale. md5 is byte-identical
# in every engine, so unlike MLlib's seed-private MinHashLSH this whole
# pipeline — sketch, banding, candidate join, exact verify —
# hash-matches DuckDB.
MINHASH_BANDS = [(0, 1), (2, 3), (4, 5), (6, 7)]

MINHASH_SIG = ",\n          ".join(
    f"MIN(substring(md5('{s // 4}:' || shingle), {1 + 8 * (s % 4)}, 8))"
    f" AS h{s}"
    for s in range(8)
)
MINHASH_BANDS_SQL = "\n  UNION ALL ".join(
    f"SELECT doc_id, {i} AS band, h{a} || h{b} AS bkey FROM sig"
    for i, (a, b) in enumerate(MINHASH_BANDS)
)

MINHASH_BANDED_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
sh AS (
  SELECT doc_id, list_distinct(list_transform(
           range(1, GREATEST(LEN(w) - 1, 1)),
           i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingles
  FROM w
),
shx AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM sh
),
sig AS (
  SELECT doc_id,
          {MINHASH_SIG}
  FROM shx GROUP BY doc_id
),
bands AS (
  {MINHASH_BANDS_SQL}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(LEN(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
         / (LEN(x.shingles) + LEN(y.shingles)
            - LEN(list_intersect(x.shingles, y.shingles))) AS jaccard
FROM cand c
JOIN sh x ON x.doc_id = c.doc_a
JOIN sh y ON y.doc_id = c.doc_b
"""

# --- Okapi BM25 ---------------------------------------------------------------------
#
# Lucene idf form, k1=1.2, b=0.75. Every input (tf, df, dl, N) is an
# exact integer aggregate; avgdl and the score are then the same IEEE
# op sequence over identical operands in both engines, so ROUND(,4) is
# bit-stable. Shared by text_bm25 (queries/text.py) and the Rocchio
# expansion oracle (queries/pipelines.py) so the scoring function
# cannot drift between the retrieval queries.
BM25_CTES = """
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
stats AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
bm25 AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
         ROUND(
           LN(1.0 + (CAST(stats.n - dfreq.df AS DOUBLE) + 0.5)
                    / (CAST(dfreq.df AS DOUBLE) + 0.5))
           * (CAST(tf.tf AS DOUBLE) * 2.2)
           / (CAST(tf.tf AS DOUBLE)
              + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) / stats.avgdl))),
           4) AS bm25
  FROM tf
  JOIN dl USING (doc_id)
  JOIN dfreq USING (token), stats
)"""

# --- deterministic k-means (2 unrolled Lloyd iterations) ---------------------------
#
# Every numeric step is cross-engine exact: init centroids are
# decimal-mean per (vec_id % k) bucket, distances are decimal sums of
# identical-IEEE (v−c)² terms, and argmin breaks (impossible) ties by
# cluster id. k grows with the corpus — k = max(4, ceil(sqrt(n/50)))
# keeps cell sizes ~50·sqrt(n/50) so cell-local pair scans are Σ|cell|²
# ≈ n^1.5, not n². Shared by queries/vectors.py (assignment, IVF) and
# queries/curation.py (SemDeDup clustering stage).
KMEANS_K_SQL = (
    "(SELECT GREATEST(4, CAST(ceil(sqrt(COUNT(*) / 50.0)) AS BIGINT))"
    " FROM embeddings)"
)

KMEANS_CTES = f"""pos AS (
  SELECT vec_id, pos AS dim,
         CAST(list_extract(embedding, pos) AS DOUBLE) AS v
  FROM embeddings, range(1, 65) t(pos)
),
cent0 AS (
  SELECT vec_id % {KMEANS_K_SQL} AS j, dim,
         CAST(SUM(CAST(v AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*) AS c
  FROM pos GROUP BY j, dim
),
d1 AS (
  SELECT p.vec_id, c.j,
         SUM(CAST((p.v - c.c) * (p.v - c.c) AS DECIMAL(38,12))) AS dist
  FROM pos p JOIN cent0 c ON p.dim = c.dim
  GROUP BY p.vec_id, c.j
),
a1 AS (
  SELECT vec_id, j AS c1
  FROM (SELECT vec_id, j,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rk
        FROM d1)
  WHERE rk = 1
),
cent1 AS (
  SELECT a1.c1 AS j, p.dim,
         CAST(SUM(CAST(p.v AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*) AS c
  FROM pos p JOIN a1 ON p.vec_id = a1.vec_id
  GROUP BY j, p.dim
),
d2 AS (
  SELECT p.vec_id, c.j,
         SUM(CAST((p.v - c.c) * (p.v - c.c) AS DECIMAL(38,12))) AS dist
  FROM pos p JOIN cent1 c ON p.dim = c.dim
  GROUP BY p.vec_id, c.j
),
a2 AS (
  SELECT vec_id, j AS c2
  FROM (SELECT vec_id, j,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rk
        FROM d2)
  WHERE rk = 1
)
"""

# --- corpus novelty / saturation curve ----------------------------------------------
#
# Shared by the batch derivation (queries/text.py text_novelty_curve)
# and its streaming replay twin (queries/streaming.py
# stream_novelty_replay): first-seen attribution is MIN(doc_id) per
# distinct 3-gram (doc_id = ingestion order), rolled up by ingestion
# decile. Under ascending-doc_id replay, per-batch first-arrival
# admission equals smallest-doc_id attribution, so the incremental
# gram-index maintenance reproduces this order-free derivation exactly.
NOVELTY_CURVE_ORACLE = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
g AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, GREATEST(LEN(w) - 1, 1)),
           i -> concat_ws(' ', w[i], w[i+1], w[i+2])))) AS gram
  FROM w
),
firstseen AS (
  SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram
),
mx AS (SELECT MAX(doc_id) AS mxid FROM documents),
per AS (
  SELECT g.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
              AS BIGINT) AS n_novel
  FROM g JOIN firstseen f ON f.gram = g.gram
  GROUP BY g.doc_id
)
SELECT CAST(p.doc_id * 10 // (m.mxid + 1) AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(p.n_grams) AS BIGINT) AS n_grams,
       CAST(SUM(p.n_novel) AS BIGINT) AS n_novel,
       ROUND(CAST(SUM(p.n_novel) AS DOUBLE) / CAST(SUM(p.n_grams) AS DOUBLE), 4)
         AS novelty_share
FROM per p, mx m
GROUP BY 1
ORDER BY decile
"""

# --- Efraimidis–Spirakis weighted sample --------------------------------------------
#
# Shared by the batch sampler (queries/curation.py
# sample_weighted_priority) and its streaming replay twin
# (queries/streaming.py stream_priority_sample_replay): the A-ES key
# is stateless per row, so top-k of per-batch top-ks equals the global
# top-k and the replay grades against this same derivation. The Spark
# key expression lives in operators/sampling.py.
WPS_K = 100

WPS_ORACLE = f"""
WITH w AS (
  SELECT doc_id, CAST(GREATEST(n_chars, 1) AS BIGINT) AS weight
  FROM documents
),
keys AS (
  SELECT doc_id, weight,
         ln((CAST(CAST(concat('0x', substring(md5('wps:' ||
                 CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) AS DOUBLE)
             + 1.0) / 4503599627370496.0) / weight AS es_key
  FROM w
),
topk AS (
  SELECT doc_id, weight, es_key
  FROM keys ORDER BY es_key DESC, doc_id LIMIT {WPS_K}
)
SELECT ROW_NUMBER() OVER (ORDER BY es_key DESC, doc_id) AS rank,
       doc_id, weight, ROUND(es_key * 1000000, 4) AS key_ppm
FROM topk
ORDER BY rank
"""
