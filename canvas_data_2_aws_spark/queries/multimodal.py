"""Graded multimodal-column queries (SURVEY §1.3 / §2.8 EXT).

Payload bytes are opaque; the graded surface proves (a) binary
columns + typed metadata structs flow through scan → filter → project
→ hash untouched, and (b) the mapInPandas decode plumbing
(operators/multimodal.py) produces a stable frame-row schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import multimodal as MM
from ..registry import graded
from ..session import load_table

# --- binary payload + metadata: oracle-checked ---------------------------------

_BINARY_META_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS payload_sha,
       lang AS media_lang,
       length(text) AS content_length
FROM documents
WHERE lang IN ('en', 'zh')
"""


@graded("multimodal_binary_meta", oracle=_BINARY_META_ORACLE)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BinaryType payload with typed metadata: filter on metadata
    (never touching payload bytes), project byte length + SHA-256.
    Spark ``sha2(binary)`` ≡ DuckDB ``sha256(varchar)`` over the same
    UTF-8 bytes (both lowercase hex)."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload(docs)
    return media.where(F.col("meta.media_lang").isin("en", "zh")).select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha"),
        F.col("meta.media_lang").alias("media_lang"),
        F.col("meta.content_length").cast("long").alias("content_length"),
    )


# --- decode / frame-sample plumbing: rows-only (decoder is stubbed) -------------


# Per-frame twin of _DECODE_STATS_ORACLE (below): the fake codec is a
# pure function of the payload bytes, so every frame row re-derives in
# SQL. The mean is graded as FLOOR(mean·10⁴) — floor of the identical
# IEEE quotient is engine-stable, where ROUND of a raw double has the
# half-tie hazard (SURVEY §8.3; same discipline as decode_stats).
_DECODE_FRAMES_ORACLE = """
WITH f AS (
  SELECT doc_id, text, length(text) AS n,
         least(3, greatest(1, length(text) // 64)) AS n_frames
  FROM documents WHERE doc_id % 20 = 0
),
frames AS (
  SELECT doc_id, i.i AS frame_idx,
         64 + (n % 64) AS width, 64 AS height,
         substring(text, i.i * (n // n_frames) + 1, n // n_frames) AS chunk
  FROM f, range(0, 3) i(i)
  WHERE i.i < n_frames
)
SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
       CAST(FLOOR(
         CASE WHEN length(chunk) = 0 THEN CAST(0 AS DOUBLE)
              ELSE CAST(list_sum(list_transform(
                     range(1, length(chunk) + 1),
                     j -> ascii(substring(chunk, j, 1)))) AS DOUBLE)
                   / length(chunk)
         END * 10000) AS BIGINT) AS mean_e4
FROM frames
"""


@graded("multimodal_decode_frames", oracle=_DECODE_FRAMES_ORACLE)
def multimodal_decode_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N frame sampling through the mapInPandas decode path with the
    deterministic fake codec (real codec libs absent — see
    operators/multimodal.py). Upgraded from rows-only in round 6: the
    codec is SQL-reproducible, so every frame row — index, geometry,
    floor-quantized mean byte — is hash-graded; any drift in payload
    encoding, Arrow batch shape, or the 1→N expansion breaks it."""
    docs = load_table(spark, sf_dir, "documents").where("doc_id % 20 = 0")
    media = MM.attach_payload(docs)
    frames = MM.decode_media(media, codec=MM.fake_codec)
    return frames.select(
        "doc_id",
        "frame_idx",
        "width",
        "height",
        F.floor(F.col("mean_byte") * 10000).cast("long").alias("mean_e4"),
    ).orderBy("doc_id", "frame_idx")


# --- decode path, oracle-checked: the fake codec is SQL-reproducible ------------

# The stand-in codec is a pure function of the payload bytes, and the
# fixture payloads are ASCII — so the oracle re-derives every frame
# (substring slices + ascii sums) and checks the ENTIRE mapInPandas
# decode path against DuckDB. Aggregates are integer-exact: widths and
# FLOOR(mean_byte) — floor of the same IEEE quotient is identical in
# every engine, unlike ROUND of a raw double (SURVEY §8.3 trap).
_DECODE_STATS_ORACLE = """
WITH f AS (
  SELECT doc_id, lang, text, length(text) AS n,
         least(3, greatest(1, length(text) // 64)) AS n_frames
  FROM documents WHERE doc_id % 4 = 0
),
frames AS (
  SELECT doc_id, lang, i.i AS frame_idx,
         64 + (n % 64) AS width,
         substring(text, i.i * (n // n_frames) + 1, n // n_frames) AS chunk
  FROM f, range(0, 3) i(i)
  WHERE i.i < n_frames
),
means AS (
  SELECT doc_id, lang, frame_idx, width,
         CASE WHEN length(chunk) = 0 THEN CAST(0 AS DOUBLE)
              ELSE CAST(list_sum(list_transform(
                     range(1, length(chunk) + 1),
                     j -> ascii(substring(chunk, j, 1)))) AS DOUBLE)
                   / length(chunk)
         END AS mean_byte
  FROM frames
)
SELECT lang,
       COUNT(*) AS n_frames,
       CAST(SUM(width) AS BIGINT) AS sum_width,
       CAST(SUM(CAST(FLOOR(mean_byte) AS BIGINT)) AS BIGINT) AS sum_floor_mean
FROM means
GROUP BY lang
"""


@graded("multimodal_decode_stats", oracle=_DECODE_STATS_ORACLE)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stats over DECODED frames — the full binary →
    mapInPandas(codec) → frame rows → aggregate pipeline with a hash
    oracle: the fake codec's features are re-derived in SQL, so a
    drift anywhere (payload encoding, Arrow batch shape, frame
    slicing, 1→N expansion) breaks the match. With a real codec this
    becomes the rows-only path (multimodal_decode_frames); the
    Spark-side plumbing is identical."""
    docs = load_table(spark, sf_dir, "documents").where("doc_id % 4 = 0")
    media = MM.attach_payload(docs)
    frames = MM.decode_media(media, codec=MM.fake_codec)
    lang = docs.select("doc_id", "lang")
    return (
        frames.join(lang, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_frames"),
            F.sum("width").alias("sum_width"),
            F.sum(F.floor("mean_byte").cast("long")).alias("sum_floor_mean"),
        )
    )


# --- resize plumbing: SQL-graded geometry, byte content pinned in tests ---------

# The fake resize keeps every k-th byte, k = ceil(n/1024) → output
# length ceil(n/k) is pure integer arithmetic on octet_length, which
# DuckDB reproduces exactly. Byte-level equality against the Python
# reference is asserted in
# tests/test_approx.py::test_resize_bytes_match_python_reference.
_RESIZE_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS orig_bytes,
       32 AS out_w, 32 AS out_h,
       CAST(CASE WHEN octet_length(encode(text)) <= 1024
                 THEN octet_length(encode(text))
                 ELSE (octet_length(encode(text))
                       + CAST(CEIL(octet_length(encode(text)) / 1024.0) AS BIGINT)
                       - 1)
                      // CAST(CEIL(octet_length(encode(text)) / 1024.0) AS BIGINT)
            END AS BIGINT) AS resized_bytes
FROM documents
"""


@graded("multimodal_resize_stats", oracle=_RESIZE_ORACLE)
def multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail/resize plumbing end-to-end: payloads stream through a
    mapInPandas resize stage (operators/multimodal.resize_media) and
    the graded output checks the geometry contract — original size,
    target dims, resized size — against the oracle's closed-form
    arithmetic. The resize runs in the same scan-parallel narrow stage
    a real thumbnailer would."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload(docs)
    resized = MM.resize_media(media, resizer=MM.fake_resize)
    orig = media.select("doc_id", F.octet_length("payload").cast("long").alias("orig_bytes"))
    return orig.join(resized, "doc_id").select(
        "doc_id",
        "orig_bytes",
        F.col("out_w").cast("int").alias("out_w"),
        F.col("out_h").cast("int").alias("out_h"),
        F.octet_length("resized").cast("long").alias("resized_bytes"),
    )


# --- storage accounting over the binary column -----------------------------------

# The capacity-planning rollup a multimodal lakehouse runs per
# (source, modality-language): object counts, byte totals, mean
# object size, and each group's share of the corpus — all computed
# from metadata + octet_length without ever decoding payload bytes.
_STORAGE_ORACLE = """
WITH m AS (
  SELECT source AS media_source, lang AS media_lang,
         octet_length(encode(text)) AS n_bytes
  FROM documents
),
t AS (SELECT CAST(SUM(n_bytes) AS BIGINT) AS total FROM m)
SELECT m.media_source, m.media_lang,
       CAST(COUNT(*) AS BIGINT) AS n_objects,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(SUM(n_bytes) AS DOUBLE) / COUNT(*) AS mean_bytes,
       CAST(SUM(n_bytes) AS DOUBLE) / t.total AS byte_share
FROM m, t
GROUP BY m.media_source, m.media_lang, t.total
"""


@graded("multimodal_storage_budget", oracle=_STORAGE_ORACLE)
def multimodal_storage_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, language) storage budget of the binary column:
    counts, bytes, mean size, corpus share. Pure metadata arithmetic —
    payload bytes never leave the scan — so the rollup costs one
    column-pruned scan at any corpus size; shares are integer-operand
    divisions, unrounded."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload(docs)
    m = media.select(
        F.col("meta.media_source").alias("media_source"),
        F.col("meta.media_lang").alias("media_lang"),
        F.octet_length("payload").cast("long").alias("n_bytes"),
    )
    t = m.agg(F.sum("n_bytes").alias("total"))
    return (
        m.groupBy("media_source", "media_lang")
        .agg(
            F.count(F.lit(1)).alias("n_objects"),
            F.sum("n_bytes").alias("total_bytes"),
            (F.sum("n_bytes").cast("double") / F.count(F.lit(1))).alias(
                "mean_bytes"
            ),
        )
        .crossJoin(F.broadcast(t))
        .withColumn(
            "byte_share", F.col("total_bytes").cast("double") / F.col("total")
        )
        .drop("total")
    )


# --- perceptual-hash near-dup over payload bytes --------------------------------

# The image-dedup analog for opaque payloads: a 16-bit aHash-style
# signature (per-block byte-sum vs global mean — content-smooth, so
# similar payloads land at small Hamming distance), two 8-bit bands as
# LSH buckets, exact bit_count verify inside candidate groups. Every
# stage is integer arithmetic on the payload bytes: the bit test is
# 16·blocksum > totalsum (no division), the signature is a sum of
# shifted bits, and both engines run the same nested list transforms.
# With a real image codec the signature becomes a DCT pHash computed
# in the decode mapInPandas stage; the banding/verify plan is
# unchanged — that separation is the point of this query.
# Candidate generation runs in the VALUE domain: the signature space is
# 2^16, so the distinct-phash table is ≤65 536 rows at ANY corpus size
# and the two 8-bit band buckets hold ≤256 values each — the value-level
# clique join is bounded (≈512·256²/2 candidates worst case) with NO cap
# needed and therefore NO recall loss from capping. Doc expansion is
# where the corpus-sized caps live, and there they are connectivity-
# EXACT, not heuristic: all docs sharing a phash are pairwise hamming-0,
# so a >64-member group emits a min-doc_id star of TRUE (hamming-0)
# pairs that always survive the verify, and a big-group cross pair
# emits one rep–rep edge (a true pair at the value pair's hamming).
# Emitted components therefore coincide exactly with the BANDED
# CANDIDATE graph's components — the caps lose nothing, unlike the
# round-5 band-bucket star, whose hub edges could fail the verify and
# split components (the round-5 advisory finding this rewrite closes).
# The banding itself is approximate above hamming 1 (2x8 pigeonhole
# only guarantees tau <= 1); multimodal_phash_threshold_curve (r12)
# measures that recall per threshold against 4x4 pigeonhole truth.
_PHASH_ORACLE = """
WITH sig AS (
  SELECT doc_id,
         list_transform(range(0, 16), i ->
           list_sum(list_transform(range(1, length(text) // 16 + 1),
             j -> ascii(substring(text, i * (length(text) // 16) + j, 1))))
         ) AS bs
  FROM documents
  WHERE length(text) >= 16
),
ph AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, 16), i ->
           CASE WHEN 16 * bs[i + 1] > list_sum(bs)
                THEN CAST(1 AS BIGINT) << i ELSE 0 END)) AS BIGINT) AS phash
  FROM sig
),
vals AS (
  SELECT phash, COUNT(*) AS n, MIN(doc_id) AS rep FROM ph GROUP BY phash
),
vbands AS (
  SELECT phash, 0 AS band, phash // 256 AS bkey FROM vals
  UNION ALL
  SELECT phash, 1 AS band, phash % 256 AS bkey FROM vals
),
vpairs AS (
  -- each value appears once per band, and both bands matching would
  -- force equality, so (ph_a, ph_b) is already unique: no DISTINCT
  SELECT a.phash AS ph_a, b.phash AS ph_b,
         CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
  FROM vbands a
  JOIN vbands b ON a.band = b.band AND a.bkey = b.bkey
              AND a.phash < b.phash
  WHERE bit_count(xor(a.phash, b.phash)) <= 3
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(0 AS BIGINT) AS hamming
FROM ph a JOIN ph b ON a.phash = b.phash AND a.doc_id < b.doc_id
JOIN vals v ON v.phash = a.phash
WHERE v.n <= 64
UNION ALL
SELECT v.rep AS doc_a, p.doc_id AS doc_b, CAST(0 AS BIGINT) AS hamming
FROM ph p JOIN vals v ON v.phash = p.phash
WHERE v.n > 64 AND p.doc_id <> v.rep
UNION ALL
SELECT LEAST(a.doc_id, b.doc_id) AS doc_a,
       GREATEST(a.doc_id, b.doc_id) AS doc_b, vp.hamming
FROM vpairs vp
JOIN vals va ON va.phash = vp.ph_a
JOIN vals vb ON vb.phash = vp.ph_b
JOIN ph a ON a.phash = vp.ph_a
JOIN ph b ON b.phash = vp.ph_b
WHERE va.n <= 64 AND vb.n <= 64
UNION ALL
SELECT LEAST(va.rep, vb.rep) AS doc_a,
       GREATEST(va.rep, vb.rep) AS doc_b, vp.hamming
FROM vpairs vp
JOIN vals va ON va.phash = vp.ph_a
JOIN vals vb ON vb.phash = vp.ph_b
WHERE va.n > 64 OR vb.n > 64
"""


def phash_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, phash) — the 16-bit block-mean perceptual hash of every
    payload, repartitioned on phash behind a lazy checkpoint barrier.
    The ONE copy of the phash pipeline (ADVICE r12: the dedup query
    used to inline a duplicate that could silently drift), called by
    both multimodal_phash_dedup and the r12 threshold curve. Every
    expression and barrier choice below was measured:

    - The leading repartition("doc_id") rebalances before the hashing
      map (same rationale as dedup_minhash_banded): the corpus parquet
      is one row group, and inheriting that single partition
      serializes the whole signature stage onto one core.
    - The hashing map itself is one vectorized numpy pass inside
      mapInArrow (r13, guide §4.2) — the earlier interpreted array-HOF
      form paid ~2 lambda evaluations per CHARACTER and its giant
      expression tree kept getting inlined below exchanges by
      Catalyst (two historical 243 s incidents: an inferred-IsNotNull
      pushdown and a CollapseProject inline, each re-evaluating the
      HOF per row/pair). A Python map node is opaque to both rules,
      so neither hazard exists anymore; the comment block inside
      ``build`` records the exact-value argument (codepoint split,
      int32 wraparound, truncated tail — A/B-verified on all SFs).
    - The trailing repartition("phash") + checkpoint co-partitions
      every consumer — the value census and the expansion self-joins
      read an 8-byte phash value already laid out on the join key
      (one Exchange total per doc side).

    Session-memoized (r13): three queries now read this frame (the
    dedup, the threshold curve, and the stage funnel's pHash leg), so
    it builds once per session via the house memoized-checkpoint cache
    — named bench build row ``phash_frame_build``.
    """
    from ..operators.fuzzy_graph import memoized_checkpoint

    def build() -> DataFrame:
        docs = (
            load_table(spark, sf_dir, "documents")
            .where(F.length("text") >= 16)
            .repartition("doc_id")
        )

        # r13 (guide §4.2): the hashing map moved from interpreted
        # array-HOF expressions (`transform(split(text,''), ascii)` + 16
        # slice/aggregate folds — ~2 interpreted lambda evaluations per
        # CHARACTER) into one vectorized numpy pass per Arrow batch.
        # Values are bit-identical by construction (A/B-verified on all
        # three fixture SFs, pinned by tests/test_multimodal.py):
        #  - split(text,'') is per-CODEPOINT with no trailing empty
        #    (probed), which utf-32-le decoding reproduces exactly;
        #  - Spark's `aggregate(..., 0, a+x)` folds in INT with silent
        #    wraparound, and `16 * bs[i]` likewise — `_wrap32`
        #    reproduces two's-complement int semantics so even
        #    pathological multi-hundred-MB documents hash identically;
        #  - only the first 16·(len DIV 16) codepoints contribute, as
        #    with the old slice() walk.
        # Only (doc_id, text) crosses the Python boundary, and the
        # output is 2 longs/doc — the §8.4 "decide with small rows"
        # shape. phash is non-null by construction (the old plan needed
        # a coalesce() to defeat an inferred-IsNotNull pushdown of the
        # giant HOF expression; the Python map has nothing to inline).
        import pyarrow as pa

        def _hash_batches(batches):
            import numpy as np

            def wrap32(x):
                x = np.bitwise_and(x, np.int64(0xFFFFFFFF))
                return np.where(x >= np.int64(2**31), x - np.int64(2**32), x)

            for batch in batches:
                ids = batch.column("doc_id")
                texts = batch.column("text").to_pylist()
                out = np.zeros(len(texts), dtype=np.int64)
                for r, s in enumerate(texts):
                    cs = np.frombuffer(
                        s.encode("utf-32-le"), dtype="<u4"
                    ).astype(np.int64)
                    seg = len(cs) // 16
                    bs = wrap32(cs[: 16 * seg].reshape(16, seg).sum(axis=1))
                    total = wrap32(bs.sum())
                    bits = wrap32(16 * bs) > total
                    out[r] = int(
                        (np.int64(1) << np.arange(16, dtype=np.int64))[bits].sum()
                    )
                yield pa.RecordBatch.from_arrays(
                    [ids, pa.array(out, type=pa.int64())],
                    names=["doc_id", "phash"],
                )

        ph = docs.select("doc_id", "text").mapInArrow(
            _hash_batches, "doc_id long, phash long"
        )
        return ph.repartition("phash")

    return memoized_checkpoint(spark, sf_dir, "phash_frame", build)


@graded("multimodal_phash_dedup", oracle=_PHASH_ORACLE)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate payloads by 16-bit block-mean perceptual hash.

    Signature map stage (pure higher-order functions, no explode, no
    shuffle) → ONE exchange on phash → value-domain candidate
    generation (≤65 536 distinct signatures regardless of corpus size;
    two 8-bit bands bound each bucket at 256 VALUES, so the value
    clique join is corpus-independent and needs no recall-losing cap)
    → doc expansion with connectivity-EXACT caps: >64-member
    same-value groups emit a min-doc_id star of hamming-0 (always
    true) pairs; cross pairs touching a big group emit one rep–rep
    edge. Every output pair is a true hamming≤3 pair and the caps
    preserve the banded candidate graph's components exactly (the
    banding itself is approximate above hamming 1 — its per-threshold
    recall is graded by multimodal_phash_threshold_curve)."""
    # The signature pipeline (rebalance → char codes → block sums →
    # bit-pack → phash-keyed barrier) is phash_frame — one copy shared
    # with the threshold curve; its docstring records the measured
    # rationale for every expression and barrier choice.
    ph = phash_frame(spark, sf_dir)
    # Value census: ≤65 536 rows at ANY corpus size (16-bit domain) —
    # groupBy reuses ph's partitioning (no second exchange) and the
    # result is always broadcast-sized.
    vals = ph.groupBy("phash").agg(
        F.count("*").alias("n"), F.min("doc_id").alias("rep")
    )
    vband = vals.select(
        "phash",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band"),
                    F.expr("phash DIV 256").alias("bkey"),
                ),
                F.struct(
                    F.lit(1).alias("band"),
                    (F.col("phash") % 256).alias("bkey"),
                ),
            )
        ).alias("e"),
    ).select("phash", "e.band", "e.bkey")
    # Value-level candidates: each band bucket holds ≤256 DISTINCT
    # values, so this join is corpus-independent (≤ ~8.4 M candidate
    # checks worst case over a saturated 16-bit domain) and needs no
    # cap. Each value appears once per band and both bands matching
    # would force equality, so pairs are already unique — no DISTINCT.
    vp = (
        vband.alias("a")
        .join(F.broadcast(vband.alias("b")), ["band", "bkey"])
        .where(F.col("a.phash") < F.col("b.phash"))
        .select(
            F.col("a.phash").alias("ph_a"),
            F.col("b.phash").alias("ph_b"),
            F.expr("bit_count(a.phash ^ b.phash)").cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
    )
    vp = F.broadcast(
        vp.join(
            F.broadcast(
                vals.select(
                    F.col("phash").alias("ph_a"),
                    F.col("n").alias("n_a"),
                    F.col("rep").alias("rep_a"),
                )
            ),
            "ph_a",
        ).join(
            F.broadcast(
                vals.select(
                    F.col("phash").alias("ph_b"),
                    F.col("n").alias("n_b"),
                    F.col("rep").alias("rep_b"),
                )
            ),
            "ph_b",
        )
    )
    # Doc expansion. Caps here are connectivity-exact (see docstring):
    # every emitted edge is a true pair, so none can be dropped by a
    # later verify — components match the true graph's.
    phv = ph.join(F.broadcast(vals), "phash")
    within_small = (
        phv.where(F.col("n") <= 64)
        .alias("a")
        .join(phv.where(F.col("n") <= 64).alias("b"), "phash")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.lit(0).cast("long").alias("hamming"),
        )
    )
    within_star = phv.where(
        (F.col("n") > 64) & (F.col("doc_id") != F.col("rep"))
    ).select(
        F.col("rep").alias("doc_a"),
        F.col("doc_id").alias("doc_b"),
        F.lit(0).cast("long").alias("hamming"),
    )
    vp_small = vp.where((F.col("n_a") <= 64) & (F.col("n_b") <= 64))
    cross_small = (
        ph.select(F.col("phash").alias("ph_a"), F.col("doc_id").alias("id_a"))
        .join(vp_small, "ph_a")
        .join(
            ph.select(
                F.col("phash").alias("ph_b"), F.col("doc_id").alias("id_b")
            ),
            "ph_b",
        )
        .select(
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
            "hamming",
        )
    )
    cross_star = vp.where((F.col("n_a") > 64) | (F.col("n_b") > 64)).select(
        F.least("rep_a", "rep_b").alias("doc_a"),
        F.greatest("rep_a", "rep_b").alias("doc_b"),
        "hamming",
    )
    return (
        within_small.unionByName(within_star)
        .unionByName(cross_small)
        .unionByName(cross_star)
    )


# --- EXT: pHash Hamming-threshold recall curve, value domain (r12) -------------------

# multimodal_phash_dedup runs the production 2x8-bit banding at ONE
# operating point (hamming <= 3); this is its operating curve — the
# multimodal sibling of dedup_threshold_sweep. For every tau <= 3 the
# 4x4-bit pigeonhole banding is exact truth (3 bit errors can dirty at
# most 3 of 4 bands), while the production 2x8 banding is only
# GUARANTEED complete for tau <= 1 — at tau in {2, 3} both bands can
# take a hit, so recall may drop, and this query measures by how much
# before anyone widens the verify threshold. Everything runs in the
# VALUE domain: doc-pair masses come from value multiplicities
# (n_a * n_b per value pair, C(n,2) within a value — within-value
# pairs are hamming-0 and found by construction), so the whole curve
# is census-sized at ANY corpus: <= 65 536 values, band buckets
# bounded by the 16-bit domain, a 4-row tau ladder.
_PHASH_CURVE_ORACLE = """
WITH sig AS (
  SELECT doc_id,
         list_transform(range(0, 16), i ->
           list_sum(list_transform(range(1, length(text) // 16 + 1),
             j -> ascii(substring(text, i * (length(text) // 16) + j, 1))))
         ) AS bs
  FROM documents
  WHERE length(text) >= 16
),
ph AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, 16), i ->
           CASE WHEN 16 * bs[i + 1] > list_sum(bs)
                THEN CAST(1 AS BIGINT) << i ELSE 0 END)) AS BIGINT) AS phash
  FROM sig
),
vals AS (
  SELECT phash, CAST(COUNT(*) AS BIGINT) AS n FROM ph GROUP BY phash
),
within0 AS (
  SELECT CAST(COALESCE(SUM(n * (n - 1) // 2), 0) AS BIGINT) AS m FROM vals
),
tband AS (
  SELECT phash, n, b, CAST((phash >> (b * 4)) & 15 AS BIGINT) AS bv
  FROM vals, range(0, 4) t(b)
),
tpairs AS (
  SELECT DISTINCT a.phash AS ph_a, b.phash AS ph_b,
         CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS ham,
         a.n * b.n AS m
  FROM tband a
  JOIN tband b ON a.b = b.b AND a.bv = b.bv AND a.phash < b.phash
  WHERE bit_count(xor(a.phash, b.phash)) BETWEEN 1 AND 3
),
fband AS (
  SELECT phash, n, b,
         CASE WHEN b = 0 THEN phash // 256 ELSE phash % 256 END AS bkey
  FROM vals, range(0, 2) t(b)
),
fpairs AS (
  SELECT a.phash AS ph_a, b.phash AS ph_b,
         CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS ham,
         a.n * b.n AS m
  FROM fband a
  JOIN fband b ON a.b = b.b AND a.bkey = b.bkey AND a.phash < b.phash
  WHERE bit_count(xor(a.phash, b.phash)) BETWEEN 1 AND 3
),
taus AS (SELECT CAST(unnest([0, 1, 2, 3]) AS BIGINT) AS tau)
SELECT t.tau,
       CAST(w.m + (SELECT COALESCE(SUM(m), 0) FROM tpairs
                   WHERE ham <= t.tau) AS BIGINT) AS n_truth_pairs,
       CAST(w.m + (SELECT COALESCE(SUM(m), 0) FROM fpairs
                   WHERE ham <= t.tau) AS BIGINT) AS n_found_pairs,
       ROUND(CAST(w.m + (SELECT COALESCE(SUM(m), 0) FROM fpairs
                         WHERE ham <= t.tau) AS DOUBLE)
             / NULLIF(w.m + (SELECT COALESCE(SUM(m), 0) FROM tpairs
                             WHERE ham <= t.tau), 0), 4) AS recall
FROM taus t, within0 w
ORDER BY t.tau
"""


@graded("multimodal_phash_threshold_curve", oracle=_PHASH_CURVE_ORACLE)
def multimodal_phash_threshold_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Recall of the production 2x8 pHash banding per Hamming
    threshold tau in {0..3} against 4x4 pigeonhole truth, computed
    entirely in the 16-bit value domain (rationale above)."""
    ph = phash_frame(spark, sf_dir)
    vals = ph.groupBy("phash").agg(F.count("*").cast("bigint").alias("n"))
    within0 = vals.agg(
        F.coalesce(F.sum(F.expr("n * (n - 1) DIV 2")), F.lit(0))
        .cast("bigint")
        .alias("m")
    )

    def band_pairs(bands_df: DataFrame, distinct: bool) -> DataFrame:
        a = bands_df.select(
            "b", "bv", F.col("phash").alias("ph_a"), F.col("n").alias("n_a")
        )
        b = bands_df.select(
            "b", "bv", F.col("phash").alias("ph_b"), F.col("n").alias("n_b")
        )
        p = (
            a.join(b, ["b", "bv"])
            .where(F.col("ph_a") < F.col("ph_b"))
            .select(
                "ph_a",
                "ph_b",
                F.expr("bit_count(ph_a ^ ph_b)").cast("long").alias("ham"),
                (F.col("n_a") * F.col("n_b")).alias("m"),
            )
            .where(F.col("ham").between(1, 3))
        )
        return p.distinct() if distinct else p

    tband = vals.select(
        "phash",
        "n",
        F.explode(F.array(*[F.lit(b) for b in range(4)])).alias("b"),
    ).withColumn("bv", F.expr("CAST((phash >> (b * 4)) & 15 AS BIGINT)"))
    fband = vals.select(
        "phash",
        "n",
        F.explode(F.array(*[F.lit(b) for b in range(2)])).alias("b"),
    ).withColumn(
        "bv",
        F.expr("CASE WHEN b = 0 THEN phash DIV 256 ELSE phash % 256 END"),
    )
    # truth pairs can share several 4-bit bands -> DISTINCT; the 2x8
    # production pairs are unique by construction (both bands matching
    # forces equality).
    tpairs = band_pairs(tband, distinct=True)
    fpairs = band_pairs(fband, distinct=False)

    taus = spark.range(4).select(F.col("id").cast("bigint").alias("tau"))

    def per_tau(pairs: DataFrame, out: str) -> DataFrame:
        sums = (
            pairs.crossJoin(F.broadcast(taus))  # 4-row tau ladder
            .groupBy("tau")
            .agg(
                F.sum(F.when(F.col("ham") <= F.col("tau"), F.col("m")))
                .cast("bigint")
                .alias(out)
            )
        )
        return taus.join(sums, "tau", "left").select(
            "tau", F.coalesce(out, F.lit(0)).cast("bigint").alias(out)
        )

    tcnt = per_tau(tpairs, "cross_truth")
    fcnt = per_tau(fpairs, "cross_found")
    return (
        tcnt.join(fcnt, "tau")
        .crossJoin(F.broadcast(within0))  # 1-row within-value mass
        .select(
            "tau",
            (F.col("m") + F.col("cross_truth"))
            .cast("bigint")
            .alias("n_truth_pairs"),
            (F.col("m") + F.col("cross_found"))
            .cast("bigint")
            .alias("n_found_pairs"),
            F.round(
                (F.col("m") + F.col("cross_found")).cast("double")
                / F.nullif(F.col("m") + F.col("cross_truth"), F.lit(0)),
                4,
            ).alias("recall"),
        )
        .orderBy("tau")
    )
