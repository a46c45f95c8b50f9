"""Graded text-analysis queries (SURVEY §2.8 M8–M9 + driver-mandated
EXT: language-ID, quality scoring, token counting, fingerprinting)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators import ranks as R, text as T
from ..registry import graded
from ..session import load_table

# --- M8: word count ------------------------------------------------------------

_WORDCOUNT_ORACLE = """
SELECT token, COUNT(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
GROUP BY token
ORDER BY cnt DESC, token
LIMIT 20
"""


@graded("text_wordcount", oracle=_WORDCOUNT_ORACLE)
def text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-20 tokens: explode → hash agg → TakeOrdered top-k."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(T.tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(20)
    )


# --- M9: TF-IDF (pure SQL form — NOT MLlib IDF, whose smoothing differs) --------

_TFIDF_ORACLE = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
n AS (SELECT COUNT(*) AS n FROM documents)
SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
       ROUND(tf.tf * LN(CAST(n.n AS DOUBLE) / dfreq.df), 4) AS tfidf
FROM tf JOIN dfreq USING (token), n
"""


@graded("text_tfidf", oracle=_TFIDF_ORACLE)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf × ln(N/df): two hash aggs + a broadcast join on the (tiny)
    df table + a broadcast scalar N — no full-corpus shuffle of the
    token stream beyond the tf aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(T.tokens()).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n"))
    return (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 4
            ).alias("tfidf"),
        )
    )


# --- EXT: language-ID heuristic ---------------------------------------------------

_STOP_SQL = "['" + "','".join(T.EN_STOPWORDS) + "']"

_LANGID_ORACLE = f"""
SELECT
  doc_id,
  lang,
  CAST(LEN(list_intersect(list_distinct(string_split(text, ' ')), {_STOP_SQL}))
       AS INTEGER) AS en_hits,
  CASE WHEN LEN(list_intersect(list_distinct(string_split(text, ' ')), {_STOP_SQL})) >= 2
       THEN 'en' ELSE 'other' END AS pred_lang
FROM documents
"""


@graded("text_langid", oracle=_LANGID_ORACLE)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language-ID heuristic: distinct function-word
    matches against a broadcast dictionary — the n-gram/stopword
    pattern a real lang-ID model plugs into (dictionary per language,
    argmax over hit ratios)."""
    docs = load_table(spark, sf_dir, "documents")
    hits = T.stopword_hits()
    return docs.select(
        "doc_id",
        "lang",
        hits.alias("en_hits"),
        F.when(hits >= 2, "en").otherwise("other").alias("pred_lang"),
    )


# --- EXT: quality scoring -----------------------------------------------------------

_QUALITY_ORACLE = """
SELECT
  doc_id,
  CAST(LEN(string_split(text, ' ')) AS INTEGER) AS n_tokens,
  CAST(LEN(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_uniq,
  CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE)
    / LEN(string_split(text, ' ')) AS uniq_ratio,
  CAST(n_chars AS DOUBLE) / LEN(string_split(text, ' ')) AS avg_token_len,
  0.6 * (CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE)
         / LEN(string_split(text, ' ')))
  + 0.4 * LEAST(CAST(LEN(string_split(text, ' ')) AS DOUBLE) / 64.0, 1.0)
    AS quality_score
FROM documents
"""


@graded("text_quality", oracle=_QUALITY_ORACLE)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/diversity quality score: unique-token ratio + saturating
    length factor — the filters a pretraining pipeline applies before
    dedup. All arithmetic IEEE-exact (int ÷ int → double)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens()
    n_tokens = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    uniq_ratio = n_uniq.cast("double") / n_tokens
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_uniq.alias("n_uniq"),
        uniq_ratio.alias("uniq_ratio"),
        (F.col("n_chars").cast("double") / n_tokens).alias("avg_token_len"),
        (
            0.6 * uniq_ratio
            + 0.4 * F.least(n_tokens.cast("double") / 64.0, F.lit(1.0))
        ).alias("quality_score"),
    )


# --- EXT: token counting --------------------------------------------------------------

_TOKCOUNT_ORACLE = f"""
SELECT
  doc_id,
  CAST(LEN(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
  CAST(LEN(regexp_extract_all(text, '{T.BPE_PATTERN}')) AS INTEGER) AS n_bpe_tokens,
  CAST(CEIL(CAST(n_chars AS DOUBLE) / 4.0) AS BIGINT) AS est_llm_tokens
FROM documents
"""


@graded("text_token_count", oracle=_TOKCOUNT_ORACLE)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace, BPE-ish regex runs, and
    the chars/4 LLM heuristic (SURVEY §2.8 EXT)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(T.tokens()).alias("n_ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(text, '{T.BPE_PATTERN}', 0)")).alias(
            "n_bpe_tokens"
        ),
        F.ceil(F.col("n_chars").cast("double") / 4.0).alias("est_llm_tokens"),
    )


# --- EXT: document fingerprinting -------------------------------------------------------

_FINGERPRINT_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, pos, list_extract(string_split(text, ' '), pos) AS token
  FROM documents, range(1, 100 + 1) t(pos)
  WHERE pos <= LEN(string_split(text, ' '))
)
SELECT doc_id,
       CAST(SUM((ascii(substring(token, 1, 1)) * 31 + length(token)) * pos)
         % {T.FINGERPRINT_MOD} AS BIGINT) AS fingerprint,
       COUNT(*) AS n_tokens
FROM tok
GROUP BY doc_id
"""


@graded("text_fingerprint", oracle=_FINGERPRINT_ORACLE)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive positional document fingerprint (integer-exact
    polynomial, engine-neutral — operators/text.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.fingerprint(docs)


# --- deterministic train/test split (hash bucketing) ----------------------------

_SPLIT_ORACLE = """
WITH tagged AS (
  SELECT lang,
         CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
              THEN 'test' ELSE 'train' END AS split
  FROM documents
)
SELECT split, lang, COUNT(*) AS n
FROM tagged
GROUP BY split, lang
"""


@graded("sample_train_test_split", oracle=_SPLIT_ORACLE)
def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable ~10% test split via md5 key bucketing — the
    training-pipeline sampling primitive. Hash-of-key, never rand():
    the assignment is reproducible across engines, runs, and
    re-partitions, and survives incremental appends (a doc's split
    never changes). First 2 hex chars < '1a' ⇒ 26/256 ≈ 10.2%."""
    docs = load_table(spark, sf_dir, "documents")
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "1a", "test"
    ).otherwise("train")
    return (
        docs.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n"))
    )


# --- deterministic stratified sample (fixed n per stratum) ----------------------

_STRATIFIED_ORACLE = """
SELECT doc_id, lang, rk
FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM documents
) t
WHERE rk <= 20
"""


@graded("sample_stratified", oracle=_STRATIFIED_ORACLE)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-20-per-language sample: rank by md5(key) inside each
    stratum and keep the first 20 — a deterministic reservoir
    (hash order is uniform pseudo-random but reproducible across
    engines/runs, unlike rand() or TABLESAMPLE). Complements the
    proportional hash split: this form guarantees per-stratum counts
    for eval sets. WindowGroupLimit keeps it one shuffle + truncated
    per-group sort."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).cast("long").alias("rk"))
        .where(F.col("rk") <= 20)
    )


# --- per-source language-diversity entropy --------------------------------------

# Shannon entropy of each source's language mix: p = n/total is an
# exact int÷int double; ln(double) may differ by 1 ulp across libm
# implementations → ROUND(,4), same policy as text_tfidf.
_ENTROPY_ORACLE = """
WITH counts AS (
  SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY source, lang
),
tot AS (
  SELECT source, SUM(n) AS total FROM counts GROUP BY source
)
SELECT c.source,
       CAST(t.total AS BIGINT) AS n_docs,
       COUNT(*) AS n_langs,
       ROUND(-SUM((CAST(c.n AS DOUBLE) / t.total)
                  * ln(CAST(c.n AS DOUBLE) / t.total)), 4) AS lang_entropy
FROM counts c JOIN tot t ON c.source = t.source
GROUP BY c.source, t.total
"""


@graded("text_entropy", oracle=_ENTROPY_ORACLE)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix Shannon entropy per source — the diversity metric
    a pretraining mix uses to spot monolingual or over-concentrated
    shards. Two cheap aggregations over the same (source) shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "lang").agg(F.count("*").alias("n"))
    tot = counts.groupBy("source").agg(F.sum("n").alias("total"))
    p = F.col("n").cast("double") / F.col("total")
    return (
        counts.join(tot, "source")
        .groupBy("source", "total")
        .agg(
            F.count("*").alias("n_langs"),
            F.round(-F.sum(p * F.log(p)), 4).alias("lang_entropy"),
        )
        .select(
            "source",
            F.col("total").cast("long").alias("n_docs"),
            "n_langs",
            "lang_entropy",
        )
    )


# --- Gopher-style quality rule ensemble -----------------------------------------

# Thresholds tuned so every rule splits the fixture corpus both ways
# (token count 10–99, avg token length 4.67–6.24, uniq ratio 0.28–1.0).
# All ratios are single int÷int IEEE divisions — identical operand,
# identical result in both engines, so the booleans grade unrounded.
_GOPHER_ORACLE = f"""
SELECT doc_id,
       CAST(LEN(string_split(text, ' ')) AS INTEGER) AS n_tokens,
       CAST(n_chars AS DOUBLE) / LEN(string_split(text, ' ')) AS avg_len,
       CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE)
         / LEN(string_split(text, ' ')) AS uniq_ratio,
       CAST(LENGTH(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
         / n_chars AS sym_ratio,
       LEN(string_split(text, ' ')) BETWEEN 16 AND 80 AS r_len,
       CAST(n_chars AS DOUBLE) / LEN(string_split(text, ' '))
         BETWEEN 5.0 AND 6.0 AS r_avg,
       CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE)
         / LEN(string_split(text, ' ')) >= 0.5 AS r_uniq,
       CAST(LENGTH(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
         / n_chars < 0.1 AS r_sym,
       LEN(list_intersect(list_distinct(string_split(text, ' ')),
           {_STOP_SQL})) >= 2 AS r_stop,
       (LEN(string_split(text, ' ')) BETWEEN 16 AND 80)
         AND (CAST(n_chars AS DOUBLE) / LEN(string_split(text, ' '))
              BETWEEN 5.0 AND 6.0)
         AND (CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE)
              / LEN(string_split(text, ' ')) >= 0.5)
         AND (CAST(LENGTH(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
              / n_chars < 0.1)
         AND (LEN(list_intersect(list_distinct(string_split(text, ' ')),
              {_STOP_SQL})) >= 2) AS keep
FROM documents
"""


@graded("text_gopher_rules", oracle=_GOPHER_ORACLE)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-ensemble quality filter (the Gopher-rules shape): length
    bounds, mean-token-length band, lexical-diversity floor, symbol
    ceiling, and a function-word floor, each a pure-codegen expression
    over one scan — the per-document gate a pretraining corpus applies
    before any model-based scoring. One projection, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    w = T.tokens()
    n_tok = F.size(w)
    avg_len = F.col("n_chars").cast("double") / n_tok
    uniq = F.size(F.array_distinct(w)).cast("double") / n_tok
    sym = (
        F.length(F.regexp_replace("text", "[a-z0-9 ]", "")).cast("double")
        / F.col("n_chars")
    )
    r_len = (n_tok >= 16) & (n_tok <= 80)
    r_avg = (avg_len >= 5.0) & (avg_len <= 6.0)
    r_uniq = uniq >= 0.5
    r_sym = sym < 0.1
    r_stop = T.stopword_hits() >= 2
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        avg_len.alias("avg_len"),
        uniq.alias("uniq_ratio"),
        sym.alias("sym_ratio"),
        r_len.alias("r_len"),
        r_avg.alias("r_avg"),
        r_uniq.alias("r_uniq"),
        r_sym.alias("r_sym"),
        r_stop.alias("r_stop"),
        (r_len & r_avg & r_uniq & r_sym & r_stop).alias("keep"),
    )


# --- unigram LM surprisal: model-based quality proxy ----------------------------

# Per-token surprisal ln(N/count) may differ by 1 ulp between engines
# (ln is not guaranteed correctly-rounded); the DECIMAL(38,9) per-term
# quantization absorbs that before the order-independent decimal sum,
# and the final double division is identical-operand IEEE.
_SURPRISAL_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
cnt AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
n AS (SELECT COUNT(*) AS n FROM tok)
SELECT tok.doc_id,
       COUNT(*) AS n_tok,
       CAST(SUM(CAST(ln(CAST(n.n AS DOUBLE) / cnt.c) AS DECIMAL(38,9)))
            AS DOUBLE) / COUNT(*) AS avg_surprisal
FROM tok JOIN cnt USING (token), n
GROUP BY tok.doc_id
"""


@graded("text_unigram_logprob", oracle=_SURPRISAL_ORACLE)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM scoring: mean −ln p(token) per document under the
    corpus's own unigram distribution — the cheapest model-based
    quality/typicality score (rare-token-heavy docs score high). The
    token→count table is corpus-vocabulary-sized, so it broadcasts;
    the probe side is the token stream itself — one shuffle for the
    vocabulary agg, one for the per-doc agg, nothing quadratic."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(T.tokens()).alias("token"))
    # Vocabulary table materialized once (vocab-sized — fine to pin at
    # any corpus scale); the corpus token total derives from it as
    # sum(c) — identical value to counting the token stream, WITHOUT a
    # third full tokenize pass over the corpus (probe + cnt are the
    # only two scans).
    cnt = tok.groupBy("token").agg(F.count("*").alias("c")).localCheckpoint(
        eager=False
    )
    n = cnt.agg(F.sum("c").alias("n"))
    term = F.log(F.col("n").cast("double") / F.col("c")).cast("decimal(38,9)")
    return (
        tok.join(F.broadcast(cnt), "token")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            (F.sum(term).cast("double") / F.count("*")).alias("avg_surprisal"),
        )
    )


# --- weighted reservoir sample (Efraimidis–Spirakis A-ES, deterministic) --------

# Key r = u^(1/w) with u an md5-derived uniform and w = n_chars: the
# top-k by r IS a weighted random sample without replacement — the
# data-mixing primitive (sample shards proportional to quality weight)
# in a form that is reproducible across engines, runs, and appends.
# The 52-bit md5 slice maps into (0,1]; pow may differ by 1 ulp across
# engines but keys of distinct docs differ at ~1e-3, so the ranking is
# stable (ties impossible: md5 is injective on doc ids here).
_WEIGHTED_SAMPLE_ORACLE = """
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         POW(
           (CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                 AS BIGINT) + 1) / 4503599627370497.0,
           1.0 / n_chars
         ) AS r
  FROM documents
)
SELECT lang, doc_id, n_chars
FROM (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY r DESC, doc_id) AS rk
  FROM keyed
)
WHERE rk <= 5
"""


@graded("sample_weighted_reservoir", oracle=_WEIGHTED_SAMPLE_ORACLE)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (A-ES): one projection
    computes the key, one per-stratum top-k keeps the winners —
    mergeable across partitions (the max-k of a union is the max-k of
    per-partition max-ks), so at 100 TB it's a map-side top-k heap per
    partition plus a tiny final merge, never a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10)
        .cast("bigint")
        + 1
    ) / F.lit(4503599627370497.0)
    r = F.pow(u, F.lit(1.0) / F.col("n_chars"))
    w = Window.partitionBy("lang").orderBy(F.col("r").desc(), F.col("doc_id"))
    return (
        docs.select("lang", "doc_id", "n_chars", r.alias("r"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .select("lang", "doc_id", "n_chars")
    )


# --- EXT: PMI co-occurrence (collocation mining) --------------------------------

# Counts are exact integers; the PMI is ONE ln() over a double ratio
# built from identical operands in identical order, so both engines
# feed the same double into their (correctly-rounded) libm ln. The
# ROUND(,4) boundary risk for a single transcendental is the accepted
# ≪1e-9-per-row class (same rationale as the A-ES sampling keys; the
# sf0.01 check_oracle pass IS the driver's exact gate data). The ≥5
# pair-count floor bounds the output, not the math.
_PMI_ORACLE = """
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents
),
tok4 AS (
  SELECT doc_id, token FROM tok WHERE length(token) >= 4
),
n_docs AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
df AS (SELECT token, COUNT(*) AS dfreq FROM tok4 GROUP BY token),
pairs AS (
  SELECT a.token AS tok_a, b.token AS tok_b, COUNT(*) AS n_co
  FROM tok4 a JOIN tok4 b
    ON a.doc_id = b.doc_id AND a.token < b.token
  GROUP BY a.token, b.token
  HAVING COUNT(*) >= 5
)
SELECT p.tok_a, p.tok_b, p.n_co,
       ROUND(ln(CAST(p.n_co AS DOUBLE) * (SELECT n FROM n_docs)
                / (da.dfreq * db.dfreq)), 4) AS pmi
FROM pairs p
JOIN df da ON da.token = p.tok_a
JOIN df db ON db.token = p.tok_b
"""


@graded("text_cooccurrence_pmi", oracle=_PMI_ORACLE)
def text_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over same-document token pairs —
    the collocation miner (phrase discovery, tokenizer-merge
    candidates). The pair join is doc-keyed (bounded per-doc fanout,
    like every blocked pair expansion here); document frequencies
    broadcast back onto the pair aggregate, and the scalar corpus
    size rides a 1-row broadcast. At 100 TB: cap distinct tokens per
    doc before pairing — fanout is quadratic in that cap only."""
    docs = load_table(spark, sf_dir, "documents")
    tok4 = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("token")
        )
        .where(F.length("token") >= 4)
        .distinct()
    )
    tok4 = tok4.localCheckpoint(eager=True)  # consumed 3× below
    n_docs = docs.agg(F.countDistinct("doc_id").alias("n"))
    df_t = tok4.groupBy("token").agg(F.count(F.lit(1)).alias("dfreq"))
    a = tok4.select("doc_id", F.col("token").alias("tok_a"))
    b = tok4.select("doc_id", F.col("token").alias("tok_b"))
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .where(F.col("n_co") >= 5)
    )
    da = df_t.select(F.col("token").alias("tok_a"), F.col("dfreq").alias("df_a"))
    db = df_t.select(F.col("token").alias("tok_b"), F.col("dfreq").alias("df_b"))
    return (
        pairs.join(F.broadcast(da), "tok_a")
        .join(F.broadcast(db), "tok_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tok_a",
            "tok_b",
            "n_co",
            F.round(
                F.log(
                    F.col("n_co").cast("double")
                    * F.col("n")
                    / (F.col("df_a") * F.col("df_b"))
                ),
                4,
            ).alias("pmi"),
        )
    )


# --- EXT: BM25 retrieval scoring -------------------------------------------------

# Okapi BM25 with the Lucene idf form, k1=1.2, b=0.75. Every input (tf,
# df, dl, N) is an exact integer aggregate; avgdl and the score are then
# the same IEEE op sequence over identical operands in both engines, so
# ROUND(,4) is bit-stable (same recipe as text_tfidf / text_unigram).
# The CTE block is SHARED with the Rocchio expansion oracle
# (queries/pipelines.py) so the scoring function cannot drift between
# the retrieval queries.
# Defined once in queries/shared_sql.py (also consumed by the Rocchio
# oracle in queries/pipelines.py, which must not import this
# registering module for SQL text).
from .shared_sql import BM25_CTES as _BM25_CTES  # noqa: E402

_BM25_ORACLE = f"""
WITH {_BM25_CTES}
SELECT doc_id, token, tf, df, bm25 FROM bm25
"""


def bm25_postings_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized (doc_id, token, tf, dl, df, n, avgdl) posting
    frame — the corpus-scale stage under the whole BM25 family (r13,
    guide §2.4): ``text_bm25``/``bm25_scores``, the Rocchio expansion,
    ``search_ndcg_eval`` and ``search_bm25_param_grid`` all start from
    these exact counts and each used to re-run the token explode + two
    hash aggs per invocation. Counts are corpus-deterministic, so
    sharing cannot change any consumer's output; named bench build row
    ``bm25_postings_build``."""
    from ..operators.fuzzy_graph import memoized_checkpoint

    def build() -> DataFrame:
        from ..session import spread

        # spread the single-row-group scan before the token explode
        # (r14, guide §2.5) — the explode + map-side partial aggs
        # otherwise run as one task at any core count.
        docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
        tok = docs.select("doc_id", F.explode(T.tokens()).alias("token"))
        tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
        # One tokenize pass instead of four (r14, guide §2.3/§2.4).
        # The spread's hashpartitioning(doc_id) already satisfies the
        # (doc_id, token) clustering, so tf has NO exchange of its own
        # — without a barrier each consumer leg (the join, dl, dfreq,
        # stats — the last three are separate broadcast-build jobs)
        # re-ran scan → explode → partial agg over the full corpus
        # (verified in the executed plan: four Generate explode
        # subtrees, no ReusedExchange). Checkpointing the (doc, token,
        # tf) frame — vocabulary-scale, far smaller than the token
        # stream — runs the explode once; dl = Σ tf per doc is the
        # exact same token count as re-counting the raw stream
        # (sf0.1 timing is neutral — each pass is parallel and cheap
        # at fixture scale — the win is the removed corpus passes).
        tf = tf.localCheckpoint(eager=True)
        dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
        dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        stats = dl.agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        )
        return (
            tf.join(dl, "doc_id")
            .join(F.broadcast(dfreq), "token")
            .crossJoin(F.broadcast(stats))
            .select("doc_id", "token", "tf", "dl", "df", "n", "avgdl")
        )

    return memoized_checkpoint(spark, sf_dir, "bm25_postings", build)


def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared (doc_id, token, tf, df, bm25) scoring table — the Spark
    twin of ``_BM25_CTES``, consumed by ``text_bm25``, the Rocchio
    expansion query (queries/pipelines.py) and ``search_ndcg_eval``.
    One projection over the memoized posting frame; the score
    expression is unchanged (identical-operand IEEE, ROUND(,4))."""
    p = bm25_postings_cached(spark, sf_dir)
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
    return (
        p.select("doc_id", "token", "tf", "df", F.round(score, 4).alias("bm25"))
    )


@graded("text_bm25", oracle=_BM25_ORACLE)
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75, Lucene idf) per (doc, term) — the
    ranking function a corpus-retrieval stage runs over the inverted
    index. Three hash aggs off one token explode; df and the scalar
    (N, avgdl) stats broadcast back onto the tf stream, and dl rides a
    doc-keyed join that co-partitions with tf's grouping — so the only
    full shuffle of the token stream is the tf aggregation itself, same
    as text_tfidf."""
    return bm25_scores(spark, sf_dir)


# --- EXT: inverted-index construction --------------------------------------------

_INVERTED_ORACLE = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
post AS (SELECT token, doc_id, COUNT(*) AS tf FROM tok GROUP BY token, doc_id)
SELECT token,
       CAST(COUNT(*) AS BIGINT) AS df,
       CAST(SUM(tf) AS BIGINT) AS cf,
       array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
FROM post
GROUP BY token
HAVING COUNT(*) >= 3
"""


@graded("text_inverted_index", oracle=_INVERTED_ORACLE)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term → sorted postings-list construction (df ≥ 3) — the search
    index build step. Two hash aggs: (token, doc) tf partials, then a
    token-keyed collect; ``sort_array`` pins the postings order that
    ``collect_list`` alone leaves nondeterministic. At 100 TB the
    postings list for a stop-term is the scale hazard — cap or
    tier hot terms (df cutoff here models the tiering gate)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(T.tokens()).alias("token"))
    post = tok.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    return (
        post.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("cf"),
            F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias(
                "postings"
            ),
        )
        .where(F.col("df") >= 3)
    )


# --- EXT: top-k keyword extraction per document ----------------------------------

# Keyword extraction = per-doc top-5 tf-idf terms. Reuses the tf-idf
# contract verbatim (same CTE text), then a doc-partitioned
# WindowGroupLimit — ties on the rounded score break on the token, so
# the top-k set is total-ordered (SURVEY §8.4).
_KEYWORDS_ORACLE = f"""
WITH base AS ({_TFIDF_ORACLE})
SELECT doc_id, token, tfidf, rk FROM (
  SELECT doc_id, token, tfidf,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf DESC, token) AS INTEGER) AS rk
  FROM base
) t WHERE rk <= 5
"""


@graded("text_keywords_topk", oracle=_KEYWORDS_ORACLE)
def text_keywords_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 tf-idf keywords per document — the per-doc salience tags
    a curation UI or topic index consumes. Composes the graded tf-idf
    dataflow with a doc-partitioned rank; Spark turns the rank filter
    into WindowGroupLimit, so each doc's candidate list is pruned
    before the final sort (no full tf-idf table materialization)."""
    scored = text_tfidf(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "token")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .select("doc_id", "token", "tfidf", "rk")
    )


# --- EXT: first-occurrence novelty scoring ---------------------------------------

# Novelty = fraction of a doc's distinct 3-gram shingles whose FIRST
# corpus occurrence (min doc_id — ingest order) is this doc. The
# content-freshness signal a curation pipeline uses to down-weight
# recombinations of already-seen text. Pure integer counts until one
# unrounded division.
_NOVELTY_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_transform(
           range(1, GREATEST(LEN(w) - 1, 1)),
           i -> concat_ws(' ', w[i], w[i+1], w[i+2])))) AS shingle
  FROM w
),
first_seen AS (
  SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
)
SELECT sh.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS novelty
FROM sh JOIN first_seen f USING (shingle)
GROUP BY sh.doc_id
"""


@graded("text_novelty_score", oracle=_NOVELTY_ORACLE)
def text_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc novelty: share of distinct shingles first seen (by
    ingest order) in this doc. One shingle explode feeds both the
    first-occurrence agg and the probe (localCheckpoint); the
    first-seen table joins back shingle-keyed, then one doc-keyed agg.
    The same two-shuffle profile as the duplicated-span op — at 100 TB
    the first-seen agg is the wide exchange and combines map-side."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.split("text", " ").alias("w"))
    sh = words.select(
        "doc_id",
        F.explode(F.array_distinct(T.ngrams_from_words("w", 3))).alias("shingle"),
    ).distinct()
    sh = sh.localCheckpoint(eager=True)  # consumed 2× below
    first_seen = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        sh.join(first_seen, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            novel.alias("n_novel"),
        )
        .withColumn(
            "novelty", F.col("n_novel").cast("double") / F.col("n_shingles")
        )
    )


# --- EXT: per-source dataset card ------------------------------------------------

# The "dataset card" rollup a corpus registry publishes per source:
# volume, token mass, language spread, exact-dup rate (md5 identity),
# and the mean quality score — one scan, one hash agg. Ratios are
# integer-operand divisions, unrounded; the quality mean reuses the
# graded text_quality formula via a DECIMAL(38,10)-exact sum of
# identical per-row doubles.
_DATASET_CARD_ORACLE = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts,
       1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*) AS dup_rate,
       CAST(SUM(CAST(
           0.6 * (CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE)
                  / LEN(string_split(text, ' ')))
         + 0.4 * LEAST(CAST(LEN(string_split(text, ' ')) AS DOUBLE) / 64.0, 1.0)
         AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*) AS mean_quality
FROM documents
GROUP BY source
"""


@graded("pipeline_dataset_card", oracle=_DATASET_CARD_ORACLE)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card: volume, token mass, language spread,
    exact-dup rate, mean quality. Single hash agg over one scan — the
    registry artifact every corpus release ships. The DECIMAL sum of
    the per-row quality doubles makes the mean independent of
    aggregation order (the per-row values are already bit-identical
    cross-engine)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens()
    n_tokens = F.size(toks)
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    quality = 0.6 * uniq_ratio + 0.4 * F.least(
        n_tokens.cast("double") / 64.0, F.lit(1.0)
    )
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens).alias("total_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct(F.md5("text")).alias("n_unique_texts"),
        (
            F.lit(1.0)
            - F.countDistinct(F.md5("text")).cast("double") / F.count(F.lit(1))
        ).alias("dup_rate"),
        (
            F.sum(quality.cast("decimal(38,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_quality"),
    )


# --- EXT: corpus drift detection (token-distribution shift) ----------------------

# Chi-square token-rate shift between two md5-stable halves of the
# corpus — the drift monitor run between corpus releases (tokenizer
# retrain / mix-change alarms). Counts are exact integers; expected
# values and chi² contributions are mirrored integer-operand
# expressions (unrounded), ranked with a token tie-break.
_DRIFT_ORACLE = """
WITH tok AS (
  SELECT CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                    AS INTEGER) % 2 = 0 THEN 'a' ELSE 'b' END AS split,
         unnest(string_split(text, ' ')) AS token
  FROM documents
),
counts AS (
  SELECT token,
         CAST(COUNT(*) FILTER (WHERE split = 'a') AS BIGINT) AS ca,
         CAST(COUNT(*) FILTER (WHERE split = 'b') AS BIGINT) AS cb
  FROM tok GROUP BY token
),
tot AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
  FROM counts
)
SELECT token, ca, cb,
       (CAST(ca AS DOUBLE) - CAST(ca + cb AS DOUBLE) * na / (na + nb))
       * (CAST(ca AS DOUBLE) - CAST(ca + cb AS DOUBLE) * na / (na + nb))
       / (CAST(ca + cb AS DOUBLE) * na / (na + nb))
       + (CAST(cb AS DOUBLE) - CAST(ca + cb AS DOUBLE) * nb / (na + nb))
       * (CAST(cb AS DOUBLE) - CAST(ca + cb AS DOUBLE) * nb / (na + nb))
       / (CAST(ca + cb AS DOUBLE) * nb / (na + nb)) AS chi2
FROM counts, tot
WHERE ca + cb >= 20
ORDER BY chi2 DESC, token
LIMIT 20
"""


@graded("text_corpus_drift", oracle=_DRIFT_ORACLE)
def text_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokens by chi-square rate shift between two hash-stable
    corpus halves. One token agg with conditional counts (map-side
    combinable), two scalar totals broadcast, TakeOrdered top-k — the
    release-to-release drift alarm at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    split = F.when(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % 2 == 0,
        "a",
    ).otherwise("b")
    tok = docs.select(
        split.alias("split"), F.explode(T.tokens()).alias("token")
    )
    counts = tok.groupBy("token").agg(
        F.count(F.when(F.col("split") == "a", 1)).alias("ca"),
        F.count(F.when(F.col("split") == "b", 1)).alias("cb"),
    )
    tot = counts.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    ea = (F.col("ca") + F.col("cb")).cast("double") * F.col("na") / (
        F.col("na") + F.col("nb")
    )
    eb = (F.col("ca") + F.col("cb")).cast("double") * F.col("nb") / (
        F.col("na") + F.col("nb")
    )
    chi2 = (F.col("ca").cast("double") - ea) * (
        F.col("ca").cast("double") - ea
    ) / ea + (F.col("cb").cast("double") - eb) * (
        F.col("cb").cast("double") - eb
    ) / eb
    return (
        counts.crossJoin(F.broadcast(tot))
        .where(F.col("ca") + F.col("cb") >= 20)
        .select("token", "ca", "cb", chi2.alias("chi2"))
        .orderBy(F.col("chi2").desc(), "token")
        .limit(20)
    )


# --- EXT: tokenizer vocabulary coverage (OOV rate) -------------------------------

# Coverage of a top-100 corpus vocabulary per source — the tokenizer
# health metric (rising OOV = drifting inputs or an undersized
# vocab). Vocab selection is total-ordered (count DESC, token); the
# rate is an integer-operand division, unrounded.
_OOV_ORACLE = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
),
vocab AS (
  SELECT token FROM (
    SELECT token, COUNT(*) AS c,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS rk
    FROM tok GROUP BY token) t
  WHERE rk <= 100
)
SELECT t.source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) FILTER (WHERE v.token IS NULL) AS BIGINT) AS n_oov,
       CAST(COUNT(*) FILTER (WHERE v.token IS NULL) AS DOUBLE) / COUNT(*)
         AS oov_rate
FROM tok t LEFT JOIN vocab v ON v.token = t.token
GROUP BY t.source
"""


@graded("text_oov_rate", oracle=_OOV_ORACLE)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per source against the corpus top-100
    vocabulary. The vocab is vocabulary-sized (broadcast at any corpus
    scale); scoring is a map-side membership probe over the token
    stream + one source-keyed agg — the same broadcast-probe shape as
    decontamination."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(T.tokens()).alias("token"))
    # orderBy+limit → TakeOrderedAndProject: per-partition top-100
    # heaps merged at the driver — no single-task sort even when the
    # distinct-token table is huge.
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "token")
        .limit(100)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(F.when(F.col("in_vocab").isNull(), 1)).alias("n_oov"),
            (
                F.count(F.when(F.col("in_vocab").isNull(), 1)).cast("double")
                / F.count(F.lit(1))
            ).alias("oov_rate"),
        )
    )


# --- EXT: vocabulary coverage curve ----------------------------------------------

# Token-mass coverage of a top-k vocabulary for k ∈ {10,50,100,500} —
# the sizing curve a tokenizer design reads ("how big must the vocab
# be to cover 95% of the stream"). Ranking and cumulative mass run on
# the vocabulary-sized count table (metadata scale); coverage is an
# integer-operand division, unrounded.
_VOCAB_CURVE_ORACLE = """
WITH counts AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
  GROUP BY token
),
ranked AS (
  SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, token) AS BIGINT) AS rk,
         CAST(SUM(c) OVER (ORDER BY c DESC, token
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM counts
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM counts),
ks AS (SELECT CAST(unnest([10, 50, 100, 500]) AS BIGINT) AS k)
SELECT CAST(ks.k AS INTEGER) AS k,
       MAX(r.cum) AS covered_tokens,
       CAST(MAX(r.cum) AS DOUBLE) / t.total AS coverage
FROM ks JOIN ranked r ON r.rk <= ks.k, tot t
GROUP BY ks.k, t.total
"""


@graded("text_vocab_coverage_curve", oracle=_VOCAB_CURVE_ORACLE)
def text_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-mass coverage at vocab sizes {10,50,100,500}. The
    token agg is one data-scale exchange; rank + cumulative mass run
    distributed on the ranks operator (one range exchange, no
    single-task WindowExec — a web-scale vocabulary is 10^7–10^8 rows
    and does not fit one task), then only the rk ≤ max(k) head joins
    the 4-point grid."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(T.tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ranked = R.global_rank_and_cumsum(
        counts,
        [F.col("c").desc(), F.col("token")],
        "c",
        rank_out="rk",
        cum_out="cum",
    ).select("c", "rk", F.col("cum").cast("long").alias("cum"))
    # Only ranks ≤ the largest requested vocab size can ever join.
    ranked = ranked.filter(F.col("rk") <= 500)
    tot = counts.agg(F.sum("c").alias("total"))
    ks = spark.range(0, 1).select(
        F.explode(F.array(*[F.lit(k) for k in (10, 50, 100, 500)])).alias("k")
    )
    return (
        ks.join(ranked, F.col("rk") <= F.col("k"))
        .groupBy("k")
        .agg(F.max("cum").alias("covered_tokens"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("k").cast("int").alias("k"),
            "covered_tokens",
            (F.col("covered_tokens").cast("double") / F.col("total")).alias(
                "coverage"
            ),
        )
    )


# --- within-document repetition stats (Gopher repetition signals) ---------------

# Gopher/MassiveText filters on within-doc repetition: the fraction of
# repeated n-grams and the heaviest single n-gram. Pure integers plus
# one exact small-int division.
_REPETITION_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
shx AS (
  SELECT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2]) AS shingle
  FROM w, LATERAL unnest(range(1, GREATEST(LEN(w) - 1, 1))) t(i)
),
per AS (
  SELECT doc_id, shingle, COUNT(*) AS c FROM shx GROUP BY doc_id, shingle
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_shingles,
       CAST(COUNT(*) AS BIGINT) AS n_uniq,
       CAST(SUM(c) - COUNT(*) AS DOUBLE) / SUM(c) AS rep_frac,
       CAST(MAX(c) AS BIGINT) AS max_rep
FROM per GROUP BY doc_id
"""


@graded("text_repetition_stats", oracle=_REPETITION_ORACLE)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document 3-gram repetition: repeated fraction and
    heaviest shingle per doc — the Gopher repetition-rule inputs that
    complement the corpus-level dedup family. One explode + two hash
    aggs, both partial-aggregated; the (doc, shingle) exchange is the
    only wide stage and shrinks with map-side combine on repeats."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.split("text", " ").alias("w"))
    shx = words.select(
        "doc_id", F.explode(T.ngrams_from_words("w", n=3)).alias("shingle")
    )
    per = shx.groupBy("doc_id", "shingle").agg(F.count("*").alias("c"))
    return per.groupBy("doc_id").agg(
        F.sum("c").alias("n_shingles"),
        F.count("*").alias("n_uniq"),
        (
            (F.sum("c") - F.count("*")).cast("double") / F.sum("c")
        ).alias("rep_frac"),
        F.max("c").alias("max_rep"),
    )


# --- language-ID evaluation: confusion matrix + per-class precision/recall --------

# Classifier ops need their eval harness next to them (the NB quality
# classifier has ECE calibration in curation; lang-ID gets the same
# treatment here): the binary en/other heuristic of text_langid scored
# against the fixture's gold `lang` label. Confusion cells are exact
# integer counts; precision/recall are single divisions of those ints —
# identical-operand IEEE, rounded last.
_LANGID_EVAL_ORACLE = f"""
WITH pred AS (
  SELECT lang AS gold,
         CASE WHEN lang = 'en' THEN 'en' ELSE 'other' END AS gold_bin,
         CASE WHEN LEN(list_intersect(list_distinct(string_split(text, ' ')),
                                      {_STOP_SQL})) >= 2
              THEN 'en' ELSE 'other' END AS pred_lang
  FROM documents
),
cells AS (
  SELECT gold, gold_bin, pred_lang, COUNT(*) AS n_docs
  FROM pred GROUP BY gold, gold_bin, pred_lang
),
tot AS (
  SELECT CAST(SUM(CASE WHEN gold_bin = 'en' AND pred_lang = 'en'
                       THEN n_docs ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN pred_lang = 'en' THEN n_docs ELSE 0 END)
              AS BIGINT) AS pred_en,
         CAST(SUM(CASE WHEN gold_bin = 'en' THEN n_docs ELSE 0 END)
              AS BIGINT) AS gold_en
  FROM cells
)
SELECT c.gold, c.pred_lang, c.n_docs,
       ROUND(CAST(t.tp AS DOUBLE) / t.pred_en, 4) AS en_precision,
       ROUND(CAST(t.tp AS DOUBLE) / t.gold_en, 4) AS en_recall
FROM cells c, tot t
"""


@graded("text_langid_eval", oracle=_LANGID_EVAL_ORACLE)
def text_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the stopword lang-ID heuristic against the
    gold `lang` label, with corpus-level en-precision/recall attached
    to every cell (1-row scalar broadcast — the metrics a gate on this
    classifier would threshold). Counts shuffle once on the tiny
    (gold, pred) key; the scalar attach is metadata-sized."""
    docs = load_table(spark, sf_dir, "documents")
    hits = T.stopword_hits()
    pred = docs.select(
        F.col("lang").alias("gold"),
        F.when(F.col("lang") == "en", "en").otherwise("other").alias("gold_bin"),
        F.when(hits >= 2, "en").otherwise("other").alias("pred_lang"),
    )
    cells = pred.groupBy("gold", "gold_bin", "pred_lang").agg(
        F.count("*").alias("n_docs")
    )
    tot = cells.agg(
        F.sum(
            F.when(
                (F.col("gold_bin") == "en") & (F.col("pred_lang") == "en"),
                F.col("n_docs"),
            ).otherwise(0)
        ).cast("bigint").alias("tp"),
        F.sum(
            F.when(F.col("pred_lang") == "en", F.col("n_docs")).otherwise(0)
        ).cast("bigint").alias("pred_en"),
        F.sum(
            F.when(F.col("gold_bin") == "en", F.col("n_docs")).otherwise(0)
        ).cast("bigint").alias("gold_en"),
    )
    return (
        cells.crossJoin(F.broadcast(tot))  # 1-row metrics attach
        .select(
            "gold",
            "pred_lang",
            "n_docs",
            F.round(F.col("tp").cast("double") / F.col("pred_en"), 4).alias(
                "en_precision"
            ),
            F.round(F.col("tp").cast("double") / F.col("gold_en"), 4).alias(
                "en_recall"
            ),
        )
    )


# --- feature hashing (the hashing trick) -------------------------------------------

# Fixed-width bag-of-words without a vocabulary: token → md5 bucket in
# [0, 1024), ± sign from an independent md5 bit so colliding tokens
# partially cancel instead of always adding (Weinberger et al.'s
# signed hashing). The point at 100 TB: the feature space is bounded
# BEFORE the shuffle — the agg state is ≤ D buckets per partition no
# matter how many distinct tokens exist, where a vocabulary-based
# featurizer would need a corpus-wide dictionary build first. The
# md5 family makes bucket assignment engine-identical, so collision
# statistics themselves are hash-graded.
_FH_D = 1024

_FH_ORACLE = f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
hashed AS (
  SELECT token,
         CAST(concat('0x', substring(md5('fh:' || token), 1, 8))
              AS BIGINT) % {_FH_D} AS bucket,
         CASE WHEN substring(md5('fhs:' || token), 1, 1) < '8'
              THEN 1 ELSE -1 END AS sign
  FROM tok
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT token) AS BIGINT) AS n_distinct_tokens,
       CAST(SUM(sign) AS BIGINT) AS net_weight
FROM hashed
GROUP BY bucket
ORDER BY n_tokens DESC, bucket
LIMIT 20
"""


@graded("text_feature_hashing", oracle=_FH_ORACLE)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed hashing-trick featurization over the corpus token
    stream: md5 bucket in [0, 1024) + ±1 sign, reporting the 20
    heaviest buckets with their collision load (distinct tokens per
    bucket) and net signed weight. One explode + one bounded-state
    groupBy; the top-k is TakeOrderedAndProject, never a global
    sort."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(T.tokens()).alias("token"))
    hashed = tok.select(
        "token",
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("fh:"), F.col("token"))), 1, 8),
                16,
                10,
            ).cast("long")
            % _FH_D
        ).alias("bucket"),
        F.when(
            F.substring(F.md5(F.concat(F.lit("fhs:"), F.col("token"))), 1, 1)
            < "8",
            1,
        )
        .otherwise(-1)
        .alias("sign"),
    )
    return (
        hashed.groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.countDistinct("token").cast("bigint").alias("n_distinct_tokens"),
            F.sum("sign").cast("bigint").alias("net_weight"),
        )
        .orderBy(F.col("n_tokens").desc(), "bucket")
        .limit(20)
    )


# --- EXT: nDCG@10 ranking-quality evaluation (r11) ---------------------------------

# The search family (BM25, RRF, Rocchio, MMR, hard negatives) produces
# RANKINGS; nothing graded their QUALITY. nDCG@10 is the standard
# offline metric: DCG = sum gain(rel)/log2(rank+1) over the ranking's
# top 10, normalized by the ideal ordering's DCG. Queries are the 5
# highest-df tokens (a deterministic query log); graded relevance is
# rel = LEAST(tf, 3) — term frequency capped at "highly relevant", the
# classic pseudo-label when no click data exists. Gains use the exact
# integer map {0,1,3,7} (2^rel - 1) and log2 runs as ln(r+1)/ln(2.0)
# on identical integer-cast operands; the <=10 per-query sums are
# DECIMAL(38,12)-quantized. BM25 ranks break rounded-score ties by
# doc_id. Plan: the shared BM25 scoring table, one WindowGroupLimit
# per ranking, two 50-row manifest sums.
_NDCG_K = 10
_NDCG_ORACLE = f"""
WITH {_BM25_CTES},
queries AS (
  SELECT token FROM dfreq ORDER BY df DESC, token LIMIT 5
),
rel AS (
  SELECT q.token, tf.doc_id, LEAST(tf.tf, 3) AS rel
  FROM tf JOIN queries q ON q.token = tf.token
),
gains AS (
  SELECT token, doc_id, rel,
         CASE rel WHEN 0 THEN 0.0 WHEN 1 THEN 1.0 WHEN 2 THEN 3.0
                  ELSE 7.0 END AS gain
  FROM rel
),
ranked AS (
  SELECT g.token, g.gain,
         ROW_NUMBER() OVER (PARTITION BY g.token
                            ORDER BY b.bm25 DESC, g.doc_id) AS r
  FROM gains g
  JOIN bm25 b ON b.token = g.token AND b.doc_id = g.doc_id
),
ideal AS (
  SELECT token, gain,
         ROW_NUMBER() OVER (PARTITION BY token
                            ORDER BY rel DESC, doc_id) AS r
  FROM gains
),
dcg AS (
  SELECT token,
         CAST(SUM(CAST(gain / (ln(CAST(r + 1 AS DOUBLE)) / ln(2.0))
                       AS DECIMAL(38,12))) AS DOUBLE) AS dcg
  FROM ranked WHERE r <= {_NDCG_K} GROUP BY token
),
idcg AS (
  SELECT token,
         CAST(SUM(CAST(gain / (ln(CAST(r + 1 AS DOUBLE)) / ln(2.0))
                       AS DECIMAL(38,12))) AS DOUBLE) AS idcg
  FROM ideal WHERE r <= {_NDCG_K} GROUP BY token
)
SELECT q.token AS query, d.dcg IS NOT NULL AS has_hits,
       ROUND(d.dcg, 4) AS dcg,
       ROUND(i.idcg, 4) AS idcg,
       CASE WHEN i.idcg > 0 THEN ROUND(d.dcg / i.idcg, 4) END AS ndcg
FROM queries q
LEFT JOIN dcg d ON d.token = q.token
LEFT JOIN idcg i ON i.token = q.token
ORDER BY q.token
"""


@graded("search_ndcg_eval", oracle=_NDCG_ORACLE)
def search_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of BM25 rankings for the 5 highest-df query tokens
    against capped-tf graded relevance (rationale above the oracle)."""
    # r13: everything here derives from the memoized posting frame —
    # the old form re-ran its own token explode + tf/df aggs on top of
    # rebuilding bm25_scores (same counts, verbatim).
    scores = bm25_scores(spark, sf_dir)
    post = bm25_postings_cached(spark, sf_dir)
    tf = post.select("doc_id", "token", "tf")
    dfreq = post.select("token", "df").distinct()
    queries = dfreq.orderBy(F.col("df").desc(), "token").limit(5).select("token")
    gains = (
        tf.join(F.broadcast(queries), "token")
        .select(
            "token",
            "doc_id",
            F.least(F.col("tf"), F.lit(3)).alias("rel"),
        )
        .withColumn(
            "gain",
            F.when(F.col("rel") == 0, 0.0)
            .when(F.col("rel") == 1, 1.0)
            .when(F.col("rel") == 2, 3.0)
            .otherwise(7.0),
        )
    )
    ranked = gains.join(
        scores.select("token", "doc_id", "bm25"), ["token", "doc_id"]
    ).withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("token").orderBy(F.col("bm25").desc(), "doc_id")
        ),
    )
    ideal = gains.withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("token").orderBy(F.col("rel").desc(), "doc_id")
        ),
    )

    def dcg_of(df: DataFrame, out: str) -> DataFrame:
        term = F.col("gain") / (
            F.log((F.col("r") + 1).cast("double")) / F.log(F.lit(2.0))
        )
        return (
            df.where(F.col("r") <= _NDCG_K)
            .groupBy("token")
            .agg(
                F.sum(term.cast("decimal(38,12)")).cast("double").alias(out)
            )
        )

    d = dcg_of(ranked, "dcg")
    i = dcg_of(ideal, "idcg")
    # LEFT joins keep queries with zero scored docs visible (NULL
    # metrics, has_hits = false) instead of silently dropping them —
    # that's the failure mode an eval instrument exists to flag.
    return (
        queries.join(d, "token", "left")
        .join(i, "token", "left")
        .select(
            F.col("token").alias("query"),
            F.col("dcg").isNotNull().alias("has_hits"),
            F.round("dcg", 4).alias("dcg"),
            F.round("idcg", 4).alias("idcg"),
            F.when(
                F.col("idcg") > 0, F.round(F.col("dcg") / F.col("idcg"), 4)
            ).alias("ndcg"),
        )
        .orderBy("query")
    )


# --- EXT: corpus saturation / novelty curve (r11) ----------------------------------

# The "is more data still worth ingesting?" diagnostic: as a corpus
# grows, what share of each new document's distinct 3-grams has never
# been seen before? A healthy diverse corpus holds a high novelty
# share; a saturating or template-heavy one decays toward zero — the
# curve by ingestion decile is the go/no-go signal for further
# collection and a cheap redundancy audit next to the dedup family.
# First-seen attribution is MIN(doc_id) per gram (doc_id = ingestion
# order); all counts are exact integers. Plan: one shingle explode,
# one gram-keyed MIN collapse (map-side combinable), one doc-keyed
# re-group, a 10-row decile rollup — two wide exchanges at any corpus.
# The oracle text lives in shared_sql (r12): the streaming replay twin
# stream_novelty_replay grades against the SAME derivation.
from .shared_sql import NOVELTY_CURVE_ORACLE as _NOVELTY_ORACLE


def novelty_gram_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized exploded (doc_id, gram) distinct-3-gram frame
    over documents — the corpus census the novelty curve groups twice
    and the r13 Heaps-law fit re-reads. Named bench build row
    ``novelty_gram_build`` (r12 verdict What's-wrong #3): the query
    used to rebuild + eagerly checkpoint this frame on EVERY
    invocation (~4 s of a ~4.3 s warm rep at sf0.1 measured locally),
    so its suite median swung with whatever storage-memory pressure
    the session had accumulated — the 0.32 → 1.22 s driver-bench
    drift. With the census memoized, consumer rows measure their own
    two group-bys and the one-off explode cost is its own attributable
    number, the same treatment the MinHash eval family got in r12.

    The leading repartition("doc_id") rebalances before the explode:
    the corpus parquet is one row group, and inheriting that single
    partition would serialize the shingle stage onto one core (the
    dedup_minhash_banded rationale)."""
    from ..operators.fuzzy_graph import memoized_checkpoint

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").repartition("doc_id")
        # two-projection shingle form (r13, guide §1.2 per-task work):
        # split once per doc, then n-gram over the word array — the
        # inline T.ngrams form re-evaluates split(text) per word
        # inside the interpreted lambda (the ngrams_from_words
        # docstring rationale). Same grams, same explode.
        return docs.select("doc_id", T.tokens("text").alias("w")).select(
            "doc_id",
            F.explode(
                F.array_distinct(T.ngrams_from_words("w", 3))
            ).alias("gram"),
        )

    return memoized_checkpoint(spark, sf_dir, "novelty_gram", build)


@graded("text_novelty_curve", oracle=_NOVELTY_ORACLE)
def text_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of never-seen-before distinct 3-grams per ingestion
    decile — the corpus saturation curve (rationale above the
    oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    g = novelty_gram_cached(spark, sf_dir)
    # No gram-keyed join back: a doc's novel-gram count is exactly the
    # number of grams whose MIN(doc_id) equals it, so the firstseen
    # census re-groups by its OWN value column (doc-sized frames from
    # there on). One gram-keyed exchange total — the join-based form
    # paid that exchange twice plus a join (8.2 -> ~5 s at sf0.1).
    firstseen = g.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    nov = firstseen.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_novel")
    )
    mx = docs.agg(F.max("doc_id").alias("mxid"))
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
    return (
        per.crossJoin(F.broadcast(mx))  # 1-row horizon attach
        .groupBy(
            F.expr("CAST(doc_id * 10 DIV (mxid + 1) AS BIGINT)").alias("decile")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_grams").cast("bigint").alias("n_grams"),
            F.sum("n_novel").cast("bigint").alias("n_novel"),
            F.round(
                F.sum("n_novel").cast("double") / F.sum("n_grams").cast("double"),
                4,
            ).alias("novelty_share"),
        )
        .orderBy("decile")
    )


# --- EXT: source-level n-gram overlap matrix (r11) ----------------------------------

# Corpus forensics ABOVE the document level: which SOURCES share
# verbatim 5-gram content (mirrored scrapes, syndication, cross-source
# template reuse)? Doc-level dedup can't see this aggregate pattern;
# the decontamination probe answers it only against one benchmark
# list. Per source the distinct 5-gram set is a bag-of-shingles
# profile; pair overlap comes from ONE gram-keyed self-join of the
# (source, gram) census — fan-out per gram is bounded by the source
# count (a catalog, never the corpus), the same bounded-equi-join
# discipline as the dedup family. Jaccard from three exact integers.
_OVERLAP_N = 5

_OVERLAP_ORACLE = f"""
WITH w AS (
  SELECT source, string_split(text, ' ') AS w FROM documents
),
g AS (
  SELECT DISTINCT source, unnest(list_transform(
           range(1, GREATEST(LEN(w) - {_OVERLAP_N - 2}, 1)),
           i -> concat_ws(' ', {", ".join(f"w[i+{k}]" for k in range(_OVERLAP_N))})))
           AS gram
  FROM w
),
sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams FROM g GROUP BY source),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT i.src_a, i.src_b, sa.n_grams AS grams_a, sb.n_grams AS grams_b,
       i.n_inter,
       ROUND(CAST(i.n_inter AS DOUBLE)
             / (sa.n_grams + sb.n_grams - i.n_inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.source = i.src_a
JOIN sizes sb ON sb.source = i.src_b
ORDER BY jaccard DESC, i.src_a, i.src_b
LIMIT 20
"""


@graded("text_source_overlap_matrix", oracle=_OVERLAP_ORACLE)
def text_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 source pairs by distinct-5-gram Jaccard overlap
    (rationale above the oracle)."""
    from ..operators import ranks as RK

    docs = load_table(spark, sf_dir, "documents")
    # Source-bitmask plan (r11 perf, generalized r12): instead of a
    # gram-keyed SELF-JOIN of the (source, gram) census (two wide
    # exchanges + a join), fold each gram's source set into a FIXED
    # number of BIGINT mask words via bit_or (bit_or over duplicate
    # rows is idempotent, so no pre-distinct either), census the mask
    # tuples, and decompose set-bit pairs from the census rows —
    # everything after the single gram-keyed groupBy is mask-census
    # sized. Word w holds sids [w*63, w*63+63) in bits 0..62 (63 bits
    # per word keeps every shift in non-negative BIGINT range), so a
    # 200-source catalog costs 4 mask words per gram — the r11
    # 63-source ValueError is gone; the gram-keyed join form remains
    # the oracle's independent derivation.
    cat = docs.select("source").distinct()
    n_src = cat.count()  # catalog-sized action (bounded by design)
    n_words = (n_src + 62) // 63
    srcs = RK.attach_unit_group(cat).select(
        "source",
        (
            F.row_number().over(
                Window.partitionBy(RK.UNIT_GROUP).orderBy("source")
            )
            - 1
        ).alias("sid"),
    )
    # two-projection shingle form (r13, guide §1.2): split once per
    # doc; the inline T.ngrams form re-evaluated split(text) per word
    # inside the interpreted lambda. Same grams, same explode.
    g = docs.select("source", T.tokens("text").alias("w")).select(
        "source", F.explode(T.ngrams_from_words("w", _OVERLAP_N)).alias("gram")
    )
    masks = (
        g.join(F.broadcast(srcs), "source")
        .groupBy("gram")
        .agg(
            *[
                F.expr(
                    f"bit_or(CASE WHEN sid DIV 63 = {w}"
                    " THEN CAST(1 AS BIGINT) << (sid % 63)"
                    " ELSE CAST(0 AS BIGINT) END)"
                ).alias(f"m{w}")
                for w in range(n_words)
            ]
        )
    )
    census = masks.groupBy(*[f"m{w}" for w in range(n_words)]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    ids = F.expr(
        "concat("
        + ", ".join(
            f"transform(filter(sequence(0, 62),"
            f" b -> ((m{w} >> b) & 1) = 1), b -> b + {w * 63})"
            for w in range(n_words)
        )
        + ")"
    )
    with_ids = census.withColumn("ids", ids).localCheckpoint()
    pair_arr = F.expr(
        "flatten(transform(ids, x -> transform(filter(ids, y -> y > x),"
        " y -> named_struct('a', x, 'b', y))))"
    )
    inter_ids = (
        with_ids.select("n", F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.a").alias("sid_a"), F.col("p.b").alias("sid_b"))
        .agg(F.sum("n").cast("bigint").alias("n_inter"))
    )
    sizes_ids = (
        with_ids.select("n", F.explode("ids").alias("sid"))
        .groupBy("sid")
        .agg(F.sum("n").cast("bigint").alias("n_grams"))
    )
    sa = srcs.join(sizes_ids, srcs.sid == sizes_ids.sid).select(
        F.col("source").alias("src_a"),
        srcs.sid.alias("sid_a"),
        F.col("n_grams").alias("grams_a"),
    )
    sb = srcs.join(sizes_ids, srcs.sid == sizes_ids.sid).select(
        F.col("source").alias("src_b"),
        srcs.sid.alias("sid_b"),
        F.col("n_grams").alias("grams_b"),
    )
    inter = (
        inter_ids.join(F.broadcast(sa), "sid_a")
        .join(F.broadcast(sb), "sid_b")
        .select("src_a", "src_b", "grams_a", "grams_b", "n_inter")
    )
    return (
        inter
        .select(
            "src_a",
            "src_b",
            "grams_a",
            "grams_b",
            "n_inter",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("grams_a") + F.col("grams_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "src_a", "src_b")
        .limit(20)
    )


# --- EXT: BM25 (k1, b) parameter-grid ranking eval (r12) -----------------------------

# search_ndcg_eval grades the PRODUCTION scoring point (k1=1.2,
# b=0.75); the tuning question is the GRID — does more aggressive tf
# saturation or weaker length normalization rank better on this
# corpus? Four classic operating points (Robertson default 1.2/0.75,
# the 0.9/0.4 alternative many engines ship, high-saturation 2.0/0.75,
# and no-length-norm 1.2/0.0) are scored against the SAME capped-tf
# graded relevance and query log as the single-point eval, each
# reported as mean nDCG@10 over the 5 queries. The ideal ranking is
# parameter-FREE (it orders by relevance), so idcg computes once; the
# grid costs one 4-row broadcast ladder over the 5-token posting
# frame + one window per ladder — never a corpus re-scan per point.
_BM25_GRID_POINTS = [(1.2, 0.75), (0.9, 0.4), (2.0, 0.75), (1.2, 0.0)]
# Same cutoff as the single-point eval (ADVICE r12: the grid shipped
# with K=20 while claiming nDCG@10 comparability — the metrics now
# genuinely share the cutoff instead of just the name).
_BM25_GRID_K = _NDCG_K

_BM25_GRID_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
stats AS (
  SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl
),
queries AS (
  SELECT token FROM dfreq ORDER BY df DESC, token LIMIT 5
),
grid AS (
  SELECT CAST(k1 AS DOUBLE) AS k1, CAST(b AS DOUBLE) AS b
  FROM (VALUES {", ".join(f"({k1}, {b})" for k1, b in _BM25_GRID_POINTS)})
       g(k1, b)
),
post AS (
  SELECT g.k1, g.b, tf.token, tf.doc_id,
         LEAST(tf.tf, 10) AS rel,
         ROUND(
           LN(1.0 + (CAST(stats.n - dfreq.df AS DOUBLE) + 0.5)
                    / (CAST(dfreq.df AS DOUBLE) + 0.5))
           * (CAST(tf.tf AS DOUBLE) * (g.k1 + 1.0))
           / (CAST(tf.tf AS DOUBLE)
              + g.k1 * (1.0 - g.b + g.b * (CAST(dl.dl AS DOUBLE)
                                           / stats.avgdl))),
           4) AS score
  FROM tf
  JOIN queries q ON q.token = tf.token
  JOIN dl ON dl.doc_id = tf.doc_id
  JOIN dfreq ON dfreq.token = tf.token, stats, grid g
),
gains AS (
  SELECT k1, b, token, doc_id, rel, score,
         CAST((1 << rel) - 1 AS DOUBLE) AS gain
  FROM post
),
ranked AS (
  SELECT k1, b, token, gain,
         ROW_NUMBER() OVER (PARTITION BY k1, b, token
                            ORDER BY score DESC, doc_id) AS r
  FROM gains
),
dcg AS (
  SELECT k1, b, token,
         CAST(SUM(CAST(gain / (ln(CAST(r + 1 AS DOUBLE)) / ln(2.0))
                       AS DECIMAL(38,12))) AS DOUBLE) AS dcg
  FROM ranked WHERE r <= {_BM25_GRID_K} GROUP BY k1, b, token
),
ideal AS (
  SELECT token, gain,
         ROW_NUMBER() OVER (PARTITION BY token
                            ORDER BY rel DESC, doc_id) AS r
  FROM (SELECT DISTINCT token, doc_id, rel,
               CAST((1 << rel) - 1 AS DOUBLE) AS gain
        FROM post WHERE k1 = 1.2 AND b = 0.75) t
),
idcg AS (
  SELECT token,
         CAST(SUM(CAST(gain / (ln(CAST(r + 1 AS DOUBLE)) / ln(2.0))
                       AS DECIMAL(38,12))) AS DOUBLE) AS idcg
  FROM ideal WHERE r <= {_BM25_GRID_K} GROUP BY token
),
nd AS (
  SELECT d.k1, d.b, ROUND(d.dcg / i.idcg, 4) AS ndcg
  FROM dcg d JOIN idcg i USING (token)
)
SELECT k1, b, CAST(COUNT(*) AS BIGINT) AS n_queries,
       ROUND(CAST(SUM(CAST(ndcg AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 4)
         AS mean_ndcg
FROM nd GROUP BY k1, b
ORDER BY k1, b
"""


@graded("search_bm25_param_grid", oracle=_BM25_GRID_ORACLE)
def search_bm25_param_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean nDCG@10 per BM25 (k1, b) operating point — four classic
    parameter choices ranked against the same capped-tf relevance as
    search_ndcg_eval (rationale above the oracle)."""
    # r13: the tf/dl/df/n/avgdl counts come from the memoized posting
    # frame (identical values) instead of a per-invocation explode +
    # three hash aggs.
    p0 = bm25_postings_cached(spark, sf_dir)
    dfreq = p0.select("token", "df").distinct()
    queries = dfreq.orderBy(F.col("df").desc(), "token").limit(5).select("token")
    grid = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(k1).alias("k1"), F.lit(b).alias("b"))
                    for k1, b in _BM25_GRID_POINTS
                ]
            )
        ).alias("g")
    ).select("g.k1", "g.b")
    idf = F.log(
        1.0
        + ((F.col("n") - F.col("df")).cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
    )
    score = F.round(
        idf
        * (F.col("tf").cast("double") * (F.col("k1") + 1.0))
        / (
            F.col("tf").cast("double")
            + F.col("k1")
            * (
                1.0
                - F.col("b")
                + F.col("b") * (F.col("dl").cast("double") / F.col("avgdl"))
            )
        ),
        4,
    )
    post = (
        p0.join(F.broadcast(queries), "token")
        .crossJoin(F.broadcast(grid))  # 4-row (k1, b) ladder
        .select(
            "k1",
            "b",
            "token",
            "doc_id",
            F.least(F.col("tf"), F.lit(10)).alias("rel"),
            score.alias("score"),
        )
    )
    gain = F.expr(
        "CAST(shiftleft(CAST(1 AS BIGINT), CAST(rel AS INT)) - 1 AS DOUBLE)"
    )
    gains = post.withColumn("gain", gain).localCheckpoint()  # 2 consumers
    ranked = gains.withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("k1", "b", "token").orderBy(
                F.col("score").desc(), "doc_id"
            )
        ),
    )
    dterm = F.col("gain") / (
        F.log((F.col("r") + 1).cast("double")) / F.log(F.lit(2.0))
    )
    dcg = (
        ranked.where(F.col("r") <= _BM25_GRID_K)
        .groupBy("k1", "b", "token")
        .agg(F.sum(dterm.cast("decimal(38,12)")).cast("double").alias("dcg"))
    )
    ideal = (
        gains.where((F.col("k1") == 1.2) & (F.col("b") == 0.75))
        .select("token", "doc_id", "rel", "gain")
        .distinct()
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("token").orderBy(
                    F.col("rel").desc(), "doc_id"
                )
            ),
        )
    )
    idcg = (
        ideal.where(F.col("r") <= _BM25_GRID_K)
        .groupBy("token")
        .agg(F.sum(dterm.cast("decimal(38,12)")).cast("double").alias("idcg"))
    )
    nd = dcg.join(idcg, "token").select(
        "k1", "b", F.round(F.col("dcg") / F.col("idcg"), 4).alias("ndcg")
    )
    return (
        nd.groupBy("k1", "b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_queries"),
            F.round(
                F.sum(F.col("ndcg").cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("mean_ndcg"),
        )
        .orderBy("k1", "b")
    )


# --- EXT: quality-gate threshold sweep (lexical-diversity floor, r12) ----------------

# text_gopher_rules applies the rule ensemble at ONE operating point;
# the tuning question for the most-contested rule — the
# lexical-diversity floor (uniq_ratio >= u) — is the CURVE: how much
# corpus does each tightening cost, holding the other four rules
# fixed? Each document's (uniq_ratio, other-rules verdict, token
# count) is computed ONCE in the same single-scan projection as the
# base gate; the sweep is a 4-row broadcast floor ladder + one
# grouped count — no per-threshold re-scan. Kept masses are exact
# integers; shares are single divisions.
_GOPHER_SWEEP_FLOORS = ["0.3", "0.4", "0.5", "0.6"]

_GOPHER_SWEEP_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / LEN(string_split(text, ' ')) AS uniq_ratio,
         (LEN(string_split(text, ' ')) BETWEEN 16 AND 80)
           AND (CAST(n_chars AS DOUBLE) / LEN(string_split(text, ' '))
                BETWEEN 5.0 AND 6.0)
           AND (CAST(LENGTH(regexp_replace(text, '[a-z0-9 ]', '', 'g'))
                     AS DOUBLE) / n_chars < 0.1)
           AND (LEN(list_intersect(list_distinct(string_split(text, ' ')),
                {{stop}})) >= 2) AS others_pass
  FROM documents
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_total
  FROM base
),
floors AS (
  SELECT CAST(unnest([{", ".join(_GOPHER_SWEEP_FLOORS)}]) AS DOUBLE)
    AS uniq_floor
)
SELECT f.uniq_floor,
       CAST(SUM(CASE WHEN b.others_pass AND b.uniq_ratio >= f.uniq_floor
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       ROUND(CAST(SUM(CASE WHEN b.others_pass
                            AND b.uniq_ratio >= f.uniq_floor
                           THEN 1 ELSE 0 END) AS DOUBLE) / t.n_docs, 4)
         AS kept_doc_share,
       CAST(SUM(CASE WHEN b.others_pass AND b.uniq_ratio >= f.uniq_floor
                     THEN b.n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens,
       ROUND(CAST(SUM(CASE WHEN b.others_pass
                            AND b.uniq_ratio >= f.uniq_floor
                           THEN b.n_tokens ELSE 0 END) AS DOUBLE)
             / t.n_tokens_total, 4) AS kept_token_share
FROM floors f, base b, tot t
GROUP BY f.uniq_floor, t.n_docs, t.n_tokens_total
ORDER BY f.uniq_floor
""".format(stop="{stop}").replace("{stop}", _STOP_SQL)


@graded("text_gopher_threshold_sweep", oracle=_GOPHER_SWEEP_ORACLE)
def text_gopher_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept doc/token mass per lexical-diversity floor u in
    {0.3..0.6}, other Gopher rules held fixed — one scan + a 4-row
    broadcast ladder (rationale above the oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    w = T.tokens()
    n_tok = F.size(w).cast("bigint")
    avg_len = F.col("n_chars").cast("double") / F.size(w)
    uniq = F.size(F.array_distinct(w)).cast("double") / F.size(w)
    sym = (
        F.length(F.regexp_replace("text", "[a-z0-9 ]", "")).cast("double")
        / F.col("n_chars")
    )
    others = (
        (F.size(w) >= 16)
        & (F.size(w) <= 80)
        & (avg_len >= 5.0)
        & (avg_len <= 6.0)
        & (sym < 0.1)
        & (T.stopword_hits() >= 2)
    )
    base = docs.select(
        n_tok.alias("n_tokens"),
        uniq.alias("uniq_ratio"),
        others.alias("others_pass"),
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens_total"),
    )
    floors = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(float(u)) for u in _GOPHER_SWEEP_FLOORS])
        ).alias("uniq_floor")
    )
    kept = F.when(
        F.col("others_pass") & (F.col("uniq_ratio") >= F.col("uniq_floor")), 1
    ).otherwise(0)
    kept_tok = F.when(
        F.col("others_pass") & (F.col("uniq_ratio") >= F.col("uniq_floor")),
        F.col("n_tokens"),
    ).otherwise(0)
    return (
        base.crossJoin(F.broadcast(floors))  # 4-row floor ladder
        .groupBy("uniq_floor")
        .agg(
            F.sum(kept).cast("bigint").alias("n_kept"),
            F.sum(kept_tok).cast("bigint").alias("kept_tokens"),
        )
        .crossJoin(F.broadcast(tot))  # 1-row totals attach
        .select(
            "uniq_floor",
            "n_kept",
            F.round(
                F.col("n_kept").cast("double") / F.col("n_docs"), 4
            ).alias("kept_doc_share"),
            "kept_tokens",
            F.round(
                F.col("kept_tokens").cast("double") / F.col("n_tokens_total"),
                4,
            ).alias("kept_token_share"),
        )
        .orderBy("uniq_floor")
    )


# --- EXT: Heaps'-law vocabulary-growth fit (r13) ------------------------------------

# The companion diagnostic to the novelty curve: Heaps' law says the
# distinct-gram vocabulary grows as V(N) = K * N^beta (beta ~ 0.4-0.6
# for natural text; beta near 1 means every document brings new
# vocabulary — dedup won't help; beta near 0 means the corpus is
# saturated — more ingestion buys nothing). The fit runs over the ten
# ingestion-decile prefix points the novelty curve already defines:
# N_d = cumulative gram occurrences through decile d, V_d = cumulative
# first-seen grams (both from the SAME per-decile census as
# text_novelty_curve, via the shared memoized gram frame), then a
# closed-form log-log OLS. Determinism: the 10 ln/cross-product terms
# are quantized to DECIMAL(38,9) BEFORE summing (the Zipf-slope
# recipe — ln may differ by 1 ulp across engines and the quantization
# absorbs it); ln/exp are in the safe shared-libm set (SURVEY §8 r12
# erratum 1); the closed forms run as SHARED SQL text in both engines.
# Scale: everything after the gram census is decile-manifest-sized
# (10 rows); the census is the novelty curve's one corpus-wide pass.
_HEAPS_PTS = """
SELECT CAST(ln(cum_tokens) AS DOUBLE) AS x,
       CAST(ln(cum_vocab) AS DOUBLE) AS y,
       cum_tokens, cum_vocab
FROM heaps_cum
WHERE cum_tokens > 0 AND cum_vocab > 0
"""

_HEAPS_SUMS = """
SELECT COUNT(*) AS n,
       CAST(SUM(CAST(x AS DECIMAL(38,9))) AS DOUBLE) AS sx,
       CAST(SUM(CAST(y AS DECIMAL(38,9))) AS DOUBLE) AS sy,
       CAST(SUM(CAST(x * y AS DECIMAL(38,9))) AS DOUBLE) AS sxy,
       CAST(SUM(CAST(x * x AS DECIMAL(38,9))) AS DOUBLE) AS sxx,
       CAST(SUM(CAST(y * y AS DECIMAL(38,9))) AS DOUBLE) AS syy,
       CAST(MAX(cum_tokens) AS BIGINT) AS n_grams_total,
       CAST(MAX(cum_vocab) AS BIGINT) AS vocab_total
FROM heaps_pts
"""

_HEAPS_FINAL = """
SELECT n AS n_points,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta,
       ROUND(exp((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n),
             6) AS k_coeff,
       ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2,
       n_grams_total, vocab_total
FROM heaps_sums
"""

_HEAPS_ORACLE = f"""
WITH curve AS ({_NOVELTY_ORACLE}),
heaps_cum AS (
  SELECT decile,
         CAST(SUM(n_grams) OVER (ORDER BY decile) AS BIGINT) AS cum_tokens,
         CAST(SUM(n_novel) OVER (ORDER BY decile) AS BIGINT) AS cum_vocab
  FROM curve
),
heaps_pts AS ({_HEAPS_PTS}),
heaps_sums AS ({_HEAPS_SUMS})
{_HEAPS_FINAL}
"""


@graded("text_heaps_law", oracle=_HEAPS_ORACLE)
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V = K * N^beta over the ten ingestion-decile
    prefix points of the shared gram census — beta, K, R², and the
    full-corpus totals in one row (rationale above the oracle)."""
    curve = text_novelty_curve(spark, sf_dir)
    cum = R.attach_unit_group(curve)
    w = Window.partitionBy(R.UNIT_GROUP).orderBy("decile")  # 10-row frame
    heaps_cum = cum.select(
        "decile",
        F.sum("n_grams").over(w).cast("bigint").alias("cum_tokens"),
        F.sum("n_novel").over(w).cast("bigint").alias("cum_vocab"),
    )
    heaps_cum.createOrReplaceTempView("heaps_cum")
    spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW heaps_pts AS {_HEAPS_PTS}")
    spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW heaps_sums AS {_HEAPS_SUMS}")
    return spark.sql(_HEAPS_FINAL)
