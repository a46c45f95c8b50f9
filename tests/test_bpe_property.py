"""Property-based equivalence of the BPE merge fold (the
double-separator replace chain behind pipeline_bpe_encode /
text_bpe_fertility) with a pure-Python reference encoder, over
randomized words and merge lists on a tiny alphabet — maximizing
boundary collisions (runs, prefix/suffix overlaps, chained merges)
that fixed unit cases can't sweep."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from tests.test_curation import _ref_bpe

ALPHA = "abc"

WORDS = st.lists(
    st.text(alphabet=ALPHA, min_size=0, max_size=12),
    min_size=1,
    max_size=25,
)

# ordered merge lists of distinct 2-char pairs over the same alphabet
MERGES = st.lists(
    st.tuples(st.sampled_from(ALPHA), st.sampled_from(ALPHA)).map(
        lambda t: t[0] + t[1]
    ),
    min_size=1,
    max_size=5,
    unique=True,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

from canvas_data_2_aws_spark.queries.curation import _BPE_FOLD_SQL

_FOLD = _BPE_FOLD_SQL.format(w="w", merges="merges")


@settings(**_SETTINGS)
@given(words=WORDS, merges=MERGES)
def test_bpe_fold_equals_reference_on_random_words(spark, words, merges):
    df = spark.createDataFrame(
        [(w,) for w in words], "w string"
    ).withColumn("merges", F.array(*[F.lit(m) for m in merges]))
    got = {r.w: list(r.toks) for r in df.select("w", F.expr(_FOLD).alias("toks")).collect()}
    for w in set(words):
        assert got[w] == _ref_bpe(w, merges), (w, merges, got[w], _ref_bpe(w, merges))


@settings(**_SETTINGS)
@given(words=WORDS, merges=MERGES)
def test_bpe_fold_reconstruction_invariant(spark, words, merges):
    """Concatenating the tokens must reconstruct the word exactly, and
    no token may span a merge the rank order forbids (checked by the
    reference equality above; here the lossless property is asserted
    independently so a bug in BOTH implementations that drops
    characters cannot hide)."""
    df = spark.createDataFrame(
        [(w,) for w in words], "w string"
    ).withColumn("merges", F.array(*[F.lit(m) for m in merges]))
    for r in df.select("w", F.expr(_FOLD).alias("toks")).collect():
        assert "".join(r.toks) == r.w
