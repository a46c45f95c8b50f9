"""Skew mitigation operators (SURVEY §4 / SCALE.md §2).

First line of defense is free: AQE skew-join splitting
(``spark.sql.adaptive.skewJoin``) and map-side partial aggregation.
This module covers the pathological case AQE cannot fix — a single
join key so hot that one task still exceeds executor memory after
splitting (the classic "null-ish default id" / campus-wide-course key).

``salted_join`` spreads one logical key across ``n_salts`` physical
shuffle partitions: the big (skewed) side gets a deterministic salt
derived from its own rows, the small side is replicated ``n_salts``×.
Cost: |small| × n_salts extra rows — only ever salt the *join*, never
an aggregation (partial aggregation already handles agg skew).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
    big_salt_from: list[str] | None = None,
) -> DataFrame:
    """Equi-join with the hot-key pressure spread over ``n_salts``.

    ``big_salt_from``: columns whose hash assigns the salt (defaults to
    all of ``big``'s non-key columns so rows of one hot key scatter
    uniformly). Deterministic — no ``rand()``, so retried tasks salt
    identically and the operator stays replay-safe.
    """
    salt_cols = big_salt_from or [c for c in big.columns if c not in on]
    if not salt_cols:
        salt_cols = on  # degenerate: key-only frame, salting is a no-op
    big_s = big.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts))
    )
    small_s = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = big_s.join(small_s, on=[*on, SALT_COL], how=how)
    return joined.drop(SALT_COL)


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    finals: list[Column],
    n_salts: int = 16,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Explicit salted two-phase aggregation for decomposable aggs.

    Rarely needed — Catalyst's partial aggregation is the same plan —
    but useful when a non-decomposable pipeline (e.g. collect-heavy)
    sits between scan and agg and partials can't form. ``aggs`` run per
    (keys, salt); ``finals`` combine the partials per keys.
    """
    salt_cols = salt_from or df.columns
    salted = df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts))
    )
    partial = salted.groupBy(*keys, SALT_COL).agg(*aggs)
    return partial.groupBy(*keys).agg(*finals)
