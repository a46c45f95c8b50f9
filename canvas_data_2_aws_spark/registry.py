"""Graded-query registry — the SURVEY.md §2 correctness contract.

Every graded operator registers here via the :func:`graded` decorator;
``__spark_entry__.py`` exposes the registry to the driver. A query with
``oracle`` set gets the full DuckDB hash-match check; ``oracle=None``
declares a rows-only smoke (reserved for ops DuckDB can't reproduce
deterministically: LSH, sketches, sinks, streaming).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def graded(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn(spark, sf_dir) -> DataFrame`` as graded query ``name``.

    Rules every registrant must satisfy (SURVEY §8):
    - alias every computed column, identically in Spark and oracle SQL;
    - decimal-cast recipe for double aggregates;
    - every LIMIT / window orderBy ends with a unique key;
    - ROUND(,4) on float-vector / z-score outputs.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate graded query {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    from .queries import (  # noqa: F401
        aggregates,
        analytics,
        curation,
        dedup,
        enrichment,
        joins,
        layout,
        merge,
        multimodal,
        pipelines,
        relational,
        scalars,
        semistructured,
        setops,
        sketches,
        streaming,
        text,
        udfs,
        validation,
        vectors,
        windows,
    )
