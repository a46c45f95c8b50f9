"""Cross-engine regex-semantics pin for the CEP pattern query.

analytics_cep_pattern's determinism claim is that its patterns are
unambiguous BY CONSTRUCTION (gaps exclude both terminators), so Java
regex (Spark), RE2 (DuckDB), and Python re agree on every count and
extracted span. This test pins that over a seeded corpus of random
event strings — if a future pattern edit reintroduces ambiguity
(e.g. a gap class that admits a terminator), the three engines can
disagree and this fails before the oracle does.
"""

from __future__ import annotations

import random
import re

import duckdb
from pyspark.sql import functions as F

from canvas_data_2_aws_spark.queries.analytics import (
    _CEP_ABORT_PAT,
    _CEP_CONV_PAT,
)

ALPHABET = "vcpes"


def _corpus() -> list[str]:
    rng = random.Random(42)
    seqs = ["", "v", "vcp", "vcep", "vvccpp", "vcecp", "pcv", "vcpvcp", "vscp"]
    seqs += [
        "".join(rng.choice(ALPHABET) for _ in range(rng.randint(1, 40)))
        for _ in range(200)
    ]
    return seqs


def test_cep_patterns_agree_across_engines(spark):
    seqs = _corpus()
    expected = [
        (
            i,
            len(re.findall(_CEP_CONV_PAT, s)),
            len(re.findall(_CEP_ABORT_PAT, s)),
            len(m.group(0)) if (m := re.search(_CEP_CONV_PAT, s)) else 0,
        )
        for i, s in enumerate(seqs)
    ]

    df = spark.createDataFrame(list(enumerate(seqs)), "i long, seq string")
    got_spark = sorted(
        tuple(r)
        for r in df.select(
            "i",
            F.size(F.expr(f"regexp_extract_all(seq, '{_CEP_CONV_PAT}', 0)")),
            F.size(F.expr(f"regexp_extract_all(seq, '{_CEP_ABORT_PAT}', 0)")),
            F.length(F.regexp_extract("seq", _CEP_CONV_PAT, 0)),
        ).collect()
    )
    assert got_spark == expected

    con = duckdb.connect()
    con.execute("CREATE TABLE s (i BIGINT, seq VARCHAR)")
    con.executemany("INSERT INTO s VALUES (?, ?)", list(enumerate(seqs)))
    got_duck = sorted(
        tuple(r)
        for r in con.execute(
            f"""SELECT i,
                 len(regexp_extract_all(seq, '{_CEP_CONV_PAT}', 0)),
                 len(regexp_extract_all(seq, '{_CEP_ABORT_PAT}', 0)),
                 length(regexp_extract(seq, '{_CEP_CONV_PAT}', 0))
               FROM s"""
        ).fetchall()
    )
    assert got_duck == expected
