"""Differential test for EVERY registered oracle-checked query.

Parametrizes over the registry at collection time: any new @graded
query with an oracle automatically gets a sf0.001 hash-match test —
the in-repo mirror of the driver's t2 gate.
"""

from __future__ import annotations

import pytest

from canvas_data_2_aws_spark import registry
from tests.oracle_util import assert_matches_oracle

registry.load_all()


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = registry.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(sdf, duck, registry.ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(registry.QUERIES) - set(registry.ORACLES)))
def test_rows_only_query_runs(name, spark, sf_dir):
    rows = registry.QUERIES[name](spark, sf_dir).collect()
    assert rows is not None
