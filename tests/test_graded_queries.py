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


def test_interval_overlap_pairs_truly_overlap(spark, sf_dir):
    from canvas_data_2_aws_spark import registry

    rows = registry.QUERIES["join_interval_overlap"](spark, sf_dir).collect()
    assert rows
    assert all(r.overlap_sec >= 0 for r in rows)
    # exactly-once emission: no duplicate (p_id, e_id) pairs
    pairs = [(r.p_id, r.e_id) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_incremental_probe_sides(spark, sf_dir):
    from canvas_data_2_aws_spark import registry

    rows = registry.QUERIES["dedup_incremental_probe"](spark, sf_dir).collect()
    for r in rows:
        assert r.doc_new % 10 == 9
        assert r.doc_old % 10 != 9
        assert 0.0 <= r.jaccard <= 1.0


def test_weighted_reservoir_k_per_stratum(spark, sf_dir):
    from collections import Counter

    from canvas_data_2_aws_spark import registry

    rows = registry.QUERIES["sample_weighted_reservoir"](spark, sf_dir).collect()
    per_lang = Counter(r.lang for r in rows)
    assert all(n == 5 for n in per_lang.values())


def test_reconcile_covers_all_orders(spark, sf_dir):
    from canvas_data_2_aws_spark import registry
    from canvas_data_2_aws_spark.session import load_table

    rows = registry.QUERIES["validate_reconcile_totals"](spark, sf_dir).collect()
    assert sum(r.n_orders for r in rows) == load_table(
        spark, sf_dir, "orders"
    ).count()
    for r in rows:
        assert r.n_diverged <= r.n_with_lines <= r.n_orders
