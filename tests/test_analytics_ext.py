

def test_did_cells_consistent_with_estimate(spark, sf_dir):
    """The attached DiD scalar equals the 2×2 cell arithmetic; cell
    populations match across periods (same users pre and post)."""
    from canvas_data_2_aws_spark.queries.pipelines import analytics_did_lift

    rows = analytics_did_lift(spark, sf_dir).collect()
    cell = {(r.arm, r.period): r for r in rows}
    assert len(cell) == 4
    for arm in (0, 1):
        assert cell[(arm, "pre")].n_users == cell[(arm, "post")].n_users
    did = (
        cell[(1, "post")].mean_usd - cell[(1, "pre")].mean_usd
    ) - (cell[(0, "post")].mean_usd - cell[(0, "pre")].mean_usd)
    # means are independently rounded to 4dp, so allow quantization slack
    assert abs(did - rows[0].did_usd) < 5e-4
