"""End-to-end CLI lifecycle test: initdb → syncdb (JSONL changeset)
must reproduce exactly what the in-process merge operator computes."""

from __future__ import annotations

from pyspark.sql import functions as F

from canvas_data_2_aws_spark import cli
from canvas_data_2_aws_spark.operators.merge import apply_changeset
from canvas_data_2_aws_spark.queries.merge import derive_changeset
from canvas_data_2_aws_spark.session import load_table
from canvas_data_2_aws_spark.sources.envelope import encode_envelope


def test_initdb_syncdb_lifecycle(spark, sf_dir, tmp_path):
    replica = str(tmp_path / "replica")
    changes_path = str(tmp_path / "changes")

    rc = cli.main(
        ["initdb", "--table", "orders", "--source-dir", sf_dir, "--replica", replica]
    )
    assert rc == 0

    orders = load_table(spark, sf_dir, "orders")
    changeset = derive_changeset(orders)
    encode_envelope(changeset, key_cols=["o_orderkey"]).coalesce(1).write.mode(
        "overwrite"
    ).text(changes_path)

    rc = cli.main(
        [
            "syncdb",
            "--table", "orders",
            "--changes", changes_path,
            "--key", "o_orderkey",
            "--replica", replica,
        ]
    )
    assert rc == 0

    merged = spark.read.parquet(f"{replica}/orders")
    expected = apply_changeset(orders, changeset, keys=["o_orderkey"])
    assert merged.count() == expected.count()
    # PK-unique and deleted keys absent
    assert merged.select("o_orderkey").distinct().count() == merged.count()
    # deleted ORIGINAL keys absent (fresh inserts may land on %97 keys
    # above the original max — those legitimately survive)
    deleted = orders.where(F.col("o_orderkey") % 97 == 0).select("o_orderkey")
    assert merged.join(deleted, "o_orderkey", "left_semi").count() == 0
    # updated ORIGINAL keys carry the new payload (fresh inserts above
    # the original max keep their cloned status)
    max_key = orders.agg(F.max("o_orderkey")).first()[0]
    updated = merged.where(
        (F.col("o_orderkey") % 10 == 0)
        & (F.col("o_orderkey") % 97 != 0)
        & (F.col("o_orderkey") <= max_key)
    )
    assert updated.where(F.col("o_orderstatus") != "X").count() == 0


def test_cli_list_and_query(capsys, spark, sf_dir):
    assert cli.main(["list"]) == 0
    out = capsys.readouterr().out
    assert "agg_group_sum" in out and "oracle" in out

    assert cli.main(["query", "--name", "agg_group_sum", "--sf-dir", sf_dir]) == 0
    assert cli.main(["query", "--name", "nope", "--sf-dir", sf_dir]) == 2


def test_validate_verb_detects_drift(spark, sf_dir, tmp_path):
    """validate exits 0 on a faithful replica, 1 after it drifts."""
    replica = str(tmp_path / "vreplica")
    rc = cli.main(
        ["initdb", "--table", "orders", "--source-dir", sf_dir, "--replica", replica]
    )
    assert rc == 0
    base_args = [
        "validate",
        "--table", "orders",
        "--source-dir", sf_dir,
        "--replica", replica,
        "--key", "o_orderkey",
    ]
    assert cli.main(base_args) == 0

    # Drift: drop some rows from the replica in place (stage-then-swap).
    import shutil

    drifted = spark.read.parquet(f"{replica}/orders").where(
        F.col("o_orderkey") % 5 != 0
    )
    staging = str(tmp_path / "vstaging")
    drifted.write.mode("overwrite").parquet(staging)
    shutil.rmtree(f"{replica}/orders")
    shutil.move(staging, f"{replica}/orders")
    assert cli.main(base_args) == 1
