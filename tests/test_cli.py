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


def test_syncdb_compacts_multi_change_per_pk(spark, sf_dir, tmp_path):
    """A changeset touching one PK several times (update → update →
    delete for one key; delete → re-insert for another) must apply in
    meta.ts order: no duplicate-PK rows, last writer wins (the M3
    hazard in the r1 ADVICE)."""
    import json

    replica = str(tmp_path / "mc_replica")
    assert (
        cli.main(
            ["initdb", "--table", "orders", "--source-dir", sf_dir,
             "--replica", replica]
        )
        == 0
    )
    base = spark.read.parquet(f"{replica}/orders")
    k1, k2 = [r.o_orderkey for r in
              base.orderBy("o_orderkey").limit(2).collect()]
    row = base.where(F.col("o_orderkey") == k1).first().asDict()

    def env(key, action, ts, status=None):
        rec = {"key": {"o_orderkey": key}, "meta": {"action": action, "ts": ts}}
        if action == "U":
            val = {c: v for c, v in row.items() if c != "o_orderkey"}
            val["o_orderstatus"] = status
            val["o_orderdate"] = str(val["o_orderdate"])
            rec["value"] = val
        return json.dumps(rec)

    lines = [
        env(k1, "U", 1, "A"),
        env(k1, "U", 2, "B"),
        env(k1, "D", 3),          # k1: final state = deleted
        env(k2, "D", 1),
        env(k2, "U", 2, "Z"),     # k2: final state = re-inserted as Z
    ]
    changes = tmp_path / "mc_changes.jsonl"
    changes.write_text("\n".join(lines) + "\n")

    assert (
        cli.main(
            ["syncdb", "--table", "orders", "--changes", str(changes),
             "--key", "o_orderkey", "--replica", replica]
        )
        == 0
    )
    merged = spark.read.parquet(f"{replica}/orders")
    assert merged.select("o_orderkey").distinct().count() == merged.count()
    assert merged.where(F.col("o_orderkey") == k1).count() == 0
    k2_rows = merged.where(F.col("o_orderkey") == k2).collect()
    assert len(k2_rows) == 1 and k2_rows[0].o_orderstatus == "Z"


def test_validate_detects_double_and_date_drift(spark, sf_dir, tmp_path):
    """The digest must cover double and date columns (r1 ADVICE: they
    were silently excluded, letting o_totalprice corruption pass)."""
    import shutil

    replica = str(tmp_path / "ddreplica")
    assert (
        cli.main(
            ["initdb", "--table", "orders", "--source-dir", sf_dir,
             "--replica", replica]
        )
        == 0
    )
    base_args = [
        "validate", "--table", "orders", "--source-dir", sf_dir,
        "--replica", replica, "--key", "o_orderkey",
    ]
    assert cli.main(base_args) == 0

    # Never .cache() the pristine frame here: Spark's cache manager
    # matches read.parquet plans by path, so a later read of the
    # swapped-in corrupted files would silently serve pristine rows.
    backup = str(tmp_path / "ddbackup")
    shutil.copytree(f"{replica}/orders", backup)

    def swap(mutate):
        df = mutate(spark.read.parquet(backup))
        staging = str(tmp_path / "ddstaging")
        df.write.mode("overwrite").parquet(staging)
        shutil.rmtree(f"{replica}/orders")
        shutil.move(staging, f"{replica}/orders")

    # Corrupt a double column only — row count and PKs unchanged.
    swap(lambda df: df.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 11 == 0,
               F.col("o_totalprice") + 1.0).otherwise(F.col("o_totalprice")),
    ))
    assert cli.main(base_args) == 1

    # Corrupt the order-date column only (timestamp_ntz in-fixture).
    swap(lambda df: df.withColumn(
        "o_orderdate",
        F.when(F.col("o_orderkey") % 13 == 0,
               F.col("o_orderdate") + F.expr("INTERVAL 1 DAY"))
        .otherwise(F.col("o_orderdate")),
    ))
    assert cli.main(base_args) == 1


def test_optimize_compacts_and_preserves_content(spark, sf_dir, tmp_path):
    import glob

    replica = str(tmp_path / "replica")
    rc = cli.main(
        ["initdb", "--table", "orders", "--source-dir", sf_dir, "--replica", replica]
    )
    assert rc == 0
    # fragment the replica into many small files first
    frag = spark.read.parquet(f"{replica}/orders").repartition(16)
    frag.write.mode("overwrite").parquet(f"{replica}/orders__staging")
    import shutil

    shutil.rmtree(f"{replica}/orders")
    shutil.move(f"{replica}/orders__staging", f"{replica}/orders")
    before = spark.read.parquet(f"{replica}/orders")
    before_rows = before.count()
    before_sum = before.agg(F.sum("o_orderkey")).first()[0]
    assert len(glob.glob(f"{replica}/orders/part-*")) >= 16

    rc = cli.main(
        [
            "optimize",
            "--table", "orders",
            "--replica", replica,
            "--key", "o_orderkey",
            "--target-mb", "256",
        ]
    )
    assert rc == 0
    after = spark.read.parquet(f"{replica}/orders")
    assert after.count() == before_rows
    assert after.agg(F.sum("o_orderkey")).first()[0] == before_sum
    assert len(glob.glob(f"{replica}/orders/part-*")) < 16
