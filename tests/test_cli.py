"""End-to-end CLI lifecycle test: initdb → syncdb (JSONL changeset)
must reproduce exactly what the in-process merge operator computes."""

from __future__ import annotations

from pyspark.sql import functions as F

from canvas_data_2_aws_spark import cli, replica as replica_mod
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

    merged = spark.read.parquet(replica_mod.table_dir(replica, "orders"))
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
    merged = spark.read.parquet(replica_mod.table_dir(replica, "orders"))
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
    after_path = replica_mod.table_dir(replica, "orders")
    after = spark.read.parquet(after_path)
    assert after.count() == before_rows
    assert after.agg(F.sum("o_orderkey")).first()[0] == before_sum
    assert len(glob.glob(f"{after_path}/part-*")) < 16


def _delete_changeset(tmp_path, name, key_col, keys):
    import json

    lines = [
        json.dumps({"key": {key_col: int(k)}, "meta": {"action": "D", "ts": 1}})
        for k in keys
    ]
    path = tmp_path / name
    path.write_text("\n".join(lines) + "\n")
    return str(path)


def test_syncdb_multi_table_atomic_commit(spark, sf_dir, tmp_path):
    """One syncdb invocation over two tables advances both tables AND
    the high-water token in a single manifest commit."""
    replica = str(tmp_path / "mt_replica")
    for t in ("orders", "customer"):
        assert cli.main(
            ["initdb", "--table", t, "--source-dir", sf_dir, "--replica", replica]
        ) == 0
    o_keys = [r.o_orderkey for r in
              spark.read.parquet(f"{replica}/orders")
              .orderBy("o_orderkey").limit(3).collect()]
    c_keys = [r.c_custkey for r in
              spark.read.parquet(f"{replica}/customer")
              .orderBy("c_custkey").limit(2).collect()]
    o_before = spark.read.parquet(f"{replica}/orders").count()
    c_before = spark.read.parquet(f"{replica}/customer").count()

    rc = cli.main([
        "syncdb", "--replica", replica, "--token", "tok-42",
        "--table", "orders",
        "--changes", _delete_changeset(tmp_path, "o.jsonl", "o_orderkey", o_keys),
        "--key", "o_orderkey",
        "--table", "customer",
        "--changes", _delete_changeset(tmp_path, "c.jsonl", "c_custkey", c_keys),
        "--key", "c_custkey",
    ])
    assert rc == 0

    man = replica_mod.load(replica)
    assert man["token"] == "tok-42"
    assert man["version"] == 1
    o_now = spark.read.parquet(replica_mod.table_dir(replica, "orders"))
    c_now = spark.read.parquet(replica_mod.table_dir(replica, "customer"))
    assert o_now.count() == o_before - len(o_keys)
    assert c_now.count() == c_before - len(c_keys)
    # superseded plain dirs were vacuumed after the commit
    import os

    assert not os.path.exists(f"{replica}/orders")
    assert not os.path.exists(f"{replica}/customer")


def test_syncdb_failed_midsync_leaves_prior_manifest(spark, sf_dir, tmp_path,
                                                     monkeypatch):
    """A sync that dies after staging (commit never runs) must leave the
    prior manifest — data AND token — fully intact, and the next run
    reclaims the staged garbage."""
    import os

    replica = str(tmp_path / "crash_replica")
    for t in ("orders", "customer"):
        assert cli.main(
            ["initdb", "--table", t, "--source-dir", sf_dir, "--replica", replica]
        ) == 0
    o_keys = [r.o_orderkey for r in
              spark.read.parquet(f"{replica}/orders")
              .orderBy("o_orderkey").limit(2).collect()]
    ch = _delete_changeset(tmp_path, "ok.jsonl", "o_orderkey", o_keys)

    # Establish a committed baseline (manifest v1, token tok-1).
    assert cli.main([
        "syncdb", "--replica", replica, "--token", "tok-1",
        "--table", "orders", "--changes", ch, "--key", "o_orderkey",
    ]) == 0
    man_before = replica_mod.load(replica)
    o_rows = spark.read.parquet(replica_mod.table_dir(replica, "orders")).count()
    c_rows = spark.read.parquet(replica_mod.table_dir(replica, "customer")).count()

    # Crash INSIDE the commit: both tables stage fine, the manifest
    # replace itself dies (power-loss analog at the last instant).
    c_keys = [r.c_custkey for r in
              spark.read.parquet(replica_mod.table_dir(replica, "customer"))
              .orderBy("c_custkey").limit(2).collect()]
    ch2 = _delete_changeset(tmp_path, "c2.jsonl", "c_custkey", c_keys)

    def boom(*a, **kw):
        raise OSError("simulated crash during manifest replace")

    monkeypatch.setattr(replica_mod.os, "replace", boom)
    import pytest

    with pytest.raises(OSError):
        cli.main([
            "syncdb", "--replica", replica, "--token", "tok-2",
            "--table", "orders", "--changes", ch, "--key", "o_orderkey",
            "--table", "customer", "--changes", ch2, "--key", "c_custkey",
        ])
    monkeypatch.undo()

    # Prior manifest intact: same token, same version, same dirs, same data.
    man_after = replica_mod.load(replica)
    assert man_after == man_before
    assert man_after["token"] == "tok-1"
    assert spark.read.parquet(
        replica_mod.table_dir(replica, "orders")).count() == o_rows
    assert spark.read.parquet(
        replica_mod.table_dir(replica, "customer")).count() == c_rows

    # Staged v2 leftovers exist now, and the next sync reclaims them
    # before re-staging (vacuum on entry), then commits cleanly.
    leftovers = [d for d in os.listdir(replica) if d.endswith("__v2")]
    assert leftovers
    assert cli.main([
        "syncdb", "--replica", replica, "--token", "tok-2",
        "--table", "customer", "--changes", ch2, "--key", "c_custkey",
    ]) == 0
    assert replica_mod.load(replica)["token"] == "tok-2"
    assert spark.read.parquet(
        replica_mod.table_dir(replica, "customer")).count() == c_rows - len(c_keys)


def test_syncdb_failed_staging_leaves_prior_manifest(spark, sf_dir, tmp_path):
    """If the SECOND table's changeset is unreadable, the first table's
    already-staged merge must not become visible (no partial commit)."""
    import pytest

    replica = str(tmp_path / "stage_replica")
    for t in ("orders", "customer"):
        assert cli.main(
            ["initdb", "--table", t, "--source-dir", sf_dir, "--replica", replica]
        ) == 0
    o_keys = [r.o_orderkey for r in
              spark.read.parquet(f"{replica}/orders")
              .orderBy("o_orderkey").limit(2).collect()]
    ch = _delete_changeset(tmp_path, "s1.jsonl", "o_orderkey", o_keys)
    o_before = spark.read.parquet(f"{replica}/orders").count()

    with pytest.raises(Exception):
        cli.main([
            "syncdb", "--replica", replica, "--token", "tok-x",
            "--table", "orders", "--changes", ch, "--key", "o_orderkey",
            "--table", "customer",
            "--changes", str(tmp_path / "missing.jsonl"),
            "--key", "c_custkey",
        ])

    # No manifest was ever committed; both tables read their originals.
    assert not replica_mod.has_manifest(replica)
    assert spark.read.parquet(
        replica_mod.table_dir(replica, "orders")).count() == o_before


def test_cli_schema_compile_and_migrate(tmp_path, capsys):
    import json

    from canvas_data_2_aws_spark.cli import main

    v1 = {
        "tableName": "courses",
        "schemaVersion": 1,
        "schema": {
            "type": "object",
            "properties": {"id": {"type": "integer"}},
            "required": ["id"],
        },
    }
    v2 = json.loads(json.dumps(v1))
    v2["schemaVersion"] = 2
    v2["schema"]["properties"]["name"] = {"type": "string"}
    p1, p2 = tmp_path / "v1.json", tmp_path / "v2.json"
    p1.write_text(json.dumps(v1))
    p2.write_text(json.dumps(v2))
    assert main(["schema", "--doc", str(p2), "--migrate-from", str(p1)]) == 0
    out = capsys.readouterr().out
    assert "+1 column(s) ['name']" in out
    assert "id BIGINT NOT NULL, name STRING" in out
