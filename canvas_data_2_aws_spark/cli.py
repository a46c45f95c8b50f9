"""Command-line surface mirroring the reference pipeline's entry
points (SURVEY §3.1): ``initdb`` bootstraps a replica table from a
snapshot, ``syncdb`` applies an incremental JSONL changeset, ``query``
runs any graded query. A user of the reference drives the same three
verbs; here they run on Spark.

    python -m canvas_data_2_aws_spark initdb  --table orders \\
        --source-dir /root/testdata/sf0.001 --replica /tmp/replica
    python -m canvas_data_2_aws_spark syncdb  --table orders \\
        --changes /tmp/changes.jsonl --key o_orderkey --replica /tmp/replica
    python -m canvas_data_2_aws_spark query   --name agg_group_sum \\
        --sf-dir /root/testdata/sf0.001
"""

from __future__ import annotations

import argparse
import os
import sys

from . import registry, replica, session
from .operators.merge import apply_changeset
from .sources.envelope import read_changeset_jsonl


def cmd_initdb(args) -> int:
    spark = session.get_spark(app="cda2-initdb")
    df = session.load_table(spark, args.source_dir, args.table)
    dest = os.path.join(args.replica, args.table)
    df.write.mode("overwrite").parquet(dest)
    if replica.has_manifest(args.replica):
        man = replica.load(args.replica)
        man["tables"][args.table] = {"dir": args.table}
        man["version"] += 1
        replica.commit(args.replica, man)
        replica.vacuum(args.replica)
    n = spark.read.parquet(replica.table_dir(args.replica, args.table)).count()
    print(f"initdb: {args.table} bootstrapped with {n} rows")
    return 0


def cmd_syncdb(args) -> int:
    """Apply one changeset per table, then advance ALL tables (and the
    high-water token) in ONE atomic manifest commit.

    Mirrors the reference's all-tables-or-nothing Postgres transaction
    around per-table token updates `[public: DAP]`: every merged table
    is staged to a fresh ``{table}__v{N}`` directory first; nothing the
    current manifest references is touched. The single commit point is
    the manifest's ``os.replace`` — a crash before it leaves the prior
    manifest (old data, old token) fully intact, and the staged
    directories are reclaimed by vacuum on the next run.
    """
    spark = session.get_spark(app="cda2-syncdb")
    root = args.replica
    tables, changes_list, keys = args.table, args.changes, args.key
    if not (len(tables) == len(changes_list) == len(keys)):
        print(
            "syncdb: --table/--changes/--key must be repeated together",
            file=sys.stderr,
        )
        return 2
    replica.vacuum(root)  # reclaim leftovers from any crashed prior sync
    man = replica.load(root)
    new_ver = man["version"] + 1
    staged: dict[str, str] = {}
    for table, changes_path, key in zip(tables, changes_list, keys):
        base = spark.read.parquet(replica.table_dir(root, table))
        changes = read_changeset_jsonl(
            spark,
            changes_path,
            table=table,
            key_cols=[key],
            ts_col="_change_ts",
            seq_col="_change_seq",
        )
        # Compact multi-change-per-PK batches to the latest by meta.ts
        # (file order as the tie-break) BEFORE applying — without this
        # a changeset touching one key twice produces duplicate-PK rows
        # and order-dependent results (M3).
        merged = apply_changeset(
            base,
            changes,
            keys=[key],
            compact_by=["_change_ts", "_change_seq"],
        )
        rel = f"{table}__v{new_ver}"
        merged.write.mode("overwrite").parquet(os.path.join(root, rel))
        staged[table] = rel
    for table, rel in staged.items():
        man["tables"][table] = {"dir": rel}
    man["version"] = new_ver
    if args.token is not None:
        man["token"] = args.token
    replica.commit(root, man)  # <- the all-tables-or-nothing point
    replica.vacuum(root)  # superseded versions are now unreferenced
    for table in tables:
        n = spark.read.parquet(replica.table_dir(root, table)).count()
        print(f"syncdb: {table} now {n} rows after merge")
    return 0


def cmd_query(args) -> int:
    registry.load_all()
    if args.name not in registry.QUERIES:
        print(f"unknown query {args.name!r}; run `list` to see all", file=sys.stderr)
        return 2
    spark = session.get_spark(app=f"cda2-query-{args.name}")
    df = registry.QUERIES[args.name](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.rows, truncate=False)
    return 0


def cmd_validate(args) -> int:
    """Post-sync replica audit: order-insensitive content checksum of
    the replica table vs a reference snapshot (the same md5-fold
    recipe as the graded ``validate_table_checksum``), plus row count
    and PK uniqueness. Exit 0 iff all three agree — the check a
    scheduler runs after every ``syncdb`` before advancing the token.
    """
    from pyspark.sql import functions as F

    spark = session.get_spark(app="cda2-validate")
    replica_df = spark.read.parquet(replica.table_dir(args.replica, args.table))
    reference = session.load_table(spark, args.source_dir, args.table)
    key = args.key

    def digest(df):
        # Engine-neutral canonical field per dtype (same recipe as the
        # graded validate_table_checksum): doubles as integer cents,
        # dates/timestamps as ISO strings — raw double/timestamp string
        # forms are engine-dependent and must never enter a digest, but
        # silently excluding those columns would let corruption of e.g.
        # o_totalprice or o_orderdate pass the audit.
        parts = []
        for c, t in sorted(df.dtypes):
            col = F.col(c)
            if t in ("string", "int", "bigint", "smallint", "tinyint", "boolean"):
                parts.append(col.cast("string"))
            elif t in ("double", "float"):
                parts.append(F.round(col * 100, 0).cast("long").cast("string"))
            elif t == "date":
                parts.append(col.cast("string"))
            elif t.startswith("timestamp"):
                parts.append(F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
            elif t.startswith("decimal"):
                parts.append(col.cast("string"))
        row = F.concat_ws("|", *parts)
        fold = F.conv(F.substring(F.md5(row), 1, 8), 16, 10).cast("long")
        return df.agg(
            F.sum(fold).alias("checksum"),
            F.count("*").alias("n"),
            F.countDistinct(key).alias("n_keys"),
        ).first()

    rep, ref = digest(replica_df), digest(reference)
    ok_checksum = rep.checksum == ref.checksum
    ok_rows = rep.n == ref.n
    ok_pk = rep.n == rep.n_keys
    print(
        f"validate {args.table}: rows {rep.n} vs {ref.n} "
        f"({'OK' if ok_rows else 'MISMATCH'}), "
        f"checksum {'OK' if ok_checksum else 'MISMATCH'}, "
        f"pk-unique {'OK' if ok_pk else 'VIOLATED'}"
    )
    return 0 if (ok_checksum and ok_rows and ok_pk) else 1


def cmd_optimize(args) -> int:
    """Replica maintenance: rewrite a table's small files into
    ~``--target-mb`` files range-clustered on the PK (the actionable
    form of the graded compaction planner + Z-order layout ops).
    Clustering on the key keeps footer min/max selective, so post-
    compaction scans skip files on PK predicates. The rewrite commits
    exactly like ``syncdb``: staged directory + atomic manifest
    replace, so a crash mid-rewrite leaves the prior layout readable.
    At 100 TB the same verb runs per partition off the manifest bins
    (`layout_compaction_bins`)."""
    import glob

    spark = session.get_spark(app="cda2-optimize")
    root = args.replica
    replica.vacuum(root)
    path = replica.table_dir(root, args.table)
    files_before = glob.glob(f"{path}/part-*")
    bytes_total = sum(os.path.getsize(f) for f in files_before)
    target = max(1, round(bytes_total / (args.target_mb * 1024 * 1024)) or 1)

    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    clustered = df.repartitionByRange(target, F.col(args.key)).sortWithinPartitions(
        args.key
    )
    man = replica.load(root)
    new_ver = man["version"] + 1
    rel = f"{args.table}__v{new_ver}"
    clustered.write.mode("overwrite").parquet(os.path.join(root, rel))
    man["tables"][args.table] = {"dir": rel}
    man["version"] = new_ver
    replica.commit(root, man)
    replica.vacuum(root)
    new_path = replica.table_dir(root, args.table)
    files_after = glob.glob(f"{new_path}/part-*")
    n = spark.read.parquet(new_path).count()
    print(
        f"optimize: {args.table} rewrote {len(files_before)} files "
        f"({bytes_total >> 20} MiB) into {len(files_after)} "
        f"PK-clustered files, {n} rows"
    )
    return 0


def cmd_list(args) -> int:
    registry.load_all()
    for name in sorted(registry.QUERIES):
        kind = "oracle" if name in registry.ORACLES else "rows-only"
        print(f"{name:35s} {kind}")
    return 0


def cmd_schema(args) -> int:
    """Compile a server-declared JSON-Schema table document to the
    regenerated DDL (and optionally plan a version-bump migration) —
    the client-side half of the upstream get_table_schema flow."""
    import json as _json

    from .sources.schema_compiler import (
        compile_json_schema,
        ddl_for,
        migrate,
        schema_version,
    )

    with open(args.doc, encoding="utf-8") as fh:
        doc = _json.load(fh)
    if args.migrate_from:
        with open(args.migrate_from, encoding="utf-8") as fh:
            old = _json.load(fh)
        struct, added = migrate(old, doc)
        print(
            f"v{schema_version(old)} -> v{schema_version(doc)}: "
            f"+{len(added)} column(s) {added}"
        )
    else:
        struct = compile_json_schema(doc)
    print(f"-- {doc.get('tableName', '?')} v{schema_version(doc)}")
    print(ddl_for(doc))
    print(struct.simpleString())
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="canvas_data_2_aws_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_init = sub.add_parser("initdb", help="bootstrap a replica table (M2)")
    p_init.add_argument("--table", required=True)
    p_init.add_argument("--source-dir", required=True)
    p_init.add_argument("--replica", required=True)
    p_init.set_defaults(fn=cmd_initdb)

    p_sync = sub.add_parser("syncdb", help="apply a JSONL changeset (M1)")
    p_sync.add_argument(
        "--table", required=True, action="append",
        help="table name (repeat with --changes/--key for a multi-table"
             " all-or-nothing sync)",
    )
    p_sync.add_argument(
        "--changes", required=True, action="append",
        help="JSONL envelope file/dir (one per --table)",
    )
    p_sync.add_argument(
        "--key", required=True, action="append",
        help="primary-key column (one per --table)",
    )
    p_sync.add_argument("--replica", required=True)
    p_sync.add_argument(
        "--token", default=None,
        help="high-water token recorded atomically with the data commit",
    )
    p_sync.set_defaults(fn=cmd_syncdb)

    p_query = sub.add_parser("query", help="run a graded query")
    p_query.add_argument("--name", required=True)
    p_query.add_argument("--sf-dir", default=session.DEFAULT_SF_DIR)
    p_query.add_argument("--rows", type=int, default=20)
    p_query.add_argument(
        "--explain", action="store_true", help="print the formatted physical plan"
    )
    p_query.set_defaults(fn=cmd_query)

    p_val = sub.add_parser(
        "validate", help="audit a replica table against a snapshot"
    )
    p_val.add_argument("--table", required=True)
    p_val.add_argument("--source-dir", required=True)
    p_val.add_argument("--replica", required=True)
    p_val.add_argument("--key", required=True, help="primary-key column")
    p_val.set_defaults(fn=cmd_validate)

    p_opt = sub.add_parser(
        "optimize", help="compact a replica table into PK-clustered files"
    )
    p_opt.add_argument("--table", required=True)
    p_opt.add_argument("--replica", required=True)
    p_opt.add_argument("--key", required=True, help="clustering key column")
    p_opt.add_argument("--target-mb", type=int, default=256)
    p_opt.set_defaults(fn=cmd_optimize)

    p_list = sub.add_parser("list", help="list all graded queries")
    p_list.set_defaults(fn=cmd_list)

    p_schema = sub.add_parser(
        "schema", help="compile a JSON-Schema table doc to DDL/StructType"
    )
    p_schema.add_argument("--doc", required=True, help="JSON schema document")
    p_schema.add_argument(
        "--migrate-from", default=None,
        help="previous-version document: prints the version-bump plan",
    )
    p_schema.set_defaults(fn=cmd_schema)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
