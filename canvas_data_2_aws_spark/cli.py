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
import shutil
import sys

from . import registry, session
from .operators.merge import apply_changeset
from .sources.envelope import read_changeset_jsonl


def _replica_path(replica: str, table: str) -> str:
    return f"{replica}/{table}"


def cmd_initdb(args) -> int:
    spark = session.get_spark(app="cda2-initdb")
    df = session.load_table(spark, args.source_dir, args.table)
    df.write.mode("overwrite").parquet(_replica_path(args.replica, args.table))
    n = spark.read.parquet(_replica_path(args.replica, args.table)).count()
    print(f"initdb: {args.table} bootstrapped with {n} rows")
    return 0


def cmd_syncdb(args) -> int:
    spark = session.get_spark(app="cda2-syncdb")
    path = _replica_path(args.replica, args.table)
    base = spark.read.parquet(path)
    changes = read_changeset_jsonl(
        spark, args.changes, table=args.table, key_cols=[args.key]
    )
    merged = apply_changeset(base, changes, keys=[args.key])
    # Stage-then-swap: never overwrite the replica in place while
    # reading from it (overwrite would truncate its own input). A
    # lakehouse format replaces this with an atomic commit.
    staging = f"{path}__staging"
    merged.write.mode("overwrite").parquet(staging)
    shutil.rmtree(path)
    shutil.move(staging, path)
    n = spark.read.parquet(path).count()
    print(f"syncdb: {args.table} now {n} rows after merge")
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


def cmd_list(args) -> int:
    registry.load_all()
    for name in sorted(registry.QUERIES):
        kind = "oracle" if name in registry.ORACLES else "rows-only"
        print(f"{name:35s} {kind}")
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
    p_sync.add_argument("--table", required=True)
    p_sync.add_argument("--changes", required=True, help="JSONL envelope file/dir")
    p_sync.add_argument("--key", required=True, help="primary-key column")
    p_sync.add_argument("--replica", required=True)
    p_sync.set_defaults(fn=cmd_syncdb)

    p_query = sub.add_parser("query", help="run a graded query")
    p_query.add_argument("--name", required=True)
    p_query.add_argument("--sf-dir", default=session.DEFAULT_SF_DIR)
    p_query.add_argument("--rows", type=int, default=20)
    p_query.add_argument(
        "--explain", action="store_true", help="print the formatted physical plan"
    )
    p_query.set_defaults(fn=cmd_query)

    p_list = sub.add_parser("list", help="list all graded queries")
    p_list.set_defaults(fn=cmd_list)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
