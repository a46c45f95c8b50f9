#!/usr/bin/env python
"""Registry-wide physical-plan audit.

For every graded query, builds the DataFrame at the given sf dir and
scans the formatted physical plan for anti-patterns that are invisible
at fixture scale but fatal at 100 TB:

- ``hof-in-filter``: a higher-order-function expression inlined into a
  Filter node or pushed scan filter (inferred-constraint pushdown — the
  multimodal_phash_dedup 243 s bug; re-evaluates the expression
  interpreted per row below the projection that computes it).
- ``cartesian``: CartesianProduct / BroadcastNestedLoopJoin whose build
  side is NOT provably bounded (plans/audit.py resolves each node's
  build subtree to a static row bound: grouping-free aggregate = 1 row,
  Range/LocalTableScan/LIMIT = their literal size). Bounded scalar
  attaches print as ``ok``; cap-gated deliberate brute-force baselines
  (the exact-KNN family, where the corpus broadcast is bounded at CALL
  time by similarity.CORPUS_ROW_CAP with a loud refusal) must be
  declared in ``DELIBERATE`` with a reason; anything else is a failure.

Usage:
    python tools/plan_audit.py [--sf DIR] [--out FILE] [name ...]

``--out`` writes ONLY the audit report lines to FILE — shell
redirection of the whole process (``> file 2>&1``) also captures JVM
stdout (streaming sink paths) and Python worker FutureWarnings, which
polluted the r07 artifact; the flag keeps the committed report clean.

Exit code 1 if any hof-in-filter hit or unexplained cartesian is found.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from canvas_data_2_aws_spark import registry, session  # noqa: E402
from canvas_data_2_aws_spark.plans.audit import (  # noqa: E402
    audit_checkpoints,
    find_nested_loops,
)

# Nested-loop joins whose build side is data-sized BY DESIGN, each with
# the runtime cap that keeps it broadcast-safe. EMPTY as of round 7:
# every nested loop in the registry resolves to a bounded build side
# (the exact-KNN brute-force family does its capped corpus broadcast
# through mapInPandas, not a join, so it never appears here). Adding a
# name requires a call-time cap with a loud refusal
# (operators/similarity.py CORPUS_ROW_CAP pattern) stated in the reason.
DELIBERATE: dict[str, str] = {}


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit_hof(plan: str) -> list[str]:
    hits = []
    for line in plan.splitlines():
        stripped = line.strip().lstrip(":+- ")
        in_filter = stripped.startswith(("Filter", "PushedFilters")) or (
            "PushedFilters: [" in line and "lambdafunction" in line
        )
        if in_filter and "lambdafunction" in line:
            hits.append(line.strip()[:200])
    return hits


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("names", nargs="*", help="query names (default: all)")
    parser.add_argument("--sf", default="/root/testdata/sf0.001", dest="sf_dir")
    parser.add_argument("--out", default=None, dest="out_path")
    ns = parser.parse_args()
    args = ns.names
    sf_dir = ns.sf_dir
    out_path = ns.out_path
    report: list[str] = []

    def emit(line: str) -> None:
        report.append(line)
        print(line, flush=True)

    registry.load_all()
    names = args or sorted(registry.QUERIES)
    spark = session.get_spark(app="plan-audit", shuffle_partitions=8)
    bad = 0
    n_scalar = n_deliberate = 0
    for name in names:
        try:
            # localCheckpoint truncates lineage, hiding upstream joins
            # from any post-hoc plan read — audit_checkpoints() captures
            # those plans at checkpoint-creation time instead.
            with audit_checkpoints() as ckpt_hits:
                df = registry.QUERIES[name](spark, sf_dir)
            plan = plan_text(df)
        except Exception as exc:  # queries with side effects may not build dry
            emit(f"SKIP {name}: {type(exc).__name__}: {exc}")
            continue
        for detail in audit_hof(plan):
            bad += 1
            emit(f"BAD  {name}: hof-in-filter: {detail}")
        for nl in find_nested_loops(df) + ckpt_hits:
            via = "checkpoint " if nl.get("via") == "checkpoint" else ""
            desc = f"{via}{nl['kind']}({nl['build']}, build<={nl['bound']})"
            if nl["ok"]:
                n_scalar += 1
                emit(f"ok   {name}: scalar-attach {desc}")
            elif name in DELIBERATE:
                n_deliberate += 1
                emit(f"ok   {name}: deliberate {desc}: {DELIBERATE[name]}")
            else:
                bad += 1
                emit(f"BAD  {name}: unexplained cartesian {desc}")
    emit(
        f"audited {len(names)} queries: {bad} failures, "
        f"{n_scalar} bounded scalar attaches, "
        f"{n_deliberate} declared deliberate nested loops"
    )
    if out_path:
        with open(out_path, "w") as fh:
            fh.write("\n".join(report) + "\n")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
