#!/usr/bin/env python
"""Registry-wide physical-plan audit.

For every graded query, builds the DataFrame at the given sf dir and
scans the formatted physical plan for anti-patterns that are invisible
at fixture scale but fatal at 100 TB:

- ``hof-in-filter``: a higher-order-function expression inlined into a
  Filter node or pushed scan filter (inferred-constraint pushdown — the
  multimodal_phash_dedup 243 s bug; re-evaluates the expression
  interpreted per row below the projection that computes it).
- ``cartesian``: CartesianProduct / BroadcastNestedLoopJoin that is not
  a whitelisted 1-row scalar attachment (tests/test_plans.py pins the
  curated list; this sweep just reports).

Usage:
    python tools/plan_audit.py [--sf DIR] [name ...]

Prints one line per offending (query, pattern); exit code 1 if any
hof-in-filter hit is found (cartesians are report-only here).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from canvas_data_2_aws_spark import registry, session  # noqa: E402


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit_one(name: str, plan: str) -> list[tuple[str, str]]:
    hits = []
    for line in plan.splitlines():
        stripped = line.strip().lstrip(":+- ")
        in_filter = stripped.startswith(("Filter", "PushedFilters")) or (
            "PushedFilters: [" in line and "lambdafunction" in line
        )
        if in_filter and "lambdafunction" in line:
            hits.append(("hof-in-filter", line.strip()[:200]))
    for marker in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if marker in plan:
            hits.append(("cartesian", marker))
    return hits


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.001"
    for i, a in enumerate(sys.argv[1:]):
        if a == "--sf":
            sf_dir = sys.argv[1:][i + 1]
            args.remove(sf_dir) if sf_dir in args else None
    registry.load_all()
    names = args or sorted(registry.QUERIES)
    spark = session.get_spark(app="plan-audit", shuffle_partitions=8)
    bad = 0
    for name in names:
        try:
            plan = plan_text(registry.QUERIES[name](spark, sf_dir))
        except Exception as exc:  # queries with side effects may not build dry
            print(f"SKIP {name}: {type(exc).__name__}: {exc}", flush=True)
            continue
        for kind, detail in audit_one(name, plan):
            tag = "BAD " if kind == "hof-in-filter" else "note"
            if kind == "hof-in-filter":
                bad += 1
            print(f"{tag} {name}: {kind}: {detail}", flush=True)
    print(f"audited {len(names)} queries, {bad} hof-in-filter hits", flush=True)
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
