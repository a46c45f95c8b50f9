"""Physical-plan inspection: nested-loop-join build-side classification.

A BroadcastNestedLoopJoin / CartesianProduct in a graded plan is only
scale-safe when the broadcast (build) side is PROVABLY bounded — a
grouping-free aggregate (exactly 1 row), a bounded Range /
LocalTableScan (literal fan-out grids), or a LIMIT. Anything else is a
potential all-pairs product that fixture-scale timing cannot expose.

``find_nested_loops`` walks the initial physical plan over py4j and
returns, for each nested-loop node, the static row bound of its build
side (or None if unbounded). The plan audit tool and the plan tests
share this classification, so a genuine cross join can no longer hide
among scalar attaches (round-6 verdict: 58 indistinguishable notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# A build side proven at or below this many rows is a scalar/manifest
# attach (1-row aggregates, unit groups, lag/week/k-grid fan-outs), not
# a data-scale product. The largest deliberate grid in the registry is
# the 9-row week grid (analytics_survival_curve).
SCALAR_ATTACH_MAX_ROWS = 32

# Wrappers that preserve (or only shrink) their single child's row bound.
_PASSTHROUGH = {
    "ProjectExec",
    "FilterExec",
    "WholeStageCodegenExec",
    "InputAdapter",
    "ColumnarToRowExec",
    "RowToColumnarExec",
    "BroadcastExchangeExec",
    "ShuffleExchangeExec",
    "SortExec",
    "CoalesceExec",
    "AQEShuffleReadExec",
    "SubqueryExec",
}

_AGGREGATES = {"HashAggregateExec", "SortAggregateExec", "ObjectHashAggregateExec"}


def _simple_name(jnode) -> str:
    return jnode.getClass().getSimpleName()


def max_rows_bound(jnode) -> int | None:
    """Static upper bound on the rows this physical subtree can emit,
    or None when no bound is provable."""
    name = _simple_name(jnode)
    if name == "AdaptiveSparkPlanExec":
        return max_rows_bound(jnode.initialPlan())
    if name == "ReusedExchangeExec":
        return max_rows_bound(jnode.child())
    if name in _AGGREGATES:
        # No grouping keys => exactly one output row, whatever the input.
        return 1 if jnode.groupingExpressions().isEmpty() else None
    if name == "RangeExec":
        return int(str(jnode.numElements()))
    if name == "LocalTableScanExec":
        return int(jnode.rows().size())
    if name in ("GlobalLimitExec", "LocalLimitExec", "TakeOrderedAndProjectExec"):
        return int(jnode.limit())
    if name == "UnionExec":
        total = 0
        ch = jnode.children()
        for i in range(ch.size()):
            b = max_rows_bound(ch.apply(i))
            if b is None:
                return None
            total += b
        return total
    if name == "GenerateExec":
        # explode() multiplies rows by the generated-array size; that
        # size is static when the array is a literal / CreateArray /
        # sequence with literal bounds (the deliberate fan-out grids:
        # lag sets, k-grids). Data-dependent arrays stay unbounded.
        k = _static_generator_size(jnode.generator())
        if k is not None:
            ch = jnode.children()
            child = max_rows_bound(ch.apply(0)) if ch.size() == 1 else None
            if child is not None:
                # outer=true adds at most one row per input row
                return child * max(k, 1)
        return None
    if name in _PASSTHROUGH:
        ch = jnode.children()
        if ch.size() == 1:
            return max_rows_bound(ch.apply(0))
    return None


def _static_generator_size(jgen) -> int | None:
    """Rows an Explode/PosExplode generator emits per input row, when
    its array argument has a statically known size."""
    gname = jgen.getClass().getSimpleName()
    if gname not in ("Explode", "PosExplode"):
        return None
    arr = jgen.child()
    aname = arr.getClass().getSimpleName()
    if aname == "CreateArray":
        return int(arr.children().size())
    if aname == "Literal":
        try:
            v = arr.value()
            if v is not None and hasattr(v, "numElements"):
                return int(v.numElements())
        except Exception:
            return None
    if aname == "Sequence":
        # sequence(lo, hi [, step]) with literal bounds
        try:
            args = arr.children()
            vals = []
            for i in range(args.size()):
                a = args.apply(i)
                if a.getClass().getSimpleName() != "Literal":
                    return None
                vals.append(int(str(a.value())))
            lo, hi = vals[0], vals[1]
            step = vals[2] if len(vals) > 2 else (1 if hi >= lo else -1)
            if step == 0:
                return None
            return max(0, (hi - lo) // step + 1)
        except Exception:
            return None
    return None


import contextlib


@contextlib.contextmanager
def audit_checkpoints():
    """Capture nested-loop joins in plans ABOUT TO BE TRUNCATED by
    ``DataFrame.localCheckpoint``.

    A checkpointed subtree appears downstream as an opaque RDD scan
    (``RDDScanExec``), so a product upstream of one is invisible to any
    post-hoc plan inspection — found in round 7 when the vocab-growth
    curve's scalar attach vanished from its final plan. Inside this
    context every ``localCheckpoint`` call first audits its
    pre-checkpoint plan; hits (tagged ``via='checkpoint'``) accumulate
    in the yielded list, closing the blind spot for the audit tool and
    the plan-test sweep.
    """
    # Spark 4 instances are pyspark.sql.classic.dataframe.DataFrame,
    # which OVERRIDES localCheckpoint — patching only the abstract base
    # would intercept nothing.
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _ClassicDF
    except ImportError:  # older layout: one concrete class
        _ClassicDF = DataFrame
    targets = {DataFrame, _ClassicDF}

    hits: list[dict] = []
    origs = {cls: cls.__dict__.get("localCheckpoint") for cls in targets}

    def make_wrapper(orig):
        # Forward *args/**kwargs verbatim: Spark 4's signature is
        # localCheckpoint(eager=True, storageLevel=None) and may grow —
        # a pinned (self, eager) wrapper would TypeError on the rest.
        def wrapper(self, *args, **kwargs):
            for h in find_nested_loops(self):
                h["via"] = "checkpoint"
                hits.append(h)
            return orig(self, *args, **kwargs)

        return wrapper

    for cls, orig in origs.items():
        if orig is not None:
            cls.localCheckpoint = make_wrapper(orig)
    try:
        yield hits
    finally:
        for cls, orig in origs.items():
            if orig is not None:
                cls.localCheckpoint = orig


def count_rdd_scans(df: DataFrame) -> int:
    """Opaque RDD scans (checkpoint/createDataFrame results) in df's
    initial physical plan — each one is a subtree the post-hoc audit
    cannot see past (pair with audit_checkpoints() for coverage)."""
    qe = df._jdf.queryExecution()
    n = 0

    def walk(node) -> None:
        nonlocal n
        name = _simple_name(node)
        if name == "AdaptiveSparkPlanExec":
            walk(node.initialPlan())
            return
        if name == "ReusedExchangeExec":
            walk(node.child())
            return
        if name in ("RDDScanExec", "ExternalRDDScanExec"):
            n += 1
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(qe.executedPlan())
    return n


def find_nested_loops(df: DataFrame) -> list[dict]:
    """All BNLJ/Cartesian nodes in df's initial physical plan, each with
    the provable row bound of its build side.

    Returns dicts: {"kind", "build", "bound", "ok"} where ok means the
    build side is bounded at or below SCALAR_ATTACH_MAX_ROWS.
    """
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan()
    out: list[dict] = []

    def walk(n) -> None:
        name = _simple_name(n)
        if name == "AdaptiveSparkPlanExec":
            walk(n.initialPlan())
            return
        if name == "ReusedExchangeExec":
            walk(n.child())
            return
        ch = n.children()
        if name == "BroadcastNestedLoopJoinExec":
            side = str(n.buildSide().toString())
            idx = 1 if side == "BuildRight" else 0
            bound = max_rows_bound(ch.apply(idx))
            out.append(
                {
                    "kind": "BroadcastNestedLoopJoin",
                    "build": side,
                    "bound": bound,
                    "ok": bound is not None and bound <= SCALAR_ATTACH_MAX_ROWS,
                }
            )
        elif name == "CartesianProductExec":
            bounds = [max_rows_bound(ch.apply(i)) for i in range(2)]
            known = [b for b in bounds if b is not None]
            bound = min(known) if known else None
            out.append(
                {
                    "kind": "CartesianProduct",
                    "build": "either",
                    "bound": bound,
                    "ok": bound is not None and bound <= SCALAR_ATTACH_MAX_ROWS,
                }
            )
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(plan)
    return out
