"""As-of join — latest prior match per row (SURVEY §2.3 J9, §4).

Spark SQL has no native ASOF JOIN. The scalable plan is the
union-and-carry-forward trick: tag both sides, union them, and let
``last(value, ignoreNulls=True)`` over a per-key time-ordered window
carry the most recent right-side value onto each left row.

Cost: ONE shuffle (by key) + one in-partition sort — no row explosion,
no range cross-product, no skew amplification. A join-then-max plan
would shuffle both sides *and* explode to |L|·|R per key| intermediate
rows; at 100 TB the window form wins on every axis.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window, functions as F

# Strict grammar for the tolerance interval: "<n> <unit>[S]", one term.
# The string is interpolated into SQL expression text, so anything
# outside this shape must be rejected HERE with a clear error instead
# of surfacing as an opaque Catalyst parse failure (or worse, being
# interpreted as arbitrary expression text).
_TOLERANCE_RE = re.compile(
    r"^\s*(\d{1,9})\s+(DAY|HOUR|MINUTE|SECOND|MILLISECOND|MICROSECOND)S?\s*$",
    re.IGNORECASE,
)


def _tolerance_interval(tolerance: str) -> Column:
    m = _TOLERANCE_RE.match(tolerance)
    if not m:
        raise ValueError(
            f"invalid asof tolerance {tolerance!r}: expected '<n> "
            "<day|hour|minute|second|millisecond|microsecond>[s]'"
        )
    n, unit = m.group(1), m.group(2).upper()
    return F.expr(f"INTERVAL {int(n)} {unit}")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value: str,
    value_alias: str = "asof_value",
    inclusive: bool = True,
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the ``right_value`` of the closest
    right row sharing the join key: the latest with ``right_ts <=
    left_ts`` (direction='backward') or the earliest with ``right_ts >=
    left_ts`` (direction='forward'); ``inclusive=False`` makes the
    bound strict. ``tolerance`` (an interval string, e.g. "2 hours")
    nulls the match when the carried row is further away than the
    bound — pandas ``merge_asof(tolerance=...)`` semantics, at the
    cost of one extra carried column, no plan change.

    Ties at equal timestamps are deterministic: a side tag sorts the
    right row inside or outside the carry frame.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    backward = direction == "backward"
    # Side ordering: the right row is visible at equal ts iff inclusive.
    # backward: carry frame is (preceding..current) → visible right
    # sorts BEFORE the left row; forward: frame is (current..following)
    # → visible right sorts AFTER.
    visible, hidden = (0, 2) if backward else (2, 0)
    lhs = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
        F.lit(None).cast(right.schema[right_value].dataType).alias("_val"),
    )
    rhs = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(visible if inclusive else hidden).alias("_side"),
        F.lit(None).cast(left.select(F.struct(*left.columns)).schema[0].dataType).alias(
            "_row"
        ),
        F.col(right_value).alias("_val"),
    )
    # Carry (right_ts, value) as ONE struct so the timestamp used for
    # the tolerance check always belongs to the same right row as the
    # carried value — two independently-carried columns desynchronize
    # when right_value is itself null.
    lhs = lhs.withColumn(
        "_pair",
        F.lit(None).cast(
            f"struct<_rts:timestamp,_v:{right.schema[right_value].dataType.simpleString()}>"
        ),
    )
    rhs = rhs.withColumn(
        "_pair",
        F.struct(
            F.col("_ts").cast("timestamp").alias("_rts"), F.col("_val").alias("_v")
        ),
    )
    w = Window.partitionBy("_k").orderBy("_ts", "_side")
    if backward:
        w = w.rowsBetween(Window.unboundedPreceding, 0)
        carried: Column = F.last("_pair", ignorenulls=True).over(w)
    else:
        w = w.rowsBetween(0, Window.unboundedFollowing)
        carried = F.first("_pair", ignorenulls=True).over(w)
    out = lhs.unionByName(rhs).withColumn("_carried", carried)
    value = F.col("_carried._v")
    if tolerance is not None:
        tol = _tolerance_interval(tolerance)
        bound = F.col("_ts") - tol if backward else F.col("_ts") + tol
        in_tol = (
            F.col("_carried._rts") >= bound
            if backward
            else F.col("_carried._rts") <= bound
        )
        value = F.when(in_tol, value)
    return (
        out.withColumn(value_alias, value)
        .where(F.col("_side") == 1)
        .select("_row.*", value_alias)
    )
