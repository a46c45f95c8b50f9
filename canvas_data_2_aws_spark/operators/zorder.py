"""Z-order (Morton) interleaving for multi-dimensional data layout.

At 100 TB a replica is read by many query shapes; sorting files by one
key gives min/max data-skipping on that key only. Interleaving the bits
of two keys into one sort value gives every file a narrow rectangle in
BOTH dimensions, so footer min/max stats prune scans for either
predicate — the lakehouse ``OPTIMIZE ZORDER BY`` primitive, built here
from plain integer arithmetic so it runs identically in any engine
(and hash-matches the DuckDB oracle).
"""

from __future__ import annotations

BITS = 16


def z_expr(x: str, y: str, bits: int = BITS) -> str:
    """SQL expression interleaving the low ``bits`` of ``x`` (even bit
    positions) and ``y`` (odd positions) into a Morton value.

    Pure ``>>``/``&``/``*``/``+`` on BIGINT — the same string parses
    and evaluates identically in Spark SQL and DuckDB, which is what
    makes the layout op oracle-checkable. Constant-folded per row into
    one codegen expression (no UDF, no join)."""
    terms = []
    for k in range(bits):
        terms.append(f"((({x} >> {k}) & 1) * {1 << (2 * k)})")
        terms.append(f"((({y} >> {k}) & 1) * {1 << (2 * k + 1)})")
    return "(" + " + ".join(terms) + ")"
