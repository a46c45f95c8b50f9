"""Differential-comparison helpers shared by unit tests.

Mirrors the driver's t2 gate: row count, column-name set, and
order-insensitive canonical value equality (floats bit-exact).
"""

from __future__ import annotations

import datetime as dt
import math


def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else float.hex(v)
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, dt.datetime):
        return "ts:" + v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, dt.date):
        return "date:" + v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return "bytes:" + v.hex()
    return f"{type(v).__name__}:{v}"


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def assert_matches_oracle(sdf, duck_con, oracle_sql: str):
    """Assert a Spark DataFrame hash-matches DuckDB output of oracle_sql."""
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = sdf.columns
    cur = duck_con.execute(oracle_sql)
    d_cols = [d[0] for d in cur.description]
    d_rows = cur.fetchall()
    assert sorted(s_cols) == sorted(d_cols), (sorted(s_cols), sorted(d_cols))
    assert len(s_rows) == len(d_rows), (len(s_rows), len(d_rows))
    cs, cd = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
    diffs = [(a, b) for a, b in zip(cs, cd) if a != b]
    assert not diffs, diffs[:3]
