"""Vector math over ArrayType(FloatType) columns — pure Catalyst.

Higher-order functions (``aggregate`` / ``zip_with``) keep the math
JVM-side inside whole-stage codegen — no Python UDF round trip. Floats
are promoted to double *element-wise before accumulation* so DuckDB's
``list_dot_product`` / ``list_cosine_similarity`` (which compute in
double) agree; graded outputs still ROUND(,4) because the promotion
point can differ in the last ulp (SURVEY §8.5).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: str, b: str) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (JVM-side, no shuffle)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def l2_norm(a: str) -> Column:
    """√(Σ aᵢ²)."""
    return F.sqrt(
        F.expr(
            f"aggregate({a}, CAST(0.0 AS DOUBLE),"
            " (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))"
        )
    )


def cosine_similarity(a: str, b: str) -> Column:
    """dot(a,b) / (‖a‖·‖b‖) — matches DuckDB list_cosine_similarity."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
