"""Determinism-safe helper functions (SURVEY §8 recipes)."""

from .numeric import davg, dec6, dsum, dsum_col  # noqa: F401
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
