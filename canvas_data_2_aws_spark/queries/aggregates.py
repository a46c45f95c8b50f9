"""Placeholder — filled in by build step (SURVEY §7)."""
