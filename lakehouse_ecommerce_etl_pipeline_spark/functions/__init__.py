"""Scalar-function helpers (SURVEY.md §2.9 + extension tier)."""
