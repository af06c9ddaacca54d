"""Scalar / vectorized function layer (SURVEY.md §2.8)."""
