"""Scalar / vectorized function surface of the engine (SURVEY.md §2.8, §2.10)."""
