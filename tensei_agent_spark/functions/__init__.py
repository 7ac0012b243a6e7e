"""Scalar function surface: the transformer registry (SURVEY.md §2.7)."""

from .transformers import TRANSFORMERS, apply_chain, build  # noqa: F401
