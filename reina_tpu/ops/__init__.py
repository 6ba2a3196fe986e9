"""Vectorized primitives backing the engine (XLA + Pallas)."""

from .clamped import clamped_counter_grants  # noqa: F401
