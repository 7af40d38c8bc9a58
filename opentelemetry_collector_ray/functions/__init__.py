"""Vectorized helper kernels and distributed relational primitives."""

from .join import broadcast_join, bucketed_hash_join

__all__ = ["broadcast_join", "bucketed_hash_join"]
