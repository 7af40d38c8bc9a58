"""Vectorized helper kernels and distributed relational primitives."""

from .join import asof_join, broadcast_join, bucketed_hash_join

__all__ = ["asof_join", "broadcast_join", "bucketed_hash_join"]
