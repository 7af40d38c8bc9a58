"""Sinks — exporter analogues (SURVEY.md §2.2)."""

from .writers import atomic_write_parquet, logging_sink, write_sinks

__all__ = ["atomic_write_parquet", "logging_sink", "write_sinks"]
