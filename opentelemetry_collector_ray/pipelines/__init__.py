"""Pipelines — DAG assembly (service/internal/graph analogue)."""

from .logs import build_transcript_pipeline, sink_counts, run_logs_pipeline

__all__ = ["build_transcript_pipeline", "sink_counts", "run_logs_pipeline"]
