"""Sources — the receiver analogues (SURVEY.md §2.1).

Push receivers (OTLP gRPC/HTTP, receiver/otlpreceiver/otlp.go) have no
batch-mode equivalent; the source of a batch pipeline is a Parquet read.
"""

from .transcripts import read_transcripts, transcripts_from_events

__all__ = ["read_transcripts", "transcripts_from_events"]
