"""State — metrics counters and checkpoint ledger (SURVEY.md §2.2/§4)."""

from .metrics import MetricsActor, get_metrics_actor

__all__ = ["MetricsActor", "get_metrics_actor"]
