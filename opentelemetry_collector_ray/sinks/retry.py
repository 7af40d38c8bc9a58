"""Retry with exponential backoff — the exporter retry-sender analogue.

Reference semantics (exporter/exporterhelper/queued_retry.go):
- defaults: initial 5 s, multiplier ×1.5, max interval 30 s, give up
  after 5 min elapsed (queued_retry.go:267-277);
- permanent errors drop immediately, no retry (queued_retry.go:399-407);
- retryable classification is the caller's (gRPC code / HTTP status
  tables in otlpexporter/otlp.go:128-199, otlphttpexporter/otlp.go:166-201)
  — here a predicate;
- a throttle hint (server Retry-After) overrides the computed backoff
  (queued_retry.go:418-427).

Used around sink writes; combined with atomic partition writes
(sinks/writers.py) a retried write is idempotent, which is what turns
the reference's at-least-once into effectively exactly-once.
"""

from __future__ import annotations

import time
from dataclasses import dataclass


class PermanentError(Exception):
    """Non-retryable — dropped immediately (consumererror.Permanent)."""


@dataclass
class RetryPolicy:
    initial_interval: float = 5.0   # queued_retry.go:270
    multiplier: float = 1.5         # :272
    max_interval: float = 30.0      # :273
    max_elapsed: float = 300.0      # :276
    # tests override sleep to count calls instead of waiting
    sleep = staticmethod(time.sleep)


def retry_call(
    fn,
    *,
    policy: RetryPolicy | None = None,
    is_retryable=lambda e: not isinstance(e, PermanentError),
    throttle_hint=lambda e: None,
):
    """Run ``fn()`` with collector-style backoff. Raises the last error
    when ``max_elapsed`` wall time (attempt durations INCLUDED, like the
    reference's elapsed-time bound) is exhausted or the error is
    permanent. The final wait is capped to the remaining budget."""
    policy = policy or RetryPolicy()
    interval = policy.initial_interval
    start = time.monotonic()
    slept = 0.0  # tests stub sleep, so track budget explicitly too
    while True:
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - classification decides
            if not is_retryable(e):
                raise
            elapsed = max(time.monotonic() - start, slept)
            remaining = policy.max_elapsed - elapsed
            if remaining <= 0:
                raise
            wait = min(throttle_hint(e) or interval, remaining)
            policy.sleep(wait)
            slept += wait
            interval = min(interval * policy.multiplier, policy.max_interval)
