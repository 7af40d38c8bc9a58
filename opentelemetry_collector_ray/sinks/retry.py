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


class AttemptTimeout(Exception):
    """An attempt exceeded the per-attempt deadline (timeout sender,
    exporterhelper/common.go:194-209). Retryable by default."""


@dataclass
class RetryPolicy:
    initial_interval: float = 5.0   # queued_retry.go:270
    multiplier: float = 1.5         # :272
    max_interval: float = 30.0      # :273
    max_elapsed: float = 300.0      # :276
    # per-attempt deadline — the timeout sender, the last wrapper of the
    # exporter helper chain (common.go:194-209; reference default 5 s).
    # None disables (no deadline — the pre-round-2 behavior where a hung
    # sink write blocked retries forever).
    timeout: float | None = None
    # tests override sleep to count calls instead of waiting
    sleep = staticmethod(time.sleep)


def _call_with_deadline(fn, timeout: float | None):
    """Run ``fn()`` under a wall-clock deadline. Python can't cancel a
    running call, so a timed-out attempt's thread is ABANDONED (daemon
    executor thread; it may still complete in the background — safe here
    because sink writes are idempotent stage+swap). Mirrors the
    reference's context-deadline semantics: the send is given up on and
    handed to the retry sender, not waited out."""
    if not timeout:
        return fn()
    from concurrent.futures import ThreadPoolExecutor
    from concurrent.futures import TimeoutError as _FTimeout

    ex = ThreadPoolExecutor(max_workers=1)
    try:
        fut = ex.submit(fn)
        try:
            return fut.result(timeout=timeout)
        except _FTimeout:
            raise AttemptTimeout(
                f"attempt exceeded {timeout}s deadline"
            ) from None
    finally:
        ex.shutdown(wait=False)


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
            return _call_with_deadline(fn, policy.timeout)
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
