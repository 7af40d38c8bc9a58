"""Traces / metrics signal analogues over the transcript model.

The reference carries three signals through one pipeline architecture
(pdata/ptrace, pdata/pmetric — SURVEY.md §1.2). The flat-table
restatement:

- **spans**: one row per span — a transcript turn maps to a span whose
  trace is the conversation (trace_id = conv_id, span_id = (conv_id,
  turn_idx), duration = parsed latency_ms, name = action, kind from
  role). `Traces.SpanCount()` (pdata/ptrace) becomes row count;
  span-level aggregates are plain groupbys.
- **metrics**: cumulative→delta temporality conversion (the contrib
  ``cumulativetodeltaprocessor`` idiom; AggregationTemporality —
  pdata/pmetric/aggregation_temporality.go): per series (key), ordered
  by time, ``delta[i] = value[i] - value[i-1]`` with the first point
  kept as-is. Partitioning: series key co-location, same single
  shuffle shape as sessionize.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# imported at module top, NOT inside the batch fn: a function-body
# relative import would execute on the worker, where this package is
# only available through pickle-by-value (no importable install).
from .enrich import _dict_lookup

SPAN_KIND = {  # role → SpanKind (ptrace/span_kind.go:23-43 vocabulary)
    "user": "CLIENT",
    "assistant": "SERVER",
    "tool": "INTERNAL",
    "system": "INTERNAL",
}


def spans_batch(batch: pa.Table) -> pa.Table:
    """Parsed transcripts → span rows (trace_id, span_name, kind,
    duration_ms). Parse misses produce null-duration spans (kept — the
    collector never drops on conversion)."""

    def col(name):
        c = batch[name]
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    return pa.table(
        {
            "trace_id": col("conv_id"),
            "span_idx": col("turn_idx"),
            "span_name": pc.fill_null(col("action"), "unparsed"),
            "kind": _dict_lookup(batch["role"], SPAN_KIND, default="INTERNAL"),
            "duration_ms": col("latency_ms"),
        }
    )


def cumulative_to_delta(
    series: ray.data.Dataset,
    *,
    key: str,
    ts: str,
    value: str,
    order_tiebreak: str,
) -> ray.data.Dataset:
    """Per-series delta conversion: one groupby(key) shuffle, ordered
    diff inside the group. First point of each series keeps its value
    (the cumulativetodelta 'initial value' convention)."""

    def per_series(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts, order_tiebreak], kind="mergesort")
        v = g[value].to_numpy()
        delta = np.empty_like(v)
        delta[0] = v[0]
        delta[1:] = v[1:] - v[:-1]
        return g.assign(delta=delta)

    return series.groupby(key).map_groups(per_series, batch_format="pandas")
