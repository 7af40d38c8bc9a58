"""Route stage — the fan-out consumer re-expressed as row tagging.

Reference: ``fanoutconsumer`` hands one batch to N downstream consumers,
cloning only for mutating consumers (service/internal/fanoutconsumer/
logs.go:35-85); the connector Router restricts the fan-out per content
(logs.go:87-132). Arrow blocks are immutable, so fan-out needs no clone
at all: each row is tagged with the set of sinks it belongs to, and each
sink's exporter is a filter + write over the SAME underlying blocks.

Routing rules (fixture semantics, FIXTURES.md §3): every row → its
``route`` sink; rows with level == 'ERROR' additionally → the 'errors'
sink. Rows can land in ≥2 sinks — the multi-exporter pipeline case of
graph_test.go (one batch asserted to arrive at each exporter).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import ERROR_SINK


def route_batch(batch: pa.Table) -> pa.Table:
    """Append ``sinks: list<string>`` — the sink set per row."""
    route = batch["route"].combine_chunks() if isinstance(
        batch["route"], pa.ChunkedArray
    ) else batch["route"]
    is_err = pc.equal(pc.fill_null(batch["level"], ""), "ERROR")
    mask = np.asarray(is_err.combine_chunks() if isinstance(is_err, pa.ChunkedArray) else is_err)
    route_np = np.asarray(route).astype(object)

    counts = 1 + mask.astype(np.int64)
    offsets = np.zeros(len(batch) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    values = np.empty(offsets[-1], dtype=object)
    values[offsets[:-1]] = route_np
    values[offsets[1:][mask] - 1] = ERROR_SINK

    sinks = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        pa.array(values, type=pa.string()),
    )
    return batch.append_column("sinks", sinks)


def explode_sinks_batch(batch: pa.Table) -> pa.Table:
    """One output row per (input row, sink) — the exploded routing table
    used for per-sink aggregates and routed-row-equality checks.

    Vectorized as two takes (base: every row with sink=route; extra:
    ERROR rows with sink='errors') concatenated — no per-row Python.
    Works on batches WITHOUT a ``sinks`` column (it derives the same
    rule), so it composes directly after enrich.
    """
    base = batch.append_column(
        "sink",
        batch["route"].combine_chunks()
        if isinstance(batch["route"], pa.ChunkedArray)
        else batch["route"],
    )
    err_mask = pc.equal(pc.fill_null(batch["level"], ""), "ERROR")
    extra = batch.filter(err_mask)
    extra = extra.append_column(
        "sink", pa.array([ERROR_SINK] * len(extra), type=pa.string())
    )
    return pa.concat_tables([base, extra])
