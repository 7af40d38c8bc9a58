"""Batch-sizing stage — the batch processor re-expressed as block shaping.

Reference: the batch processor accumulates items and emits when
``itemCount >= send_batch_size`` or a timeout fires, capping emissions
at ``send_batch_max_size`` via split
(processor/batchprocessor/batch_processor.go:39-41,114-155,323-368;
splitlogs.go:22-76). In a batch engine the timeout trigger is
meaningless; the size semantics map onto explicit block shaping before a
sink:

- ``rebatch(ds, rows)`` — coalesce/split so each downstream block/task
  sees ~``rows`` rows (``map_batches(identity, batch_size=rows)``): the
  send_batch_size analogue.
- ``split_table(tbl, max_rows)`` — the splitLogs primitive: cut a batch
  into ≤max_rows slices (zero-copy ``Table.slice``).
- ``BatchSizeObserver`` — records the batch_send_size /
  batch_size_trigger_send telemetry (batchprocessor/metrics.go:111-219)
  as counters on the driver-collected partials.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


def split_table(tbl: pa.Table, max_rows: int) -> list[pa.Table]:
    """splitLogs analogue (splitlogs.go:22-76): zero-copy slices of at
    most ``max_rows`` rows, order-preserving, envelope-free (flat)."""
    if max_rows <= 0:
        raise ValueError("max_rows must be positive")
    return [
        tbl.slice(off, max_rows) for off in range(0, max(tbl.num_rows, 1), max_rows)
    ]


def rebatch(
    ds: ray.data.Dataset, rows: int, *, num_blocks: int | None = None
) -> ray.data.Dataset:
    """Reshape block sizes: the send_batch_size knob.

    ``rows`` bounds the rows per BLOCK downstream of this point
    (``repartition(target_num_rows_per_block=...)`` — a map_batches
    ``batch_size`` alone only shapes that one stage's UDF input, not
    the emitted blocks); ``num_blocks`` instead coalesces/splits to a
    fixed block count, e.g. to bound the number of output files a
    following ``write_parquet`` produces — the "batch before the
    exporter for sink efficiency" purpose of the reference's batch
    processor. The two are mutually exclusive shapes; ``num_blocks``
    wins when given.
    """
    if num_blocks is not None:
        return ds.repartition(num_blocks)
    return ds.repartition(target_num_rows_per_block=rows)
