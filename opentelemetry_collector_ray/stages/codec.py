"""Codecs — the §1.3 serialization surface.

The reference exposes three interchangeable codecs per signal behind
Marshaler/Unmarshaler/Sizer (pdata/plog/encoding.go:17-43): OTLP
protobuf (pb.go), OTLP JSON (json.go), and the human-readable text form
of the logging exporter (exporter/loggingexporter/internal/otlptext).
Here: Parquet is the binary form, ``write_json``/``read_json`` the JSON
form (both exercised by the ``json_roundtrip`` query), and this module
adds the text form plus the Sizer.

- ``to_text_batch``: one rendered text line per record — the
  verbosity=detailed dump (logging_exporter.go:40-87), vectorized as
  pure Arrow string concatenation.
- ``table_size_bytes`` / ``rebatch_bytes``: the Sizer analogue — the
  reference sizes batches in encoded bytes to drive
  ``send_batch_size_bytes`` (batch_processor.go:267-270); here block
  payload bytes drive re-blocking.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def to_text_batch(batch: pa.Table) -> pa.Table:
    """Render each transcript record as the logging exporter's text
    form: one ``rendered`` string column keyed by (conv_id, turn_idx)."""

    def s(col):
        c = batch[col]
        c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        if not pa.types.is_string(c.type):
            c = pc.cast(c, pa.string())
        return pc.fill_null(c, "<nil>")

    parts = [
        pa.scalar("LogRecord conv_id="), s("conv_id"),
        pa.scalar(" turn_idx="), s("turn_idx"),
        pa.scalar(" role="), s("role"),
        pa.scalar(" tool="), s("tool"),
        pa.scalar(" body="), s("text"),
    ]
    rendered = pc.binary_join_element_wise(
        *[p if isinstance(p, pa.Array) else pa.scalar(str(p.as_py())) for p in parts],
        "",
    )
    return pa.table(
        {
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"],
            "rendered": rendered,
        }
    )


def to_ipc_batch(batch: pa.Table) -> pa.Table:
    """Binary marshal (the OTLP-protobuf slot, pdata/plog/pb.go:24-44):
    each batch becomes ONE wire message — an Arrow IPC stream payload
    (binary column) plus its record count, the ExportLogsServiceRequest
    framing restated. Arrow IPC is the engine's native binary encoding;
    a protobuf library is deliberately not reimplemented."""
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, batch.schema) as writer:
        writer.write_table(batch)
    payload = sink.getvalue().to_pybytes()
    return pa.table(
        {
            "payload": pa.array([payload], type=pa.binary()),
            "n_records": pa.array([len(batch)], type=pa.int64()),
        }
    )


def from_ipc_batch(batch: pa.Table) -> pa.Table:
    """Binary unmarshal: decode every IPC payload in the batch back to
    its record rows (pb.go unmarshal slot). Count invariance against
    ``n_records`` is asserted — a truncated payload fails loudly."""
    tables = []
    for payload, n in zip(
        batch["payload"].to_pylist(), batch["n_records"].to_pylist()
    ):
        t = pa.ipc.open_stream(pa.BufferReader(payload)).read_all()
        if len(t) != n:
            raise ValueError(f"payload decoded {len(t)} rows, framed {n}")
        tables.append(t)
    return pa.concat_tables(tables) if tables else pa.table({})


def table_size_bytes(batch: pa.Table) -> int:
    """Sizer: in-memory payload bytes of a batch (buffer sizes)."""
    return int(batch.nbytes)


def rebatch_bytes(
    ds: ray.data.Dataset, target_bytes: int, *, sample_rows: int = 1024
) -> ray.data.Dataset:
    """send_batch_size_bytes analogue: re-block so each downstream batch
    is ~``target_bytes``. Row width is estimated from one sampled batch
    (bytes are not addressable directly through ``map_batches``), then
    delegated to row-count re-batching."""
    from .batch import rebatch

    sample = ds.limit(sample_rows).take_batch(sample_rows, batch_format="pyarrow")
    width = max(table_size_bytes(sample) / max(sample.num_rows, 1), 1.0)
    rows = max(int(target_bytes / width), 1)
    return rebatch(ds, rows)
