"""OTLP/JSON traces interchange — ``ExportTraceServiceRequest``.

The reference's trace codec round-trips ``resourceSpans[] >
scopeSpans[] > spans[]`` (pdata/ptrace/json.go:27-49,
pdata/ptrace/pb.go:24-44) with the OTLP-JSON deviation from plain
proto3 JSON: trace/span IDs are HEX strings on the JSON wire (the Go
codec implements custom ID marshaling — pdata/pcommon/trace_id.go),
while the binary wire carries raw bytes. This module is the traces
sibling of ``otlp_json.py``: the same vectorized nest (change-point
grouping → ListArray offsets) and flatten (list_flatten /
parent_indices) halves over the span tree, so a user can point the
engine at genuine OTel trace-export NDJSON and write it back out.

Deterministic transcript mapping (mirrored by the
``otlp_traces_flatten`` oracle — DuckDB shares ``md5``):

- trace_id   = md5(conv_id)                       (32 hex = 16 bytes)
- span_id    = md5(conv_id ':' turn_idx)[:16]     (16 hex = 8 bytes)
- parent     = md5(conv_id ':' turn_idx-1)[:16], roots (turn 0) unset
- name       = parsed action, 'unparsed' on parse miss
- kind       = role → SpanKind int (user=3 CLIENT, assistant=2 SERVER,
               tool/system=1 INTERNAL — ptrace/span_kind.go vocabulary)
- start      = ts (ns); end = start + latency_ms (ns), end=start on miss
- status     = {code: 2 STATUS_ERROR} for [ERROR] turns, unset otherwise
               (an absent Status reads back as code 0 UNSET, the pdata
               embedded-struct default — ptrace/status.go)
- resource   = service.name from the tool dimension; scope = otelray.<role>

The md5 IDs run per row at the codec boundary only (same cost class as
the one ``json.dumps`` per request); trace IDs are hashed once per
UNIQUE conv_id via factorize.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..schema import DIM_TOOL_SERVICE
from . import wirefs
from .otlp_json import REQUEST_ROWS
from ..stages.parse import GROK_PATTERN
from .otlp_json import (
    _require_non_null_keys,
    _KV,
    _NdjsonWriter,
    _attr_first,
    _i64_strings,
    _kv_list,
    _md5_hex,
    _ndjson_requests,
    _opt_field,
    _str,
)

# role → SpanKind integer (trace.proto SpanKind enum)
KIND_INT = {"user": 3, "assistant": 2, "tool": 1, "system": 1}
STATUS_CODE_ERROR = 2  # trace.proto StatusCode.STATUS_CODE_ERROR

_STATUS = pa.struct([pa.field("code", pa.int64())])
_EVENT = pa.struct(
    [
        pa.field("timeUnixNano", pa.string()),
        pa.field("name", pa.string()),
    ]
)
_LINK = pa.struct(
    [
        pa.field("traceId", pa.string()),
        pa.field("spanId", pa.string()),
    ]
)


def nest_otlp_traces_batch(t: pa.Table) -> pa.Table:
    """Transcript rows → ONE ExportTraceServiceRequest row (the marshal
    half, ptrace/json.go MarshalTraces): spans grouped into scopes by
    role, scopes into resources by derived service.name."""
    _require_non_null_keys(t)
    n = len(t)
    df = pd.DataFrame(
        {
            "service": pd.Series(_str(t["tool"])).fillna("").map(
                lambda x: DIM_TOOL_SERVICE.get(x, "unknown")
            ),
            "role": _str(t["role"]),
            "conv_id": _str(t["conv_id"]),
            "turn_idx": t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64),
            "tool": _str(t["tool"]),
            "text": _str(t["text"]),
            "ts_us": pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False),
        }
    )
    df = df.sort_values(
        ["service", "role", "conv_id", "turn_idx"], kind="mergesort"
    ).reset_index(drop=True)
    svc = df["service"].to_numpy(dtype=object)
    rol = df["role"].to_numpy(dtype=object)
    conv = df["conv_id"].to_numpy(dtype=object)
    turn = df["turn_idx"].to_numpy()

    # ---- span identity (hex wire form; trace id hashed per UNIQUE conv)
    conv_codes, conv_uniq = pd.factorize(df["conv_id"])
    trace_hex = _md5_hex(np.asarray(conv_uniq, dtype=object), 32)[conv_codes]
    turn_str = turn.astype("U").astype(object)
    span_keys = np.char.add(
        np.char.add(conv.astype("U"), ":"), turn_str.astype("U")
    ).astype(object)
    span_hex = _md5_hex(span_keys, 16)
    parent_keys = np.char.add(
        np.char.add(conv.astype("U"), ":"), (turn - 1).astype("U")
    ).astype(object)
    parent_hex = _md5_hex(parent_keys, 16)
    parent_hex = np.where(turn > 0, parent_hex, None)

    # ---- parsed fields (one RE2 pass, same grammar as stages/parse.py)
    text_arr = pa.array(df["text"].to_numpy(dtype=object), type=pa.string())
    extracted = pc.extract_regex(text_arr, GROK_PATTERN)
    ok = extracted.is_valid()
    null_str = pa.scalar(None, type=pa.string())
    name = pc.fill_null(
        pc.if_else(ok, extracted.field("action"), null_str), "unparsed"
    )
    latency_ms = pc.cast(
        pc.fill_null(
            pc.if_else(ok, extracted.field("latency_ms"), null_str), "0"
        ),
        pa.int64(),
    ).to_numpy(zero_copy_only=False)
    level = pc.if_else(ok, extracted.field("level"), null_str)
    is_error = pc.equal(pc.fill_null(level, ""), "ERROR")

    # keep UNSCALED microseconds here; _i64_strings scales by 1000 in
    # int64 (a null-holding float64 array times 1000 exceeds 2^53 and
    # corrupts every neighbor's nanoseconds)
    start_us = df["ts_us"].to_numpy()
    end_us = start_us + latency_ms * 1000
    kind = pa.array(
        pd.Series(rol).map(KIND_INT).fillna(1).astype(np.int64),
        type=pa.int64(),
    )
    # status: present (code=2) only on ERROR turns — unset otherwise, so
    # _strip_nulls omits it from both wires (proto3 default semantics).
    # Null-ness rides the StructArray validity mask (if_else lacks
    # struct support in this pyarrow).
    code_arr = pa.array(
        np.full(n, STATUS_CODE_ERROR, dtype=np.int64), type=pa.int64()
    )
    err_mask = np.asarray(
        pc.fill_null(is_error, False).to_numpy(zero_copy_only=False),
        dtype=bool,
    )
    status = pa.StructArray.from_arrays(
        [code_arr], names=["code"], mask=pa.array(~err_mask)
    )

    # span events: ONE event per span (the parsed action fired at span
    # start — generated_span.go:59-184 span-event surface); span links:
    # non-root spans link to their trace's ROOT span (turn 0), the
    # groupbytrace causal anchor. Both are repeated nested messages
    # inside Span on the wire.
    start_str = _i64_strings(start_us, scale=1000)
    events = pa.ListArray.from_arrays(
        pa.array(np.arange(n + 1, dtype=np.int32), type=pa.int32()),
        pa.StructArray.from_arrays(
            [
                pa.array(start_str, type=pa.string()),
                name,
            ],
            names=["timeUnixNano", "name"],
        ),
    )
    root_keys = np.char.add(conv.astype("U"), ":0").astype(object)
    root_hex = _md5_hex(root_keys, 16)
    has_link = turn > 0
    link_off = np.concatenate(([0], np.cumsum(has_link.astype(np.int32))))
    link_rows = np.flatnonzero(has_link)
    links = pa.ListArray.from_arrays(
        pa.array(link_off, type=pa.int32()),
        pa.StructArray.from_arrays(
            [
                pa.array(trace_hex[link_rows], type=pa.string()),
                pa.array(root_hex[link_rows], type=pa.string()),
            ],
            names=["traceId", "spanId"],
        ),
    )

    # span attributes: conv.id / turn.index / tool — 3 entries per span
    keys = np.empty(3 * n, dtype=object)
    svals = np.empty(3 * n, dtype=object)
    ivals = np.empty(3 * n, dtype=object)
    keys[0::3], keys[1::3], keys[2::3] = "conv.id", "turn.index", "tool"
    svals[0::3] = conv
    svals[1::3] = None
    svals[2::3] = df["tool"].to_numpy(dtype=object)
    ivals[0::3] = None
    ivals[1::3] = turn_str
    ivals[2::3] = None
    span_attrs = _kv_list(keys, svals, ivals, np.arange(0, 3 * n + 3, 3))

    spans = pa.StructArray.from_arrays(
        [
            pa.array(trace_hex, type=pa.string()),
            pa.array(span_hex, type=pa.string()),
            pa.array(parent_hex, type=pa.string()),
            name,
            kind,
            pa.array(_i64_strings(start_us, scale=1000), type=pa.string()),
            pa.array(_i64_strings(end_us, scale=1000), type=pa.string()),
            span_attrs,
            events,
            links,
            status,
        ],
        names=[
            "traceId",
            "spanId",
            "parentSpanId",
            "name",
            "kind",
            "startTimeUnixNano",
            "endTimeUnixNano",
            "attributes",
            "events",
            "links",
            "status",
        ],
    )

    # ---- scope groups: change points of (service, role)
    if n:
        sc_change = np.flatnonzero(
            np.concatenate(
                ([True], (svc[1:] != svc[:-1]) | (rol[1:] != rol[:-1]))
            )
        )
    else:
        sc_change = np.empty(0, np.int64)
    sc_off = np.append(sc_change, n).astype(np.int32)
    span_lists = pa.ListArray.from_arrays(pa.array(sc_off, type=pa.int32()), spans)
    n_scope = len(sc_change)
    scope = pa.StructArray.from_arrays(
        [
            pa.array(
                np.char.add("otelray.", rol[sc_change].astype("U")),
                type=pa.string(),
            ),
            pa.array(["1.0"] * n_scope, type=pa.string()),
        ],
        names=["name", "version"],
    )
    scopes = pa.StructArray.from_arrays([scope, span_lists], names=["scope", "spans"])

    # ---- resource groups: change points of service over scope groups
    svc_per_scope = svc[sc_change]
    if n_scope:
        rs_change = np.flatnonzero(
            np.concatenate(([True], svc_per_scope[1:] != svc_per_scope[:-1]))
        )
    else:
        rs_change = np.empty(0, np.int64)
    rs_off = np.append(rs_change, n_scope).astype(np.int32)
    scope_spans = pa.ListArray.from_arrays(pa.array(rs_off, type=pa.int32()), scopes)
    n_res = len(rs_change)
    res_svc = svc_per_scope[rs_change] if n_scope else np.empty(0, object)
    res_attrs = _kv_list(
        np.full(n_res, "service.name", dtype=object),
        np.asarray(res_svc, dtype=object),
        np.full(n_res, None, dtype=object),
        np.arange(n_res + 1),
    )
    resource = pa.StructArray.from_arrays([res_attrs], names=["attributes"])
    res_entries = pa.StructArray.from_arrays(
        [resource, scope_spans], names=["resource", "scopeSpans"]
    )
    resource_spans = pa.ListArray.from_arrays(
        pa.array([0, n_res], type=pa.int32()), res_entries
    )
    return pa.table({"resourceSpans": resource_spans})


_EMPTY_FLAT = {
    "service": pa.string(),
    "scope_name": pa.string(),
    "scope_version": pa.string(),
    "trace_id": pa.string(),
    "span_id": pa.string(),
    "parent_span_id": pa.string(),
    "name": pa.string(),
    "kind": pa.int64(),
    "start_unix_nano": pa.int64(),
    "end_unix_nano": pa.int64(),
    "status_code": pa.int64(),
    "event_name": pa.string(),
    "link_span_id": pa.string(),
    "conv_id": pa.string(),
    "turn_idx": pa.int32(),
    "tool": pa.string(),
}


def _first_struct_field(lst, n: int, field: str, typ) -> np.ndarray:
    """First list element's ``field`` per parent row (null when the
    list is empty/null) — vectorized Get over a repeated message."""
    parents = pc.list_parent_indices(lst).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lst)
    vals = np.asarray(
        _opt_field(flat, field, typ).to_numpy(zero_copy_only=False),
        dtype=object,
    )
    out = np.full(n, None, dtype=object)
    out[parents[::-1]] = vals[::-1]  # reversed → FIRST element wins
    return out


def flatten_otlp_traces_batch(t: pa.Table) -> pa.Table:
    """ExportTraceServiceRequest rows → flat span table (the unmarshal
    half, ptrace/json.go UnmarshalTraces): resource/scope context
    denormalized onto every span; an absent status reads back as
    code 0 (UNSET — the pdata embedded-Status default)."""
    if "resourceSpans" not in t.column_names:
        return pa.table(
            {k: pa.array([], type=v) for k, v in _EMPTY_FLAT.items()}
        )
    rs = t["resourceSpans"]
    if isinstance(rs, pa.ChunkedArray):
        rs = rs.combine_chunks()
    res = pc.list_flatten(rs)
    n_res = len(res)
    resource = _opt_field(
        res, "resource", pa.struct([("attributes", pa.list_(_KV))])
    )
    service = _attr_first(
        _opt_field(resource, "attributes", pa.list_(_KV)),
        n_res,
        "service.name",
        "stringValue",
    )

    sl = res.field("scopeSpans")
    scope_parent = pc.list_parent_indices(sl).to_numpy(zero_copy_only=False)
    scopes = pc.list_flatten(sl)
    scope_struct = _opt_field(
        scopes, "scope", pa.struct([("name", pa.string()), ("version", pa.string())])
    )
    scope_name = _opt_field(scope_struct, "name", pa.string())
    scope_version = _opt_field(scope_struct, "version", pa.string())

    sp = scopes.field("spans")
    span_parent = pc.list_parent_indices(sp).to_numpy(zero_copy_only=False)
    spans = pc.list_flatten(sp)
    n_span = len(spans)

    res_idx = scope_parent[span_parent] if n_span else np.empty(0, np.int64)
    take_scope = pa.array(span_parent, type=pa.int64())

    span_attrs = _opt_field(spans, "attributes", pa.list_(_KV))
    conv_id = _attr_first(span_attrs, n_span, "conv.id", "stringValue")
    turn_raw = _attr_first(span_attrs, n_span, "turn.index", "intValue")
    tool = _attr_first(span_attrs, n_span, "tool", "stringValue")
    turn_idx = pc.cast(
        pc.cast(pa.array(turn_raw, type=pa.string()), pa.int64()), pa.int32()
    )
    status = _opt_field(spans, "status", _STATUS)
    # .field() ignores the parent struct's null mask (the CLAUDE.md
    # trap): an unset status must read as code 0, not as whatever the
    # child buffer holds — re-mask by parent validity, then fill.
    code_child = pc.cast(_opt_field(status, "code", pa.int64()), pa.int64())
    status_code = pc.fill_null(
        pc.if_else(
            pc.is_valid(status), code_child, pa.scalar(None, pa.int64())
        ),
        0,
    )

    empty_str = pa.array([], type=pa.string())
    return pa.table(
        {
            "service": pa.array(service, type=pa.string()).take(
                pa.array(res_idx, type=pa.int64())
            )
            if n_span
            else empty_str,
            "scope_name": scope_name.take(take_scope) if n_span else empty_str,
            "scope_version": scope_version.take(take_scope)
            if n_span
            else empty_str,
            "trace_id": _opt_field(spans, "traceId", pa.string()),
            "span_id": _opt_field(spans, "spanId", pa.string()),
            "parent_span_id": _opt_field(spans, "parentSpanId", pa.string()),
            "name": _opt_field(spans, "name", pa.string()),
            "kind": pc.fill_null(
                pc.cast(_opt_field(spans, "kind", pa.int64()), pa.int64()), 0
            ),
            "start_unix_nano": pc.cast(
                _opt_field(spans, "startTimeUnixNano", pa.string()), pa.int64()
            ),
            "end_unix_nano": pc.cast(
                _opt_field(spans, "endTimeUnixNano", pa.string()), pa.int64()
            ),
            "status_code": status_code,
            "event_name": pa.array(
                _first_struct_field(
                    _opt_field(spans, "events", pa.list_(_EVENT)),
                    n_span,
                    "name",
                    pa.string(),
                ),
                type=pa.string(),
            ),
            "link_span_id": pa.array(
                _first_struct_field(
                    _opt_field(spans, "links", pa.list_(_LINK)),
                    n_span,
                    "spanId",
                    pa.string(),
                ),
                type=pa.string(),
            ),
            "conv_id": pa.array(conv_id, type=pa.string()),
            "turn_idx": turn_idx,
            "tool": pa.array(tool, type=pa.string()),
        }
    )


def write_otlp_traces_json(
    ds: ray.data.Dataset,
    out_dir: str,
    compression: str | None = None,
    rows_per_request: int | None = None,
    *,
    requests_per_file: int | None = None,
    filesystem=None,
    storage_options: dict | None = None,
    overwrite: bool = True,
) -> int:
    """Marshal: one ExportTraceServiceRequest JSON object per request,
    ``requests_per_file`` requests per NDJSON file (null fields
    omitted — the proto3 JSON wire form, IDs in hex), optionally
    wire-compressed. ``out_dir`` may be a filesystem URI. Returns the
    number of requests written."""
    fs, dir_path = wirefs.resolve_fs(out_dir, filesystem, storage_options)
    wirefs.prepare_dir(fs, dir_path, overwrite)
    nested = ds.map_batches(
        nest_otlp_traces_batch,
        batch_format="pyarrow",
        batch_size=rows_per_request or REQUEST_ROWS,
    )
    written = nested.map_batches(
        _NdjsonWriter(dir_path, compression, filesystem=fs),
        batch_format="pyarrow",
        batch_size=requests_per_file or wirefs.REQUESTS_PER_FILE,
    ).sum("rows")
    return int(written or 0)


def read_otlp_traces_json(paths, filesystem=None) -> ray.data.Dataset:
    """Unmarshal: NDJSON of ExportTraceServiceRequest → flat spans."""
    return _ndjson_requests(paths, filesystem).map_batches(
        flatten_otlp_traces_batch, batch_format="pyarrow"
    )
