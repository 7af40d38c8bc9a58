"""OTLP/JSON logs interchange — the real nested wire shape.

The reference's JSON codec round-trips ``ExportLogsServiceRequest``:
``resourceLogs[] > scopeLogs[] > logRecords[]`` with resource/scope
attributes as ``[{key, value:{stringValue|intValue}}]`` entry lists and
``timeUnixNano`` as a decimal STRING (proto3 JSON fixed64 —
pdata/plog/json.go:27-49, pdata/plog/pb.go:24-44). This module is the
flatten/unflatten pair between that tree and the engine's flat
transcript table, so a user can point the engine at genuine OTel
export NDJSON (one request per line) and write it back out.

Both directions are vectorized:

- **nest** sorts a batch by (service, scope), finds group boundaries
  with numpy change-points, and assembles the tree bottom-up from
  ``pa.ListArray.from_arrays`` offsets — one request row per batch
  (the reference marshals one request per pdata batch).
- **flatten** walks the tree top-down with ``pc.list_flatten`` +
  ``pc.list_parent_indices``, denormalizing resource/scope context
  onto each record and extracting attribute entries with first-match
  masks — no per-row Python.

Deterministic transcript mapping (the fixture contract, mirrored by
the ``otlp_json_flatten`` oracle): resource identity =
``service.name`` = DIM_TOOL_SERVICE[tool] (the enrich dimension);
scope = ``otelray.<role>`` v1.0; severityText = the ``[LEVEL]`` text
prefix, severityNumber per plog/severity_number.go; body = the raw
turn text; record attributes carry conv.id / turn.index / tool.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..schema import DIM_TOOL_SERVICE, SEVERITY_NUMBER
from . import wirefs

_ANYVALUE = pa.struct(
    [pa.field("stringValue", pa.string()), pa.field("intValue", pa.string())]
)
_KV = pa.struct([pa.field("key", pa.string()), pa.field("value", _ANYVALUE)])


def _kv_list(
    keys: np.ndarray,
    str_vals: np.ndarray,
    int_vals: np.ndarray,
    offsets: np.ndarray,
) -> pa.ListArray:
    entries = pa.StructArray.from_arrays(
        [
            pa.array(keys, type=pa.string()),
            pa.StructArray.from_arrays(
                [
                    pa.array(str_vals, type=pa.string()),
                    pa.array(int_vals, type=pa.string()),
                ],
                names=["stringValue", "intValue"],
            ),
        ],
        names=["key", "value"],
    )
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), entries)


def _md5_hex(keys: np.ndarray, width: int) -> np.ndarray:
    """Deterministic hex IDs (DuckDB shares md5, so oracles mirror
    them verbatim). Codec-boundary cost only — trace IDs hash once per
    UNIQUE conv via factorize at the call sites."""
    import hashlib

    out = np.empty(len(keys), dtype=object)
    for i, k in enumerate(keys):
        out[i] = hashlib.md5(k.encode()).hexdigest()[:width]
    return out


def _i64_strings(vals: np.ndarray, scale: int = 1) -> np.ndarray:
    """int64-as-string proto3 JSON wire form, None where the input is
    null — a blind ``astype("U")`` on a NaN-holding float array writes
    the literal string "nan" onto the wire and crashes every reader
    (the CLAUDE.md NaN→astype bug class, found by review).

    ``scale`` multiplies AFTER the int64 conversion: one null in a
    batch makes the whole array float64, and scaling epoch-microseconds
    by 1000 in float64 exceeds 2^53 — every other timestamp in the
    batch would come back ±hundreds of ns off (found by review)."""
    out = np.empty(len(vals), dtype=object)
    if vals.dtype.kind == "f":
        mask = np.isnan(vals)
        ints = np.where(mask, 0, vals).astype(np.int64) * scale
        out[:] = ints.astype("U").astype(object)
        out[mask] = None
    else:
        out[:] = (vals.astype(np.int64) * scale).astype("U").astype(object)
    return out


def _str(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_string(col.type):
        col = pc.cast(col, pa.string())
    return np.asarray(col.to_numpy(zero_copy_only=False), dtype=object)


def _require_non_null_keys(
    t: pa.Table, cols=("conv_id", "role", "turn_idx")
) -> None:
    """OTLP identity (trace/span IDs, scope names) derives from these
    columns via numpy ops that corrupt nulls instead of propagating
    them — string columns stringify null to 'None', and turn_idx goes
    through ``.astype(np.int64)`` where NaN becomes INT64_MIN (the
    CLAUDE.md quirk) and would mint a bogus-but-valid
    -9223372036854775808 turn identity. The transcripts derivation
    guarantees non-null; EXTERNAL callers must fail loudly (ADVICE r3
    + review finding r4)."""
    for c in cols:
        if c in t.column_names:
            nulls = pc.sum(pc.cast(pc.is_null(t[c]), pa.int64())).as_py()
            if nulls:
                raise ValueError(
                    f"nest_otlp*: column {c!r} has {nulls} null value(s); "
                    "OTLP identity keys derive from it and null would "
                    "corrupt to 'None'/INT64_MIN. Filter or fill nulls "
                    "before marshaling."
                )


def nest_otlp_batch(t: pa.Table) -> pa.Table:
    """Transcript rows → ONE ExportLogsServiceRequest row (the marshal
    half, plog/json.go MarshalLogs): records grouped into scopes by
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

    # ---- logRecords (one per row, in sorted order)
    lvl = pc.extract_regex(
        pa.array(df["text"].to_numpy(dtype=object), type=pa.string()),
        r"^\[(?P<lvl>[A-Z]+)\]",
    )
    # .field() ignores the parent struct's null mask (a non-matching
    # extract_regex row surfaces as "" in the child) — re-mask so
    # unparsed rows are NULL and both wire codecs omit the field.
    sev_text = pc.if_else(
        pc.is_valid(lvl), lvl.field("lvl"), pa.scalar(None, pa.string())
    )
    sev_num = pa.array(
        pd.Series(sev_text.to_numpy(zero_copy_only=False)).map(SEVERITY_NUMBER),
        type=pa.int64(),
    )
    time_ns = pa.array(
        _i64_strings(df["ts_us"].to_numpy(), scale=1000), type=pa.string()
    )
    # log-trace correlation (logs.proto LogRecord.trace_id=9/span_id=10;
    # the logs data model's RequestContext section): every record points
    # at the span of its own turn — the SAME md5 scheme as the traces
    # codec, so a correlated trace lookup round-trips across signals.
    # Hex on the JSON wire, raw bytes on the binary wire.
    conv_codes, conv_uniq = pd.factorize(df["conv_id"])
    trace_hex = _md5_hex(np.asarray(conv_uniq, dtype=object), 32)[conv_codes]
    span_keys = np.char.add(
        np.char.add(df["conv_id"].to_numpy(dtype=object).astype("U"), ":"),
        df["turn_idx"].to_numpy().astype("U"),
    ).astype(object)
    span_hex = _md5_hex(span_keys, 16)
    body = pa.StructArray.from_arrays(
        [pa.array(df["text"].to_numpy(dtype=object), type=pa.string())],
        names=["stringValue"],
    )
    # record attributes: conv.id / turn.index / tool — 3 entries per record
    keys = np.empty(3 * n, dtype=object)
    svals = np.empty(3 * n, dtype=object)
    ivals = np.empty(3 * n, dtype=object)
    keys[0::3], keys[1::3], keys[2::3] = "conv.id", "turn.index", "tool"
    svals[0::3] = df["conv_id"].to_numpy(dtype=object)
    svals[1::3] = None
    svals[2::3] = df["tool"].to_numpy(dtype=object)
    ivals[0::3] = None
    ivals[1::3] = df["turn_idx"].to_numpy().astype("U").astype(object)
    ivals[2::3] = None
    rec_attrs = _kv_list(keys, svals, ivals, np.arange(0, 3 * n + 3, 3))
    records = pa.StructArray.from_arrays(
        [
            time_ns,
            sev_num,
            # left NULL when the text has no [LEVEL] prefix: proto3
            # omits unset fields, and the binary wire (otlp_pb) cannot
            # distinguish "" from unset — both codecs omit it.
            sev_text,
            body,
            rec_attrs,
            pa.array(trace_hex, type=pa.string()),
            pa.array(span_hex, type=pa.string()),
        ],
        names=[
            "timeUnixNano",
            "severityNumber",
            "severityText",
            "body",
            "attributes",
            "traceId",
            "spanId",
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
    log_records = pa.ListArray.from_arrays(pa.array(sc_off, type=pa.int32()), records)
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
    scopes = pa.StructArray.from_arrays(
        [scope, log_records], names=["scope", "logRecords"]
    )

    # ---- resource groups: change points of service over scope groups
    svc_per_scope = svc[sc_change]
    if n_scope:
        rs_change = np.flatnonzero(
            np.concatenate(([True], svc_per_scope[1:] != svc_per_scope[:-1]))
        )
    else:
        rs_change = np.empty(0, np.int64)
    rs_off = np.append(rs_change, n_scope).astype(np.int32)
    scope_logs = pa.ListArray.from_arrays(pa.array(rs_off, type=pa.int32()), scopes)
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
        [resource, scope_logs], names=["resource", "scopeLogs"]
    )
    resource_logs = pa.ListArray.from_arrays(
        pa.array([0, n_res], type=pa.int32()), res_entries
    )
    return pa.table({"resourceLogs": resource_logs})


def _attr_first(kvlist: pa.ListArray, n: int, key: str, field: str) -> np.ndarray:
    """First-match attribute value per parent (vectorized Get over the
    OTLP entry-list encoding)."""
    parents = pc.list_parent_indices(kvlist).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(kvlist)
    keys = np.asarray(
        _opt_field(flat, "key", pa.string()).to_numpy(zero_copy_only=False),
        dtype=object,
    )
    value_struct = _opt_field(flat, "value", _ANYVALUE)
    vals = np.asarray(
        _opt_field(value_struct, field, pa.string()).to_numpy(
            zero_copy_only=False
        ),
        dtype=object,
    )
    out = np.full(n, None, dtype=object)
    hit = keys == key
    out[parents[hit][::-1]] = vals[hit][::-1]
    return out


def _opt_field(sa, name: str, typ: pa.DataType):
    """Struct field, or typed nulls when the field never appeared in
    the file (proto3 JSON omits unset fields, so Arrow's reader may
    not even infer them)."""
    if sa.type.get_field_index(name) < 0:
        return pa.nulls(len(sa), typ)
    return sa.field(name)


def flatten_otlp_batch(t: pa.Table) -> pa.Table:
    """ExportLogsServiceRequest rows → flat record table (the unmarshal
    half, plog/json.go UnmarshalLogs): resource/scope context
    denormalized onto every record."""
    if "resourceLogs" not in t.column_names:
        # empty reader blocks can arrive schema-less
        return pa.table(
            {
                "service": pa.array([], type=pa.string()),
                "scope_name": pa.array([], type=pa.string()),
                "scope_version": pa.array([], type=pa.string()),
                "time_unix_nano": pa.array([], type=pa.int64()),
                "severity_number": pa.array([], type=pa.int64()),
                "severity_text": pa.array([], type=pa.string()),
                "body": pa.array([], type=pa.string()),
                "trace_id": pa.array([], type=pa.string()),
                "span_id": pa.array([], type=pa.string()),
                "conv_id": pa.array([], type=pa.string()),
                "turn_idx": pa.array([], type=pa.int32()),
                "tool": pa.array([], type=pa.string()),
            }
        )
    rl = t["resourceLogs"]
    if isinstance(rl, pa.ChunkedArray):
        rl = rl.combine_chunks()
    res = pc.list_flatten(rl)  # one row per resource entry
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

    sl = res.field("scopeLogs")
    scope_parent = pc.list_parent_indices(sl).to_numpy(zero_copy_only=False)
    scopes = pc.list_flatten(sl)
    n_scope = len(scopes)
    scope_struct = _opt_field(
        scopes, "scope", pa.struct([("name", pa.string()), ("version", pa.string())])
    )
    scope_name = _opt_field(scope_struct, "name", pa.string())
    scope_version = _opt_field(scope_struct, "version", pa.string())

    lr = scopes.field("logRecords")
    rec_parent = pc.list_parent_indices(lr).to_numpy(zero_copy_only=False)
    recs = pc.list_flatten(lr)
    n_rec = len(recs)

    # context indices per record: scope idx → resource idx
    res_idx = scope_parent[rec_parent] if n_rec else np.empty(0, np.int64)
    take_scope = pa.array(rec_parent, type=pa.int64())

    rec_attrs = _opt_field(recs, "attributes", pa.list_(_KV))
    conv_id = _attr_first(rec_attrs, n_rec, "conv.id", "stringValue")
    turn_raw = _attr_first(rec_attrs, n_rec, "turn.index", "intValue")
    tool = _attr_first(rec_attrs, n_rec, "tool", "stringValue")
    # proto3 JSON int64-as-string → int32 (bounded: a turn index)
    turn_valid = pa.array(turn_raw, type=pa.string())
    turn_idx = pc.cast(pc.cast(turn_valid, pa.int64()), pa.int32())
    time_ns = pc.cast(
        _opt_field(recs, "timeUnixNano", pa.string()), pa.int64()
    )
    body = _opt_field(recs, "body", pa.struct([("stringValue", pa.string())]))
    body_str = _opt_field(body, "stringValue", pa.string())
    sev_num = _opt_field(recs, "severityNumber", pa.int64())
    sev_text = _opt_field(recs, "severityText", pa.string())

    empty_str = pa.array([], type=pa.string())
    return pa.table(
        {
            "service": pa.array(service, type=pa.string()).take(
                pa.array(res_idx, type=pa.int64())
            )
            if n_rec
            else empty_str,
            "scope_name": scope_name.take(take_scope) if n_rec else empty_str,
            "scope_version": scope_version.take(take_scope)
            if n_rec
            else empty_str,
            "time_unix_nano": time_ns,
            "severity_number": pc.cast(sev_num, pa.int64()),
            "severity_text": sev_text,
            "body": body_str,
            "trace_id": _opt_field(recs, "traceId", pa.string()),
            "span_id": _opt_field(recs, "spanId", pa.string()),
            "conv_id": pa.array(conv_id, type=pa.string()),
            "turn_idx": turn_idx,
            "tool": pa.array(tool, type=pa.string()),
        }
    )


def _strip_nulls(o):
    """proto3 JSON omits unset fields (a null oneof member is not
    written); recursively drop None values before serializing."""
    if isinstance(o, dict):
        return {k: _strip_nulls(v) for k, v in o.items() if v is not None}
    if isinstance(o, list):
        return [_strip_nulls(x) for x in o]
    return o


# Wire compression (configgrpc compressor matrix parity — the
# reference's gRPC/HTTP clients gzip/zstd their Export payloads,
# config/configgrpc/configgrpc.go). Files carry the compressor as an
# extension suffix; readers sniff it back off the path.
_COMPRESS_EXT = {"gzip": ".gz", "zstd": ".zst"}


def compress_payload(data: bytes, compression: str | None) -> bytes:
    if compression is None or compression == "none":
        return data
    if compression == "gzip":
        import gzip

        # fixed mtime keeps the payload deterministic across runs
        return gzip.compress(data, mtime=0)
    if compression == "zstd":
        sink = pa.BufferOutputStream()
        with pa.CompressedOutputStream(sink, "zstd") as s:
            s.write(data)
        return sink.getvalue().to_pybytes()
    raise ValueError(f"unsupported wire compression: {compression!r}")


def decompress_payload(data: bytes, path: str = "") -> bytes:
    """Sniffs the MAGIC BYTES, not the path: Ray's read_binary_files
    already auto-decompresses paths with known codec extensions, so an
    extension-based rule would double-decompress those blobs."""
    if data[:2] == b"\x1f\x8b":
        import gzip

        return gzip.decompress(data)
    if data[:4] == b"\x28\xb5\x2f\xfd":
        return pa.input_stream(pa.BufferReader(data), compression="zstd").read()
    return data


class _NdjsonWriter:
    """Render each request row to one canonical OTLP JSON line and land
    one NDJSON file per writer batch (the sink side of MarshalLogs) —
    k requests frame naturally as k lines. One ``json.dumps`` per
    REQUEST, not per record. Files land through ``wirefs``: any
    pyarrow filesystem, worker-side mkdir, atomic tmp+rename publish,
    content-addressed names (retry-idempotent)."""

    def __init__(
        self,
        out_dir: str,
        compression: str | None = None,
        *,
        prefix: str = "otlp",
        suffix: str = ".json",
        filesystem=None,
    ):
        self.out_dir = out_dir
        self.compression = compression
        self.prefix = prefix
        self.ext = suffix + _COMPRESS_EXT.get(compression or "", "")
        self.filesystem = filesystem
        self._dir_ready = False

    def __call__(self, t: pa.Table) -> pa.Table:
        import json

        fs, dir_path = wirefs.resolve_fs(self.out_dir, self.filesystem)
        if not self._dir_ready:
            wirefs.ensure_dir(fs, dir_path)
            self._dir_ready = True
        lines = [
            json.dumps(_strip_nulls(row), separators=(",", ":"))
            for row in t.to_pylist()
        ]
        payload = compress_payload(
            ("\n".join(lines) + "\n").encode(), self.compression
        )
        name = wirefs.content_name(self.prefix, payload, self.ext)
        wirefs.atomic_write(fs, dir_path, name, payload)
        return pa.table({"rows": pa.array([len(lines)], type=pa.int64())})


# One Export() request per input batch: cap the batch size so request
# payloads stay exporter-sized (~a few MB) even when upstream blocks
# are 100TB-scale (~128MB) — the batch-processor send_batch_max_size
# rule applied at the wire boundary.
REQUEST_ROWS = 8192


def write_otlp_logs_json(
    ds: ray.data.Dataset,
    out_dir: str,
    compression: str | None = None,
    rows_per_request: int = REQUEST_ROWS,
    *,
    requests_per_file: int | None = None,
    filesystem=None,
    storage_options: dict | None = None,
    overwrite: bool = True,
) -> int:
    """Marshal: one ExportLogsServiceRequest JSON object per
    ``rows_per_request`` input rows, ``requests_per_file`` requests per
    NDJSON file (null fields omitted — the proto3 JSON wire form),
    optionally wire-compressed (gzip/zstd). ``out_dir`` may be a local
    path or a filesystem URI (s3://…); a non-empty existing dir is
    replaced, never appended to. Returns the number of requests
    written."""
    fs, dir_path = wirefs.resolve_fs(out_dir, filesystem, storage_options)
    wirefs.prepare_dir(fs, dir_path, overwrite)
    nested = ds.map_batches(
        nest_otlp_batch, batch_format="pyarrow", batch_size=rows_per_request
    )
    written = nested.map_batches(
        _NdjsonWriter(dir_path, compression, filesystem=fs),
        batch_format="pyarrow",
        batch_size=requests_per_file or wirefs.REQUESTS_PER_FILE,
    ).sum("rows")
    return int(written or 0)


class _NdjsonDecode:
    """Compressed-NDJSON blocks → request trees (one Arrow JSON parse
    per FILE, decompressed by path suffix)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.json as pj

        tables = []
        for data, path in zip(
            t["bytes"].to_pylist(), t["path"].to_pylist()
        ):
            raw = decompress_payload(data, path)
            # one NDJSON line = one whole request (MBs at exporter
            # sizing) — the parser's default 1MB block would fail with
            # "straddling object straddles two block boundaries"
            opts = pj.ReadOptions(block_size=max(1 << 20, len(raw) + 1))
            tables.append(
                pj.read_json(pa.BufferReader(raw), read_options=opts)
            )
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables, promote_options="permissive")


def _any_compressed(paths, filesystem=None) -> bool:
    """True when any input entry carries a wire-compression suffix.
    Handles a directory string, a single file string, and a LIST of
    either (a bare list of .gz paths previously fell through to
    read_json on compressed bytes). Directory listings go through the
    SAME filesystem the read will use — an os.listdir against the
    local cwd mis-detected remote/SubTree dirs as uncompressed
    (review finding, r4)."""
    import os

    import pyarrow.fs as pafs

    entries = [paths] if isinstance(paths, str) else list(paths)
    for p in entries:
        if not isinstance(p, str):
            continue
        if p.endswith((".gz", ".zst")):
            return True
        if filesystem is not None or "://" in p:
            fs, path = wirefs.resolve_fs(p, filesystem)
            info = fs.get_file_info(path)
            if info.type == pafs.FileType.Directory and any(
                f.path.endswith((".gz", ".zst"))
                for f in fs.get_file_info(
                    pafs.FileSelector(path, recursive=False)
                )
            ):
                return True
        elif os.path.isdir(p) and any(
            n.endswith((".gz", ".zst")) for n in os.listdir(p)
        ):
            return True
    return False


def _ndjson_requests(paths, filesystem=None) -> ray.data.Dataset:
    """Dataset of request trees from NDJSON files, transparently
    handling wire compression (sniffed off the file extensions across
    ALL entries — dir listings, single files, and lists alike, on the
    read's own filesystem)."""
    if not _any_compressed(paths, filesystem):
        return ray.data.read_json(paths, filesystem=filesystem)
    return ray.data.read_binary_files(
        paths, include_paths=True, filesystem=filesystem
    ).map_batches(_NdjsonDecode(), batch_format="pyarrow")


def read_otlp_logs_json(paths, filesystem=None) -> ray.data.Dataset:
    """Unmarshal: NDJSON of ExportLogsServiceRequest → flat records."""
    return _ndjson_requests(paths, filesystem).map_batches(
        flatten_otlp_batch, batch_format="pyarrow"
    )
