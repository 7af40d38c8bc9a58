"""OTLP/HTTP listener — live-push end-to-end and error-path tests.

The e2e test POSTs REAL wire bytes (binary ExportLogsServiceRequest
protobuf, gzip-compressed protobuf, and OTLP/JSON) from a SEPARATE
PROCESS (a stdlib urllib client subprocess — nothing shared with the
server but the socket), then processes the landed spool through the
checkpoint ledger and asserts the sink parquet equals the pushed
rows exactly — the reference receiver's delivery contract
(receiver/otlpreceiver/otlp.go:93-172, otlphttp.go)."""

import glob
import gzip
import json
import os
import subprocess
import sys
import urllib.request

import pyarrow as pa
import pytest
import ray
import ray.data

from opentelemetry_collector_ray.sources.otlp_json import (
    _strip_nulls,
    flatten_otlp_batch,
    nest_otlp_batch,
)
from opentelemetry_collector_ray.sources.otlp_pb import encode_logs_request
from opentelemetry_collector_ray.sources.transcripts import (
    transcripts_from_events,
)
from opentelemetry_collector_ray.state.httpreceiver import OtlpHttpListener
from opentelemetry_collector_ray.state.receiver import SpoolReceiverActor

SF_DIR = "/root/testdata/sf0.001"

# minimal stdlib POST client run as its own process: argv = url,
# payload file, content type, optional content-encoding; prints the
# HTTP status code
_CLIENT = """
import sys, urllib.request, urllib.error
url, path, ctype = sys.argv[1], sys.argv[2], sys.argv[3]
req = urllib.request.Request(url, data=open(path, 'rb').read(), method='POST')
req.add_header('Content-Type', ctype)
if len(sys.argv) > 4:
    req.add_header('Content-Encoding', sys.argv[4])
try:
    with urllib.request.urlopen(req) as resp:
        print(resp.status)
except urllib.error.HTTPError as e:
    print(e.code)
"""


def _post_subprocess(url, payload_path, ctype, encoding=None):
    argv = [sys.executable, "-c", _CLIENT, url, str(payload_path), ctype]
    if encoding:
        argv.append(encoding)
    out = subprocess.run(argv, capture_output=True, text=True, check=True)
    return int(out.stdout.strip())


def _request_row(n_rows: int = 192):
    """One real ExportLogsServiceRequest tree from sf0.001 transcripts."""
    t = pa.Table.from_pandas(
        transcripts_from_events(SF_DIR).limit(n_rows).to_pandas(),
        preserve_index=False,
    )
    nested = nest_otlp_batch(t)
    return nested.to_pylist()[0], nested


def test_http_listener_end_to_end(tmp_path):
    """pb + gzip'd pb + JSON POSTs from a separate process → durable
    spool → checkpoint ledger → sink parquet == the flattened wire
    content, exactly once."""
    from opentelemetry_collector_ray.state.checkpoint import run_partitioned

    row, nested = _request_row()
    pb_body = encode_logs_request(row)
    json_body = json.dumps(_strip_nulls(row), separators=(",", ":")).encode()

    spool = str(tmp_path / "spool")
    actor = SpoolReceiverActor.remote(spool, max_buffer_rows=1 << 20)
    lis = OtlpHttpListener({"logs": actor})
    port = lis.start()
    try:
        url = f"http://127.0.0.1:{port}/v1/logs"
        p_pb = tmp_path / "req.binpb"
        p_pb.write_bytes(pb_body)
        p_gz = tmp_path / "req.binpb.gz"
        p_gz.write_bytes(gzip.compress(pb_body))
        p_js = tmp_path / "req.json"
        p_js.write_bytes(json_body)

        assert _post_subprocess(url, p_pb, "application/x-protobuf") == 200
        assert (
            _post_subprocess(
                url, p_gz, "application/x-protobuf", encoding="gzip"
            )
            == 200
        )
        assert _post_subprocess(url, p_js, "application/json") == 200

        # ack contract: durable=True means the rows are ALREADY landed
        # (no flush needed) — 3 requests, one spool file each
        files = sorted(glob.glob(spool + "/*.parquet"))
        assert len(files) == 3

        out = str(tmp_path / "out")
        run_partitioned(
            files,
            out,
            lambda paths: ray.data.read_parquet(paths),
            num_partitions=2,
        )
        got = (
            ray.data.read_parquet(glob.glob(out + "/part-*/*.parquet"))
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"], kind="mergesort")
            .reset_index(drop=True)
        )
        expected_one = (
            flatten_otlp_batch(nested)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"], kind="mergesort")
            .reset_index(drop=True)
        )
        # the same request landed 3× (pb, gzip pb, json) — at-least-
        # once per POST, each POST exactly once
        assert len(got) == 3 * len(expected_one)
        one = (
            got.groupby(["conv_id", "turn_idx"], as_index=False)
            .first()
            .sort_values(["conv_id", "turn_idx"], kind="mergesort")
            .reset_index(drop=True)
        )
        counts = got.groupby(["conv_id", "turn_idx"]).size()
        assert (counts == 3).all()
        for col in ("conv_id", "turn_idx", "body", "severity_text"):
            if col in expected_one.columns:
                assert one[col].tolist() == expected_one[col].tolist()
        assert int(ray.get(actor.stats.remote())["accepted"]) == len(got)
        assert lis.accepted == len(got)
    finally:
        lis.stop()


def test_http_listener_traces_and_metrics_signals(tmp_path):
    """The same listener front serves /v1/traces and /v1/metrics with
    their own codecs and per-signal spool receivers (per-signal
    registration, otlp.go:246-269)."""
    from opentelemetry_collector_ray.sources.otlp_metrics import (
        nest_otlp_metrics_batch,
    )
    from opentelemetry_collector_ray.sources.otlp_pb import (
        encode_metrics_request,
        encode_traces_request,
    )
    from opentelemetry_collector_ray.sources.otlp_traces import (
        nest_otlp_traces_batch,
    )

    t = pa.Table.from_pandas(
        transcripts_from_events(SF_DIR).limit(96).to_pandas(),
        preserve_index=False,
    )
    tr_row = nest_otlp_traces_batch(t).to_pylist()[0]
    mx_row = nest_otlp_metrics_batch(t).to_pylist()[0]

    spools = {s: str(tmp_path / f"spool_{s}") for s in ("traces", "metrics")}
    actors = {
        s: SpoolReceiverActor.remote(d, receiver_id=s)
        for s, d in spools.items()
    }
    lis = OtlpHttpListener(actors)
    port = lis.start()
    try:
        for signal, body in (
            ("traces", encode_traces_request(tr_row)),
            ("metrics", encode_metrics_request(mx_row)),
        ):
            p = tmp_path / f"req_{signal}.binpb"
            p.write_bytes(body)
            assert (
                _post_subprocess(
                    f"http://127.0.0.1:{port}/v1/{signal}",
                    p,
                    "application/x-protobuf",
                )
                == 200
            )
        for s, d in spools.items():
            files = glob.glob(d + "/*.parquet")
            assert files, f"no spool landed for {s}"
            landed = ray.data.read_parquet(files).to_pandas()
            assert len(landed) > 0
            key = "trace_id" if s == "traces" else "metric_name"
            assert key in landed.columns
    finally:
        lis.stop()


def test_http_listener_error_paths(tmp_path):
    """otlp.go error mapping: 404 unknown path/signal, 405 GET, 415
    bad content type, 400 undecodable body, 429 + Retry-After on spool
    backlog saturation."""
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    actor = SpoolReceiverActor.remote(spool, max_buffer_rows=1 << 20)
    lis = OtlpHttpListener(
        {"logs": actor},
        max_spool_backlog=1,
        spool_dir=spool,
    )
    port = lis.start()
    base = f"http://127.0.0.1:{port}"

    def post(path, body=b"{}", ctype="application/json", method="POST"):
        req = urllib.request.Request(
            base + path, data=body if method == "POST" else None,
            method=method,
        )
        if method == "POST":
            req.add_header("Content-Type", ctype)
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, dict(resp.headers)
        except urllib.error.HTTPError as e:
            return e.code, dict(e.headers)

    import urllib.error

    try:
        assert post("/v1/nope")[0] == 404
        assert post("/v2/logs")[0] == 404
        assert post("/v1/traces")[0] == 404  # no traces receiver wired
        assert post("/v1/logs", method="GET")[0] == 405
        assert post("/v1/logs", ctype="text/plain")[0] == 415
        code, _ = post(
            "/v1/logs", body=b"\xde\xad\xbe\xef",
            ctype="application/x-protobuf",
        )
        assert code == 400
        # valid empty JSON request still lands (zero rows, no file)
        assert post("/v1/logs", body=b'{"resourceLogs":[]}')[0] == 200

        # saturate: pre-land one spool file, backlog limit is 1
        row, _ = _request_row(32)
        body = json.dumps(_strip_nulls(row), separators=(",", ":")).encode()
        assert post("/v1/logs", body=body)[0] == 200
        code, headers = post("/v1/logs", body=body)
        assert code == 429
        assert headers.get("Retry-After") == "1"
        assert lis.refused >= 5
    finally:
        lis.stop()


def test_http_listener_rejects_unknown_signal_config():
    with pytest.raises(ValueError, match="unknown signals"):
        OtlpHttpListener({"logz": None})
    with pytest.raises(ValueError, match="needs spool_dir"):
        OtlpHttpListener({"logs": None}, max_spool_backlog=3)
