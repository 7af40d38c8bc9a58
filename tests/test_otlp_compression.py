"""Wire-level payload compression (configgrpc compressor matrix,
config/configgrpc/configgrpc.go): gzip/zstd OTLP payloads round-trip
identically to the plain wire, files carry real compressed magic."""

import glob

import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_ray.sources.otlp_json import (
    compress_payload,
    decompress_payload,
    read_otlp_logs_json,
    write_otlp_logs_json,
)
from opentelemetry_collector_ray.sources.otlp_pb import (
    read_otlp_logs_pb,
    write_otlp_logs_pb,
)
from tests.test_otlp_pb import _transcript_batch


def test_payload_helpers_roundtrip():
    data = b"x" * 4096 + b"hello" * 100
    for comp, magic in (("gzip", b"\x1f\x8b"), ("zstd", b"\x28\xb5\x2f\xfd")):
        blob = compress_payload(data, comp)
        assert blob[: len(magic)] == magic
        assert len(blob) < len(data)
        assert decompress_payload(blob, f"f.json{'.gz' if comp=='gzip' else '.zst'}") == data
    assert compress_payload(data, None) == data
    assert decompress_payload(data, "f.json") == data
    with pytest.raises(ValueError):
        compress_payload(data, "lz9")


@pytest.mark.parametrize("compression", ["gzip", "zstd"])
def test_json_wire_compressed_roundtrip(ray_session, tmp_path, compression):
    t = _transcript_batch()
    plain, comp = str(tmp_path / "plain"), str(tmp_path / "comp")
    assert write_otlp_logs_json(ray.data.from_arrow(t), plain) >= 1
    assert write_otlp_logs_json(
        ray.data.from_arrow(t), comp, compression=compression
    ) >= 1
    ext = ".json.gz" if compression == "gzip" else ".json.zst"
    assert glob.glob(comp + "/*" + ext)

    key = ["conv_id", "turn_idx"]
    a = read_otlp_logs_json(plain).to_pandas().sort_values(key)
    b = read_otlp_logs_json(comp).to_pandas().sort_values(key)
    import pandas.testing as pdt

    pdt.assert_frame_equal(
        a.reset_index(drop=True)[sorted(a.columns)],
        b.reset_index(drop=True)[sorted(b.columns)],
    )


def test_pb_wire_gzip_roundtrip(ray_session, tmp_path):
    t = _transcript_batch()
    plain, comp = str(tmp_path / "plain"), str(tmp_path / "comp")
    assert write_otlp_logs_pb(ray.data.from_arrow(t), plain) >= 1
    assert write_otlp_logs_pb(
        ray.data.from_arrow(t), comp, compression="gzip"
    ) >= 1
    assert glob.glob(comp + "/*.binpb.gz")

    key = ["conv_id", "turn_idx"]
    a = read_otlp_logs_pb(plain).to_pandas().sort_values(key)
    b = read_otlp_logs_pb(comp).to_pandas().sort_values(key)
    import pandas.testing as pdt

    pdt.assert_frame_equal(
        a.reset_index(drop=True)[sorted(a.columns)],
        b.reset_index(drop=True)[sorted(b.columns)],
    )
