"""Chat-messages JSONL codec: ordered roundtrip, wire shape, empty."""

import glob
import json

import pyarrow as pa
import ray.data

from opentelemetry_collector_ray.sources.chat_jsonl import (
    flatten_chat_batch,
    nest_chat_batch,
    read_chat_jsonl,
    write_chat_jsonl,
)


def _batch():
    return pa.table(
        {
            "conv_id": ["c2", "c1", "c1", "c1"],
            "turn_idx": pa.array([0, 0, 1, 2], type=pa.int32()),
            "role": ["user", "user", "assistant", "user"],
            "text": ["hi", "q1", "a1", "q2"],
            "tool": [""] * 4,
            "ts": pa.array([1, 2, 3, 4], type=pa.timestamp("us")),
        }
    )


def test_nest_flatten_identity():
    flat = flatten_chat_batch(nest_chat_batch(_batch())).to_pandas()
    src = (
        _batch()
        .select(["conv_id", "turn_idx", "role", "text"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    got = flat.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    import pandas.testing as pdt

    pdt.assert_frame_equal(got, src)


def test_wire_shape_and_order(ray_session, tmp_path):
    out = str(tmp_path / "chat")
    assert write_chat_jsonl(ray.data.from_arrow(_batch()), out) == 2
    lines = [
        json.loads(ln)
        for f in glob.glob(out + "/*.jsonl")
        for ln in open(f).read().splitlines()
    ]
    by_conv = {d["conv_id"]: d for d in lines}
    assert [m["role"] for m in by_conv["c1"]["messages"]] == [
        "user",
        "assistant",
        "user",
    ]
    assert by_conv["c1"]["messages"][1]["content"] == "a1"

    back = read_chat_jsonl(out).to_pandas().sort_values(
        ["conv_id", "turn_idx"]
    ).reset_index(drop=True)
    assert back["text"].tolist() == ["q1", "a1", "q2", "hi"]


def test_empty(ray_session, tmp_path):
    out = str(tmp_path / "chat_e")
    n = write_chat_jsonl(ray.data.from_arrow(_batch().slice(0, 0)), out)
    files = glob.glob(out + "/*.jsonl")
    if files:
        assert read_chat_jsonl(out).count() == 0
    else:
        assert n == 0
