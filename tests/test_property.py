"""Property-based tests (hypothesis): the hand-rolled vectorized
kernels vs slow-but-obviously-correct per-row Python models, under
randomized inputs INCLUDING nulls, empty strings, and empty maps."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import example, given, settings
from hypothesis import strategies as st

from opentelemetry_collector_ray.stages.maps import (
    map_get,
    map_keep_keys,
    map_len,
    map_remove,
    map_rename,
    map_upsert,
)

_keys = st.sampled_from(["a", "b", "c", "k.x", ""])
_vals = st.one_of(st.none(), st.text(max_size=6))
_row = st.lists(st.tuples(_keys, _vals), max_size=5)
_maps = st.lists(_row, min_size=1, max_size=8)


def _to_arrow(rows):
    return pa.array(
        [[{"key": k, "value": v} for k, v in r] for r in rows],
        type=pa.list_(
            pa.struct([("key", pa.string()), ("value", pa.string())])
        ),
    )


def _to_py(arr):
    return [
        [(e["key"], e["value"]) for e in (row or [])]
        for row in arr.to_pylist()
    ]


@settings(max_examples=60, deadline=None)
@given(_maps, _keys, _vals)
@example(rows=[[]], key="a", val="\x00")  # np.full U-dtype NUL-strip regression
def test_map_upsert_matches_dict_model(rows, key, val):
    got = _to_py(map_upsert(_to_arrow(rows), key, val))
    for row, out in zip(rows, got):
        # Go PutStr: update in place where present, append where absent
        expect = list(row)
        hit = [i for i, (k, _) in enumerate(expect) if k == key]
        if hit:
            expect = [
                (k, val if k == key else v) for k, v in expect
            ]
        else:
            expect = expect + [(key, val)]
        assert out == expect


@settings(max_examples=60, deadline=None)
@given(_maps, _keys)
def test_map_remove_and_get_match_dict_model(rows, key):
    arr = _to_arrow(rows)
    removed = _to_py(map_remove(arr, key))
    got = map_get(arr, key).to_pylist()
    for row, rem, g in zip(rows, removed, got):
        assert rem == [(k, v) for k, v in row if k != key]
        firsts = [v for k, v in row if k == key]
        assert g == (firsts[0] if firsts else None)


@settings(max_examples=60, deadline=None)
@given(_maps, _keys, _keys)
def test_map_rename_keep_len_match_dict_model(rows, old, new):
    arr = _to_arrow(rows)
    renamed = _to_py(map_rename(arr, old, new))
    kept = _to_py(map_keep_keys(arr, [old]))
    lens = map_len(arr).to_pylist()
    for row, rn, kp, ln in zip(rows, renamed, kept, lens):
        assert rn == [(new if k == old else k, v) for k, v in row]
        assert kp == [(k, v) for k, v in row if k == old]
        assert ln == len(row)


_vals_int = st.lists(
    st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
    min_size=1,
    max_size=30,
)
_keys_int = st.lists(
    st.integers(min_value=0, max_value=3), min_size=1, max_size=30
)


@settings(max_examples=40, deadline=None)
@given(_vals_int, _keys_int, st.integers(min_value=1, max_value=5))
def test_rolling_sum_kernel_matches_pandas(ray_session, vals, keys, window):
    """The cumsum prefix-difference kernel == pandas groupby.rolling
    (SQL ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW, null-skipping,
    all-NULL window is NULL) — under random keys and nulls."""
    n = min(len(vals), len(keys))
    df = pd.DataFrame(
        {
            "k": keys[:n],
            "ts": np.arange(n),
            "v": pd.array(vals[:n], dtype="Int64"),
        }
    )
    from opentelemetry_collector_ray.stages.window2 import rolling_sum

    import ray.data

    out = (
        rolling_sum(
            ray.data.from_pandas(df),
            key="k",
            order=["ts"],
            value="v",
            window=window,
        )
        .to_pandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["k", "ts"]).reset_index(drop=True)
    expected = (
        ref.groupby("k", sort=False)["v"]
        .rolling(window, min_periods=1)
        .sum()
        .reset_index(drop=True)
    )
    got = out["roll_sum"].astype("Float64")
    exp = expected.astype("Float64").reset_index(drop=True)
    assert got.isna().tolist() == exp.isna().tolist()
    assert got.dropna().tolist() == exp.dropna().tolist()


@settings(max_examples=30, deadline=None)
@given(_maps)
def test_ottl_statement_roundtrip_on_random_maps(rows):
    """set + delete_key on random maps: delete_key(set(m, k, v), k)
    leaves no k entries; set is idempotent on the value."""
    from opentelemetry_collector_ray.stages.ottl_statements import (
        apply_statement,
        parse_statement,
    )

    t = pa.table(
        {"id": list(range(len(rows))), "attrs": _to_arrow(rows)}
    )
    s1 = apply_statement(t, parse_statement("set(attrs['zz'], 'v')"))
    assert all(
        ("zz", "v") in _to_py(s1["attrs"].chunk(0))[i]
        for i in range(len(rows))
    )
    s2 = apply_statement(s1, parse_statement("delete_key(attrs, 'zz')"))
    assert all(
        all(k != "zz" for k, _ in row)
        for row in _to_py(s2["attrs"].chunk(0))
    )


_text_strat = st.one_of(
    st.none(),
    st.text(max_size=40),
    st.from_regex(
        r"\[(DEBUG|INFO|WARN|ERROR)\] action=\w{1,8} latency_ms=\d{1,4} msg=.{0,20}",
        fullmatch=True,
    ),
)
_conv_strat = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1,
    max_size=10,
)


@st.composite
def _transcript_tables(draw):
    convs = draw(st.lists(_conv_strat, min_size=1, max_size=4, unique=True))
    rows = []
    for c in convs:
        n = draw(st.integers(min_value=1, max_value=4))
        for i in range(n):
            rows.append(
                {
                    "conv_id": c,
                    "turn_idx": i,
                    "role": draw(
                        st.sampled_from(["user", "assistant", "tool", "system"])
                    ),
                    "text": draw(_text_strat),
                    "tool": draw(st.sampled_from(["", "bash", "sql"])),
                    "ts": draw(
                        st.one_of(
                            st.none(),
                            st.integers(min_value=0, max_value=2**40),
                        )
                    ),
                }
            )
    t = pa.Table.from_pylist(rows)
    return pa.table(
        {
            "conv_id": t["conv_id"],
            "turn_idx": pc_cast_i32(t["turn_idx"]),
            "role": t["role"],
            "text": t["text"].cast(pa.string()) if t["text"].type != pa.string() else t["text"],
            "tool": t["tool"],
            "ts": t["ts"].cast(pa.timestamp("us")),
        }
    )


def pc_cast_i32(col):
    import pyarrow.compute as _pc

    return _pc.cast(col, pa.int32())


@settings(max_examples=40, deadline=None)
@given(_transcript_tables())
def test_otlp_logs_nest_flatten_identity(t):
    """flatten ∘ nest is the identity on (conv_id, turn_idx, body=text,
    tool) for ARBITRARY transcripts — unicode, newlines, empty strings,
    null text/ts all survive the wire tree."""
    from opentelemetry_collector_ray.sources.otlp_json import (
        flatten_otlp_batch,
        nest_otlp_batch,
    )

    flat = (
        flatten_otlp_batch(nest_otlp_batch(t))
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    src = (
        t.to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert flat["body"].where(flat["body"].notna(), None).tolist() == (
        src["text"].where(src["text"].notna(), None).tolist()
    )
    assert flat["conv_id"].tolist() == src["conv_id"].tolist()
    assert flat["turn_idx"].tolist() == src["turn_idx"].tolist()
    assert flat["tool"].tolist() == src["tool"].tolist()


@settings(max_examples=25, deadline=None)
@given(_transcript_tables())
def test_chat_jsonl_nest_flatten_identity(t):
    from opentelemetry_collector_ray.sources.chat_jsonl import (
        flatten_chat_batch,
        nest_chat_batch,
    )

    flat = (
        flatten_chat_batch(nest_chat_batch(t))
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    src = (
        t.select(["conv_id", "turn_idx", "role", "text"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    import pandas.testing as pdt

    pdt.assert_frame_equal(flat, src)


# ----------------------------------------------- round-4 wire framing


@given(st.lists(st.binary(max_size=2000), max_size=20))
@settings(max_examples=200, deadline=None)
def test_frame_unframe_roundtrip(blobs):
    from opentelemetry_collector_ray.sources.wirefs import (
        frame_requests,
        unframe_requests,
    )

    assert unframe_requests(frame_requests(blobs)) == blobs


@given(st.binary(min_size=1, max_size=500))
@settings(max_examples=200, deadline=None)
def test_unframe_bare_payload_is_identity(raw):
    from opentelemetry_collector_ray.sources.wirefs import (
        FRAME_MAGIC,
        unframe_requests,
    )

    if raw.startswith(FRAME_MAGIC):
        return  # framed-looking bytes are the framed case
    assert unframe_requests(raw) == [raw]


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.sampled_from([3, 4]),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_random_shapes(w, h, seed, channels):
    import numpy as np

    from opentelemetry_collector_ray.stages.imagecodec import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
    got = decode_png(encode_png(img))
    assert got.shape == (h, w, 3)
    assert (got == img[:, :, :3]).all()
