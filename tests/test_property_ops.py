"""Property-based tests (hypothesis) — beyond the reference's test
strategy (it has none, SURVEY.md §5); these pin the algebraic
invariants the engine relies on."""

import hypothesis.strategies as st
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from hypothesis import given, settings

from opentelemetry_collector_ray.stages.attributes import AttributesStage
from opentelemetry_collector_ray.stages.batch import split_table
from opentelemetry_collector_ray.stages.parse import parse_batch
from opentelemetry_collector_ray.stages.route import explode_sinks_batch

LEVELS = st.sampled_from(["DEBUG", "INFO", "WARN", "ERROR"])
WORD = st.from_regex(r"[a-z]{1,8}", fullmatch=True)
MSG = st.from_regex(r"[a-zA-Z0-9 _.,:-]{0,40}", fullmatch=True)


@st.composite
def texts(draw):
    if draw(st.booleans()):
        level = draw(LEVELS)
        action = draw(WORD)
        n = draw(st.integers(0, 10**6))
        msg = draw(MSG)
        return f"[{level}] action={action} latency_ms={n} msg={msg}"
    return draw(MSG)  # free text → parse miss (unless it matches!)


@settings(max_examples=200, deadline=None)
@given(st.lists(texts(), min_size=1, max_size=50))
def test_parse_total_and_lossless(text_list):
    t = pa.table({"text": pa.array(text_list, type=pa.string())})
    p = parse_batch(t)
    # total: row count preserved; each row either fully parsed or fully null
    assert p.num_rows == t.num_rows
    for ok, level, action, lat, msg, orig in zip(
        p["parse_ok"].to_pylist(),
        p["level"].to_pylist(),
        p["action"].to_pylist(),
        p["latency_ms"].to_pylist(),
        p["msg"].to_pylist(),
        text_list,
    ):
        if ok:
            assert f"[{level}] action={action} latency_ms={lat} msg={msg}" == orig
        else:
            assert level is None and action is None and lat is None and msg is None


@settings(max_examples=100, deadline=None)
@given(st.integers(1, 200), st.integers(1, 50))
def test_split_table_partitions(n, max_rows):
    t = pa.table({"x": list(range(n))})
    parts = split_table(t, max_rows)
    assert all(p.num_rows <= max_rows for p in parts)
    assert pa.concat_tables(parts)["x"].to_pylist() == list(range(n))
    assert len(parts) == -(-n // max_rows)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["ingest", "audit"]), st.sampled_from(["ERROR", "INFO", None])),
        min_size=0,
        max_size=40,
    )
)
def test_route_explode_invariant(rows):
    t = pa.table(
        {
            "route": pa.array([r for r, _ in rows], type=pa.string()),
            "level": pa.array([l for _, l in rows], type=pa.string()),
        }
    )
    x = explode_sinks_batch(t)
    errors = sum(1 for _, l in rows if l == "ERROR")
    assert x.num_rows == len(rows) + errors
    assert x.filter(pc.equal(x["sink"], "errors")).num_rows == errors


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abc", min_size=1, max_size=8), st.integers(-5, 5))
def test_attributes_upsert_idempotent(key, value):
    t = pa.table({"a": [1, 2, 3]})
    st_ = AttributesStage([{"action": "upsert", "key": key, "value": value}])
    once = st_(t)
    twice = st_(once)
    assert once.equals(twice)
    assert once[key].to_pylist() == [value] * 3


DOC = st.from_regex(r"([a-z]{1,6} ){0,12}[a-z]{1,6}", fullmatch=True)


@given(st.lists(DOC, min_size=1, max_size=20))
@settings(max_examples=30, deadline=None)
def test_chunk_reassembly_roundtrip(doc_list):
    """With stride == size (no overlap), concatenating a doc's chunks
    restores the whitespace-normalized document exactly."""
    from opentelemetry_collector_ray.stages.text import chunk_batch

    t = pa.table(
        {"doc_id": list(range(len(doc_list))), "text": doc_list}
    )
    out = chunk_batch(t, size=4, stride=4).to_pandas()
    for did, doc in enumerate(doc_list):
        mine = out[out["doc_id"] == did].sort_values("chunk_idx")
        rebuilt = " ".join(mine["chunk_text"])
        assert rebuilt == " ".join(doc.split())


@given(st.lists(DOC, min_size=2, max_size=16), st.integers(2, 5))
@settings(max_examples=15, deadline=None)
def test_contamination_layout_invariant(doc_list, nblocks):
    """Contamination results are a pure function of the corpus —
    identical across block layouts (the determinism the resume and
    scaling stories rely on)."""
    import pandas as pd
    import ray.data

    from opentelemetry_collector_ray.stages.dedup import contamination_check

    df = pd.DataFrame(
        {"doc_id": range(len(doc_list)), "text": doc_list}
    )
    def norm(ds):
        out = ds.to_pandas()
        if out.empty:  # zero-block empty results have no columns
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "n_shared": pd.Series(dtype="int64"),
                }
            )
        return out.sort_values("doc_id").reset_index(drop=True)

    a = norm(contamination_check(ray.data.from_pandas(df), n=3, test_mod=2))
    b = norm(
        contamination_check(
            ray.data.from_pandas(df).repartition(nblocks), n=3, test_mod=2
        )
    )
    assert a.equals(b)


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=1,
        max_size=60,
    ),
    st.integers(1, 5),
)
@settings(max_examples=25, deadline=None)
def test_global_rank_stats_matches_pandas(pairs, nparts):
    """RANK/DENSE_RANK from the zero-shuffle histogram path equal the
    pandas reference for ANY value multiset and partitioning."""
    import pandas as pd

    from opentelemetry_collector_ray.stages.window2 import global_rank_stats

    df = pd.DataFrame(
        {
            "id": np.arange(len(pairs), dtype=np.int64),
            "v": np.array([p[1] for p in pairs], dtype=np.int64),
        }
    )
    out = (
        global_rank_stats(
            ray.data.from_pandas(df).repartition(nparts), value="v"
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    ref_rank = df["v"].rank(method="min").astype(np.int64)
    ref_dense = df["v"].rank(method="dense").astype(np.int64)
    assert out["rnk"].tolist() == ref_rank.tolist()
    assert out["drnk"].tolist() == ref_dense.tolist()


@given(
    st.lists(st.integers(1, 30), min_size=1, max_size=40),
    st.integers(1, 200),
    st.integers(1, 4),
)
@settings(max_examples=25, deadline=None)
def test_budget_select_prefix_property(weights, budget, nparts):
    """budget_select keeps EXACTLY the hash-order prefix whose
    running-before total is under budget — for any weights, budget and
    partitioning."""
    import pandas as pd

    from opentelemetry_collector_ray.functions.shard import mult_hash
    from opentelemetry_collector_ray.stages.text import budget_select

    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(weights), dtype=np.int64),
            "source": ["s"] * len(weights),
            "n_chars": np.array(weights, dtype=np.int64),
        }
    )
    got = set(
        budget_select(
            ray.data.from_pandas(df).repartition(nparts),
            budget=budget,
            buckets=8,  # small buckets exercise boundary refinement
        )
        .to_pandas()["doc_id"]
    )
    order = np.lexsort((df["doc_id"], mult_hash(df["doc_id"].to_numpy())))
    run = 0
    want = set()
    for i in order:
        if run < budget:
            want.add(int(df["doc_id"].iloc[i]))
        run += int(df["n_chars"].iloc[i])
    assert got == want
