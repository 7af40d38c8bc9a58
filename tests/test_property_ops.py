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


TOKTEXT = st.one_of(
    st.none(),
    st.from_regex(r"[ a-zA-Z0-9.,;!?-]{0,60}", fullmatch=True),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(TOKTEXT, min_size=1, max_size=30), st.sampled_from([7, 64]))
def test_horner_token_buckets_matches_reference(text_list, buckets):
    """The exact-twin token hasher (vectorized over character
    positions, bytes straight off the Arrow buffer) equals a pure
    per-byte Python loop for any ASCII text, null/empty included —
    and is insensitive to a sliced (offset != 0) input array."""
    from opentelemetry_collector_ray.stages.text import (
        _DSIR_MOD,
        _horner_token_buckets,
    )

    def ref(tok):
        acc = 0
        for b in tok.encode():
            acc = (acc * 257 + b) % _DSIR_MOD
        return acc % buckets

    exp_buckets, exp_parents = [], []
    for i, s in enumerate(text_list):
        for w in (s or "").split():
            exp_buckets.append(ref(w))
            exp_parents.append(i)

    col = pa.array(text_list, type=pa.string())
    got_b, got_p = _horner_token_buckets(col, buckets)
    assert got_b.tolist() == exp_buckets
    assert got_p.tolist() == exp_parents

    # sliced input: drop the first row, parents shift by one
    if len(text_list) > 1:
        got_b2, got_p2 = _horner_token_buckets(col.slice(1), buckets)
        exp2 = [
            (b, p - 1) for b, p in zip(exp_buckets, exp_parents) if p >= 1
        ]
        assert list(zip(got_b2.tolist(), got_p2.tolist())) == exp2


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["m.a", "m.b", None]),
            st.sampled_from(["web", "infra", None]),
            st.one_of(st.none(), st.integers(0, 1000)),
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(1, 4),
)
def test_metrics_transform_matches_pandas_reference(rows, nparts):
    """metricstransform == a pandas reference (rename → relabel →
    scale → groupby sum/count with null keys kept) for any mix of
    null metric names, null labels and null values, at any
    partitioning."""
    import pandas as pd

    from opentelemetry_collector_ray.stages.signals import metrics_transform

    df = pd.DataFrame(rows, columns=["metric_name", "service", "value"])
    df["value"] = df["value"].astype("Int64")
    got = (
        metrics_transform(
            ray.data.from_pandas(df).repartition(nparts),
            rename={"m.a": "m.r"},
            relabel={"service": {"web": "fe"}},
            scale=3,
            keep=("service",),
        )
        .to_pandas()
    )
    ref = df.copy()
    ref["metric_name"] = ref["metric_name"].replace({"m.a": "m.r"})
    ref["service"] = ref["service"].replace({"web": "fe"})
    ref["value"] = ref["value"] * 3
    grp = ref.groupby(["metric_name", "service"], dropna=False)["value"]
    want = (
        grp.agg([("n_points", "size"), ("sum_value", "sum")])
        .reset_index()
    )
    # pandas sums an all-null group to 0; SQL (and the engine) keep NULL
    nullsum = grp.apply(lambda s: s.notna().sum() == 0)
    want.loc[nullsum.to_numpy(), "sum_value"] = pd.NA

    def canon(d):
        d = d.copy()
        for c in d.columns:
            d[c] = d[c].map(lambda x: "~" if pd.isna(x) else repr(int(x) if isinstance(x, (int, np.integer, float)) and not isinstance(x, bool) else x))
        return (
            d[sorted(d.columns)]
            .sort_values(sorted(d.columns), kind="mergesort")
            .reset_index(drop=True)
        )

    a, b = canon(got), canon(want)
    assert a.equals(b), f"\n{a}\nvs\n{b}"
