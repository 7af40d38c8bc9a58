"""Unit tests for the batch stages — pure Arrow, no Ray needed.

Mirrors the reference's colocated per-operator unit tests
(processor/batchprocessor/batch_processor_test.go style) with the
fixture-generator-as-oracle strategy (internal/testdata/log.go).
"""

import pyarrow as pa
import pyarrow.compute as pc

from opentelemetry_collector_ray.fixtures import gen_transcripts, n_turns
from opentelemetry_collector_ray.schema import (
    DIM_ROLE_ROUTE,
    DIM_TOOL_SERVICE,
    TRANSCRIPT_SCHEMA,
)
from opentelemetry_collector_ray.stages.enrich import enrich_batch
from opentelemetry_collector_ray.stages.parse import ParseStage, parse_batch
from opentelemetry_collector_ray.stages.route import (
    explode_sinks_batch,
    route_batch,
)


def test_generator_deterministic_and_schema():
    a = gen_transcripts(100)
    b = gen_transcripts(100)
    assert a.equals(b)
    assert a.schema == TRANSCRIPT_SCHEMA
    assert a.num_rows == int(sum(n_turns(i) for i in range(100)))
    # disjoint ranges concatenate to the same corpus
    c = pa.concat_tables(
        [gen_transcripts(60), gen_transcripts(40, start_conv=60)]
    )
    assert c.equals(a)


def test_parse_roundtrip():
    t = gen_transcripts(80)
    p = parse_batch(t)
    ok = p.filter(pc.equal(p["parse_ok"], True))
    miss = p.filter(pc.equal(p["parse_ok"], False))
    assert ok.num_rows + miss.num_rows == t.num_rows
    assert 0 < miss.num_rows < t.num_rows * 0.15
    # reconstruct text from parsed fields == original (lossless grok)
    rebuilt = [
        f"[{l}] action={a} latency_ms={n} msg={m}"
        for l, a, n, m in zip(
            ok["level"].to_pylist(),
            ok["action"].to_pylist(),
            ok["latency_ms"].to_pylist(),
            ok["msg"].to_pylist(),
        )
    ]
    assert rebuilt == ok["text"].to_pylist()
    # misses keep null fields
    assert miss["level"].null_count == miss.num_rows
    assert miss["latency_ms"].null_count == miss.num_rows


def test_parse_stage_class_matches_function():
    t = gen_transcripts(30)
    assert ParseStage()(t).equals(parse_batch(t))


def test_enrich_lookup():
    t = parse_batch(gen_transcripts(60))
    e = enrich_batch(t)
    tools = e["tool"].to_pylist()
    roles = e["role"].to_pylist()
    assert e["service"].to_pylist() == [
        DIM_TOOL_SERVICE.get(x, "unknown") for x in tools
    ]
    assert e["route"].to_pylist() == [DIM_ROLE_ROUTE[r] for r in roles]


def test_route_fanout():
    e = enrich_batch(parse_batch(gen_transcripts(60)))
    r = route_batch(e)
    x = explode_sinks_batch(e)
    # sinks list rule: route always present; errors iff level == ERROR
    for sinks, route, level in zip(
        r["sinks"].to_pylist(), r["route"].to_pylist(), r["level"].to_pylist()
    ):
        want = [route] + (["errors"] if level == "ERROR" else [])
        assert sinks == want
    # exploded row count == total sink memberships
    assert x.num_rows == pc.sum(pc.list_value_length(r["sinks"])).as_py()
    # per-turn text equality through the fanout (no mutation in flight)
    base = x.filter(pc.not_equal(x["sink"], "errors"))
    assert base.num_rows == e.num_rows


def test_null_typed_block_dictionary_probes():
    """An all-null block degrades its column to Arrow's null TYPE;
    every index_in dictionary probe must pass it through instead of
    throwing ArrowTypeError (found by the metrics_transform property
    test; enrich and severity share the idiom)."""
    import numpy as np
    import pyarrow as pa

    from opentelemetry_collector_ray.stages.enrich import enrich_batch
    from opentelemetry_collector_ray.stages.signals import (
        severity_number_batch,
    )

    t = pa.table(
        {
            "tool": pa.array([None, None], type=pa.null()),
            "role": pa.array([None, None], type=pa.null()),
            "level": pa.array([None, None], type=pa.null()),
        }
    )
    e = enrich_batch(t)
    assert e["service"].to_pylist() == ["unknown", "unknown"]
    assert e["route"].to_pylist() == ["ingest", "ingest"]
    s = severity_number_batch(t)
    assert s["severity_number"].to_pylist() == [0, 0]
