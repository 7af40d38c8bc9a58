"""OTTL statement language (transformprocessor parity): parser, every
statement function, where-masking on plain and map columns, and the
config-pipeline integration of the `transform` stage."""

import pyarrow as pa
import pytest

from opentelemetry_collector_ray.stages.maps import map_from_columns
from opentelemetry_collector_ray.stages.ottl_statements import (
    TransformStage,
    apply_statement,
    parse_statement,
)


def _batch():
    t = pa.table(
        {
            "level": ["ERROR", "INFO", None, "WARN"],
            "latency_ms": pa.array([120, 30, None, 80], type=pa.int64()),
            "msg": ["err 42 here", "ok 7", "none", "warn 9 x 10"],
            "service": ["data", "infra", "web", "data"],
        }
    )
    return t.append_column("attrs", map_from_columns(t, ["level", "service"]))


def _attrs(batch, row):
    return {
        e["key"]: e["value"] for e in batch["attrs"].to_pylist()[row]
    }


def test_set_where_and_null_mask():
    out = apply_statement(
        _batch(), parse_statement("set(flag, 'slow') where latency_ms > 50")
    )
    out = apply_statement(
        out, parse_statement("set(flag, 'fast') where latency_ms <= 50")
    )
    # the null-latency row matches NEITHER branch (Kleene null → false)
    assert out["flag"].to_pylist() == ["slow", "fast", None, "slow"]


def test_set_from_column_and_converter():
    out = apply_statement(
        _batch(), parse_statement("set(svc2, Uppercase(service))")
    )
    assert out["svc2"].to_pylist() == ["DATA", "INFRA", "WEB", "DATA"]
    out = apply_statement(out, parse_statement("set(svc3, service)"))
    assert out["svc3"].to_pylist() == out["service"].to_pylist()


def test_set_overwrites_existing_column_only_where():
    out = apply_statement(
        _batch(),
        parse_statement("set(service, 'hot') where latency_ms > 100"),
    )
    assert out["service"].to_pylist() == ["hot", "infra", "web", "data"]


def test_replace_pattern_plain_and_where():
    out = apply_statement(
        _batch(), parse_statement("replace_pattern(msg, '[0-9]+', '#')")
    )
    assert out["msg"].to_pylist() == [
        "err # here",
        "ok #",
        "none",
        "warn # x #",
    ]
    out = apply_statement(
        _batch(),
        parse_statement(
            "replace_pattern(msg, '[0-9]+', '#') where level == 'ERROR'"
        ),
    )
    assert out["msg"].to_pylist()[1] == "ok 7"  # unmasked row untouched


def test_map_set_rename_delete_where():
    b = _batch()
    b = apply_statement(
        b, parse_statement("set(attrs['svc'], service) where level == 'ERROR'")
    )
    assert _attrs(b, 0)["svc"] == "data" and "svc" not in _attrs(b, 1)
    b = apply_statement(b, parse_statement("rename_key(attrs, 'level', 'lvl')"))
    assert "lvl" in _attrs(b, 0) and "level" not in _attrs(b, 0)
    b = apply_statement(
        b,
        parse_statement("delete_key(attrs, 'service') where latency_ms > 100"),
    )
    assert "service" not in _attrs(b, 0) and "service" in _attrs(b, 1)


def test_map_keep_limit_truncate_replace():
    b = _batch()
    out = apply_statement(b, parse_statement("keep_keys(attrs, ['level'])"))
    assert list(_attrs(out, 0)) == ["level"]
    out = apply_statement(b, parse_statement("limit(attrs, 1)"))
    assert [len(r) for r in out["attrs"].to_pylist()] == [1, 1, 1, 1]
    out = apply_statement(b, parse_statement("truncate_all(attrs, 3)"))
    assert _attrs(out, 0) == {"level": "ERR", "service": "dat"}
    # null map VALUE survives truncation as null
    assert _attrs(out, 2)["level"] is None
    out = apply_statement(
        b, parse_statement("replace_all_patterns(attrs, '^d', 'D')")
    )
    assert _attrs(out, 0)["service"] == "Data"
    out = apply_statement(
        b, parse_statement("delete_matching_keys(attrs, '^lev')")
    )
    assert list(_attrs(out, 0)) == ["service"]


def test_map_replace_pattern_subscript():
    out = apply_statement(
        _batch(),
        parse_statement("replace_pattern(attrs['service'], 'a', 'A')"),
    )
    assert _attrs(out, 0)["service"] == "dAtA"


def test_parser_errors():
    with pytest.raises(ValueError):
        parse_statement("set(x 'v')")  # missing comma
    with pytest.raises(ValueError):
        parse_statement("frobnicate(x, 1)") and apply_statement(
            _batch(), parse_statement("frobnicate(x, 1)")
        )
    with pytest.raises(ValueError):
        apply_statement(_batch(), parse_statement("frobnicate(msg, 1)"))
    with pytest.raises(ValueError):
        parse_statement("set(x, 'v') where level == 'E' trailing")


def test_statement_order_matters():
    out = TransformStage(
        [
            "set(flag, 'a')",
            "set(flag, 'b') where flag == 'a'",
        ]
    )(_batch())
    assert set(out["flag"].to_pylist()) == {"b"}


def test_config_pipeline_transform_stage(ray_session, tmp_path):
    import ray.data

    from opentelemetry_collector_ray.pipelines.builder import build_dataset
    from opentelemetry_collector_ray.pipelines.config import load_config

    src = str(tmp_path / "in")
    ray.data.from_arrow(
        pa.table(
            {
                "conv_id": ["c1", "c2"],
                "turn_idx": pa.array([0, 0], type=pa.int32()),
                "role": ["user", "tool"],
                "text": [
                    "[ERROR] action=x latency_ms=9 msg=a",
                    "[INFO] action=y latency_ms=2 msg=b",
                ],
                "tool": ["bash", ""],
                "ts": pa.array([1, 2], type=pa.timestamp("us")),
            }
        )
    ).write_parquet(src)
    cfg = load_config(
        {
            "pipeline": {
                "source": {"type": "parquet", "paths": [src]},
                "stages": [
                    {"type": "parse"},
                    {
                        "type": "transform",
                        "statements": [
                            "set(flag, 'bad') where level == 'ERROR'",
                            "replace_pattern(msg, 'a', 'A')",
                        ],
                    },
                ],
                "sinks": {"mode": "route", "out_dir": str(tmp_path / "out")},
            }
        }
    )
    out = build_dataset(cfg).to_pandas().sort_values("conv_id")
    assert out["flag"].tolist() == ["bad", None]
    assert out["msg"].tolist() == ["A", "b"]
