"""Config validation + builder tests — mirrors the reference's config
tests (service/config.go:70-98 validation rules; otelcoltest YAML
loading)."""

import os

import pytest

from opentelemetry_collector_ray.fixtures import write_transcript_corpus
from opentelemetry_collector_ray.pipelines.builder import (
    build_dataset,
    register_stage,
    run_pipeline,
)
from opentelemetry_collector_ray.pipelines.config import ConfigError, load_config


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("cfg_corpus")
    write_transcript_corpus(str(d), 100, files=2)
    return str(d)


def _spec(corpus, out):
    return {
        "pipeline": {
            "source": {"type": "parquet", "paths": [corpus]},
            "stages": [
                {"type": "parse"},
                {"type": "enrich"},
            ],
            "sinks": {"mode": "route", "out_dir": out},
        }
    }


def test_yaml_roundtrip(corpus, tmp_path):
    yaml_text = f"""
pipeline:
  source:
    type: parquet
    paths: ["{corpus}"]
  stages:
    - type: parse
    - type: enrich
    - type: filter
      include: [["level", "in", ["WARN", "ERROR"]]]
  sinks:
    mode: single
    out_dir: "{tmp_path}/out"
"""
    cfg = load_config(yaml_text)
    assert [s.type for s in cfg.stages] == ["parse", "enrich", "filter"]
    ds = build_dataset(cfg)
    df = ds.to_pandas()
    assert set(df["level"].unique()) <= {"WARN", "ERROR"}


def test_validation_errors(corpus):
    with pytest.raises(ConfigError, match="source"):
        load_config({"pipeline": {"sinks": {"out_dir": "/tmp/x"}}})
    with pytest.raises(ConfigError, match="sink"):
        load_config(
            {"pipeline": {"source": {"type": "parquet", "paths": ["x"]}}}
        )
    with pytest.raises(ConfigError, match="unknown stage"):
        load_config(
            {
                "pipeline": {
                    "source": {"type": "parquet", "paths": ["x"]},
                    "stages": [{"type": "nope"}],
                    "sinks": {"out_dir": "/tmp/x"},
                }
            }
        )
    with pytest.raises(ConfigError, match="duplicate stage name"):
        load_config(
            {
                "pipeline": {
                    "source": {"type": "parquet", "paths": ["x"]},
                    "stages": [{"type": "parse"}, {"type": "parse"}],
                    "sinks": {"out_dir": "/tmp/x"},
                }
            }
        )
    with pytest.raises(ConfigError, match="unknown source"):
        load_config(
            {
                "pipeline": {
                    "source": {"type": "kafka"},
                    "sinks": {"out_dir": "/tmp/x"},
                }
            }
        )


def test_run_pipeline_route_mode(corpus, tmp_path):
    out = str(tmp_path / "sinks")
    report = run_pipeline(_spec(corpus, out))
    assert set(report["per_sink"]) == {
        "ingest",
        "replies",
        "tooling",
        "audit",
        "errors",
    }
    # fan-out invariant: base sinks sum to the input row count
    import ray.data

    n_in = ray.data.read_parquet(corpus).count()
    base = sum(
        v for k, v in report["per_sink"].items() if k != "errors"
    )
    assert base == n_in
    assert os.path.exists(os.path.join(out, "sink=errors"))


def test_register_custom_stage(corpus):
    calls = {}

    def my_builder(opts):
        def fn(batch):
            calls["n"] = calls.get("n", 0) + 1
            return batch

        return fn

    register_stage("my_custom", my_builder)
    cfg = load_config(
        {
            "pipeline": {
                "source": {"type": "parquet", "paths": [corpus]},
                "stages": [{"type": "my_custom"}],
                "sinks": {"mode": "single", "out_dir": "/tmp/unused"},
            }
        }
    )
    assert build_dataset(cfg).count() > 0
    with pytest.raises(ConfigError, match="already registered"):
        register_stage("my_custom", my_builder)
