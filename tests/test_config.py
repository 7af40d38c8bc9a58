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


def test_run_service_shared_source(corpus, tmp_path):
    """Two pipelines sharing one source (shared-receiver semantics):
    different filters, both sinks correct."""
    from opentelemetry_collector_ray.pipelines.builder import run_service

    spec = {
        "service": {
            "pipelines": {
                "errors_only": {
                    "source": {"type": "parquet", "paths": [corpus]},
                    "stages": [
                        {"type": "parse"},
                        {"type": "enrich"},
                        {
                            "type": "filter",
                            "include": [["level", "==", "ERROR"]],
                        },
                    ],
                    "sinks": {"mode": "single", "out_dir": str(tmp_path / "a")},
                },
                "all_routed": {
                    "source": {"type": "parquet", "paths": [corpus]},
                    "stages": [{"type": "parse"}, {"type": "enrich"}],
                    "sinks": {"mode": "route", "out_dir": str(tmp_path / "b")},
                },
            }
        }
    }
    reports = run_service(spec)
    import ray.data

    n_in = ray.data.read_parquet(corpus).count()
    assert reports["all_routed"]["per_sink"]["errors"] == reports[
        "errors_only"
    ]["rows"]
    base = sum(
        v for k, v in reports["all_routed"]["per_sink"].items() if k != "errors"
    )
    assert base == n_in


def test_service_config_validation():
    from opentelemetry_collector_ray.pipelines.config import (
        load_service_config,
    )

    with pytest.raises(ConfigError, match="service"):
        load_service_config({"pipeline": {}})
    with pytest.raises(ConfigError, match="at least one pipeline"):
        load_service_config({"service": {"pipelines": {}}})


def test_retry_policy_semantics():
    from opentelemetry_collector_ray.sinks.retry import (
        PermanentError,
        RetryPolicy,
        retry_call,
    )

    sleeps = []
    policy = RetryPolicy(max_elapsed=50.0)
    policy.sleep = sleeps.append

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 4:
            raise OSError("transient")
        return "ok"

    assert retry_call(flaky, policy=policy) == "ok"
    # backoff schedule: 5, 7.5, 11.25 (initial 5, x1.5 — the reference
    # defaults queued_retry.go:267-277)
    assert sleeps == [5.0, 7.5, 11.25]

    with pytest.raises(PermanentError):
        retry_call(
            lambda: (_ for _ in ()).throw(PermanentError("4xx")), policy=policy
        )

    # gives up after max_elapsed; last wait capped to remaining budget
    policy2 = RetryPolicy(initial_interval=20.0, max_elapsed=30.0)
    waits = []
    policy2.sleep = waits.append
    with pytest.raises(OSError):
        retry_call(lambda: (_ for _ in ()).throw(OSError("x")), policy=policy2)
    assert waits == [20.0, 10.0]  # 20, then capped to the 10 remaining


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
