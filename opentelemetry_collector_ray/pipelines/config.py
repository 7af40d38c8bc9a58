"""Pipeline configuration — YAML spec → validated config.

Mirrors the collector's config surface shrunk to batch semantics: the
service pipeline shape ``{receivers[], processors[], exporters[]}`` with
validation (≥1 receiver, ≥1 exporter, no duplicate processors —
service/config.go:70-98), YAML unmarshalling via confmap
(confmap/resolver.go:60-76) minus providers/hot-reload (batch jobs
rebuild instead, SURVEY.md §2.8).

Spec::

    pipeline:
      source:  {type: parquet|transcripts|events_transcripts, paths|sf_dir, columns?}
      stages:  [{type: parse|enrich|attributes|filter|rebatch|route|..., ...}]
      sinks:   {mode: route|single, out_dir: ...}
"""

from __future__ import annotations

from dataclasses import dataclass, field


class ConfigError(ValueError):
    pass


KNOWN_SOURCES = {"parquet", "transcripts", "events_transcripts"}


@dataclass
class SourceConfig:
    type: str
    paths: list[str] | None = None
    sf_dir: str | None = None
    columns: list[str] | None = None


@dataclass
class StageConfig:
    type: str
    name: str
    options: dict = field(default_factory=dict)


@dataclass
class SinkConfig:
    mode: str = "route"
    out_dir: str | None = None
    # file-sizing knob (SURVEY §4 "Batching for sink efficiency")
    min_rows_per_file: int | None = None


@dataclass
class PipelineConfig:
    source: SourceConfig
    stages: list[StageConfig]
    sinks: SinkConfig


def load_service_config(spec: dict | str) -> dict[str, PipelineConfig]:
    """Multi-pipeline service spec (service.pipelines.{name} shape,
    service/config.go:70-98): ``{service: {pipelines: {name: <pipeline
    spec body>}}}``. Each body is validated like a single pipeline."""
    spec = _load_yaml(spec)
    if not isinstance(spec, dict) or "service" not in spec:
        raise ConfigError("spec must contain a top-level 'service' key")
    svc = spec["service"]
    if not isinstance(svc, dict):
        raise ConfigError("'service' must be a mapping")
    pipelines = svc.get("pipelines")
    if not pipelines:
        raise ConfigError("service must define at least one pipeline")
    if not isinstance(pipelines, dict):
        raise ConfigError("'service.pipelines' must be a mapping of name → pipeline")
    out = {}
    for name, body in pipelines.items():
        if not isinstance(body, dict):
            raise ConfigError(f"pipeline {name!r} must be a mapping")
        out[name] = load_config({"pipeline": body})
    # two pipelines writing the same out_dir would clobber each other's
    # atomic swap — reject like duplicate exporters would collide
    seen_dirs = {}
    for name, cfg in out.items():
        other = seen_dirs.setdefault(cfg.sinks.out_dir, name)
        if other != name:
            raise ConfigError(
                f"pipelines {other!r} and {name!r} share out_dir "
                f"{cfg.sinks.out_dir!r}"
            )
    return out


def _load_yaml(spec: dict | str) -> dict:
    if isinstance(spec, str):
        import os

        import yaml

        if os.path.exists(spec):
            with open(spec) as f:
                return yaml.safe_load(f)
        return yaml.safe_load(spec)
    return spec


def load_config(spec: dict | str) -> PipelineConfig:
    """Parse + validate a pipeline spec (dict, YAML string, or path)."""
    spec = _load_yaml(spec)
    if not isinstance(spec, dict) or "pipeline" not in spec:
        raise ConfigError("spec must contain a top-level 'pipeline' key")
    p = spec["pipeline"]
    if not isinstance(p, dict):
        raise ConfigError("'pipeline' must be a mapping")

    src = p.get("source")
    if not src:
        raise ConfigError("pipeline must reference at least one source")
    if not isinstance(src, dict):
        raise ConfigError("'source' must be a mapping")
    if src.get("type") not in KNOWN_SOURCES:
        raise ConfigError(f"unknown source type: {src.get('type')!r}")
    source = SourceConfig(
        type=src["type"],
        paths=src.get("paths"),
        sf_dir=src.get("sf_dir"),
        columns=src.get("columns"),
    )
    if source.type == "parquet" and not source.paths:
        raise ConfigError("parquet source needs paths")
    if source.type == "events_transcripts" and not source.sf_dir:
        raise ConfigError("events_transcripts source needs sf_dir")

    from .builder import STAGE_REGISTRY

    stages = []
    seen = set()
    for i, s in enumerate(p.get("stages", [])):
        stype = s.get("type")
        if stype not in STAGE_REGISTRY:
            raise ConfigError(f"unknown stage type: {stype!r}")
        name = s.get("name", stype)
        if name in seen:
            # duplicate processor names are rejected, service/config.go:88-93
            raise ConfigError(f"duplicate stage name: {name!r}")
        seen.add(name)
        opts = {k: v for k, v in s.items() if k not in {"type", "name"}}
        stages.append(StageConfig(type=stype, name=name, options=opts))

    sk = p.get("sinks")
    if not sk:
        raise ConfigError("pipeline must reference at least one sink")
    if not isinstance(sk, dict):
        raise ConfigError("'sinks' must be a mapping")
    sinks = SinkConfig(
        mode=sk.get("mode", "route"),
        out_dir=sk.get("out_dir"),
        min_rows_per_file=sk.get("min_rows_per_file"),
    )
    if sinks.mode not in {"route", "single"}:
        raise ConfigError(f"unknown sink mode: {sinks.mode!r}")
    if not sinks.out_dir:
        raise ConfigError("sinks need out_dir")

    return PipelineConfig(source=source, stages=stages, sinks=sinks)
