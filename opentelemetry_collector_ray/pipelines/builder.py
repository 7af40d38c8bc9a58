"""Pipeline builder — config → Ray Data DAG.

The ``graph.Build`` analogue (service/internal/graph/graph.go:66-80):
the reference assembles receiver → capabilities → processors → fanout →
exporters by constructing consumers in reverse topological order; here
the graph is a linear Dataset chain plus a terminal fan-out, so the
builder is a fold over the stage registry (no capabilities node — Arrow
blocks are immutable; no reverse-topo — datasets are lazy, composition
order is declaration order).

``STAGE_REGISTRY`` is the factory table (the ``otelcol.Factories``
analogue, otelcol/factories.go / receiver/receiver.go:69-94): stage
type name → builder ``(options) -> batch_fn | (cls, ctor_kwargs)``.
Users register custom stages with :func:`register_stage` — the
processorhelper one-function extension point
(processor/processorhelper/logs.go:40-82).
"""

from __future__ import annotations

from collections.abc import Callable

import ray.data

from ..state import metrics as _metrics
from .config import ConfigError, PipelineConfig, load_config


class _CountedStage:
    """Data-plane obsreport wrapper (obs_processor.go:24-33 names):
    counts rows out as ``accepted`` and rows in minus rows out as
    ``dropped`` per stage, via ONE fire-and-forget RPC per block to the
    run's named counter actor (never awaited — no data-plane stall; the
    actor is num_cpus=0). ``refused`` stays a structural zero in batch
    mode (backpressure replaces refusal). Wraps either a plain batch fn
    or a stage class (constructed once per actor, the stateful idiom).
    Gated by ``engine.processorCounters`` — default off, so ungated
    pipelines carry zero overhead."""

    def __init__(self, *, stage_name, run_id, fn=None, cls=None, kwargs=None):
        import os

        self.inner = fn if fn is not None else cls(**(kwargs or {}))
        self.stage_name = stage_name
        self.run_id = run_id
        self._actors = None
        # round-robin start varies per worker so shards load evenly
        self._rr = os.getpid()

    # batch_send_size histogram bounds (processor/batchprocessor/
    # metrics.go:111-219 idiom: distribution of emitted batch sizes)
    SIZE_BOUNDS = (1024, 8192, 65536)

    def __call__(self, batch):
        out = self.inner(batch)
        if self._actors is None:
            # SHARDED counter actors (one per ~16 cluster CPUs): a
            # single actor takes one RPC per block from every counted
            # stage — a hotspot on a wide cluster. Counts merge by sum
            # at snapshot time, so any add may land on any shard.
            self._actors = _metrics.get_metrics_shards(self.run_id)
        updates = {
            _metrics.processor_accepted(self.stage_name): len(out)
        }
        dropped = len(batch) - len(out)
        if dropped > 0:
            updates[_metrics.processor_dropped(self.stage_name)] = dropped
        le = next(
            (str(b) for b in self.SIZE_BOUNDS if len(out) <= b), "inf"
        )
        updates[f"processor/{self.stage_name}/batch_send_size/le_{le}"] = 1
        self._rr = (self._rr + 1) % len(self._actors)
        self._actors[self._rr].add_many.remote(updates)
        return out


def _build_parse(opts):
    from ..stages.parse import GROK_PATTERN, ParseStage

    pattern = opts.get("pattern", GROK_PATTERN)
    return (ParseStage, {"pattern": pattern})


def _build_enrich(opts):
    from ..stages.enrich import EnrichStage

    return (
        EnrichStage,
        {
            "tool_service": opts.get("tool_service"),
            "role_route": opts.get("role_route"),
        },
    )


def _build_attributes(opts):
    from ..stages.attributes import AttributesStage

    return (AttributesStage, {"actions": opts.get("actions", [])})


def _build_filter(opts):
    from ..stages.filters import FilterStage

    return (
        FilterStage,
        {"include": opts.get("include"), "exclude": opts.get("exclude")},
    )


def _build_route(opts):
    from ..stages.route import route_batch

    return route_batch


def _build_explode_sinks(opts):
    from ..stages.route import explode_sinks_batch

    return explode_sinks_batch


def _build_token_stats(opts):
    from ..stages.text import token_stats_batch

    return token_stats_batch


def _build_quality(opts):
    from ..stages.text import quality_batch

    return quality_batch


def _build_fingerprint(opts):
    from ..stages.text import fingerprint_batch

    return fingerprint_batch


def _build_map_attributes(opts):
    # pcommon.Map mutation surface over an open-ended map column:
    # {type: map_attributes, column: attrs, from_json: props,
    #  actions: [{action: upsert, key: k, value: v}, ...]}
    from ..stages.maps import MapAttributesStage

    return (
        MapAttributesStage,
        {
            "column": opts.get("column", "attributes"),
            "actions": opts.get("actions", []),
            "from_json": opts.get("from_json"),
        },
    )


def _build_condition_filter(opts):
    # OTTL-style string condition (transformprocessor parity):
    # {type: condition_filter, condition: "level == 'ERROR' and ..."}
    from ..stages.ottl import ConditionFilter

    return ConditionFilter(opts["condition"])


def _build_transform(opts):
    # OTTL statement list (transformprocessor parity):
    # {type: transform, statements: ["set(x, 'v') where c", ...]}
    from ..stages.ottl_statements import TransformStage

    return TransformStage(list(opts["statements"]))


def _build_memory_limiter(opts):
    # explicit per-worker memory budget (memorylimiterprocessor
    # parity): {type: memory_limiter, limit_mib: N[, spike_limit_mib]}
    from ..stages.memlimit import MemoryLimiterStage

    kwargs = {"limit_mib": float(opts["limit_mib"])}
    if "spike_limit_mib" in opts:
        kwargs["spike_limit_mib"] = float(opts["spike_limit_mib"])
    if "recovery_timeout_s" in opts:
        kwargs["recovery_timeout_s"] = float(opts["recovery_timeout_s"])
    return MemoryLimiterStage, kwargs


STAGE_REGISTRY: dict[str, Callable] = {
    "parse": _build_parse,
    "enrich": _build_enrich,
    "attributes": _build_attributes,
    "filter": _build_filter,
    "route": _build_route,
    "explode_sinks": _build_explode_sinks,
    "token_stats": _build_token_stats,
    "quality": _build_quality,
    "fingerprint": _build_fingerprint,
    "condition_filter": _build_condition_filter,
    "transform": _build_transform,
    "map_attributes": _build_map_attributes,
    "memory_limiter": _build_memory_limiter,
    "rebatch": None,  # handled structurally (dataset-level, not batch-level)
}


def register_stage(name: str, builder: Callable) -> None:
    """Extension point: add a custom stage factory (factories idiom)."""
    if name in STAGE_REGISTRY:
        raise ConfigError(f"stage type already registered: {name!r}")
    STAGE_REGISTRY[name] = builder


def build_source(cfg: PipelineConfig) -> ray.data.Dataset:
    src = cfg.source
    if src.type == "parquet" or src.type == "transcripts":
        kwargs = {}
        if src.columns:
            kwargs["columns"] = src.columns
        paths = src.paths
        if src.storage_options:
            # configauth parity: per-source credentials become the
            # filesystem constructor's kwargs (sources/wirefs registry).
            # One filesystem is resolved from the first path and every
            # entry must live on it (strip_scheme documents the
            # mixed-scheme assumption).
            from ..sources import wirefs

            fs, _ = wirefs.resolve_fs(paths[0], None, src.storage_options)
            kwargs["filesystem"] = fs
            paths = [wirefs.strip_scheme(p) for p in paths]
        return ray.data.read_parquet(paths, **kwargs)
    if src.type == "events_transcripts":
        from ..sources.transcripts import transcripts_from_events

        return transcripts_from_events(src.sf_dir)
    raise ConfigError(f"unknown source type: {src.type!r}")


def run_service(spec: dict | str) -> dict:
    """Multi-pipeline service run (service.pipelines shape): pipelines
    declaring the SAME source share one Dataset read (the shared-
    receiver-instance semantics, internal/sharedcomponent/
    sharedcomponent.go:28-58 — one receiver fanning into every pipeline
    that lists it). Returns {pipeline_name: run report}."""
    from .config import load_service_config

    cfgs = load_service_config(spec)

    def skey(cfg):
        import json as _json

        return (
            cfg.source.type,
            tuple(cfg.source.paths or []),
            cfg.source.sf_dir,
            tuple(cfg.source.columns or []),
            # canonical-JSON so NESTED option dicts (valid per config
            # validation) stay hashable (review finding, r4)
            _json.dumps(cfg.source.storage_options or {}, sort_keys=True),
        )

    # shared sources: a lazy Dataset re-executes its read per consumer,
    # so sharing the *object* alone shares nothing — materialize() a
    # source only when ≥2 pipelines consume it (read once, blocks
    # pinned in the object store and fanned into every pipeline — the
    # actual shared-receiver semantics; a single-consumer source stays
    # lazy/streaming).
    from collections import Counter

    uses = Counter(skey(cfg) for cfg in cfgs.values())
    sources: dict[tuple, ray.data.Dataset] = {}
    reports = {}
    for name, cfg in cfgs.items():
        key = skey(cfg)
        if key not in sources:
            ds = build_source(cfg)
            sources[key] = ds.materialize() if uses[key] > 1 else ds
        reports[name] = _run_one(cfg, sources[key])
    return reports


def _run_one(cfg: PipelineConfig, source: ray.data.Dataset) -> dict:
    from ..sinks.retry import AttemptTimeout, RetryPolicy, retry_call
    from ..sinks.writers import atomic_write_parquet, write_sinks
    from ..state.checkpoint import _is_io_failure

    def _retryable(e: BaseException) -> bool:
        return _is_io_failure(e) or isinstance(e, AttemptTimeout)

    counters_run_id = None
    counters_actor = None
    if cfg.gates.get("engine.processorCounters"):
        import uuid

        counters_run_id = _metrics.shard_run_id(uuid.uuid4().hex[:8])
        # the DRIVER must own the named actors AND hold their handles
        # for the whole run: a named (non-detached) actor is destroyed
        # when its last handle drops, and worker get_if_exists handles
        # are transient — without this reference every worker would
        # talk to its own short-lived recreation
        counters_actor = _metrics.get_metrics_shards(counters_run_id)
    ds = _apply_stages(source, cfg, counters_run_id=counters_run_id)
    out_dir = cfg.sinks.out_dir
    sizing = (
        {"min_rows_per_file": cfg.sinks.min_rows_per_file}
        if cfg.sinks.min_rows_per_file
        else {}
    )
    if cfg.sinks.storage_options:
        sizing["storage_options"] = cfg.sinks.storage_options
    if cfg.sinks.compression:
        # forwarded to pyarrow's ParquetWriter via write_parquet —
        # "none" means store uncompressed (arrow spells it "NONE")
        sizing["compression"] = (
            "NONE"
            if cfg.sinks.compression == "none"
            else cfg.sinks.compression
        )
    # the exporter helper chain on the config path: obsreport counts
    # (per-sink report) ← retry sender ← timeout sender; the queue is
    # the streaming executor's backpressure. Per-attempt deadline =
    # sinks.write_timeout while engine.timeoutSender is on; each
    # attempt is idempotent (stage+swap), so abandoning one is safe.
    use_deadline = cfg.gates.get("engine.timeoutSender", True)
    policy = RetryPolicy(
        timeout=cfg.sinks.write_timeout if use_deadline else None
    )
    if cfg.sinks.mode == "route":
        from ..stages.route import explode_sinks_batch

        exploded = ds.map_batches(explode_sinks_batch, batch_format="pyarrow")
        sort_within = (
            ("conv_id", "turn_idx")
            if cfg.gates.get("engine.sortedSinkWrites")
            else None
        )
        per_sink = retry_call(
            lambda: write_sinks(
                exploded, out_dir, sort_within=sort_within, **sizing
            ),
            policy=policy,
            is_retryable=_retryable,
        )
        report = {"out_dir": out_dir, "per_sink": per_sink}
    else:
        n = retry_call(
            lambda: atomic_write_parquet(ds, out_dir, **sizing),
            policy=policy,
            is_retryable=_retryable,
        )
        report = {"out_dir": out_dir, "rows": int(n)}
    if counters_actor is not None:
        report["processor_counters"] = _metrics.settle_snapshot(
            counters_actor
        )
    if cfg.telemetry is not None:
        # service.telemetry analogue (service/telemetry.go:96): land the
        # run's obsreport counter snapshot over the engine's own OTLP
        # metrics wire at run end.
        import time

        from ..state.telemetry import export_telemetry

        snap: dict[str, int] = {}
        if "per_sink" in report:
            for sink, n in dict(report["per_sink"]).items():
                snap[_metrics.exporter_sent(str(sink))] = int(n)
            # every row routes to exactly one non-'errors' sink (ERROR
            # rows additionally fan to 'errors'), so receiver-accepted
            # is the non-errors sum — the obs_counters derivation
            snap[_metrics.receiver_accepted()] = int(
                sum(
                    int(n)
                    for sink, n in dict(report["per_sink"]).items()
                    if str(sink) != "errors"
                )
            )
        else:
            snap[_metrics.receiver_accepted()] = int(report["rows"])
            snap[_metrics.exporter_sent("single")] = int(report["rows"])
        for k, v in (report.get("processor_counters") or {}).items():
            snap[str(k)] = int(v)
        report["telemetry_path"] = export_telemetry(
            snap,
            cfg.telemetry.out_dir,
            time.time_ns(),
            wire=cfg.telemetry.wire,
            compression=cfg.telemetry.compression,
        )
    return report


def _default_concurrency() -> tuple[int, int]:
    """Actor-pool autoscale range for config-built stages: ceiling
    tracks the CLUSTER's CPU count (floor 8 so tiny test sessions still
    autoscale). A fixed ``(1, 8)`` ceiling — the round-2 default — is
    invisible on a 32-core sandbox but caps every actor stage at 8
    actors on a 256-node cluster and starves the pipeline."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return (1, max(8, cpus))


def _stage_concurrency(opts: dict):
    c = opts.get("concurrency")
    if c is None:
        return _default_concurrency()
    return tuple(c) if isinstance(c, list) else c


def _stage_remote_args(opts: dict, stage_type: str | None = None) -> dict:
    """Scheduler-side memory budget (memorylimiter parity, half 2 —
    see stages/memlimit.py): ``memory_mib`` on any stage becomes the
    Ray ``memory`` resource, so the scheduler reserves that heap per
    actor/task and never co-locates more workers than the node holds.

    (Refusal retryability is handled INSIDE MemoryLimiterStage — a
    bounded wait-for-recovery — because Ray actor pools reject
    ``retry_exceptions`` as a creation option and Ray Data exposes no
    per-method retry surface; an unhandled refusal exception would
    abort the whole pipeline, not backpressure it.)"""
    out: dict = {}
    mib = opts.get("memory_mib")
    if mib is not None:
        out["memory"] = int(float(mib) * 1024 * 1024)
    return out


def _apply_stages(
    ds: ray.data.Dataset,
    cfg: PipelineConfig,
    *,
    counters_run_id: str | None = None,
) -> ray.data.Dataset:
    seen: dict[str, int] = {}
    for st in cfg.stages:
        if st.type == "rebatch":
            from ..stages.batch import rebatch

            ds = rebatch(
                ds,
                st.options.get("rows", 65536),
                num_blocks=st.options.get("num_blocks"),
            )
            continue
        # unique obsreport name per stage instance (a pipeline may use
        # the same stage type twice; config validation already forbids
        # exact duplicates, this disambiguates type reuse)
        idx = seen[st.type] = seen.get(st.type, 0) + 1
        stage_name = st.type if idx == 1 else f"{st.type}#{idx}"
        built = STAGE_REGISTRY[st.type](st.options)
        if isinstance(built, tuple):
            cls, kwargs = built
            if counters_run_id is not None:
                ds = ds.map_batches(
                    _CountedStage,
                    fn_constructor_kwargs={
                        "stage_name": stage_name,
                        "run_id": counters_run_id,
                        "cls": cls,
                        "kwargs": kwargs,
                    },
                    batch_format="pyarrow",
                    batch_size=st.options.get("batch_size"),
                    concurrency=_stage_concurrency(st.options),
                    **_stage_remote_args(st.options, st.type),
                )
            else:
                ds = ds.map_batches(
                    cls,
                    fn_constructor_kwargs=kwargs,
                    batch_format="pyarrow",
                    batch_size=st.options.get("batch_size"),
                    concurrency=_stage_concurrency(st.options),
                    **_stage_remote_args(st.options, st.type),
                )
        elif counters_run_id is not None:
            ds = ds.map_batches(
                _CountedStage,
                fn_constructor_kwargs={
                    "stage_name": stage_name,
                    "run_id": counters_run_id,
                    "fn": built,
                },
                batch_format="pyarrow",
                batch_size=st.options.get("batch_size"),
                concurrency=_stage_concurrency(st.options),
                **_stage_remote_args(st.options, st.type),
            )
        else:
            # plain-function stage, counters off: honor the per-stage
            # batch_size knob here too (it was silently dropped)
            ds = ds.map_batches(
                built,
                batch_format="pyarrow",
                batch_size=st.options.get("batch_size"),
                **_stage_remote_args(st.options, st.type),
            )
    return ds


def build_dataset(cfg: PipelineConfig) -> ray.data.Dataset:
    """source + stages → lazy Dataset (no sink consumption)."""
    return _apply_stages(build_source(cfg), cfg)


def run_pipeline(spec: dict | str) -> dict:
    """Config in, run out: build, write sinks atomically (stage + swap;
    Ray's write_parquet default APPENDs, a rerun must replace), return
    the run report (per-sink counts — the obsreport surface)."""
    cfg = load_config(spec)
    return _run_one(cfg, build_source(cfg))
