"""opentelemetry_collector_ray — a Ray-Data-native log/telemetry engine.

A from-scratch reimplementation of the data-processing capabilities of the
OpenTelemetry Collector (reference: lightstep/opentelemetry-collector,
~v0.75 core) as a streaming parse → enrich → route → aggregate DAG over
Parquet transcript tables, built on ``ray.data.Dataset`` / ``map_batches``
over zero-copy Arrow batches.

Layout (each module cites the reference files whose *semantics* it
re-expresses — the execution model is Ray Data, not a port):

- ``schema``     — Arrow schemas for the transcript data model
                   (pdata/plog analogue, flattened to one row per turn).
- ``fixtures``   — deterministic synthetic transcript generator
                   (internal/testdata/log.go analogue).
- ``sources``    — Parquet readers + the events→transcripts derivation
                   (receiver analogues).
- ``stages``     — batch transforms: parse (grok), enrich (lookup),
                   route (fanoutconsumer), attributes, filter, batch
                   sizing, dedup, text analysis, similarity, windows
                   (processor analogues).
- ``sinks``      — partitioned/atomic Parquet writers (exporter analogues).
- ``state``      — obsreport-style metrics actor + checkpoint ledger
                   (persistent-queue analogue).
- ``pipelines``  — YAML config → Dataset DAG builder (service/graph
                   analogue) and the flagship logs pipeline.
"""

__version__ = "0.1.0"
