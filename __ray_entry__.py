"""Driver contract for the Ray-Data-native OTel-collector-style engine.

``entry()`` — flagship parse→enrich→route pipeline over sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — matching DuckDB SQL over the same parquet views.

Ray is initialised by the driver before import; nothing here calls
``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

import pyarrow as pa

# The driver calls ray.init() BEFORE importing this module, possibly from a
# different cwd — so (a) make the package importable here, and (b) ship the
# package code by value inside every task/actor pickle so Ray workers never
# need it on their own sys.path.
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import opentelemetry_collector_ray  # noqa: E402

try:
    from ray import cloudpickle as _cp

    _cp.register_pickle_by_value(opentelemetry_collector_ray)
except Exception:  # pragma: no cover - best effort; cwd==repo still works
    pass


# --------------------------------------------------------------- helpers
def _transcripts(sf_dir: str):
    from opentelemetry_collector_ray.sources.transcripts import (
        transcripts_from_events,
    )

    return transcripts_from_events(sf_dir)


def _parsed(sf_dir: str):
    from opentelemetry_collector_ray.stages.parse import parse_batch

    return _transcripts(sf_dir).map_batches(parse_batch, batch_format="pyarrow")


def _enriched(sf_dir: str):
    from opentelemetry_collector_ray.stages.enrich import enrich_batch

    return _parsed(sf_dir).map_batches(enrich_batch, batch_format="pyarrow")


def _routed_rows(sf_dir: str):
    from opentelemetry_collector_ray.stages.route import explode_sinks_batch

    return _enriched(sf_dir).map_batches(
        explode_sinks_batch, batch_format="pyarrow"
    )


# ---------------------------------------------------------------- queries
def q_transcripts(sf_dir: str):
    return _transcripts(sf_dir)


def q_parse(sf_dir: str):
    return _parsed(sf_dir)


def q_enrich(sf_dir: str):
    return _enriched(sf_dir)


def q_route_rows(sf_dir: str):
    return _routed_rows(sf_dir).select_columns(["conv_id", "turn_idx", "sink"])


def q_sink_counts(sf_dir: str):
    from opentelemetry_collector_ray.pipelines.logs import sink_counts

    return sink_counts(_enriched(sf_dir))


def q_errors_sink(sf_dir: str):
    """Content of the 'errors' sink — routed-row + per-turn text equality."""
    import pyarrow.compute as pc

    ds = _routed_rows(sf_dir)
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t["sink"], "errors")).select(
            ["conv_id", "turn_idx", "text"]
        ),
        batch_format="pyarrow",
    )


def q_filter_severity(sf_dir: str):
    """filterprocessor analogue: drop everything below WARN."""
    import pyarrow.compute as pc

    def keep(t: pa.Table) -> pa.Table:
        mask = pc.is_in(
            pc.fill_null(t["level"], ""), value_set=pa.array(["WARN", "ERROR"])
        )
        return t.filter(mask).select(
            ["conv_id", "turn_idx", "level", "latency_ms"]
        )

    return _parsed(sf_dir).map_batches(keep, batch_format="pyarrow")


def q_route_latency_agg(sf_dir: str):
    """Aggregate over parsed values per route: count + total latency."""
    from ray.data.aggregate import Count, Sum

    ds = _enriched(sf_dir)
    return ds.groupby("route").aggregate(
        Count(alias_name="n"), Sum("latency_ms", alias_name="sum_latency")
    )


QUERIES: dict[str, Callable[[str], Any]] = {
    "transcripts": q_transcripts,
    "parse": q_parse,
    "enrich": q_enrich,
    "route_rows": q_route_rows,
    "sink_counts": q_sink_counts,
    "errors_sink": q_errors_sink,
    "filter_severity": q_filter_severity,
    "route_latency_agg": q_route_latency_agg,
}


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (driver smoke check)."""
    from opentelemetry_collector_ray.pipelines.logs import (
        build_transcript_pipeline,
    )
    from opentelemetry_collector_ray.sources.transcripts import (
        transcripts_from_events,
    )

    ds = transcripts_from_events("/root/testdata/sf0.001")
    return build_transcript_pipeline(ds)


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from opentelemetry_collector_ray import oracle as o

    return {
        "transcripts": o.TRANSCRIPTS_CTE + "SELECT * FROM transcripts",
        "parse": o.PARSED_CTE + "SELECT * FROM parsed2",
        "enrich": o.ENRICHED_CTE + "SELECT * FROM enriched",
        "route_rows": o.ROUTED_CTE
        + "SELECT conv_id, turn_idx, sink FROM routed",
        "sink_counts": o.ROUTED_CTE
        + "SELECT sink, count(*) AS n FROM routed GROUP BY sink",
        "errors_sink": o.ROUTED_CTE
        + "SELECT conv_id, turn_idx, text FROM routed WHERE sink = 'errors'",
        "filter_severity": o.PARSED_CTE
        + (
            "SELECT conv_id, turn_idx, level, latency_ms FROM parsed2 "
            "WHERE coalesce(level, '') IN ('WARN', 'ERROR')"
        ),
        "route_latency_agg": o.ENRICHED_CTE
        + (
            "SELECT route, count(*) AS n, "
            "cast(sum(latency_ms) AS bigint) AS sum_latency "
            "FROM enriched GROUP BY route"
        ),
    }
