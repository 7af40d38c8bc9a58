"""The flagship logs pipeline: parse → enrich → route → aggregate.

The Ray restatement of the collector's one-pipeline steady state
(SURVEY.md §3.1 step 5): receiver (parquet read) → processors
(map_batches chain, the synchronous consumer chain of docs/design.md:77
re-expressed as a streaming block pipeline) → fanout (route tagging) →
exporters (per-sink partitioned parquet) → obsreport counters (metrics
actor + per-sink aggregate counts).

All stages run ``batch_format="pyarrow"`` (zero-copy from the object
store). The only all-to-all operations are the tiny ``groupby("sink")``
over pre-aggregated partials and the optional per-sink sort, both noted
inline.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..stages.enrich import enrich_batch
from ..stages.parse import parse_batch
from ..stages.route import explode_sinks_batch, route_batch


def build_transcript_pipeline(ds: ray.data.Dataset) -> ray.data.Dataset:
    """transcripts → parsed + enriched + route-tagged (adds ``sinks``)."""
    return (
        ds.map_batches(parse_batch, batch_format="pyarrow")
        .map_batches(enrich_batch, batch_format="pyarrow")
        .map_batches(route_batch, batch_format="pyarrow")
    )


def _partial_sink_counts(batch: pa.Table) -> pa.Table:
    """Combiner: one (sink, n) row per sink per batch, so the global
    groupby shuffles O(sinks × blocks) rows instead of every record
    (pre-aggregation pattern — the batch processor's accumulate-then-emit
    shape, batch_processor.go:323-368, applied to counting)."""
    exploded = explode_sinks_batch(batch)
    counts = exploded.group_by("sink").aggregate([("sink", "count")])
    return counts.rename_columns(["sink", "n"])


def sink_counts(enriched: ray.data.Dataset):
    """Per-sink routed record counts — the exporter ``sent_log_records``
    numbers (obsmetrics/obs_exporter.go:37) as a pandas frame (sink, n).

    Combiner pattern: each block contributes ≤|sinks| partial rows, so
    the final combine is O(sinks × blocks) — small enough to finish on
    the driver (no all-to-all shuffle; at 10^6 blocks this is a few
    million tiny rows, still driver-sized; a ``groupby("sink")`` would
    shuffle the same partials through a full sort exchange for no win).
    """
    partials = enriched.map_batches(_partial_sink_counts, batch_format="pyarrow")
    pdf = partials.to_pandas()
    out = pdf.groupby("sink", as_index=False)["n"].sum()
    return out.sort_values("sink", kind="mergesort").reset_index(drop=True)


def run_logs_pipeline(
    input_paths,
    out_dir: str,
    *,
    run_id: str = "default",
) -> dict:
    """End-to-end run: read → parse → enrich → route → per-sink
    partitioned parquet + obsreport counter snapshot.

    The exploded (row, sink) stream is written ONCE with
    ``partition_cols=["sink"]`` — one scan feeds every exporter, the
    fanout never copies blocks, and each sink directory is independently
    re-readable (resumable layout).
    """
    import ray

    from ..sources.transcripts import read_transcripts
    from ..state import metrics as m

    from ..sinks.writers import write_sinks

    ds = read_transcripts(input_paths)
    parsed = ds.map_batches(parse_batch, batch_format="pyarrow").map_batches(
        enrich_batch, batch_format="pyarrow"
    )
    exploded = parsed.map_batches(explode_sinks_batch, batch_format="pyarrow")
    exploded = exploded.drop_columns(["msg"])
    # atomic one-pass fan-out write; per-sink counts are the obsreport
    # surface, counted at the exporter boundary like
    # obsreport_exporter.go:42-57.
    per_sink = write_sinks(exploded, out_dir)
    actor = m.get_metrics_actor(run_id)
    accepted = int(ds.count())
    updates = {m.receiver_accepted(): accepted}
    for sink, n in per_sink.items():
        updates[m.exporter_sent(sink)] = n
    ray.get(actor.add_many.remote(updates))
    snapshot = ray.get(actor.snapshot.remote())
    return {
        "accepted": accepted,
        "per_sink": per_sink,
        "counters": snapshot,
    }
