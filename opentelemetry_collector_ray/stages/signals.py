"""Traces / metrics signal analogues over the transcript model.

The reference carries three signals through one pipeline architecture
(pdata/ptrace, pdata/pmetric — SURVEY.md §1.2). The flat-table
restatement:

- **spans**: one row per span — a transcript turn maps to a span whose
  trace is the conversation (trace_id = conv_id, span_id = (conv_id,
  turn_idx), duration = parsed latency_ms, name = action, kind from
  role). `Traces.SpanCount()` (pdata/ptrace) becomes row count;
  span-level aggregates are plain groupbys.
- **metrics**: cumulative→delta temporality conversion (the contrib
  ``cumulativetodeltaprocessor`` idiom; AggregationTemporality —
  pdata/pmetric/aggregation_temporality.go): per series (key), ordered
  by time, ``delta[i] = value[i] - value[i-1]`` with the first point
  kept as-is. Partitioning: series key co-location, same single
  shuffle shape as sessionize.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# imported at module top, NOT inside the batch fn: a function-body
# relative import would execute on the worker, where this package is
# only available through pickle-by-value (no importable install).
from .enrich import _dict_lookup

SPAN_KIND = {  # role → SpanKind (ptrace/span_kind.go:23-43 vocabulary)
    "user": "CLIENT",
    "assistant": "SERVER",
    "tool": "INTERNAL",
    "system": "INTERNAL",
}


def spans_batch(batch: pa.Table) -> pa.Table:
    """Parsed transcripts → span rows (trace_id, span_name, kind,
    duration_ms). Parse misses produce null-duration spans (kept — the
    collector never drops on conversion)."""

    def col(name):
        c = batch[name]
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    return pa.table(
        {
            "trace_id": col("conv_id"),
            "span_idx": col("turn_idx"),
            "span_name": pc.fill_null(col("action"), "unparsed"),
            "kind": _dict_lookup(batch["role"], SPAN_KIND, default="INTERNAL"),
            "duration_ms": col("latency_ms"),
        }
    )


SPAN_STATUS_ERROR = "ERROR"  # ptrace/status.go StatusCode vocabulary
SPAN_STATUS_UNSET = "UNSET"


def span_details_batch(batch: pa.Table) -> pa.Table:
    """Span structure beyond the flat projection (generated_span.go:
    59-184): status code (level=ERROR → STATUS_ERROR else UNSET,
    status.go), a link to the causally-previous span of the same trace
    (linked_span_idx = turn_idx-1, null for roots — span links), and
    the span's event name (the parsed action — span events)."""

    def col(name):
        c = batch[name]
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    turn = col("turn_idx").to_numpy(zero_copy_only=False).astype(np.int32)
    linked = turn.astype(np.int64) - 1
    level = col("level")
    status = pc.if_else(
        pc.equal(pc.fill_null(level, ""), "ERROR"),
        SPAN_STATUS_ERROR,
        SPAN_STATUS_UNSET,
    )
    return pa.table(
        {
            "trace_id": col("conv_id"),
            "span_idx": col("turn_idx"),
            "status": status,
            "linked_span_idx": pa.array(
                np.where(linked >= 0, linked, None), type=pa.int64()
            ),
            "event_name": pc.fill_null(col("action"), "unparsed"),
        }
    )


def trace_groups(spans: ray.data.Dataset) -> ray.data.Dataset:
    """The groupbytrace idiom (contrib groupbytraceprocessor): assemble
    each trace's spans and emit one trace-complete summary row. The
    trace key (conv_id) is high-cardinality, so this uses the sharded
    groupby (one uniform shuffle, vectorized pandas aggregate per
    shard — never one Python call per trace)."""
    from ..functions.shard import sharded_group_map

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.assign(
                _err=(g["span_name"] == "unparsed").astype("int64"),
                _dur=g["duration_ms"].fillna(0).astype("int64"),
            )
            .groupby("trace_id", sort=False)
            .agg(
                n_spans=("span_idx", "size"),
                sum_ms=("_dur", "sum"),
                n_unparsed=("_err", "sum"),
            )
            .reset_index()
        )
        return agg.astype(
            {"n_spans": "int64", "sum_ms": "int64", "n_unparsed": "int64"}
        )

    return sharded_group_map(spans, ["trace_id"], per_shard)


def latency_histogram(
    ds: ray.data.Dataset,
    *,
    group: str = "route",
    value: str = "latency_ms",
    bounds: tuple[int, ...] = (10, 100, 1000),
) -> ray.data.Dataset:
    """Explicit-bucket histogram per group — the Histogram metric type
    (pdata/pmetric/metric_type.go:18-28, spanmetrics latency-histogram
    idiom). OTel le-bucket semantics: bucket ``le`` counts values
    ``v <= le``, partitioned into (prev, le]; the overflow bucket is
    'inf'. Mergeable by construction: per-batch partial counts on
    (group, le) combine through one tiny uniform groupby — the combiner
    shape, never a per-series reducer."""
    from ..functions.agg import grouped_count

    bounds_arr = np.asarray(bounds, dtype=np.int64)
    labels = np.asarray([str(int(b)) for b in bounds] + ["inf"], dtype=object)

    def bucketize(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[value]))
        v = t[value].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(bounds_arr, v, side="left")
        return pa.table(
            {
                group: t[group],
                "le": pa.array(labels[idx], type=pa.string()),
            }
        )

    rows = ds.map_batches(bucketize, batch_format="pyarrow")
    return grouped_count(rows, [group, "le"], alias="n")


def tail_sample(
    span_details: ray.data.Dataset, *, keep_mod: int = 20
) -> ray.data.Dataset:
    """Tail-based sampling (contrib tailsamplingprocessor): the keep
    decision needs the COMPLETE trace, then applies all-or-nothing per
    trace — two composed policies: ``status_code``-rate (keep every
    trace where ERROR spans exceed 20% of its spans — compared in
    integers, 5·errors > spans, so both engines agree bit-exactly) and
    deterministic ``probabilistic`` (keep 1/keep_mod of the rest, keyed
    on the trace's numeric suffix). One sharded co-group on trace_id;
    the whole trace's spans are co-located when the decision is
    evaluated — exactly the groupbytrace-then-decide shape."""
    from ..functions.shard import sharded_group_map

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        is_err = g["status"].eq(SPAN_STATUS_ERROR).astype(np.int64)
        err_n = is_err.groupby(g["trace_id"], sort=False).transform("sum")
        tot_n = g.groupby("trace_id", sort=False)["span_idx"].transform("size")
        err_heavy = 5 * err_n > tot_n
        sampled = (
            g["trace_id"].str.slice(5).astype(np.int64) % keep_mod == 0
        )
        out = g.loc[err_heavy | sampled, ["trace_id", "span_idx"]]
        return out.astype({"span_idx": "int32"})

    return sharded_group_map(span_details, ["trace_id"], per_shard)


def tail_sample_policies(
    parsed: ray.data.Dataset,
    *,
    latency_threshold_ms: int = 280,
    attr_action: str = "purchase",
    keep_mod: int = 3,
) -> ray.data.Dataset:
    """The tailsamplingprocessor POLICY SET (contrib
    processor/tailsamplingprocessor: status_code, latency,
    string_attribute, probabilistic composed under the composite
    policy's first-match precedence): per COMPLETE trace, record which
    policy sampled it —

    1. ``status_code``  — error-heavy trace (5·errors > spans, the
       integer rate rule ``tail_sample`` established)
    2. ``latency``      — max span latency ≥ threshold
    3. ``string_attribute`` — attr-heavy trace (6·matches > spans)
    4. ``probabilistic`` — deterministic 1/keep_mod on the trace id

    Thresholds are tuned so every policy fires on the synthetic corpus
    (any-match rules saturate: with ~66 spans/trace nearly every trace
    contains one ERROR and one purchase).

    Output: one row per SAMPLED trace (trace_id, n_spans, policy).
    Same sharded co-group as ``tail_sample`` — the decision sees the
    whole trace. All comparisons are integer/first-match so the SQL
    oracle agrees bit-exactly; null level/action compare unequal and a
    null-only latency group falls through (NaN-max vs NULL-max both
    fail the ≥)."""
    from ..functions.shard import sharded_group_map

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("trace_id", sort=False)
        # vectorized per-trace counts (.eq → grouped sum), never a
        # Python lambda per trace — same idiom as tail_sample
        keys = g["trace_id"]
        agg = pd.DataFrame(
            {
                "n_spans": grp["turn_idx"].size(),
                "errs": g["level"]
                .eq("ERROR")
                .astype(np.int64)
                .groupby(keys, sort=False)
                .sum(),
                "max_lat": grp["latency_ms"].max(),
                "attrs": g["action"]
                .eq(attr_action)
                .astype(np.int64)
                .groupby(keys, sort=False)
                .sum(),
            }
        )
        agg = agg.reset_index()
        m = agg["trace_id"].str.slice(5).astype(np.int64) % keep_mod
        n = agg["n_spans"].to_numpy()
        policy = np.select(
            [
                5 * agg["errs"].to_numpy() > n,
                (agg["max_lat"] >= latency_threshold_ms).to_numpy(),
                6 * agg["attrs"].to_numpy() > n,
                (m == 0).to_numpy(),
            ],
            ["status_code", "latency", "string_attribute", "probabilistic"],
            default=None,
        )
        agg["policy"] = policy
        keep = agg["policy"].notna()
        out = agg.loc[keep, ["trace_id", "n_spans", "policy"]]
        return out.astype({"n_spans": "int64"})

    return sharded_group_map(
        parsed.map_batches(
            lambda t: t.select(
                ["conv_id", "turn_idx", "level", "action", "latency_ms"]
            ).rename_columns(
                ["trace_id", "turn_idx", "level", "action", "latency_ms"]
            ),
            batch_format="pyarrow",
        ),
        ["trace_id"],
        per_shard,
    )


ZERO_BUCKET = -100  # sentinel for the ExponentialHistogram zero_count slot


def exponential_histogram(
    ds: ray.data.Dataset,
    *,
    group: str = "route",
    value: str = "latency_ms",
) -> ray.data.Dataset:
    """ExponentialHistogram metric type at scale 0 (pdata/pmetric/
    metric_type.go:18-28, exponential_histogram_data_point.go): bucket
    index i covers (2^i, 2^(i+1)], so idx = ceil(log2(v)) - 1; zero
    values land in the dedicated zero bucket (``ZERO_BUCKET`` sentinel —
    the zero_count field). Mergeable combiner counts, same shape as the
    fixed-bucket histogram. Safe for the hash gate: log2 of an integer
    is ≥1e-12 away from the nearest integer except at exact powers of
    two (where it is exact), so both engines' libm round identically."""
    from ..functions.agg import grouped_count

    def bucketize(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[value]))
        v = t[value].to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(divide="ignore"):
            idx = np.ceil(np.log2(np.maximum(v, 1.0))).astype(np.int64) - 1
        idx = np.where(v == 0, ZERO_BUCKET, idx)
        return pa.table(
            {group: t[group], "bucket_idx": pa.array(idx, type=pa.int64())}
        )

    rows = ds.map_batches(bucketize, batch_format="pyarrow")
    return grouped_count(rows, [group, "bucket_idx"], alias="n")


def gauge_last(
    ds: ray.data.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    order_tiebreak: str = "event_id",
) -> ray.data.Dataset:
    """Gauge metric type: last-observed value per series (the gauge
    semantic — no aggregation, latest point wins by (ts, tiebreak)).
    Sharded groupby, vectorized last-per-key inside each shard."""
    from ..functions.shard import sharded_group_map

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts, order_tiebreak], kind="mergesort")
        # the literal last ROW per key (pandas .last() skips nulls per
        # column and would resurrect an older non-null value — diverges
        # from the oracle's row_number()=1 when the latest value is NULL)
        out = g.drop_duplicates(subset=[key], keep="last")[[key, value]]
        return out.rename(columns={value: "last_value"})

    return sharded_group_map(ds, [key], per_shard)


def delta_to_cumulative(
    series: ray.data.Dataset,
    *,
    key: str,
    ts: str,
    value: str,
    order_tiebreak: str,
) -> ray.data.Dataset:
    """Delta→cumulative temporality conversion — the inverse of
    ``cumulative_to_delta`` and the contrib deltatocumulative idiom
    (AggregationTemporality, pdata/pmetric/aggregation_temporality.go):
    per series, ordered by (ts, tiebreak), running sum of the deltas.
    Same single sharded-groupby shuffle; the cumsum is one vectorized
    pandas pass over every series in the shard. Integer-valued deltas
    keep the running sum exact (bit-stable vs a SQL window SUM)."""
    from ..functions.shard import sharded_group_map

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts, order_tiebreak], kind="mergesort")
        # SQL window-SUM null semantics (the oracle's form): a NULL
        # delta leaves the running total unchanged on its own row;
        # rows before the first non-null delta are NULL. Plain pandas
        # cumsum would instead emit NaN on the null row itself.
        vals = g[value]
        cs = vals.fillna(0).groupby(g[key], sort=False).cumsum()
        seen = vals.notna().groupby(g[key], sort=False).cumsum()
        return g.assign(cumulative=cs.where(seen > 0))

    return sharded_group_map(series, [key], per_shard)


def regroup_attrs(
    ds: ray.data.Dataset, *, keep: list[str], value: str
) -> ray.data.Dataset:
    """The contrib groupbyattrsprocessor idiom: re-key datapoints onto a
    REDUCED label set (drop the other attributes) and merge the points
    that collapse together — count plus sum of the metric value. Pure
    combiner shape: per-batch Arrow partial aggregates on the kept keys,
    one tiny uniform groupby to merge; nothing per-series ever runs."""
    from ..functions.agg import grouped_stats

    projected = ds.map_batches(
        lambda t: t.select(keep + [value]), batch_format="pyarrow"
    )
    return grouped_stats(projected, keep, value)


def cumulative_to_delta(
    series: ray.data.Dataset,
    *,
    key: str,
    ts: str,
    value: str,
    order_tiebreak: str,
    handle_resets: bool = False,
) -> ray.data.Dataset:
    """Per-series delta conversion: one sharded groupby(key) shuffle,
    ordered diff vectorized over every series in the shard at once.
    First point of each series keeps its value (the cumulativetodelta
    'initial value' convention). With ``handle_resets`` a NEGATIVE diff
    is treated as a monotonic-counter restart and the new value is
    emitted as the delta (the contrib processor's reset rule for
    monotonic sums)."""
    from ..functions.shard import sharded_group_map

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts, order_tiebreak], kind="mergesort")
        v = g[value].to_numpy()
        k = g[key].to_numpy()
        delta = v.copy()
        delta[1:] = v[1:] - v[:-1]
        firsts = np.r_[True, k[1:] != k[:-1]]
        # a NULL previous point also restarts the series (SQL `lag IS
        # NULL → value`, the oracle's form; a NULL current point keeps
        # a NULL delta) — found by the null-parity gate
        prev_na = np.r_[True, pd.isna(v[:-1])]
        restart = firsts | prev_na
        delta[restart] = v[restart]
        if handle_resets:
            delta = np.where(delta < 0, v, delta)
        return g.assign(delta=delta)

    return sharded_group_map(series, [key], per_shard)


def span_red_metrics(parsed: ray.data.Dataset) -> ray.data.Dataset:
    """The spanmetricsconnector idiom (contrib): derive R.E.D. metrics —
    Requests, Errors, Duration — per span name from the span stream.
    Combiner shape: per-batch Arrow partials (count, error-flag sum,
    duration sum) merge through one tiny groupby on span_name; no
    per-span reducer, no second pass over the corpus for errors."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        name = pc.fill_null(t["action"], "unparsed")
        err = pc.cast(
            pc.equal(pc.fill_null(t["level"], ""), "ERROR"), pa.int64()
        )
        dur = pc.fill_null(t["latency_ms"], 0)
        g = (
            pa.table({"span_name": name, "_e": err, "_d": dur})
            .group_by(["span_name"])
            .aggregate([([], "count_all"), ("_e", "sum"), ("_d", "sum")])
        )
        return g.rename_columns(["span_name", "_pc", "_pe", "_pd"])

    partials = parsed.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("span_name").aggregate(
        Sum("_pc", alias_name="n"),
        Sum("_pe", alias_name="n_errors"),
        Sum("_pd", alias_name="sum_ms"),
    )


def head_sample(
    ds: ray.data.Dataset, *, keep_mod: int = 10, key: str = "conv_id"
) -> ray.data.Dataset:
    """Head-based probabilistic sampling (contrib
    probabilisticsampler): the keep decision is a deterministic hash of
    the trace id evaluated per record at ingestion — no trace
    completeness needed (that is the tail sampler's job), so the stage
    is a pure stateless vectorized filter: zero shuffle, zero state,
    and every span of a trace agrees by construction. Keeps 1/keep_mod
    of traces, keyed on the trace's numeric suffix (engine-exact
    integer rule, mirrors the tail sampler's probabilistic policy)."""

    def keep(t: pa.Table) -> pa.Table:
        ids = t[key]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        num = pc.cast(pc.utf8_slice_codeunits(ids, 5, 99), pa.int64())
        sel = pc.equal(
            pc.subtract(num, pc.multiply(pc.divide(num, keep_mod), keep_mod)),
            0,
        )
        return t.filter(sel)

    return ds.map_batches(keep, batch_format="pyarrow")


def service_graph_edges(enriched: ray.data.Dataset) -> ray.data.Dataset:
    """The servicegraphconnector idiom (contrib): derive service-to-
    service edge metrics from the span stream. An edge is a causally
    consecutive span pair within one trace — (previous span's service →
    this span's service) — keyed by turn order; per edge the connector
    reports request count, failed-request count (callee span status
    ERROR) and total duration of the callee span.

    Shape: one sharded co-group on the trace key (conv_id) so each
    trace's spans are co-located, a vectorized shift inside the shard
    to form the edges, and a per-shard PARTIAL aggregate on
    (client, server) — only O(services²) partial rows per shard leave
    the shuffle; a final tiny uniform groupby merges them. No
    per-trace Python call, no second pass for errors."""
    from ray.data.aggregate import Sum

    from ..functions.shard import sharded_group_map

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        same = g["conv_id"].to_numpy()[1:] == g["conv_id"].to_numpy()[:-1]
        client = g["service"].to_numpy()[:-1][same]
        server = g["service"].to_numpy()[1:][same]
        lvl = g["level"].to_numpy()[1:][same]
        dur = (
            pd.Series(g["latency_ms"].to_numpy()[1:][same])
            .fillna(0)
            .to_numpy()
            .astype(np.int64)
        )
        failed = (pd.Series(lvl).fillna("") == "ERROR").to_numpy(np.int64)
        part = (
            pd.DataFrame(
                {
                    "client_service": client,
                    "server_service": server,
                    "_n": np.ones(len(client), dtype=np.int64),
                    "_f": failed,
                    "_d": dur,
                }
            )
            .groupby(["client_service", "server_service"], sort=False)
            .sum()
            .reset_index()
        )
        return part

    partials = sharded_group_map(enriched, ["conv_id"], per_shard)
    return partials.groupby(["client_service", "server_service"]).aggregate(
        Sum("_n", alias_name="n"),
        Sum("_f", alias_name="n_failed"),
        Sum("_d", alias_name="sum_ms"),
    )


def delta_to_rate(
    series: ray.data.Dataset,
    *,
    key: str,
    ts: str,
    value: str,
    order_tiebreak: str,
) -> ray.data.Dataset:
    """Delta→rate temporality conversion — the contrib
    deltatorateprocessor idiom: each delta point becomes a per-second
    rate over the interval since the previous point of the same series.
    Output is the engine-exact integer ``rate_milli`` =
    floor(value · 1e9 / Δt_µs) (both engines evaluate the identical
    IEEE double expression, so the hash gate holds); the first point of
    a series and zero-interval points have no rate and are dropped —
    the processor's own convention for missing intervals. Same single
    sharded-groupby shuffle as the other temporality conversions."""
    from ..functions.shard import sharded_group_map

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts, order_tiebreak], kind="mergesort")
        t_us = g[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        k = g[key].to_numpy()
        dt = np.empty(len(g), dtype=np.int64)
        dt[0] = 0
        dt[1:] = t_us[1:] - t_us[:-1]
        dt[np.r_[True, k[1:] != k[:-1]]] = 0  # series firsts: no interval
        keep = dt > 0
        v = g[value].to_numpy().astype(np.float64)[keep]
        # null-safe: a NULL delta keeps its row with a NULL rate (SQL
        # floor(NULL/x) is NULL) — the old astype(int64) of NaN minted
        # INT64_MIN (found by the null-parity gate)
        rate = np.floor(v * 1e9 / dt[keep])
        out = g.loc[keep, [order_tiebreak, key, ts]].copy()
        out["rate_milli"] = pd.array(rate, dtype="Int64")
        return out

    return sharded_group_map(series, [key], per_shard)


def metrics_generation(
    parsed: ray.data.Dataset,
    *,
    group: str = "route",
    scale: int = 1_000_000,
) -> ray.data.Dataset:
    """The metricsgenerationprocessor idiom (contrib): generate a new
    metric from two existing ones with an arithmetic rule — here the
    canonical error-ratio: operand1 = error count, operand2 = request
    count, operation = divide (scaled to parts-per-``scale`` and
    floored, so the generated metric is integer-exact in both engines).
    Combiner shape: per-batch Arrow partials for both operands in ONE
    pass, a tiny uniform groupby merge, then the generation rule applied
    to the merged rows — never a second scan of the corpus for the
    second operand."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        err = pc.cast(
            pc.equal(pc.fill_null(t["level"], ""), "ERROR"), pa.int64()
        )
        g = (
            pa.table({group: t[group], "_e": err})
            .group_by([group])
            .aggregate([([], "count_all"), ("_e", "sum")])
        )
        return g.rename_columns([group, "_pn", "_pe"])

    merged = (
        parsed.map_batches(partial, batch_format="pyarrow")
        .groupby(group)
        .aggregate(
            Sum("_pn", alias_name="n_requests"),
            Sum("_pe", alias_name="n_errors"),
        )
    )

    def generate(t: pa.Table) -> pa.Table:
        n = t["n_requests"].to_numpy(zero_copy_only=False).astype(np.int64)
        e = t["n_errors"].to_numpy(zero_copy_only=False).astype(np.int64)
        ppm = np.where(n > 0, (e * scale) // np.maximum(n, 1), 0)
        return t.append_column(
            "error_rate_ppm", pa.array(ppm.astype(np.int64))
        )

    return merged.map_batches(generate, batch_format="pyarrow")


def metrics_transform(
    series: ray.data.Dataset,
    *,
    metric_col: str = "metric_name",
    value: str = "value",
    rename: dict[str, str] | None = None,
    relabel: dict[str, dict[str, str]] | None = None,
    scale: int = 1,
    keep: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """The contrib metricstransformprocessor: rename metrics
    (include→new_name mapping), update label VALUES per label key,
    scale datapoint values by a constant, then aggregate away every
    label not in ``keep`` (aggregation_type: sum, with the point count
    kept alongside — the merge any downstream mean needs).

    Shape: ONE stateless vectorized pass does all three value edits
    (each mapping is a tiny ``pc.index_in`` + ``take`` + ``coalesce``
    dictionary probe — no per-row Python, the mapping rides inside the
    fused task), then the standard combiner merge (per-batch Arrow
    partials → one tiny uniform groupby on (metric, kept labels));
    the wide corpus is never shuffled. ``scale`` is integer so the
    transformed values stay int64-exact in both engines (the contrib
    processor's experimental_scale on int datapoints). Unmapped names
    and null labels pass through unchanged (a null never matches a
    mapping key); null values stay null — skipped by the sum, counted
    by the count (SQL semantics via grouped_stats)."""
    from ..functions.agg import grouped_stats

    rename = rename or {}
    relabel = relabel or {}

    def _replace(col, mapping: dict[str, str]):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # an ALL-null block degrades the column to Arrow's null TYPE
        # (the CLAUDE.md quirk); index_in then throws ArrowTypeError —
        # and a null never matches a mapping key anyway
        if pa.types.is_null(col.type):
            return pc.cast(col, pa.string())
        olds = pa.array(list(mapping), type=pa.string())
        news = pa.array(list(mapping.values()), type=pa.string())
        idx = pc.index_in(col, olds)
        return pc.coalesce(pc.take(news, idx), col)

    keys = [metric_col, *keep]

    def xform(t: pa.Table) -> pa.Table:
        cols = {k: t[k] for k in keys}
        if rename:
            cols[metric_col] = _replace(t[metric_col], rename)
        for lbl, mapping in relabel.items():
            if lbl in cols and mapping:
                cols[lbl] = _replace(cols[lbl], mapping)
        v = t[value]
        if scale != 1:
            v = pc.multiply_checked(
                pc.cast(v, pa.int64()), pa.scalar(scale, pa.int64())
            )
        cols[value] = v
        return pa.table(cols)

    transformed = series.map_batches(xform, batch_format="pyarrow")
    return grouped_stats(
        transformed,
        keys,
        value,
        count_alias="n_points",
        sum_alias="sum_value",
    )


def trace_assemble(spans: ray.data.Dataset) -> ray.data.Dataset:
    """groupbytrace's EMIT form: one row per trace carrying the
    assembled span list as nested Arrow columns — span_idxs
    (list<int>, causal order) and span_names (list<string>) — the shape
    a trace-complete consumer (tail sampler, waterfall UI, trace-level
    featurizer) takes as input. Same single sharded shuffle as the
    summary form (`trace_groups`); nested lists are built vectorized
    per shard."""
    from ..functions.shard import sharded_group_map

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["trace_id", "span_idx"], kind="mergesort")
        agg = g.groupby("trace_id", sort=False).agg(
            span_idxs=("span_idx", list),
            span_names=("span_name", list),
        )
        return agg.reset_index()

    return sharded_group_map(spans, ["trace_id"], per_shard)


def summary_metrics(
    ds: ray.data.Dataset,
    *,
    series: str = "event_type",
    value: str = "value",
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    scale: int = 1000,
) -> "pd.DataFrame":
    """Summary metric type — the fifth and last pdata metric type
    (pdata/pmetric/metric_type.go:18-28 MetricTypeSummary,
    summary_data_point.go: count, sum, quantile values): per series,
    observation count, sum, and a fixed quantile set.

    Hash-safe fixed-point core: values are quantized ONCE to integer
    milli-units (``floor(v*scale)`` — one IEEE multiply + floor,
    identical in numpy and DuckDB), then count, sum AND every quantile
    read off a single distributed (series, vm) histogram: per-batch
    Arrow partial counts, one uniform-key groupby, and a driver walk of
    the tiny (series, distinct-vm, count) table. One shuffle total, no
    floats anywhere past the quantization, quantiles are exact
    ``quantile_disc`` elements. Quantization also BOUNDS the distinct
    values per series, which is what keeps the exact-histogram shape
    valid at 100 TB (the caveat `window2.discrete_quantiles` documents
    for unbounded continuous values does not apply here).
    """
    from ..functions.agg import grouped_count

    def quantize(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[value]))
        v = t[value].to_numpy(zero_copy_only=False).astype(np.float64)
        vm = np.floor(v * float(scale)).astype(np.int64)
        return pa.table(
            {series: t[series], "_vm": pa.array(vm, type=pa.int64())}
        )

    # (series, vm) histogram — the only shuffle
    hist = grouped_count(
        ds.map_batches(quantize, batch_format="pyarrow"),
        [series, "_vm"],
        alias="_n",
    ).to_pandas()

    rows = []
    # dropna=False: SQL GROUP BY keeps a NULL series group (sort=False —
    # pandas cannot sort None beside str; the gate compares unordered)
    for sval, g in hist.groupby(series, sort=False, dropna=False):
        g = g.sort_values("_vm", kind="mergesort")
        cnt = g["_n"].to_numpy()
        vm = g["_vm"].to_numpy()
        cum = cnt.cumsum()
        n = int(cum[-1])
        # pandas groupby hands the missing group back as NaN even for
        # object keys — keep it a true None (reprs as SQL NULL does)
        row = {
            series: None if pd.isna(sval) else sval,
            "n": n,
            "sum_milli": int((vm * cnt).sum()),
        }
        for q in quantiles:
            target = max(int(np.ceil(q * n)), 1)
            idx = int(np.searchsorted(cum, target, side="left"))
            row[f"q{int(round(q * 100))}"] = int(vm[idx])
        rows.append(row)
    out = pd.DataFrame(rows)
    qcols = [c for c in out.columns if c != series]
    return out.astype({c: "int64" for c in qcols}).reset_index(drop=True)


def interval_downsample(
    ds: ray.data.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    tiebreak: str = "event_id",
    interval_s: int = 900,
) -> ray.data.Dataset:
    """Interval processor (contrib intervalprocessor): compact each
    series to ONE point per fixed interval — the last observation wins
    (gauge semantics; row-literal last, same null contract as
    `gauge_last`). One sharded shuffle on the series key; windows are
    derived in-flight, so the shuffle key stays low-churn and uniform."""
    from ..functions.shard import sharded_group_map

    us = np.int64(interval_s) * 1_000_000

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        win = (
            g[ts].to_numpy().astype("datetime64[us]").astype(np.int64) // us
        )
        g = g.assign(win=win).sort_values(
            [key, "win", ts, tiebreak], kind="mergesort"
        )
        out = g.drop_duplicates(subset=[key, "win"], keep="last")
        return out[[key, "win", value]].rename(columns={value: "last_value"})

    return sharded_group_map(ds, [key], per_shard)


def rate_limit(
    ds: ray.data.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    window_s: int = 3600,
    max_per_window: int = 3,
) -> ray.data.Dataset:
    """Rate limiter (spike-protection idiom): admit at most
    ``max_per_window`` rows per key per fixed window, earliest-first —
    deterministic (ts, tiebreak) order, so admission is identical on
    every run and at every parallelism. Same single sharded shuffle as
    `interval_downsample`; the per-shard cumcount is a C pass."""
    from ..functions.shard import sharded_group_map

    us = np.int64(window_s) * 1_000_000

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        win = (
            g[ts].to_numpy().astype("datetime64[us]").astype(np.int64) // us
        )
        g = g.assign(_win=win).sort_values(
            [key, "_win", ts, tiebreak], kind="mergesort"
        )
        seq = g.groupby([key, "_win"], sort=False).cumcount()
        return g[seq < max_per_window].drop(columns="_win")

    return sharded_group_map(ds, [key], per_shard)


def histogram_exemplars(
    ds: ray.data.Dataset,
    *,
    group: str = "route",
    value: str = "latency_ms",
    trace: str = "conv_id",
    bounds: tuple[int, ...] = (10, 100, 1000),
) -> pd.DataFrame:
    """Histogram buckets WITH exemplars — the pdata per-point exemplar
    surface (pmetric exemplars: each point may carry sampled values +
    the trace that produced them). Per (group, le) bucket: count, the
    max observed value, and the trace id that observed it (ties →
    lexicographically smallest trace id, so the choice is deterministic
    across parallelism).

    Argmax is combiner-friendly: each batch emits one (count, max v,
    min trace@max) row per bucket; the driver merges
    O(groups·buckets·blocks) tiny partials — larger v wins, tie →
    smaller trace id, counts sum."""
    bounds_arr = np.asarray(bounds, dtype=np.int64)
    labels = np.asarray([str(int(b)) for b in bounds] + ["inf"], dtype=object)
    gcols = [group, "le"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[value].notna()]
        if not len(df):
            return pd.DataFrame(
                {
                    group: pd.Series([], dtype=object),
                    "le": pd.Series([], dtype=object),
                    "_n": pd.Series([], dtype=np.int64),
                    "_v": pd.Series([], dtype=np.int64),
                    "_t": pd.Series([], dtype=object),
                }
            )
        v = df[value].to_numpy().astype(np.int64)
        le = labels[np.searchsorted(bounds_arr, v, side="left")]
        b = pd.DataFrame(
            {group: df[group].to_numpy(), "le": le, "_v": v,
             "_t": df[trace].to_numpy()}
        )
        n = b.groupby(gcols, as_index=False).size().rename(columns={"size": "_n"})
        best = b.sort_values(
            gcols + ["_v", "_t"], ascending=[True, True, False, True],
            kind="mergesort",
        ).drop_duplicates(gcols)
        return n.merge(best[gcols + ["_v", "_t"]], on=gcols)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    n = parts.groupby(gcols, as_index=False)["_n"].sum()
    best = parts.sort_values(
        gcols + ["_v", "_t"], ascending=[True, True, False, True],
        kind="mergesort",
    ).drop_duplicates(gcols)
    out = n.merge(best[gcols + ["_v", "_t"]], on=gcols).rename(
        columns={"_n": "n", "_v": "exemplar_value", "_t": "exemplar_trace"}
    )
    out["n"] = out["n"].astype("int64")
    out["exemplar_value"] = out["exemplar_value"].astype("int64")
    return out.sort_values(gcols, kind="mergesort").reset_index(drop=True)


def gap_fill_locf(
    ds: ray.data.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "vm",
    tiebreak: str = "event_id",
    interval_us: int = 86_400_000_000,
) -> ray.data.Dataset:
    """Gap filling with last-observation-carried-forward — the
    Prometheus-staleness / metrics-upsampling idiom: each series gets
    exactly one point per ``interval_us`` between its first and last
    observed interval; intervals with no observation repeat the most
    recent one. The in-interval representative is the last observation
    (max ts, tie → max ``tiebreak``), so the result is deterministic.

    ONE sharded shuffle on the series key; inside a shard the fill is
    fully vectorized across ALL series: dense slots are generated with
    a concatenated-arange trick and matched to observations by a single
    ``searchsorted`` over composite (series, interval) keys — no
    per-series Python loop. ``value`` must be integer for bit-stable
    hashing."""
    from ..functions.shard import sharded_group_map

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        t_us = g[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        g = g.assign(_iv=t_us // interval_us)
        g = g.sort_values([key, "_iv", ts, tiebreak], kind="mergesort")
        k = g[key].to_numpy()
        iv = g["_iv"].to_numpy()
        # last observation per (key, interval): keep rows where the
        # next row starts a different (key, interval)
        if not len(k):
            return pd.DataFrame(
                {
                    key: np.array([], dtype=k.dtype),
                    "iv": np.array([], dtype=np.int64),
                    value: np.array([], dtype=np.int64),
                }
            )
        last = np.r_[(k[1:] != k[:-1]) | (iv[1:] != iv[:-1]), True]
        k, iv = k[last], iv[last]
        v = g[value].to_numpy()[last]
        # per-series interval spans
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], len(k)]
        lo, hi = iv[starts], iv[ends - 1]
        n_out = hi - lo + 1
        # dense slots: concatenated aranges without a Python loop
        offs = np.r_[0, np.cumsum(n_out)]
        total = int(offs[-1])
        series_idx = np.repeat(np.arange(len(lo)), n_out)
        slot_iv = np.arange(total) - offs[series_idx] + lo[series_idx]
        # composite keys are monotone over (series, interval), so one
        # global searchsorted maps every slot to its latest observation
        codes = np.cumsum(np.r_[True, k[1:] != k[:-1]]) - 1
        span = int(max(iv.max() - iv.min() + 1, 1)) if len(iv) else 1
        obs_key = codes * span + (iv - iv.min())
        slot_key = series_idx * span + (slot_iv - iv.min())
        pos = np.searchsorted(obs_key, slot_key, side="right") - 1
        return pd.DataFrame(
            {
                key: k[starts][series_idx],
                "iv": slot_iv.astype(np.int64),
                value: v[pos],
            }
        )

    return sharded_group_map(ds, [key], per_shard)


# plog SeverityNumber vocabulary (pdata/plog/severity_number.go:18-46):
# each text level maps to the FIRST number of its 4-slot band.
SEVERITY_NUMBER = {
    "TRACE": 1,
    "DEBUG": 5,
    "INFO": 9,
    "WARN": 13,
    "ERROR": 17,
    "FATAL": 21,
}


def severity_number_batch(
    batch: pa.Table, *, col: str = "level", out: str = "severity_number"
) -> pa.Table:
    """Map severity TEXT to the OTel SeverityNumber scale — the log
    data model's numeric severity (severity_number.go bands of 4 per
    level; unknown text → 0 = UNSPECIFIED). One `index_in`/`take`
    dictionary join per batch, zero shuffle."""
    c = batch[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    # null-TYPED column (all-null block): index_in throws; unknown/null
    # severity is 0 = UNSPECIFIED, same as the per-value null path
    if pa.types.is_null(c.type):
        return batch.append_column(
            out, pa.array(np.zeros(len(c), dtype=np.int64))
        )
    keys = pa.array(list(SEVERITY_NUMBER), pa.string())
    vals = pa.array(list(SEVERITY_NUMBER.values()) + [0], pa.int64())
    idx = pc.fill_null(pc.index_in(c, keys), len(SEVERITY_NUMBER))
    return batch.append_column(out, pc.take(vals, idx))


def cardinality_limit(
    ds: ray.data.Dataset,
    *,
    metric: str = "event_type",
    series: str = "user_id",
    limit: int = 50,
    overflow_label: str = "_overflow",
) -> ray.data.Dataset:
    """Metric-cardinality protection (the contrib cardinality-limit
    idiom: an exploding label set must not take down the backend): per
    metric, at most ``limit`` distinct series keep their identity —
    chosen deterministically by seed-free hash rank, NOT arrival order,
    so the kept set is stable across runs and parallelism — and every
    other series is relabeled to ``overflow_label``.

    Shape: distinct (metric, series) pairs via a combiner groupby,
    `stratified_take` keeps the first ``limit`` per metric
    (O(metrics·limit·blocks) through its shuffle), the kept set is
    broadcast once, and the datapoint stream is relabeled in one
    stateless pass. Beyond broadcast size, swap the kept set for a
    Bloom bitmap (`functions/sketch.build_bloom`) — FPs would keep a
    few extra series, never drop one."""
    import ray as _ray

    from ..functions.agg import grouped_count
    from ..stages.text import stratified_take

    # null series/metric rows can never match the kept set (SQL's
    # inner join on the pair drops them) — drop them up front rather
    # than letting NaN ride through hashing as INT64_MIN
    def drop_nulls(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.and_(pc.is_valid(t[metric]), pc.is_valid(t[series]))
        )

    ds = ds.map_batches(drop_nulls, batch_format="pyarrow")
    pairs = grouped_count(ds, [metric, series], alias="_n")
    kept = stratified_take(
        pairs, group=metric, id_col=series, n=limit
    ).to_pandas()
    # kept set broadcast as composite string keys — the relabel probe
    # is then one C++ is_in per batch (the pandas MultiIndex.isin form
    # was the query's hot spot: 4.5 s → 1.5 s at sf0.1)
    sep = "\x1f"
    kept_keys = pa.array(
        kept[metric].astype(str) + sep + kept[series].astype(str)
    )
    kref = _ray.put(kept_keys)

    def relabel(t: pa.Table) -> pa.Table:
        ks = _ray.get(kref)
        s_str = pc.cast(t[series], pa.string())
        key = pc.binary_join_element_wise(
            pc.cast(t[metric], pa.string()), s_str, sep
        )
        keep_mask = pc.is_in(key, value_set=ks)
        series_out = pc.if_else(keep_mask, s_str, overflow_label)
        return t.append_column("series", series_out).drop_columns([series])

    return ds.map_batches(relabel, batch_format="pyarrow")


def flag_late_events(
    ds: ray.data.Dataset,
    *,
    ts: str = "ts",
    lateness_us: int = 24 * 3600 * 1_000_000,
    out: str = "is_late",
) -> ray.data.Dataset:
    """Watermark-style late-data flagging (beyond the reference — it
    has no watermarks, SURVEY §2.6): watermark = corpus max(ts) −
    allowed lateness (one tiny combiner max), every event older than
    the watermark is flagged. The flag feeds a filter stage (drop) or
    a router (late-data sink). Per-key watermarks are the same shape
    with a per-key max + broadcast, bounded by key cardinality."""
    # np.datetime64 handles datetime/pd.Timestamp/np types uniformly
    # and never applies a local-timezone shift (datetime.timestamp()
    # would, for naive values)
    mx_us = int(np.datetime64(ds.max(ts), "us").astype(np.int64))
    cutoff = mx_us - lateness_us

    def flag(t: pa.Table) -> pa.Table:
        tv = t[ts]
        if isinstance(tv, pa.ChunkedArray):
            tv = tv.combine_chunks()
        us = tv.cast(pa.int64())
        return t.append_column(out, pc.less(us, cutoff))

    return ds.map_batches(flag, batch_format="pyarrow")


def time_weighted_avg(
    ds: ray.data.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "vm",
    tiebreak: str = "event_id",
) -> ray.data.Dataset:
    """Time-weighted average per series over irregular sampling (the
    avg_over_time idiom where a value holds until the next sample):
    ``Σ vᵢ·dtᵢ / Σ dtᵢ`` with dtᵢ = whole-second boundary crossings to
    the next point (mirrors SQL ``date_diff('second', …)``) — sums stay
    exact int64, the single division is the bit-stable float finish.
    Series with fewer than two points (no interval) drop out, same as
    the SQL. One sharded series shuffle, vectorized diff per shard."""
    from ..functions.shard import sharded_group_map

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts, tiebreak], kind="mergesort")
        k = g[key].to_numpy()
        sec = (
            g[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
            // 1_000_000
        )
        # a null value still anchors its interval (its dt counts toward
        # Σdt) but its product is skipped — exactly SQL's NULL-skipping
        # sum over vm·dt; a blind astype(int64) would turn NaN into
        # INT64_MIN and silently corrupt the sums
        valid = ~pd.isna(g[value]).to_numpy()
        v = np.where(valid, g[value].to_numpy(), 0).astype(np.int64)
        same_next = np.r_[k[1:] == k[:-1], False]
        dt = np.zeros(len(g), dtype=np.int64)
        dt[:-1] = sec[1:] - sec[:-1]
        dt[~same_next] = 0
        wsum = pd.Series(v * dt).groupby(k, sort=False).sum()
        dsum = pd.Series(dt).groupby(k, sort=False).sum()
        out = pd.DataFrame(
            {
                key: wsum.index,
                "sum_vdt": wsum.to_numpy(dtype=np.int64),
                "sum_dt": dsum.to_numpy(dtype=np.int64),
            }
        )
        out = out[out["sum_dt"] > 0].reset_index(drop=True)
        out["twa"] = out["sum_vdt"].astype(np.float64) / out[
            "sum_dt"
        ].astype(np.float64)
        return out

    return sharded_group_map(ds, [key], per_shard)


def histogram_quantile(
    hist: ray.data.Dataset,
    *,
    group: str = "route",
    bounds: tuple[int, ...] = (10, 100, 1000),
    q: float = 0.9,
) -> pd.DataFrame:
    """The monitoring-stack signature function (PromQL
    ``histogram_quantile``): estimate a quantile per group from
    le-bucket counts by linear interpolation inside the target bucket
    (lower bound of the first bucket = 0; a target in the +inf bucket
    returns the highest finite boundary, Prometheus's convention).

    Runs on the ALREADY-AGGREGATED histogram (O(groups·buckets) rows,
    driver-sized by construction); the float op order is fixed so a
    SQL oracle mirrors it term by term."""
    df = hist.to_pandas()
    labels = [str(b) for b in bounds] + ["inf"]
    uppers = {str(b): float(b) for b in bounds}
    lowers = dict(zip(labels[1:], [float(b) for b in bounds]))
    lowers[labels[0]] = 0.0
    order = {lab: i for i, lab in enumerate(labels)}
    df = df.assign(_o=df["le"].map(order)).sort_values(
        [group, "_o"], kind="mergesort"
    )
    rows = []
    for gval, sub in df.groupby(group, sort=False):
        total = float(sub["n"].sum())
        target = q * total
        cum = 0.0
        for _, r in sub.iterrows():
            nb = float(r["n"])
            if cum + nb >= target:
                if r["le"] == "inf":
                    est = float(bounds[-1])
                else:
                    lo = lowers[r["le"]]
                    up = uppers[r["le"]]
                    est = lo + (up - lo) * ((target - cum) / nb)
                rows.append((gval, q, est))
                break
            cum += nb
    return pd.DataFrame(rows, columns=[group, "q", "value_est"])
