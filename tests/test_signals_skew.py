"""Traces/metrics signal + skew-handling unit tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from opentelemetry_collector_ray.functions.skew import salted_grouped_sum
from opentelemetry_collector_ray.stages.parse import parse_batch
from opentelemetry_collector_ray.stages.signals import (
    cumulative_to_delta,
    spans_batch,
)
from opentelemetry_collector_ray.fixtures import gen_transcripts


def test_spans_preserve_count_and_null_durations():
    p = parse_batch(gen_transcripts(100))
    s = spans_batch(p)
    assert s.num_rows == p.num_rows  # SpanCount == LogRecordCount here
    assert s["duration_ms"].null_count == p["latency_ms"].null_count
    assert set(s.column_names) == {
        "trace_id", "span_idx", "span_name", "kind", "duration_ms",
    }


def test_cumulative_to_delta_roundtrip():
    # delta then cumsum restores the original series
    df = pd.DataFrame(
        {
            "k": [1] * 5 + [2] * 3,
            "ts": list(range(5)) + list(range(3)),
            "i": range(8),
            "v": [1.0, 3.0, 6.0, 10.0, 15.0, 2.0, 4.0, 8.0],
        }
    )
    ds = ray.data.from_pandas(df)
    out = cumulative_to_delta(ds, key="k", ts="ts", value="v", order_tiebreak="i")
    got = out.to_pandas().sort_values(["k", "ts"])
    for k, g in got.groupby("k"):
        assert np.allclose(g["delta"].cumsum(), g["v"])


def test_salted_sum_matches_plain_groupby_on_hot_key():
    # 90% of rows share one key — the skew case the salt exists for
    n = 20000
    keys = np.where(np.arange(n) % 10 < 9, "hot", "cold")
    vals = np.arange(n, dtype=np.int64) % 7
    ds = ray.data.from_arrow(
        pa.table({"k": keys, "v": vals})
    ).repartition(16)
    out = (
        salted_grouped_sum(ds, "k", "v", salt=8, alias="s")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        pd.DataFrame({"k": keys, "v": vals})
        .groupby("k", as_index=False)["v"]
        .sum()
        .rename(columns={"v": "s"})
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_delta_to_cumulative_inverts_cumulative_to_delta():
    from opentelemetry_collector_ray.stages.signals import delta_to_cumulative

    df = pd.DataFrame(
        {
            "k": [1] * 5 + [2] * 3,
            "ts": list(range(5)) + list(range(3)),
            "i": range(8),
            "v": [1, 3, 6, 10, 15, 2, 4, 8],
        }
    )
    ds = ray.data.from_pandas(df)
    deltas = cumulative_to_delta(
        ds, key="k", ts="ts", value="v", order_tiebreak="i"
    ).drop_columns(["v"]).rename_columns({"delta": "v"})
    back = delta_to_cumulative(
        deltas, key="k", ts="ts", value="v", order_tiebreak="i"
    )
    got = back.to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    assert got["cumulative"].tolist() == df["v"].tolist()


def test_regroup_attrs_merges_dropped_labels():
    from opentelemetry_collector_ray.stages.signals import regroup_attrs

    df = pd.DataFrame(
        {
            "service": ["a", "a", "b", "a"],
            "route": ["x", "y", "x", "y"],
            "latency_ms": [10, 20, 30, None],
        }
    )
    out = (
        regroup_attrs(ray.data.from_pandas(df), keep=["service"], value="latency_ms")
        .to_pandas()
        .sort_values("service")
        .reset_index(drop=True)
    )
    assert out["n"].tolist() == [3, 1]  # null latency still counted
    assert out["sum_latency_ms"].tolist() == [30, 30]


def test_log_dedup_collapses_identical_bodies_within_window():
    from opentelemetry_collector_ray.stages.dedup import log_dedup

    ts = pd.to_datetime(
        ["2024-01-01 10:05", "2024-01-01 10:55", "2024-01-01 11:05",
         "2024-01-01 10:30"]
    )
    df = pd.DataFrame(
        {
            "text": ["dup", "dup", "dup", "other"],
            "ts": ts,
            "conv_id": ["c3", "c1", "c2", "c9"],
        }
    )
    out = log_dedup(ray.data.from_pandas(df)).to_pandas()
    dup10 = out[(out["text"] == "dup")
                & (out["window_start"].dt.hour == 10)].iloc[0]
    assert dup10["n"] == 2 and dup10["first_seen"] == "c1"
    assert len(out) == 3  # (dup,10h) (dup,11h) (other,10h)


def test_gauge_last_keeps_null_latest_value():
    from opentelemetry_collector_ray.stages.signals import gauge_last

    df = pd.DataFrame(
        {
            "k": [1, 1, 2],
            "ts": [1, 2, 1],
            "i": [1, 2, 3],
            "v": [5.0, None, 7.0],
        }
    )
    out = (
        gauge_last(
            ray.data.from_pandas(df), key="k", ts="ts", value="v",
            order_tiebreak="i",
        )
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    # latest point of series 1 is NULL — must stay NULL, not fall back
    # to the older non-null 5.0
    assert pd.isna(out.loc[1, "last_value"])
    assert out.loc[2, "last_value"] == 7.0


def test_trace_assemble_nested_output():
    from opentelemetry_collector_ray.stages.signals import trace_assemble

    df = pd.DataFrame(
        {
            "trace_id": ["t1", "t1", "t2", "t1"],
            "span_idx": [2, 0, 0, 1],
            "span_name": ["c", "a", "x", "b"],
        }
    )
    out = (
        trace_assemble(ray.data.from_pandas(df))
        .to_pandas()
        .set_index("trace_id")
    )
    assert list(out.loc["t1", "span_idxs"]) == [0, 1, 2]  # causal order
    assert list(out.loc["t1", "span_names"]) == ["a", "b", "c"]
    assert list(out.loc["t2", "span_idxs"]) == [0]


def test_service_graph_edges_counts_consecutive_pairs():
    # trace A: infra -> data -> infra (2 edges); trace B: web -> web (1)
    df = pd.DataFrame(
        {
            "conv_id": ["a", "a", "a", "b", "b"],
            "turn_idx": [0, 1, 2, 0, 1],
            "service": ["infra", "data", "infra", "web", "web"],
            "level": [None, "ERROR", None, None, None],
            "latency_ms": [5, 7, None, 11, 13],
        }
    )
    from opentelemetry_collector_ray.stages.signals import service_graph_edges

    out = (
        service_graph_edges(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values(["client_service", "server_service"])
        .reset_index(drop=True)
    )
    got = {
        (r.client_service, r.server_service): (r.n, r.n_failed, r.sum_ms)
        for r in out.itertuples()
    }
    # callee metrics: (infra->data) callee is the ERROR span with 7ms
    assert got == {
        ("infra", "data"): (1, 1, 7),
        ("data", "infra"): (1, 0, 0),  # null latency -> 0
        ("web", "web"): (1, 0, 13),
    }


def test_delta_to_rate_drops_firsts_and_zero_intervals():
    from opentelemetry_collector_ray.stages.signals import delta_to_rate

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:02",
         "2024-01-01 00:00:02", "2024-01-01 00:00:00"]
    )
    df = pd.DataFrame(
        {"i": [0, 1, 2, 3], "k": [1, 1, 1, 2], "ts": ts, "v": [9.0, 5.0, 4.0, 8.0]}
    )
    out = delta_to_rate(
        ray.data.from_pandas(df), key="k", ts="ts", value="v", order_tiebreak="i"
    ).to_pandas()
    # k=1 first point dropped; third point has dt=0 -> dropped; k=2 single
    # point dropped. Survivor: i=1 with dt=2s -> 5.0/2 = 2.5/s = 2500 milli
    assert out["i"].tolist() == [1]
    assert out["rate_milli"].tolist() == [2500]


def test_metrics_generation_error_ratio_ppm():
    from opentelemetry_collector_ray.stages.signals import metrics_generation

    df = pd.DataFrame(
        {
            "route": ["a"] * 3 + ["b"] * 2,
            "level": ["ERROR", None, "INFO", None, None],
        }
    )
    out = (
        metrics_generation(ray.data.from_pandas(df), group="route")
        .to_pandas()
        .sort_values("route")
        .reset_index(drop=True)
    )
    assert out["n_requests"].tolist() == [3, 2]
    assert out["n_errors"].tolist() == [1, 0]
    assert out["error_rate_ppm"].tolist() == [333333, 0]


def test_metrics_transform_rename_relabel_scale_aggregate():
    from opentelemetry_collector_ray.stages.signals import metrics_transform

    df = pd.DataFrame(
        {
            "metric_name": ["m.a", "m.a", "m.b", None, "m.a"],
            "service": ["web", "infra", "web", "web", None],
            "value": [1, 2, 3, 4, None],
        }
    )
    out = (
        metrics_transform(
            ray.data.from_pandas(df).repartition(3),
            rename={"m.a": "m.renamed"},
            relabel={"service": {"web": "frontend"}},
            scale=10,
            keep=("service",),
        )
        .to_pandas()
        .sort_values(["metric_name", "service"], na_position="last")
        .reset_index(drop=True)
    )
    # unmapped m.b passes through; null metric/label/value survive;
    # scale is integer-exact; the null value is counted but not summed
    rows = {
        (r.metric_name, r.service): (r.n_points, r.sum_value)
        for r in out.itertuples()
    }
    assert rows[("m.renamed", "frontend")] == (1, 10)
    assert rows[("m.renamed", "infra")] == (1, 20)
    assert rows[("m.b", "frontend")] == (1, 30)
    assert rows[(None, "frontend")] == (1, 40)
    k = ("m.renamed", None)
    assert rows[k][0] == 1 and pd.isna(rows[k][1])


def test_histogram_exemplars_argmax_merge():
    import pandas as pd

    from opentelemetry_collector_ray.stages.signals import histogram_exemplars

    df = pd.DataFrame(
        {
            "route": ["a", "a", "a", "b", "b"],
            "latency_ms": [5, 9, 9, 500, 500],
            "conv_id": ["c3", "c2", "c1", "c9", "c2"],
        }
    )
    out = histogram_exemplars(
        ray.data.from_pandas(df).repartition(3),
        group="route",
        value="latency_ms",
        trace="conv_id",
        bounds=(10, 100, 1000),
    )
    a = out[(out["route"] == "a") & (out["le"] == "10")].iloc[0]
    assert a["n"] == 3 and a["exemplar_value"] == 9
    # tie on max value → lexicographically smallest trace wins,
    # regardless of which block it arrived in
    assert a["exemplar_trace"] == "c1"
    b = out[(out["route"] == "b") & (out["le"] == "1000")].iloc[0]
    assert b["n"] == 2 and b["exemplar_value"] == 500
    assert b["exemplar_trace"] == "c2"


def test_gap_fill_locf_dense_and_deterministic():
    import pandas as pd

    from opentelemetry_collector_ray.stages.signals import gap_fill_locf

    day = 86_400_000_000
    t = pd.Timestamp("2026-01-01")
    df = pd.DataFrame(
        {
            # u1: days 0 and 3 (gap 1,2 carries 7); day 0 has two obs,
            # later ts wins (vm=7 not 5). u2: single day.
            "user_id": [1, 1, 1, 2],
            "ts": [t, t + pd.Timedelta(hours=2), t + pd.Timedelta(days=3), t],
            "event_id": [10, 11, 12, 13],
            "vm": np.array([5, 7, 9, 2], dtype=np.int64),
        }
    )
    out = (
        gap_fill_locf(ray.data.from_pandas(df).repartition(2))
        .to_pandas()
        .sort_values(["user_id", "iv"])
        .reset_index(drop=True)
    )
    base = int(t.value // 1000) // day
    u1 = out[out["user_id"] == 1]
    assert u1["iv"].tolist() == [base, base + 1, base + 2, base + 3]
    assert u1["vm"].tolist() == [7, 7, 7, 9]  # LOCF + last-obs-per-day
    u2 = out[out["user_id"] == 2]
    assert u2["iv"].tolist() == [base] and u2["vm"].tolist() == [2]


def test_cumulative_to_delta_reset_handling():
    import pandas as pd

    from opentelemetry_collector_ray.stages.signals import cumulative_to_delta

    t = pd.Timestamp("2026-01-01")
    df = pd.DataFrame(
        {
            "k": ["a"] * 4,
            "ts": [t + pd.Timedelta(minutes=i) for i in range(4)],
            "id": np.arange(4, dtype=np.int64),
            # counter climbs 10→25, restarts at 3, climbs to 9
            "v": np.array([10.0, 25.0, 3.0, 9.0]),
        }
    )
    ds = ray.data.from_pandas(df).repartition(2)
    plain = (
        cumulative_to_delta(ds, key="k", ts="ts", value="v", order_tiebreak="id")
        .to_pandas().sort_values("id")["delta"].tolist()
    )
    assert plain == [10.0, 15.0, -22.0, 6.0]
    reset = (
        cumulative_to_delta(
            ds, key="k", ts="ts", value="v", order_tiebreak="id",
            handle_resets=True,
        )
        .to_pandas().sort_values("id")["delta"].tolist()
    )
    assert reset == [10.0, 15.0, 3.0, 6.0]  # restart emits the new value


def test_cardinality_limit_caps_and_is_stable():
    import pandas as pd

    from opentelemetry_collector_ray.stages.signals import cardinality_limit

    rng = np.random.default_rng(31)
    df = pd.DataFrame(
        {
            "event_id": np.arange(500, dtype=np.int64),
            "event_type": rng.choice(["m1", "m2"], size=500),
            "user_id": rng.integers(0, 100, size=500, dtype=np.int64),
        }
    )
    out = (
        cardinality_limit(
            ray.data.from_pandas(df).repartition(4),
            metric="event_type", series="user_id", limit=10,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    named = out[out["series"] != "_overflow"]
    # at most `limit` distinct named series per metric, rest overflow
    assert (named.groupby("event_type")["series"].nunique() <= 10).all()
    assert (out["series"] == "_overflow").any()
    # stable across a different partitioning
    out2 = (
        cardinality_limit(
            ray.data.from_pandas(df).repartition(7),
            metric="event_type", series="user_id", limit=10,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert (out["series"] == out2["series"]).all()


def test_time_weighted_avg_holds_value_until_next_sample():
    import pandas as pd

    from opentelemetry_collector_ray.stages.signals import time_weighted_avg

    t = pd.Timestamp("2026-01-01")
    df = pd.DataFrame(
        {
            # u1: 10 for 30s then 40 for 10s → (10*30+40*10)/40 = 17.5
            # u2: single point → no interval → dropped
            "user_id": [1, 1, 1, 2],
            "ts": [t, t + pd.Timedelta(seconds=30),
                   t + pd.Timedelta(seconds=40), t],
            "event_id": np.arange(4, dtype=np.int64),
            "vm": np.array([10, 40, 99, 5], dtype=np.int64),
        }
    )
    out = (
        time_weighted_avg(ray.data.from_pandas(df).repartition(2))
        .to_pandas()
        .set_index("user_id")
    )
    assert out.loc[1, "sum_vdt"] == 10 * 30 + 40 * 10
    assert out.loc[1, "sum_dt"] == 40
    assert out.loc[1, "twa"] == 17.5
    assert 2 not in out.index


def test_histogram_quantile_interpolation():
    import pandas as pd

    from opentelemetry_collector_ray.stages.signals import histogram_quantile

    hist = pd.DataFrame(
        {
            "route": ["a"] * 4,
            "le": ["10", "100", "1000", "inf"],
            "n": np.array([50, 30, 15, 5], dtype=np.int64),
        }
    )
    out = histogram_quantile(
        ray.data.from_pandas(hist), group="route",
        bounds=(10, 100, 1000), q=0.5,
    )
    # target = 50 → boundary of first bucket: 0 + 10*(50-0)/50 = 10
    assert out.loc[0, "value_est"] == 10.0
    out9 = histogram_quantile(
        ray.data.from_pandas(hist), group="route",
        bounds=(10, 100, 1000), q=0.9,
    )
    # target 90: bucket '1000' (cum 80, n 15): 100 + 900*(10/15) = 700
    assert abs(out9.loc[0, "value_est"] - 700.0) < 1e-9
    # inf bucket → highest finite boundary
    out99 = histogram_quantile(
        ray.data.from_pandas(hist), group="route",
        bounds=(10, 100, 1000), q=0.99,
    )
    assert out99.loc[0, "value_est"] == 1000.0


def test_time_weighted_avg_skips_null_values_like_sql():
    import pandas as pd

    from opentelemetry_collector_ray.stages.signals import time_weighted_avg

    t = pd.Timestamp("2026-01-01")
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1],
            "ts": [t, t + pd.Timedelta(seconds=30), t + pd.Timedelta(seconds=41)],
            "event_id": np.arange(3, dtype=np.int64),
            "vm": pd.array([10, None, 99], dtype="Int64"),
        }
    )
    out = (
        time_weighted_avg(ray.data.from_pandas(df))
        .to_pandas().set_index("user_id")
    )
    # null point anchors its interval (dt counts) but its product skips
    assert out.loc[1, "sum_vdt"] == 10 * 30  # null's 11s product skipped
    assert out.loc[1, "sum_dt"] == 41


def test_cardinality_limit_drops_null_series_like_sql_join():
    import pandas as pd

    from opentelemetry_collector_ray.stages.signals import cardinality_limit

    df = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "event_type": ["m"] * 4,
            "user_id": pd.array([1, 2, None, 3], dtype="Int64"),
        }
    )
    out = cardinality_limit(
        ray.data.from_pandas(df), metric="event_type",
        series="user_id", limit=2,
    ).to_pandas()
    assert 2 not in set(out["event_id"])  # null row dropped, not '<NA>'
    named = out[out["series"] != "_overflow"]
    assert named["series"].nunique() == 2
