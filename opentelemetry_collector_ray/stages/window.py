"""Windowed aggregation over the ``events`` stream table.

The collector core has no windows/watermarks (SURVEY.md §2.6); these are
the stream-shaped extensions, implemented on the ordered-partitioned-log
model: partition by key (user_id), sort within partition, window inside
``map_groups``. The partition key IS the parallelism unit — a hot user
would skew; sessionization is per-user by definition, so the bound is
max-events-per-user (documented assumption).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def sessionize(
    events: ray.data.Dataset, gap_minutes: int = 30
) -> ray.data.Dataset:
    """Session windows per user: a new session starts when the gap from
    the previous event exceeds ``gap_minutes``. Output one row per
    session: (user_id, session_id, n_events, start_ts, end_ts,
    sum_value). session_id is 0-based per user in time order —
    deterministic and SQL-mirrorable (window-function form)."""
    from ..functions.shard import sharded_group_map

    gap_us = np.int64(gap_minutes * 60 * 1_000_000)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized over ALL the shard's users at once: one sort, one
        # boundary scan, one grouped aggregate — no per-user Python
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy()
        new = np.ones(len(g), dtype=bool)
        new[1:] = (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
        g = g.assign(_sid=np.cumsum(new) - 1)  # globally increasing
        first = g.groupby("user_id", sort=False)["_sid"].transform("min")
        g["session_id"] = (g["_sid"] - first).astype(np.int64)
        out = g.groupby(["user_id", "session_id"], as_index=False).agg(
            n_events=("event_id", "size"),
            start_ts=("ts", "min"),
            end_ts=("ts", "max"),
        )
        # no float sums in the comparable output: double accumulation
        # order differs across engines; integer/timestamp fields only.
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return sharded_group_map(events, ["user_id"], per_shard)


def tumbling_counts(
    events: ray.data.Dataset, unit: str = "hour"
) -> pd.DataFrame:
    """Tumbling-window counts per (event_type, window): pre-aggregated
    per batch (combiner), merged on the driver — no full shuffle.
    Output (event_type, window_start, n)."""
    freq = {"hour": "h", "day": "D", "minute": "min"}[unit]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(window_start=df["ts"].dt.floor(freq))
        out = (
            df.groupby(["event_type", "window_start"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return out

    partials = events.map_batches(partial, batch_format="pandas")
    pdf = partials.to_pandas()
    out = (
        pdf.groupby(["event_type", "window_start"], as_index=False)["n"].sum()
    )
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(
        ["event_type", "window_start"], kind="mergesort"
    ).reset_index(drop=True)


def hopping_counts(
    events: "ray.data.Dataset",
    *,
    group: str = "event_type",
    ts: str = "ts",
    size_hours: int = 3,
    hop_hours: int = 1,
):
    """Hopping (overlapping) windows — each event lands in
    ``size/hop`` windows. Completes the window family (tumbling /
    sliding / session / rolling / hopping): the event stream explodes
    by the small overlap factor (np.repeat, stateless), then the same
    tiny combiner count as tumbling. Output (group, window_start_hour,
    n) with window w covering hours [w, w+size)."""
    assert size_hours % hop_hours == 0
    k = size_hours // hop_hours
    from ..functions.agg import grouped_count

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        hours = (
            df[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
            // 3_600_000_000
        ) // hop_hours * hop_hours
        g = np.repeat(df[group].to_numpy(), k)
        offs = np.tile(np.arange(k, dtype=np.int64) * hop_hours, len(df))
        return pd.DataFrame(
            {group: g, "window_start_hour": np.repeat(hours, k) - offs}
        )

    exploded = events.map_batches(explode, batch_format="pandas")
    return grouped_count(exploded, [group, "window_start_hour"], alias="n")


def active_sessions_per_hour(sessions: ray.data.Dataset) -> ray.data.Dataset:
    """Concurrency metric: how many sessions were active in each hour —
    the sweep-line question answered combiner-style: every session
    explodes into the hours its [start, end] span touches (bounded by
    session length / 1 h — sessions are gap-bounded, so the factor is
    small) and a tiny grouped count sums overlaps. No global ordered
    scan, no driver sweep."""
    from ..functions.agg import grouped_count

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        h0 = (
            df["start_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // 3_600_000_000
        )
        h1 = (
            df["end_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // 3_600_000_000
        )
        spans = (h1 - h0 + 1).astype(np.int64)
        # concatenated aranges without a per-session Python loop
        starts = np.r_[0, np.cumsum(spans)]
        offs = np.arange(int(starts[-1])) - np.repeat(starts[:-1], spans)
        return pd.DataFrame({"hour": np.repeat(h0, spans) + offs})

    exploded = sessions.map_batches(explode, batch_format="pandas")
    return grouped_count(exploded, ["hour"], alias="n_active")
