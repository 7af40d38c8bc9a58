"""Ordered funnel analysis over an event log.

The product-analytics staple a log pipeline feeds: for an ordered list
of step event types, each user's step-k timestamp is the EARLIEST
step-k event that happens strictly AFTER their step-(k-1) timestamp; a
user who never reaches step k has null for k and every later step.

Scale shape: ONE sharded shuffle on the user key (`sharded_group_map`
— group count bounded by the shard count, never one task per user);
inside a shard each step is a vectorized filter + per-user min, so the
work is O(rows · steps) with no per-user Python. The per-user step
table is then a tiny per-step count aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def funnel_steps(
    events: ray.data.Dataset,
    *,
    steps: list[str],
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
) -> ray.data.Dataset:
    """Per-user funnel timestamps: one row per user seen in any step
    event, columns ``t1..tN`` (datetime, null once the funnel broke).
    Strictly-after semantics: step k counts only events with
    ``ts > t_{k-1}`` (ties do NOT advance the funnel)."""
    from ..functions.shard import sharded_group_map

    step_list = list(steps)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        users = pd.Index(g[key].unique(), name=key)
        prev = None  # step 1 has no predecessor constraint
        out = {}
        for i, step in enumerate(step_list, start=1):
            sub = g[g[type_col] == step]
            if prev is not None:
                pv = prev.reindex(sub[key]).to_numpy()
                # NaT/NaN predecessor compares False → row dropped,
                # so a broken funnel stays broken
                sub = sub[sub[ts].to_numpy() > pv]
            tk = sub.groupby(key, sort=False)[ts].min().reindex(users)
            out[f"t{i}"] = tk
            prev = tk
        res = pd.DataFrame(out, index=users).reset_index()
        # only users who entered the funnel at all
        return res[res["t1"].notna()].reset_index(drop=True)

    relevant = set(step_list)
    filtered = events.map_batches(
        lambda df: df[df[type_col].isin(relevant)], batch_format="pandas"
    )
    return sharded_group_map(filtered, [key], per_shard)


def funnel_counts(
    events: ray.data.Dataset,
    *,
    steps: list[str],
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
) -> pd.DataFrame:
    """Funnel summary: (step:int64, n_users:int64) — how many users
    reached each step. Per-batch non-null partial sums over the
    per-user step table, merged on the driver (O(steps · blocks))."""
    per_user = funnel_steps(
        events, steps=steps, key=key, ts=ts, type_col=type_col
    )
    ncols = [f"t{i}" for i in range(1, len(steps) + 1)]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {c: [np.int64(df[c].notna().sum())] for c in ncols}
        )

    parts = per_user.map_batches(partial, batch_format="pandas").to_pandas()
    totals = (
        parts[ncols].sum().to_numpy(dtype=np.int64)
        if len(parts) and set(ncols) <= set(parts.columns)
        else np.zeros(len(ncols), dtype=np.int64)  # empty-aggregate quirk
    )
    return pd.DataFrame(
        {
            "step": np.arange(1, len(steps) + 1, dtype=np.int64),
            "n_users": totals,
        }
    )


def cohort_retention(
    events: ray.data.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
) -> ray.data.Dataset:
    """Cohort retention triangle: (cohort_day, day_offset, n_users) —
    users whose FIRST active day is ``cohort_day`` and who were active
    again ``day_offset`` days later (offset 0 = the cohort size).

    ONE sharded shuffle on the user key: a user's distinct active days
    are co-located, so cohort assignment (per-user min) and offsets are
    vectorized in-shard; the result collapses through a tiny
    `grouped_count` on (cohort_day, day_offset) — no second corpus
    shuffle, no per-user Python. Days are int64 days-since-epoch so
    both engines hash identically."""
    from ..functions.agg import grouped_count
    from ..functions.shard import sharded_group_map

    def to_days(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            df[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000
        )
        # per-batch dedup (combiner): the shuffle ships distinct
        # (user, day) pairs, not raw events
        return pd.DataFrame(
            {key: df[key].to_numpy(), "day": day}
        ).drop_duplicates()

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates([key, "day"])
        cohort = d.groupby(key, sort=False)["day"].transform("min")
        return pd.DataFrame(
            {
                "cohort_day": cohort.to_numpy(),
                "day_offset": d["day"].to_numpy() - cohort.to_numpy(),
            }
        )

    days = events.map_batches(to_days, batch_format="pandas")
    pairs = sharded_group_map(days, [key], per_shard)
    return grouped_count(pairs, ["cohort_day", "day_offset"], alias="n_users")
