"""Sliding windows, per-group top-k, and discrete quantiles.

Stream-shaped extensions on the ordered-partitioned-log model (same
partitioning contract as `stages/window.py`: one key's history lives in
one group; the shuffle is the single groupby on the key).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def sliding_count(
    events: ray.data.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    window_minutes: int = 60,
    out: str = "n_window",
) -> ray.data.Dataset:
    """Per row: count of the key's events with ts in [t-window, t]
    (RANGE ... CURRENT ROW semantics incl. ts-peers). Vectorized per
    group: two binary searches over the sorted ts array — O(n log n)
    per key, no per-row Python."""
    win_us = np.int64(window_minutes * 60 * 1_000_000)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts, kind="mergesort")
        t = g[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        left = np.searchsorted(t, t - win_us, side="left")
        right = np.searchsorted(t, t, side="right")
        return g.assign(**{out: (right - left).astype(np.int64)})

    return events.groupby(key).map_groups(per_key, batch_format="pandas")


def topk_per_group(
    ds: ray.data.Dataset,
    *,
    group: str,
    order_by: str,
    tiebreak: str,
    k: int = 3,
) -> ray.data.Dataset:
    """Top-k rows per group by (order_by desc, tiebreak asc), with a
    1-based ``rank`` column — row_number()-over-partition semantics."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [order_by, tiebreak], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        return g

    return ds.groupby(group).map_groups(per_group, batch_format="pandas")


def discrete_quantiles(
    ds: ray.data.Dataset,
    *,
    group: str,
    value: str,
    quantiles: tuple[float, ...] = (0.5, 0.95),
    prefix: str = "q",
    out_dtype: str | None = None,
) -> ray.data.Dataset:
    """Per-group discrete quantiles: the actual element at 1-based rank
    ``ceil(q*n)`` of the sorted non-null values — DuckDB
    ``quantile_disc`` semantics, so results are exact data values (no
    float interpolation → hash-safe across engines)."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g[value].dropna().to_numpy())
        if out_dtype:
            v = v.astype(out_dtype)
        n = len(v)
        row = {group: g[group].iloc[0]}
        for q in quantiles:
            name = f"{prefix}{int(round(q * 100))}"  # 0.57*100 → 57, not 56
            row[name] = v[max(int(np.ceil(q * n)) - 1, 0)] if n else None
        return pd.DataFrame([row])

    return ds.groupby(group).map_groups(per_group, batch_format="pandas")
