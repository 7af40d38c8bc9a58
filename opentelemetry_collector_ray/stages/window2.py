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
    from ..functions.shard import sharded_group_map

    win_us = np.int64(window_minutes * 60 * 1_000_000)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        # one sort for the whole shard; per key just two C searchsorted
        # calls over its contiguous segment (no per-key DataFrames)
        g = g.sort_values([key, ts], kind="mergesort")
        t = g[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        k = g[key].to_numpy()
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], len(k)]
        n = np.empty(len(k), dtype=np.int64)
        for s, e in zip(starts, ends):
            seg = t[s:e]
            lo = np.searchsorted(seg, seg - win_us, side="left")
            hi = np.searchsorted(seg, seg, side="right")
            n[s:e] = hi - lo
        return g.assign(**{out: n})

    return sharded_group_map(events, [key], per_shard)


def topk_per_group(
    ds: ray.data.Dataset,
    *,
    group: str,
    order_by: str,
    tiebreak: str,
    k: int = 3,
) -> ray.data.Dataset:
    """Top-k rows per group by (order_by desc, tiebreak asc), with a
    1-based ``rank`` column — row_number()-over-partition semantics.

    Scale shape: per-BATCH partial top-k first (each batch emits at most
    groups×k rows), then the final per-group selection runs over only
    the partials — O(groups × k × blocks) rows through the shuffle, so
    a low-cardinality ``group`` (the common case for top-k) never puts
    a constant fraction of the corpus into one reducer."""

    from ..functions.shard import NULL_KEY

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        # SQL PARTITION BY keeps a NULL partition; pandas groupby
        # drops NaN groups and Ray's sort shuffle can't order None
        # beside str — sentinel through, restored in `final`
        if g[group].dtype == object:
            g[group] = g[group].fillna(NULL_KEY)
        g = g.sort_values(
            [group, order_by, tiebreak],
            ascending=[True, False, True],
            kind="mergesort",
        )
        # dropna=False keeps a NUMERIC NaN group (SQL PARTITION BY
        # keeps the NULL partition); object keys took the sentinel
        # above because Ray's sort shuffle can't order None beside str,
        # but float NaN sorts fine
        return g.groupby(group, sort=False, dropna=False).head(k)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g[group].dtype == object:
            # .loc assignment, not .where — where() fills NaN, which
            # later reprs as 'nan' instead of a true null
            g.loc[g[group] == NULL_KEY, group] = None
        g = g.sort_values(
            [order_by, tiebreak], ascending=[False, True], kind="mergesort"
        ).head(k)
        return g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby(group).map_groups(final, batch_format="pandas")


def discrete_quantiles(
    ds: ray.data.Dataset,
    *,
    group: str,
    value: str,
    quantiles: tuple[float, ...] = (0.5, 0.95),
    prefix: str = "q",
    out_dtype: str | None = None,
) -> "pd.DataFrame":
    """Per-group discrete quantiles: the actual element at 1-based rank
    ``ceil(q*n)`` of the sorted non-null values — DuckDB
    ``quantile_disc`` semantics, so results are exact data values (no
    float interpolation → hash-safe across engines).

    Scale shape: EXACT quantiles from a distributed value histogram —
    per-batch partial counts on (group, value) combined through one
    uniform-key groupby; the driver sees only the tiny
    (group, distinct-value, count) table and walks cumulative counts to
    the quantile ranks. Valid while distinct values per group are
    bounded (integer-valued latencies etc. — the documented
    assumption); for unbounded continuous values switch to a mergeable
    quantile sketch (t-digest tier)."""
    import pyarrow.compute as pc

    from ..functions.agg import grouped_count

    nonnull = ds.map_batches(
        lambda t: t.filter(pc.is_valid(t[value])), batch_format="pyarrow"
    )
    hist = grouped_count(nonnull, [group, value], alias="_n").to_pandas()
    rows = []
    for gval, g in hist.groupby(group, sort=True):
        g = g.sort_values(value, kind="mergesort")
        cum = g["_n"].cumsum().to_numpy()
        n = int(cum[-1]) if len(cum) else 0
        row = {group: gval}
        for q in quantiles:
            name = f"{prefix}{int(round(q * 100))}"  # 0.57*100 → 57, not 56
            if n:
                target = max(int(np.ceil(q * n)), 1)
                idx = int(np.searchsorted(cum, target, side="left"))
                v = g[value].iloc[idx]
                row[name] = v
            else:
                row[name] = None
        rows.append(row)
    out = pd.DataFrame(rows)
    if out_dtype and len(out):
        qcols = [c for c in out.columns if c != group]
        out = out.astype({c: out_dtype for c in qcols})
    return out.reset_index(drop=True)


def global_ntile(
    ds: ray.data.Dataset,
    *,
    value: str,
    tiebreak: str,
    buckets: int = 10,
    out: str = "bucket",
) -> ray.data.Dataset:
    """``ntile(b) OVER (ORDER BY value, tiebreak)`` WITHOUT a global
    sort: global order statistics from a distributed value histogram.

    Shape: (1) tiny combiner histogram of ``value`` counts → driver
    prefix-sums it into a value→starting-rank dict, broadcast once
    (``ray.put``); (2) one sharded groupby on ``value`` ranks ties by
    ``tiebreak`` inside their value-group, so every row's exact global
    rank is start[value] + tie-rank — no all-to-all range partition, no
    ``ds.sort``. Valid while distinct ``value``s are bounded (same
    contract as `discrete_quantiles`); ties-per-value is the group-size
    bound. Bucket widths follow SQL ntile: the first n %% b buckets take
    one extra row."""
    import ray as _ray

    from ..functions.agg import grouped_count
    from ..functions.shard import sharded_group_map

    hist = grouped_count(ds, [value], alias="_n").to_pandas()
    hist = hist.sort_values(value, kind="mergesort")
    starts = np.r_[0, hist["_n"].cumsum().to_numpy()[:-1]]
    n = int(hist["_n"].sum())
    start_ref = _ray.put(dict(zip(hist[value].tolist(), starts.tolist())))

    small, nbig = divmod(n, buckets)
    big = small + 1
    cut = nbig * big  # ranks 1..cut live in the big buckets

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        lookup = _ray.get(start_ref)
        g = g.sort_values([value, tiebreak], kind="mergesort")
        v = g[value].to_numpy()
        seg_starts = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
        tie = np.arange(len(g), dtype=np.int64)
        tie -= np.repeat(tie[seg_starts], np.diff(np.r_[seg_starts, len(g)]))
        base = np.asarray([lookup[x] for x in v[seg_starts]], dtype=np.int64)
        rank = np.repeat(base, np.diff(np.r_[seg_starts, len(g)])) + tie + 1
        nt = np.where(
            rank <= cut,
            (rank - 1) // max(big, 1) + 1,
            nbig + (rank - cut - 1) // max(small, 1) + 1,
        )
        return g.assign(**{out: nt.astype(np.int64)})

    return sharded_group_map(ds, [value], per_shard)


def rolling_sum(
    ds: ray.data.Dataset,
    *,
    key: str = "user_id",
    order: list[str] | None = None,
    value: str = "vm",
    window: int = 4,
    out: str = "roll_sum",
) -> ray.data.Dataset:
    """Per-row rolling sum over the key's last ``window`` rows — SQL
    ``SUM(value) OVER (PARTITION BY key ORDER BY order ROWS BETWEEN
    window-1 PRECEDING AND CURRENT ROW)``. Vectorized across every key
    in the shard at once: one sort, one cumulative sum, one clamped
    prefix-difference — no per-key loop, no per-row Python."""
    from ..functions.shard import sharded_group_map

    order = order or ["ts"]

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key] + order, kind="mergesort")
        vals = g[value]
        # null-safe SQL window-SUM: NULL terms are skipped (fill 0 for
        # the prefix sums), an all-NULL window is NULL — a blind
        # astype(int64) minted INT64_MIN (found by the null-parity gate)
        na = vals.isna().to_numpy()
        v = vals.fillna(0).to_numpy().astype(np.int64)
        k = g[key].to_numpy()
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        seg_start = np.repeat(starts, np.diff(np.r_[starts, len(k)]))
        cs = np.cumsum(v)
        nn = np.cumsum(~na)
        idx = np.arange(len(k), dtype=np.int64)
        j = np.maximum(seg_start, idx - window + 1)  # window start row
        prev = np.where(j > 0, cs[np.maximum(j - 1, 0)], 0)
        prev_nn = np.where(j > 0, nn[np.maximum(j - 1, 0)], 0)
        roll = pd.Series(cs - prev, index=g.index)
        return g.assign(
            **{out: roll.where(nn - prev_nn > 0).astype("Int64")}
        )

    return sharded_group_map(ds, [key], per_shard)


def lag_lead(
    ds: ray.data.Dataset,
    *,
    key: str,
    order: list[str],
    col: str,
    lag_name: str | None = None,
    lead_name: str | None = None,
) -> ray.data.Dataset:
    """SQL ``LAG(col)`` / ``LEAD(col)`` over ``PARTITION BY key ORDER
    BY order`` (default offset 1, NULL at partition edges). One sharded
    key shuffle; the shift is a whole-shard slice with segment-boundary
    masking — no per-key loop."""
    from ..functions.shard import sharded_group_map

    lag_name = lag_name or f"lag_{col}"
    lead_name = lead_name or f"lead_{col}"

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key] + order, kind="mergesort")
        k = g[key].to_numpy()
        v = g[col].to_numpy(dtype=object)
        n = len(g)
        same_prev = np.zeros(n, dtype=bool)
        if n > 1:
            same_prev[1:] = k[1:] == k[:-1]
        lagv = np.empty(n, dtype=object)
        leadv = np.empty(n, dtype=object)
        lagv[1:] = v[:-1]
        leadv[:-1] = v[1:]
        lagv[~same_prev] = None
        valid_lead = np.zeros(n, dtype=bool)
        if n > 1:
            valid_lead[:-1] = same_prev[1:]
        leadv[~valid_lead] = None
        return g.assign(**{lag_name: lagv, lead_name: leadv})

    return sharded_group_map(ds, [key], per_shard)


def global_rank_stats(
    ds: ray.data.Dataset,
    *,
    value: str,
) -> ray.data.Dataset:
    """``RANK() / DENSE_RANK() / PERCENT_RANK() / CUME_DIST() OVER
    (ORDER BY value)`` for every row, with ZERO row shuffle.

    Tie-sharing window functions depend only on the row's value, so:
    (1) a tiny combiner histogram of value counts (the only shuffle —
    O(distinct values)); (2) the driver prefix-sums it into per-value
    rank/dense/cume arrays; (3) one ``ray.put`` broadcast and a
    stateless ``map_batches`` assigns every row via ``np.searchsorted``
    against the sorted distinct values — vectorized, no dict, no sort
    of the corpus. Valid while distinct values are bounded (same
    contract as `discrete_quantiles` / `global_ntile`); the floats are
    the exact SQL formulas ``(rank-1)/(n-1)`` and ``cum/n`` evaluated
    in IEEE double, bit-stable vs the oracle."""
    import ray as _ray

    from ..functions.agg import grouped_count

    hist = grouped_count(ds, [value], alias="_n").to_pandas()
    hist = hist.sort_values(value, kind="mergesort")
    cnt = hist["_n"].to_numpy(dtype=np.int64)
    n = int(cnt.sum())
    cum = np.cumsum(cnt)
    starts = cum - cnt
    stats = _ray.put(
        {
            "vals": hist[value].to_numpy(),
            "rnk": starts + 1,
            "drnk": np.arange(1, len(cnt) + 1, dtype=np.int64),
            "pr": starts.astype(np.float64) / max(n - 1, 1),
            "cd": cum.astype(np.float64) / n,
        }
    )

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        s = _ray.get(stats)
        idx = np.searchsorted(s["vals"], g[value].to_numpy())
        return g.assign(
            rnk=s["rnk"][idx],
            drnk=s["drnk"][idx],
            pr=s["pr"][idx],
            cd=s["cd"][idx],
        )

    return ds.map_batches(assign, batch_format="pandas")
