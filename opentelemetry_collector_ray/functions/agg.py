"""Pre-aggregated (combiner) grouped aggregates.

``Dataset.groupby(k).aggregate(...)`` shuffles EVERY row through a
sort exchange — and on pandas-block inputs with object-dtype keys the
aggregate map path degrades badly (measured: 225 core-seconds to count
600k joined rows by a 3-value key). When the group count is small, the
right shape is always: partial aggregate per batch inside
``map_batches`` (Arrow kernels), then combine the tiny partials —
through a final small groupby or on the driver. This module provides
that shape as reusable helpers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _sentinel_groupby(partials: ray.data.Dataset, keys: list[str], *aggs):
    """Ray ``groupby`` with SQL NULL-group semantics for STRING keys:
    its sort shuffle cannot order None beside str, so nulls ride the
    ``shard.NULL_KEY`` sentinel through the exchange and are restored
    on the tiny aggregate output. No-op overhead when keys are
    null-free (fill_null_key early-outs per batch)."""
    from .shard import fill_null_key, restore_null_key

    def fill(t: pa.Table) -> pa.Table:
        for k in keys:
            t = fill_null_key(t, k)
        return t

    out = (
        partials.map_batches(fill, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(*aggs)
    )

    def restore(t: pa.Table) -> pa.Table:
        for k in keys:
            t = restore_null_key(t, k)
        return t

    return out.map_batches(restore, batch_format="pyarrow")


def grouped_count(
    ds: ray.data.Dataset, keys: list[str], *, alias: str = "n"
) -> ray.data.Dataset:
    """count(*) per key-combination via per-batch partials + a tiny
    final groupby. Output columns: keys + [alias] (int64)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([([], "count_all")])
        return g.rename_columns(keys + ["_pc"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return _sentinel_groupby(partials, keys, Sum("_pc", alias_name=alias))


def grouped_stats(
    ds: ray.data.Dataset,
    keys: list[str],
    value: str,
    *,
    count_alias: str = "n",
    sum_alias: str | None = None,
) -> ray.data.Dataset:
    """count(*) + sum(value) per key-combination via per-batch Arrow
    partials + a tiny final groupby (null values skipped by the sum,
    counted by the count — SQL semantics). Output columns:
    keys + [count_alias, sum_alias] with the sum cast to int64 when the
    per-batch partial sums are integral."""
    from ray.data.aggregate import Sum

    sum_alias = sum_alias or f"sum_{value}"

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([([], "count_all"), (value, "sum")])
        return g.rename_columns(keys + ["_pc", "_ps"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return _sentinel_groupby(
        partials,
        keys,
        Sum("_pc", alias_name=count_alias),
        Sum("_ps", alias_name=sum_alias),
    )


def grouped_count_driver(
    ds: ray.data.Dataset, keys: list[str], *, alias: str = "n"
) -> pd.DataFrame:
    """Same, but the partials (O(groups × blocks) rows) merge on the
    driver — zero shuffle; for group counts ≪ driver memory."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([([], "count_all")])
        return g.rename_columns(keys + ["_pc"])

    pdf = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = pdf.groupby(keys, as_index=False)["_pc"].sum()
    out = out.rename(columns={"_pc": alias})
    out[alias] = out[alias].astype("int64")
    return out.sort_values(keys, kind="mergesort").reset_index(drop=True)


def grouped_rollup(
    ds: ray.data.Dataset,
    keys: list[str],
    *,
    alias: str = "n",
    sentinels: dict | None = None,
) -> pd.DataFrame:
    """GROUP BY ROLLUP in one pass: counts at every prefix level of
    ``keys`` — (k1, k2, …), (k1, …), …, () — from a SINGLE shuffle on
    the finest key combination. Coarser levels are derived by
    re-aggregating the tiny finest-level table (groups × 1 rows) on the
    driver, never by re-scanning the corpus: the same
    combiner-over-partials argument as `grouped_count`, applied once
    per level. Grouped-out columns carry a caller-chosen SENTINEL value
    instead of SQL NULL (``coalesce`` both sides of the oracle) so
    dtypes stay exact under the hash gate.
    """
    sentinels = sentinels or {}
    finest = grouped_count(ds, keys, alias=alias).to_pandas()
    levels = [finest]
    for depth in range(len(keys) - 1, -1, -1):
        kept, dropped = keys[:depth], keys[depth:]
        if kept:
            lvl = finest.groupby(kept, as_index=False)[alias].sum()
        else:
            lvl = pd.DataFrame({alias: [int(finest[alias].sum())]})
        for col in dropped:
            lvl[col] = sentinels.get(col, "(all)")
            lvl[col] = lvl[col].astype(finest[col].dtype)
        levels.append(lvl[keys + [alias]])
    out = pd.concat(levels, ignore_index=True)
    out[alias] = out[alias].astype("int64")
    return out.sort_values(keys + [alias], kind="mergesort").reset_index(
        drop=True
    )


def grouped_cube(
    ds: ray.data.Dataset,
    keys: list[str],
    *,
    alias: str = "n",
    sentinels: dict | None = None,
) -> pd.DataFrame:
    """GROUP BY CUBE in one pass: counts at EVERY subset of ``keys``
    (2^k grouping sets) from a SINGLE shuffle on the finest key
    combination — every coarser set is re-aggregated from the tiny
    finest-level table on the driver, same argument as
    `grouped_rollup`. Grouped-out columns carry caller-chosen sentinels
    so dtypes stay exact under the hash gate."""
    from itertools import combinations

    sentinels = sentinels or {}
    finest = grouped_count(ds, keys, alias=alias).to_pandas()
    levels = [finest]
    for r in range(len(keys) - 1, -1, -1):
        for kept_t in combinations(keys, r):
            kept = list(kept_t)
            dropped = [k for k in keys if k not in kept]
            if kept:
                lvl = finest.groupby(kept, as_index=False)[alias].sum()
            else:
                lvl = pd.DataFrame({alias: [int(finest[alias].sum())]})
            for col in dropped:
                lvl[col] = sentinels.get(col, "(all)")
                lvl[col] = lvl[col].astype(finest[col].dtype)
            levels.append(lvl[keys + [alias]])
    out = pd.concat(levels, ignore_index=True)
    out[alias] = out[alias].astype("int64")
    return out.sort_values(keys + [alias], kind="mergesort").reset_index(
        drop=True
    )


def grouped_variance(
    ds: ray.data.Dataset,
    keys: list[str],
    value: str,
    *,
    n_alias: str = "n",
    sum_alias: str | None = None,
    sumsq_alias: str | None = None,
    var_alias: str | None = None,
) -> ray.data.Dataset:
    """Population variance per group from ONE combiner pass: integer
    count / sum / sum-of-squares partials per batch (exact — ``value``
    must be int64), tiny final groupby, then the float step
    ``sumsq/n − (sum/n)²`` applied identically on both engines (exact
    int operands + the same IEEE op order → bit-stable under the hash
    gate). Overflow bound: per-group Σv² must fit int64, i.e.
    n·max(v)² < 2⁶³ — quantize accordingly."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    sum_alias = sum_alias or f"sum_{value}"
    sumsq_alias = sumsq_alias or f"sumsq_{value}"
    var_alias = var_alias or f"var_{value}"

    def partial(t: pa.Table) -> pa.Table:
        v = t[value]
        cols = {k: t[k] for k in keys}
        cols["_v"] = v
        cols["_sq"] = pc.multiply(v, v)
        g = pa.table(cols).group_by(keys).aggregate(
            [("_v", "count"), ("_v", "sum"), ("_sq", "sum")]
        )
        return g.rename_columns(keys + ["_pc", "_ps", "_pq"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = _sentinel_groupby(
        partials,
        keys,
        Sum("_pc", alias_name=n_alias),
        Sum("_ps", alias_name=sum_alias),
        Sum("_pq", alias_name=sumsq_alias),
    )

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t[n_alias], pa.float64())
        mean = pc.divide(pc.cast(t[sum_alias], pa.float64()), n)
        msq = pc.divide(pc.cast(t[sumsq_alias], pa.float64()), n)
        var = pc.subtract(msq, pc.multiply(mean, mean))
        return t.append_column(var_alias, var)

    return agg.map_batches(finish, batch_format="pyarrow")


def grouped_corr(
    ds: ray.data.Dataset,
    keys: list[str],
    x: str,
    y: str,
    *,
    corr_alias: str = "corr",
) -> ray.data.Dataset:
    """Pearson correlation per group from ONE combiner pass: exact
    int64 partials (n, Σx, Σy, Σxy, Σx², Σy²) per batch, tiny final
    groupby, then the float finish
    ``(n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²)(n·Σy² − Σy²))`` with a
    fixed IEEE op order so the oracle can mirror it term by term
    (bit-stable under the hash gate, same argument as
    `grouped_variance`). ``x``/``y`` must be int64; overflow bound:
    per-group n·max(v)² < 2⁶³."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        # pairwise-complete: drop rows where either operand is null so
        # every moment (incl. n) covers the same row set — mixing
        # per-column null-skipping gives an incoherent correlation
        # (found by the null-parity gate)
        t = t.filter(pc.and_(pc.is_valid(t[x]), pc.is_valid(t[y])))
        cols = {k: t[k] for k in keys}
        cols["_x"] = t[x]
        cols["_y"] = t[y]
        cols["_xy"] = pc.multiply(t[x], t[y])
        cols["_xx"] = pc.multiply(t[x], t[x])
        cols["_yy"] = pc.multiply(t[y], t[y])
        g = pa.table(cols).group_by(keys).aggregate(
            [
                ("_x", "count"),
                ("_x", "sum"),
                ("_y", "sum"),
                ("_xy", "sum"),
                ("_xx", "sum"),
                ("_yy", "sum"),
            ]
        )
        return g.rename_columns(
            keys + ["_pc", "_px", "_py", "_pxy", "_pxx", "_pyy"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = _sentinel_groupby(
        partials,
        keys,
        Sum("_pc", alias_name="n"),
        Sum("_px", alias_name="sum_x"),
        Sum("_py", alias_name="sum_y"),
        Sum("_pxy", alias_name="sum_xy"),
        Sum("_pxx", alias_name="sum_xx"),
        Sum("_pyy", alias_name="sum_yy"),
    )

    def finish(t: pa.Table) -> pa.Table:
        f = pa.float64()
        nf = pc.cast(t["n"], f)
        sx = pc.cast(t["sum_x"], f)
        sy = pc.cast(t["sum_y"], f)
        sxy = pc.cast(t["sum_xy"], f)
        sxx = pc.cast(t["sum_xx"], f)
        syy = pc.cast(t["sum_yy"], f)
        cov_n = pc.subtract(pc.multiply(nf, sxy), pc.multiply(sx, sy))
        vx = pc.subtract(pc.multiply(nf, sxx), pc.multiply(sx, sx))
        vy = pc.subtract(pc.multiply(nf, syy), pc.multiply(sy, sy))
        corr = pc.divide(cov_n, pc.sqrt(pc.multiply(vx, vy)))
        return t.append_column(corr_alias, corr)

    return agg.map_batches(finish, batch_format="pyarrow")


def grouped_outlier_counts(
    ds: ray.data.Dataset,
    keys: list[str],
    value: str,
    *,
    k: float = 2.0,
    alias: str = "n_outliers",
) -> ray.data.Dataset:
    """Per-group z-score outlier count: |v − mean| > k·std. Two
    streaming passes over ``ds`` (which must be re-iterable, e.g. a
    lazy read): (1) `grouped_variance` combiner → tiny per-group
    stats table on the driver; (2) mean/std broadcast once
    (``ray.put``), stateless vectorized threshold filter, then a tiny
    `grouped_count`. No corpus shuffle in either pass. mean/std use
    the exact `grouped_variance` float op order, so an oracle that
    mirrors those formulas makes the strict ``>`` comparison
    bit-deterministic; ``value`` must be int64."""
    import ray as _ray

    stats = grouped_variance(ds, keys, value).to_pandas()
    mean = stats[f"sum_{value}"].to_numpy() / stats["n"].to_numpy()
    std = np.sqrt(stats[f"var_{value}"].to_numpy())
    key_tuples = list(map(tuple, stats[keys].itertuples(index=False)))
    lookup = _ray.put(
        {kt: (m, s) for kt, m, s in zip(key_tuples, mean, std)}
    )

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        lk = _ray.get(lookup)
        kt = list(map(tuple, g[keys].itertuples(index=False)))
        ms = np.array([lk[t] for t in kt], dtype=np.float64)
        v = g[value].to_numpy().astype(np.float64)
        keep = np.abs(v - ms[:, 0]) > k * ms[:, 1]
        return g.loc[keep, keys]

    return grouped_count(
        ds.map_batches(flag, batch_format="pandas"), keys, alias=alias
    )



def _count_histogram(
    ds: ray.data.Dataset, key: str, *, ascending: bool
) -> pd.DataFrame:
    """Count-of-counts histogram: (_n = per-key count, _keys = how many
    keys have it), sorted by _n. Shared scaffold of
    `concentration_share` and `gini_ppm`; normalizes the zero-block
    empty-aggregate quirk (no-column to_pandas) to an empty typed
    frame."""
    per_key = grouped_count(ds, [key], alias="_n")
    hist = grouped_count(per_key, ["_n"], alias="_keys").to_pandas()
    if hist.empty or "_n" not in hist.columns:
        return pd.DataFrame(
            {"_n": np.array([], dtype=np.int64),
             "_keys": np.array([], dtype=np.int64)}
        )
    return hist.sort_values("_n", ascending=ascending).reset_index(drop=True)


def concentration_share(
    ds: ray.data.Dataset,
    *,
    key: str = "user_id",
    top_fraction_denom: int = 100,
) -> pd.DataFrame:
    """Concentration (Pareto) diagnostic: what share of all events do
    the top 1/``denom`` of keys produce? The identity of the top keys
    is irrelevant to the SUM — keys with equal counts are
    interchangeable — so the answer comes exactly from the tiny
    count-of-counts histogram: per-key counts (uniform combiner
    groupby), then a histogram of those counts (second tiny groupby),
    then a driver walk accumulating the largest count values until the
    top-k quota is filled (ties split a count level partially). Output
    is one integer-exact row; the share is ppm via floor division."""
    hist = _count_histogram(ds, key, ascending=False)
    if hist.empty:
        return pd.DataFrame(
            {c: np.array([], dtype=np.int64)
             for c in ["total_users", "total_events", "top_users",
                       "top_events", "share_ppm"]}
        )
    users = int(hist["_keys"].sum())
    total = int((hist["_n"] * hist["_keys"]).sum())
    k = max(users // top_fraction_denom, 1)
    remaining = k
    top_events = 0
    for _, r in hist.iterrows():
        take = min(int(r["_keys"]), remaining)
        top_events += take * int(r["_n"])
        remaining -= take
        if remaining == 0:
            break
    return pd.DataFrame(
        {
            "total_users": np.array([users], dtype=np.int64),
            "total_events": np.array([total], dtype=np.int64),
            "top_users": np.array([k], dtype=np.int64),
            "top_events": np.array([top_events], dtype=np.int64),
            "share_ppm": np.array(
                [top_events * 1_000_000 // total], dtype=np.int64
            ),
        }
    )


def gini_ppm(ds: ray.data.Dataset, *, key: str = "user_id") -> pd.DataFrame:
    """Gini coefficient of the per-key event distribution, exact and
    integer-valued (ppm): G = (2·S − (n+1)·T) / (n·T) with S the
    rank-weighted sum over counts sorted ascending. Keys sharing a
    count are interchangeable (a run of equal counts contributes
    count · Σranks regardless of order), so — like
    `concentration_share` — the tiny count-of-counts histogram answers
    exactly, no per-key ranking shuffle. Overflow bound: n·T < 2⁶³."""
    hist = _count_histogram(ds, key, ascending=True)
    if hist.empty:
        return pd.DataFrame(
            {c: np.array([], dtype=np.int64)
             for c in ["n_keys", "total", "gini_ppm"]}
        )
    cnt = hist["_keys"].to_numpy(dtype=np.int64)
    val = hist["_n"].to_numpy(dtype=np.int64)
    n = int(cnt.sum())
    total = int((cnt * val).sum())
    last = np.cumsum(cnt)
    first = last - cnt + 1
    # Σ ranks of each equal-count run = cnt·(first+last)/2 (exact:
    # cnt·(first+last) is always even)
    s = int((val * (cnt * (first + last) // 2)).sum())
    g_ppm = ((2 * s - (n + 1) * total) * 1_000_000) // (n * total)
    return pd.DataFrame(
        {
            "n_keys": np.array([n], dtype=np.int64),
            "total": np.array([total], dtype=np.int64),
            "gini_ppm": np.array([g_ppm], dtype=np.int64),
        }
    )


def merge_counts(
    aggs: list[ray.data.Dataset], keys: list[str], *, alias: str = "n"
) -> ray.data.Dataset:
    """Incremental view maintenance for count aggregates: merge
    previously materialized per-key counts with a new delta's counts —
    counts are a commutative monoid, so the union of aggregate tables
    re-grouped once equals a full rescan, at the cost of only the
    (tiny) aggregate tables. The checkpointed-ingest companion: each
    partition run materializes its counts; this merges them."""
    from ray.data.aggregate import Sum

    renamed = [
        ds.map_batches(
            lambda t: t.rename_columns(keys + ["_pc"]),
            batch_format="pyarrow",
        )
        for ds in aggs
    ]
    out = renamed[0]
    for ds in renamed[1:]:
        out = out.union(ds)
    return _sentinel_groupby(out, keys, Sum("_pc", alias_name=alias))
