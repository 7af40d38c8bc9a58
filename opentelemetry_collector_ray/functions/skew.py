"""Explicit skew handling — salted two-phase aggregation.

The north rule requires partitioning/shuffle/skew handled explicitly.
A hot group key (one value dominating the input) turns a groupby into a
single straggler reducer. The standard fix: **salt** — phase 1 groups
by (key, salt) where salt spreads the hot key's rows over S reducers;
phase 2 re-aggregates the S partials per key. Works for any
commutative-associative aggregate (count/sum/min/max/sketches).

Here both phases run over pre-aggregated per-batch partials, so the
shuffles move O(groups × salt × blocks) rows regardless of input size.
"""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

# per-worker-process monotone counter feeding the salt (see partial())
_SALT_COUNTER = itertools.count()


def salted_grouped_sum(
    ds: ray.data.Dataset,
    key: str,
    value_col: str | None,
    *,
    salt: int = 8,
    alias: str = "n",
) -> ray.data.Dataset:
    """count(*) (value_col=None) or sum(value_col) per key, skew-proof.

    Phase 1 partials carry a deterministic per-block salt so a hot key's
    partials land on ``salt`` different reducers; phase 2 merges the at
    most ``salt`` rows per key. Output: (key, alias).
    """

    def partial(t: pa.Table) -> pa.Table:
        agg = ([], "count_all") if value_col is None else (value_col, "sum")
        g = t.group_by([key]).aggregate([agg]).rename_columns([key, "_pv"])
        # salt from a per-worker call counter: identical (key, count)
        # partials from uniform blocks MUST still land on different
        # reducers (content-derived salt degenerates to one value in
        # exactly the uniform hot-key case). The salt value itself
        # never affects the result — phase 2 merges every salt — so it
        # needs spread, not cross-run determinism.
        base = next(_SALT_COUNTER)
        s = (base + np.arange(len(g), dtype=np.int64)) % salt
        return g.append_column("_salt", pa.array(s))

    partials = ds.map_batches(partial, batch_format="pyarrow")
    phase1 = partials.groupby([key, "_salt"]).aggregate(
        Sum("_pv", alias_name="_pv1")
    )
    phase2 = phase1.groupby(key).aggregate(Sum("_pv1", alias_name=alias))
    return phase2
