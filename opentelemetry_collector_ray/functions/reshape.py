"""Reshape operators — pivot (long→wide) and melt (wide→long).

Neither exists in the collector core (its data model is fixed-schema
signal tables, SURVEY.md §1.2); both are table stakes for a
data-processing engine's analytics surface (DuckDB PIVOT/UNPIVOT,
pandas pivot_table/melt).

``pivot_counts`` is an aggregate: it assumes the pivot column has a
BOUNDED, caller-enumerated set of distinct values (one output column
per value — the wide schema must be known up front to stay
deterministic and streaming-safe). Shape: per-batch Arrow indicator
partials (a combiner — the shuffle carries one row per (key, batch),
not per input row), then one uniform-key groupby sum. Key cardinality
can be arbitrarily high; skew is bounded because each group's state is
one row of ``len(values)`` ints.

``melt`` is stateless: each input row explodes into ``len(value_cols)``
output rows inside one ``map_batches`` — zero shuffle, column-slice
concatenation only.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def pivot_counts(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    values: list[str],
) -> ray.data.Dataset:
    """Count of rows per (key, col==value), one int64 output column per
    entry of ``values`` (rows whose ``col`` is outside ``values`` are
    ignored). Output columns: [key] + values."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        cols = {key: t[key]}
        for v in values:
            cols[v] = pc.cast(pc.equal(t[col], v), pa.int64())
        ind = pa.table(cols)
        g = ind.group_by([key]).aggregate([(v, "sum") for v in values])
        return g.rename_columns([key] + values)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby(key).aggregate(
        *[Sum(v, alias_name=v) for v in values]
    )
    return out


def melt(
    ds: ray.data.Dataset,
    id_cols: list[str],
    value_cols: list[str],
    *,
    var_name: str = "variable",
    value_name: str = "value",
) -> ray.data.Dataset:
    """Wide→long: one output row per (input row, value column).
    Output columns: id_cols + [var_name, value_name]; the value columns
    must share one type."""

    def fn(t: pa.Table) -> pa.Table:
        n = len(t)
        parts = []
        for v in value_cols:
            cols = {c: t[c] for c in id_cols}
            cols[var_name] = pa.array([v] * n, type=pa.string())
            cols[value_name] = t[v]
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(fn, batch_format="pyarrow")
