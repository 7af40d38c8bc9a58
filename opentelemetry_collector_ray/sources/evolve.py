"""Schema-evolution union — read shards whose schemas drifted.

A 100 TB corpus is written over months: new columns appear, ints widen,
old shards lack fields added later. `union_by_name` makes the union of
such datasets total: columns align by NAME (SQL ``UNION ALL BY NAME``
semantics), missing columns null-fill with the unified type, and
same-named columns with different types promote (int widths → widest,
int+float → float64, string widths → large). Each input needs one
stateless ``map_batches`` pad/cast pass — zero shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


def _promote(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    if a.equals(b):
        return a
    ints = {pa.int8(), pa.int16(), pa.int32(), pa.int64()}
    floats = {pa.float32(), pa.float64()}
    if a in ints and b in ints:
        return a if a.bit_width >= b.bit_width else b
    if (a in ints or a in floats) and (b in ints or b in floats):
        return pa.float64()
    strings = {pa.string(), pa.large_string()}
    if a in strings and b in strings:
        return pa.large_string()
    if pa.types.is_null(a):
        return b
    if pa.types.is_null(b):
        return a
    raise TypeError(f"cannot unify column types {a} and {b}")


def unified_schema(schemas: list[pa.Schema]) -> pa.Schema:
    """Column-name union in first-seen order with type promotion."""
    order: list[str] = []
    types: dict[str, pa.DataType] = {}
    for s in schemas:
        for f in s:
            if f.name not in types:
                order.append(f.name)
                types[f.name] = f.type
            else:
                types[f.name] = _promote(types[f.name], f.type)
    return pa.schema([(n, types[n]) for n in order])


def union_by_name(datasets: list[ray.data.Dataset]) -> ray.data.Dataset:
    """UNION ALL BY NAME over Ray Datasets with drifted schemas."""
    schemas = []
    for ds in datasets:
        s = ds.schema()
        schemas.append(pa.schema(list(zip(s.names, s.types))))
    target = unified_schema(schemas)

    def conform(t: pa.Table) -> pa.Table:
        cols = []
        for f in target:
            if f.name in t.column_names:
                c = t[f.name]
                if isinstance(c, pa.ChunkedArray):
                    c = c.combine_chunks()
                cols.append(c.cast(f.type) if not c.type.equals(f.type) else c)
            else:
                cols.append(pa.nulls(len(t), type=f.type))
        return pa.Table.from_arrays(cols, schema=target)

    conformed = [
        ds.map_batches(conform, batch_format="pyarrow") for ds in datasets
    ]
    out = conformed[0]
    for ds in conformed[1:]:
        out = out.union(ds)
    return out
