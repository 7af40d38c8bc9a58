"""Dataset profiling — the audit pass a 100 TB corpus runs first.

One streaming pass computes per-column row/null counts and native
min/max (mergeable partials: one tiny row per block), and ONE extra
sharded shuffle computes exact distinct counts for ALL columns at once
(columns tagged into the same (column, value) pair stream — per-batch
dedup first, so the exchange ships distinct pairs per block, not rows).
Output is a long table: (column, n, n_null, n_distinct, min_s, max_s)
with min/max cast to string at the very end (native comparisons, SQL
``cast(min(c) AS varchar)`` semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .shard import sharded_group_map


def profile_dataset(
    ds: ray.data.Dataset, columns: list[str]
) -> pd.DataFrame:
    cols = list(columns)

    def partial(t: pa.Table) -> pa.Table:
        out: dict = {}
        for c in cols:
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            out[f"n_{c}"] = [len(col)]
            out[f"z_{c}"] = [col.null_count]
            valid = col.drop_null()
            if len(valid):
                mm = pc.min_max(valid)
                out[f"lo_{c}"] = [mm["min"].as_py()]
                out[f"hi_{c}"] = [mm["max"].as_py()]
            else:
                out[f"lo_{c}"] = [None]
                out[f"hi_{c}"] = [None]
        return pa.table(out)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()

    def pairs(t: pa.Table) -> pa.Table:
        frames = []
        for c in cols:
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            vals = pc.cast(col.drop_null(), pa.string())
            u = pc.unique(vals)
            frames.append(
                pa.table(
                    {
                        "column": pa.array([c] * len(u), pa.string()),
                        "val": u,
                    }
                )
            )
        return pa.concat_tables(frames)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["column", "val"])
        out = d.groupby("column", sort=False).size().rename("_nd").reset_index()
        out["_nd"] = out["_nd"].astype(np.int64)
        return out

    nd = (
        sharded_group_map(
            ds.map_batches(pairs, batch_format="pyarrow"),
            ["column", "val"],
            per_shard,
        )
        .to_pandas()
        .groupby("column")["_nd"]
        .sum()
    )

    rows = []
    for c in cols:
        lo = parts[f"lo_{c}"].dropna()
        hi = parts[f"hi_{c}"].dropna()
        rows.append(
            {
                "column": c,
                "n": np.int64(parts[f"n_{c}"].sum()),
                "n_null": np.int64(parts[f"z_{c}"].sum()),
                "n_distinct": np.int64(nd.get(c, 0)),
                "min_s": str(lo.min()) if len(lo) else None,
                "max_s": str(hi.max()) if len(hi) else None,
            }
        )
    return pd.DataFrame(rows)
