"""Bounded-group-count groupby: shard keys by hash, vectorize per shard.

``Dataset.groupby(k).map_groups(fn)`` invokes ``fn`` once per DISTINCT
KEY — a Python call plus a DataFrame construction per group. With
high-cardinality keys that per-group overhead dominates (measured at
sf0.1: ~30k LSH buckets → 3.3 s of pure dispatch for 80k rows; ~20k
conversation keys → seconds in the flagship derivation). Sharding fixes
the shape without changing semantics: hash the key columns into
``shards`` uniform buckets, group by the bucket — complete key groups
still co-locate, the shuffle moves the same rows — and run a VECTORIZED
per-shard function once per shard (pandas groupby/merge inside, C
speed). Group count is now ``shards`` (a cluster-width knob), not key
cardinality; skew is impossible because the shard key is a hash.

The per-shard function receives complete groups for MANY keys at once
and must itself respect key boundaries (e.g. a pandas groupby inside).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_FNV = np.uint64(0x100000001B3)
_SCRAMBLE = np.uint64(11400714819323198485)  # Fibonacci hashing constant
# pd.util.hash_array key (16 bytes) — fixes the string-hash family so
# shard assignment is deterministic across processes and runs.
_HASH_KEY = "otelray-shardkey"


def hash_columns(t: pa.Table, keys: list[str]) -> np.ndarray:
    """Combined uint64 hash of the key columns, vectorized."""
    h = np.zeros(len(t), dtype=np.uint64)
    for k in keys:
        vals = t[k].to_numpy(zero_copy_only=False)
        if vals.dtype.kind in "iu":
            hk = vals.astype(np.uint64) * _SCRAMBLE
        else:
            hk = pd.util.hash_array(
                np.asarray(vals, dtype=object), hash_key=_HASH_KEY
            )
        h = h * _FNV ^ hk
    return h


def shard_column(
    t: pa.Table, keys: list[str], shards: int, out: str = "_shard"
) -> pa.Table:
    s = (hash_columns(t, keys) % np.uint64(shards)).astype(np.int64)
    return t.append_column(out, pa.array(s))


def coalesce_for_shuffle(
    ds: ray.data.Dataset,
    *,
    cpus: int | None = None,
    block_bytes: int = 128 << 20,
) -> ray.data.Dataset:
    """Right-size block count before a shuffle: ``max(cluster CPUs,
    size/128MB)``. The default parquet read splits small files into
    dozens of tiny blocks and the sort-based shuffle becomes
    dispatch-bound (measured: 64 blocks → 6.5 s vs 16 blocks → 2.7 s
    for the same sf0.1 dedup pipeline); large inputs keep
    ~``block_bytes`` blocks so parallelism tracks data size, never file
    count."""
    import ray as _ray

    if cpus is None:
        cpus = int(_ray.cluster_resources().get("CPU", 16))
    try:
        nbytes = ds.size_bytes() or 0
    except Exception:
        nbytes = 0
    n = max(16, cpus, -(-nbytes // block_bytes))
    return ds.repartition(n)


def auto_shards(
    size_bytes: int,
    cpus: int | None = None,
    *,
    target_shard_bytes: int = 256 << 20,
) -> int:
    """Shard count that scales with BOTH cluster width and input size:
    ``max(2×CPUs, size/target_shard_bytes)``. ``map_groups`` materializes
    a whole shard as ONE pandas DataFrame, so a fixed count (the old
    ``shards=64`` default) means a 100 TB input puts ~1.6 TB on one
    reducer and caps the stage at 64-way parallelism regardless of
    cluster width. 2×CPUs keeps every core busy through stragglers;
    the bytes term bounds per-reducer memory as data grows."""
    import ray as _ray

    if cpus is None:
        try:
            cpus = int(_ray.cluster_resources().get("CPU", 16))
        except Exception:
            cpus = 16
    return int(max(2 * cpus, -(-int(size_bytes or 0) // target_shard_bytes)))


def cheap_size_bytes(ds: ray.data.Dataset) -> int:
    """``ds.size_bytes()`` ONLY when it is free — the plan has already
    computed its output (materialized) — else 0. On a lazy transformed
    dataset ``size_bytes()`` EXECUTES the whole plan, which would run
    every upstream stage twice (measured: dup_spans 3.9 s → 25.8 s when
    the auto-shard default probed a lazy explode). Callers that know
    their input size pass ``size_hint_bytes`` instead."""
    try:
        if ds._plan.has_computed_output():  # metadata already in hand
            return int(ds.size_bytes() or 0)
    except Exception:
        pass
    return 0


def sharded_group_map(
    ds: ray.data.Dataset,
    keys: list[str],
    shard_fn: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    shards: int | None = None,
    size_hint_bytes: int | None = None,
) -> ray.data.Dataset:
    """``groupby(keys).map_groups(fn)`` with group count bounded by
    ``shards``. One shuffle (on the hash shard), one vectorized
    ``shard_fn`` call per shard. ``shards=None`` (the default)
    auto-scales via ``auto_shards``: 2×cluster CPUs, raised by the
    bytes term when the input size is known — from ``size_hint_bytes``
    or, for already-materialized inputs, the plan's own metadata. The
    size is NEVER probed from a lazy plan (that would execute it)."""
    if shards is None:
        nbytes = (
            size_hint_bytes
            if size_hint_bytes is not None
            else cheap_size_bytes(ds)
        )
        shards = auto_shards(nbytes)
    tagged = ds.map_batches(
        lambda t: shard_column(t, keys, shards), batch_format="pyarrow"
    )

    def run_shard(g: pd.DataFrame):
        out = shard_fn(g.drop(columns=["_shard"]))
        # emit ARROW blocks: a downstream groupby/aggregate over
        # pandas-format blocks is ~8× slower in Ray's sort shuffle
        # (measured 16 s vs 2 s on identical 162k-row partials)
        if isinstance(out, pd.DataFrame):
            return pa.Table.from_pandas(out, preserve_index=False)
        return out

    return tagged.groupby("_shard").map_groups(
        run_shard, batch_format="pandas"
    )


def mult_hash(ids: "np.ndarray") -> "np.ndarray":
    """Seed-free Knuth multiplicative hash of integer ids:
    ``(id * 2654435761) % 2³²`` — exact in int64 while id < 3.5e9, and
    expressible verbatim in SQL so oracles stay bit-identical. The ONE
    shared definition used by `stratified_take`, `budget_select` and
    `kmeans_fit` init (any change must update their oracle SQL too)."""
    return (ids.astype(np.int64) * 2654435761) % (1 << 32)


# Ray Data's sort-based groupby cannot ORDER a string key column that
# mixes None with str (numpy object sort raises "'<' not supported");
# pandas groupby additionally DROPS NaN groups by default. SQL keeps a
# NULL group. Stages whose group key can be null route it through this
# sentinel around the shuffle and restore it on the way out. The value
# contains control bytes, so no real-world key collides — but must NOT
# end in NUL: numpy's fixed-width unicode strips trailing \x00 when a
# stage round-trips strings through a U-dtype array.
NULL_KEY = "\x00\x16<null-key>\x16"


def fill_null_key(t: pa.Table, key: str) -> pa.Table:
    """Arrow batch form: replace nulls in a string key column with the
    sentinel (no-op for null-free or non-string columns)."""
    col = t[key]
    import pyarrow.compute as pc

    if col.null_count and pa.types.is_string(col.type):
        idx = t.column_names.index(key)
        t = t.set_column(idx, key, pc.fill_null(col, NULL_KEY))
    return t


def restore_null_key(t: pa.Table, key: str) -> pa.Table:
    """Inverse of :func:`fill_null_key` (arrow batch form)."""
    import pyarrow.compute as pc

    col = t[key]
    if not pa.types.is_string(col.type):
        return t
    idx = t.column_names.index(key)
    masked = pc.if_else(
        pc.equal(col, NULL_KEY), pa.scalar(None, pa.string()), col
    )
    return t.set_column(idx, key, masked)


def cheap_row_count(ds: "ray.data.Dataset") -> int | None:
    """Row count from plan METADATA only (None when unknown) — on a
    lazy transformed dataset ``ds.count()`` executes the whole lineage
    once more (the same double-execution trap as ``cheap_size_bytes``).
    Callers needing only an order-of-magnitude knob should treat None
    as "pass the knob explicitly"."""
    try:
        n = ds._meta_count()
        return int(n) if n is not None else None
    except Exception:
        return None
