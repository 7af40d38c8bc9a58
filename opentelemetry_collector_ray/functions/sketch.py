"""Mergeable sketches — HyperLogLog distinct counting.

The combiner pattern for non-decomposable aggregates (guide: "emit one
serialized sketch per batch and merge them — sketches are designed to
be mergeable"). One (group, registers) row per group per batch; merge =
elementwise max — commutative, associative, any shuffle or driver-side
combine works. Standard HLL with the usual small-range correction
(linear counting) — public-algorithm implementation (Flajolet et al.),
numpy-vectorized.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


class HLL:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.alpha = 0.7213 / (1 + 1.079 / self.m)

    def registers(self, hashes: np.ndarray) -> np.ndarray:
        """(N,) uint64 hashes → (m,) uint8 register maxima."""
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = hashes << np.uint64(self.p)
        # rank = leading zeros of the remaining 64-p bits, +1
        lz = np.full(len(hashes), 64 - self.p, dtype=np.uint8)
        nonzero = rest != 0
        # np.log2 on uint64 loses precision at the top bit; use bit length
        bl = np.zeros(len(hashes), dtype=np.uint8)
        r = rest[nonzero]
        bl_nz = np.frompyfunc(int.bit_length, 1, 1)(r.astype(object)).astype(np.uint8)
        bl[nonzero] = bl_nz
        lz[nonzero] = 64 - bl[nonzero]
        rank = np.minimum(lz + 1, 64 - self.p + 1).astype(np.uint8)
        regs = np.zeros(self.m, dtype=np.uint8)
        np.maximum.at(regs, idx, rank)
        return regs

    def estimate(self, regs: np.ndarray) -> float:
        est = self.alpha * self.m * self.m / np.sum(2.0 ** -regs.astype(np.float64))
        zeros = int((regs == 0).sum())
        if est <= 2.5 * self.m and zeros:
            est = self.m * np.log(self.m / zeros)  # linear counting
        return float(est)


def _hash64(values: np.ndarray) -> np.ndarray:
    """Deterministic, well-mixed 64-bit hashes: crc32 pair + a
    splitmix64 finalizer (crc of sequential keys is linear → biased
    high bits → HLL register indices skew without the mix)."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        b = str(v).encode()
        out[i] = (zlib.crc32(b) << 32) | zlib.crc32(b[::-1])
    with np.errstate(over="ignore"):
        z = out + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def _mg_reduce(items: np.ndarray, counts: np.ndarray, k: int):
    """Misra-Gries reduction: keep ≤ k counters by subtracting the
    (k+1)-th largest count from all (the mergeable-summaries rule,
    Agarwal et al. 2012) — vectorized, deterministic."""
    if len(items) <= k:
        return items, counts, 0
    order = np.argsort(-counts, kind="stable")
    err = int(counts[order[k]])
    kept = counts - err > 0
    return items[kept], counts[kept] - err, err


def heavy_hitters(
    ds: ray.data.Dataset, *, value: str, k: int = 256, top: int = 20
) -> pd.DataFrame:
    """Approximate top frequent items via mergeable Misra-Gries
    summaries: each batch emits an exact value_counts reduced to ≤ k
    counters; the driver merges the tiny partials (≤ k rows per block)
    and reduces again. Guarantee: estimated count underestimates the
    true count by at most n/k total decrement (returned as ``max_err``),
    so every item with true frequency > n/k survives. Deterministic —
    no RNG, stable tie-breaks. Output: top ``top`` rows of
    (item, est_count, max_err) ordered by (est desc, item asc)."""

    def partial(t: pa.Table) -> pa.Table:
        vc = t[value].to_pandas().value_counts()
        items, counts, err = _mg_reduce(
            vc.index.to_numpy(), vc.to_numpy().astype(np.int64), k
        )
        # the per-block decrement rides along as a flagged sentinel row
        # so the merged bound is an exact sum, not a lossy per-row
        # constant (flag column, not a magic item key — pyarrow cuts
        # numpy U-strings at NUL so reserved keys are fragile)
        return pa.table(
            {
                "item": pa.array(
                    np.concatenate([items.astype(str), [""]]).astype(object)
                ),
                "c": pa.array(
                    np.concatenate([counts, [err]]).astype(np.int64),
                    type=pa.int64(),
                ),
                "s": pa.array(
                    np.r_[np.zeros(len(items), dtype=np.int8), [1]],
                    type=pa.int8(),
                ),
            }
        )

    pdf = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(pdf):
        return pd.DataFrame(
            {
                "item": pd.Series(dtype=object),
                "est_count": pd.Series(dtype="int64"),
                "max_err": pd.Series(dtype="int64"),
            }
        )
    block_err = int(pdf.loc[pdf["s"] == 1, "c"].sum())
    pdf = pdf[pdf["s"] == 0]
    merged = pdf.groupby("item", sort=False)["c"].sum()
    items, counts, err2 = _mg_reduce(
        merged.index.to_numpy(), merged.to_numpy().astype(np.int64), k
    )
    max_err = block_err + err2
    out = (
        pd.DataFrame(
            {
                "item": items.astype(str),
                "est_count": counts,
                "max_err": np.full(len(items), max_err, dtype=np.int64),
            }
        )
        .sort_values(
            ["est_count", "item"], ascending=[False, True], kind="mergesort"
        )
        .head(top)
        .reset_index(drop=True)
    )
    return out


def approx_distinct(
    ds: ray.data.Dataset, *, group: str, value: str, p: int = 12
) -> pd.DataFrame:
    """Approximate count(DISTINCT value) per group via per-batch HLL
    partials merged on the driver (elementwise max). Output:
    (group, approx_n:int64). Error ~1.04/sqrt(2^p) ≈ 1.6% at p=12."""
    hll = HLL(p)

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        groups, blobs = [], []
        for gval, g in df.groupby(group):
            regs = hll.registers(_hash64(g[value].to_numpy()))
            groups.append(gval)
            blobs.append(regs.tobytes())
        return pa.table({group: groups, "_regs": pa.array(blobs, type=pa.binary())})

    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out_g, out_n = [], []
    for gval, g in partials.groupby(group):
        merged = np.zeros(hll.m, dtype=np.uint8)
        for blob in g["_regs"]:
            merged = np.maximum(merged, np.frombuffer(blob, dtype=np.uint8))
        out_g.append(gval)
        out_n.append(int(round(hll.estimate(merged))))
    return (
        pd.DataFrame({group: out_g, "approx_n": np.array(out_n, dtype=np.int64)})
        .sort_values(group, kind="mergesort")
        .reset_index(drop=True)
    )


# ------------------------------------------------------------- Bloom

_BLOOM_HASH_KEYS = ("otelray-bloom-h1", "otelray-bloom-h2")


def _bloom_positions(values: np.ndarray, m_bits: int, hashes: int):
    """(N, hashes) bit positions via double hashing — two fixed-key
    pd.util.hash_array passes derive all k probes (Kirsch-Mitzenmacher),
    deterministic across processes."""
    vals = np.asarray(values, dtype=object)
    h1 = pd.util.hash_array(vals, hash_key=_BLOOM_HASH_KEYS[0])
    h2 = pd.util.hash_array(vals, hash_key=_BLOOM_HASH_KEYS[1]) | np.uint64(1)
    i = np.arange(hashes, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(
            np.int64
        )


def build_bloom(
    ds: ray.data.Dataset, *, value: str, m_bits: int = 1 << 20, hashes: int = 4
) -> np.ndarray:
    """Distributed Bloom-filter build: each block sets its members' bits
    in a local bitmap and emits ONE packed row (m/8 bytes); the driver
    ORs the per-block bitmaps — bitwise OR is the mergeable-sketch
    combine, so any merge order/topology works. Size ``m_bits`` ≈
    10 bits/key for ~1% false positives at cluster scale (the knob
    scales with corpus-A cardinality, not corpus-B size)."""

    def partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        vals = t[value].to_numpy(zero_copy_only=False)
        if len(vals):
            pos = _bloom_positions(vals, m_bits, hashes).ravel()
            np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pa.table({"_bloom": pa.array([bits.tobytes()], type=pa.binary())})

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).to_pandas()
    merged = np.zeros(m_bits // 8, dtype=np.uint8)
    for blob in parts["_bloom"]:
        merged |= np.frombuffer(blob, dtype=np.uint8)
    return merged


def bloom_filter_new(
    ds: ray.data.Dataset,
    bloom_ref,
    *,
    value: str,
    m_bits: int = 1 << 20,
    hashes: int = 4,
) -> ray.data.Dataset:
    """Incremental-ingestion dedup: flag each incoming row as
    ``maybe_dup`` (all probe bits set — definite dups always flagged, no
    false negatives) or definitely-new. The filter is broadcast ONCE
    (``ray.put`` the packed bitmap, resolved per task), never re-shipped
    per batch; the stream never shuffles."""
    import ray as _ray

    def flag(t: pa.Table) -> pa.Table:
        bits = bloom_ref
        if isinstance(bits, _ray.ObjectRef):
            bits = _ray.get(bits)
        vals = t[value].to_numpy(zero_copy_only=False)
        if not len(vals):
            return t.append_column(
                "maybe_dup", pa.array([], type=pa.int64())
            )
        pos = _bloom_positions(vals, m_bits, hashes)
        member = (
            (bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
        ).all(axis=1)
        return t.append_column(
            "maybe_dup", pa.array(member.astype(np.int64), type=pa.int64())
        )

    return ds.map_batches(flag, batch_format="pyarrow")


# -------------------------------------------------------- Count-Min

_CM_KEY_PREFIX = "otelray-cmrow"


def build_countmin(
    ds: ray.data.Dataset, *, value: str, width: int = 1 << 14, depth: int = 4
) -> np.ndarray:
    """Distributed Count-Min sketch build (Cormode & Muthukrishnan
    2005): each block counts its rows into a local (depth × width)
    table via ``depth`` independent fixed-key hash rows and emits ONE
    packed row; the combine is elementwise SUM — commutative and
    associative, so any merge order works (here: tiny driver reduce
    over one row per block). Point query = min over rows; estimates
    never undercount, and overcount ≤ e·n/width with prob 1−e^−depth.
    Deterministic: fixed hash keys, no RNG."""

    def partial(t: pa.Table) -> pa.Table:
        cm = np.zeros((depth, width), dtype=np.int64)
        vals = t[value].to_numpy(zero_copy_only=False)
        if len(vals):
            obj = np.asarray(vals, dtype=object)
            for d in range(depth):
                h = pd.util.hash_array(obj, hash_key=f"{_CM_KEY_PREFIX}-{d:02d}")
                np.add.at(cm[d], (h % np.uint64(width)).astype(np.int64), 1)
        return pa.table({"_cm": pa.array([cm.tobytes()], type=pa.binary())})

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).to_pandas()
    merged = np.zeros((depth, width), dtype=np.int64)
    for blob in parts["_cm"]:
        merged += np.frombuffer(blob, dtype=np.int64).reshape(depth, width)
    return merged


def countmin_query(cm: np.ndarray, items) -> pd.DataFrame:
    """Point-query a Count-Min table for ``items``: (item, est_count),
    est = min over hash rows. Vectorized over the probe set."""
    depth, width = cm.shape
    obj = np.asarray(list(items), dtype=object)
    est = np.full(len(obj), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        h = pd.util.hash_array(obj, hash_key=f"{_CM_KEY_PREFIX}-{d:02d}")
        est = np.minimum(est, cm[d, (h % np.uint64(width)).astype(np.int64)])
    return pd.DataFrame({"item": [str(x) for x in obj], "est_count": est})


# --------------------------------------------------------- t-digest


def _td_k(q: np.ndarray | float, delta: float):
    """k1 scale function (Dunning & Ertl): k(q) = δ/2π · asin(2q−1).
    Steep near q∈{0,1} → small centroids in the tails, so extreme
    quantiles stay accurate after any merge order."""
    return delta / (2.0 * np.pi) * np.arcsin(2.0 * np.asarray(q) - 1.0)


def _td_block_centroids(v: np.ndarray, delta: float):
    """Sorted values → k1-scale (mean, weight) clusters in ONE
    vectorized pass: cluster boundaries sit at unit steps of k(q), i.e.
    q_j = (sin(2π·k_j/δ)+1)/2 for k_j = −δ/4 … δ/4 — tiny clusters in
    the tails (where k is steep), big ones mid-range, so extreme
    quantiles keep single-value resolution even before the merge.
    reduceat segment sums; no Python loop over values."""
    n = len(v)
    j = np.arange(int(np.floor(delta / 2.0)) + 1, dtype=np.float64)
    k = np.minimum(-delta / 4.0 + j, delta / 4.0)
    q = (np.sin(2.0 * np.pi * k / delta) + 1.0) / 2.0
    edges = np.unique(np.round(q * n).astype(np.int64))
    edges = np.unique(np.r_[0, edges[(edges > 0) & (edges < n)], n])
    starts, ends = edges[:-1], edges[1:]
    sums = np.add.reduceat(v, starts)
    w = (ends - starts).astype(np.float64)
    return sums / w, w


def _td_merge(means: np.ndarray, weights: np.ndarray, delta: float):
    """One merging pass (the 'merging digest' algorithm): sort by mean,
    greedily coalesce neighbours while k(q_right) − k(q_left) ≤ 1.
    O(#input centroids) — runs on the tiny per-block partials, never on
    raw data."""
    order = np.argsort(means, kind="mergesort")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    w_before = 0.0  # weight fully emitted so far
    cur_s, cur_w = means[0] * weights[0], float(weights[0])
    for i in range(1, len(means)):
        q0 = w_before / total
        q2 = (w_before + cur_w + weights[i]) / total
        if _td_k(q2, delta) - _td_k(q0, delta) <= 1.0:
            cur_s += means[i] * weights[i]
            cur_w += float(weights[i])
        else:
            out_m.append(cur_s / cur_w)
            out_w.append(cur_w)
            w_before += cur_w
            cur_s, cur_w = means[i] * weights[i], float(weights[i])
    out_m.append(cur_s / cur_w)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def build_tdigest(
    ds: ray.data.Dataset, *, value: str, delta: float = 200.0
) -> tuple[np.ndarray, np.ndarray]:
    """Distributed t-digest (Dunning & Ertl, 'Computing extremely
    accurate quantiles using t-digests'): each block sorts its values
    and emits ≤ 2δ equal-weight pre-clusters as ONE packed row (the
    mergeable-summary shape — same contract as the HLL/Bloom/CM
    builders); the driver concatenates the tiny partials and runs one
    k1-scale merging pass. The UNBOUNDED-continuous-value quantile tier
    that `window2.discrete_quantiles` documents as out of scope for its
    exact-histogram shape."""

    def partial(t: pa.Table) -> pa.Table:
        v = np.sort(
            t.filter(pc.is_valid(t[value]))[value]
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        if not len(v):
            return pa.table({"_m": pa.array([], type=pa.binary()),
                             "_w": pa.array([], type=pa.binary())})
        m, w = _td_block_centroids(v, 2.0 * delta)
        return pa.table(
            {
                "_m": pa.array([m.tobytes()], type=pa.binary()),
                "_w": pa.array([w.tobytes()], type=pa.binary()),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).to_pandas()
    means = np.concatenate(
        [np.frombuffer(b, dtype=np.float64) for b in parts["_m"]]
        or [np.empty(0)]
    )
    weights = np.concatenate(
        [np.frombuffer(b, dtype=np.float64) for b in parts["_w"]]
        or [np.empty(0)]
    )
    if not len(means):
        return np.empty(0), np.empty(0)
    return _td_merge(means, weights, delta)


def tdigest_quantile(
    means: np.ndarray, weights: np.ndarray, qs
) -> np.ndarray:
    """Quantile estimates from a merged digest: linear interpolation
    between centroid means at cumulative mid-weights (the standard
    t-digest inverse-CDF read-out)."""
    cum = np.cumsum(weights) - weights / 2.0
    total = weights.sum()
    return np.interp(np.asarray(qs, dtype=np.float64) * total, cum, means)


def grouped_tdigest_quantiles(
    ds: ray.data.Dataset,
    *,
    group: str,
    value: str,
    qs=(0.5, 0.9, 0.99),
    delta: float = 200.0,
) -> pd.DataFrame:
    """Per-GROUP approximate quantiles at unbounded value cardinality —
    the grouped tier of `build_tdigest`, completing the quantile story:
    `window2.discrete_quantiles` is the exact tier for bounded-distinct
    values; this is the sketch tier for continuous ones.

    Per batch, each group present emits its ≤2δ-centroid pre-cluster
    row; partials collapse through ONE uniform groupby on the group key
    (O(groups·blocks) tiny rows, never raw values) and each group's
    digest merges independently inside `map_groups`. Output:
    (group, q, value_est)."""
    qs_arr = np.asarray(qs, dtype=np.float64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        v_all = df[value].to_numpy()
        for gval, idx in df.groupby(group, sort=False).indices.items():
            v = np.sort(v_all[idx].astype(np.float64))
            v = v[~np.isnan(v)]
            if not len(v):
                continue
            m, w = _td_block_centroids(v, 2.0 * delta)
            rows.append((gval, m.tobytes(), w.tobytes()))
        return pd.DataFrame(rows, columns=[group, "_m", "_w"])

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        means = np.concatenate(
            [np.frombuffer(b, dtype=np.float64) for b in g["_m"]]
        )
        weights = np.concatenate(
            [np.frombuffer(b, dtype=np.float64) for b in g["_w"]]
        )
        m, w = _td_merge(means, weights, delta)
        est = tdigest_quantile(m, w, qs_arr)
        return pd.DataFrame(
            {group: g[group].iloc[0], "q": qs_arr, "value_est": est}
        )

    partials = ds.map_batches(partial, batch_format="pandas")
    out = (
        partials.groupby(group)
        .map_groups(merge_group, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values([group, "q"], kind="mergesort").reset_index(
        drop=True
    )


def kmv_sketch(
    ds: ray.data.Dataset, *, value: str, k: int = 256
) -> np.ndarray:
    """Bottom-k (KMV) sketch of a column's DISTINCT values (Beyer et
    al., 'On synopses for distinct value estimation'): the k smallest
    64-bit value hashes. Mergeable: each block emits its own bottom-k
    (one packed row), the driver keeps the k smallest of the union —
    same contract as the HLL/Bloom/CM builders. Supports distinct-count
    estimation ((k−1)/h₍ₖ₎ on the unit interval) and, across two
    sketches, Jaccard estimation (`kmv_jaccard`)."""

    def partial(t: pa.Table) -> pa.Table:
        vals = t[value].to_numpy(zero_copy_only=False)
        # vectorized 64-bit hash (pandas siphash with a FIXED key —
        # deterministic across processes, no per-row Python loop; the
        # sketch has no SQL oracle to mirror, so any stable hash works)
        h = pd.util.hash_array(vals, hash_key="otelray-kmv-0001")
        h = np.unique(h.astype(np.uint64))[:k]
        return pa.table({"_kmv": pa.array([h.tobytes()], type=pa.binary())})

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).to_pandas()
    merged = np.unique(
        np.concatenate(
            [np.frombuffer(b, dtype=np.uint64) for b in parts["_kmv"]]
            or [np.empty(0, dtype=np.uint64)]
        )
    )
    return merged[:k]


def kmv_distinct(sketch: np.ndarray, k: int) -> int:
    """Distinct-count estimate from a bottom-k sketch: if fewer than k
    hashes exist the count is exact; else (k−1)/u₍ₖ₎ with u the k-th
    smallest hash mapped to (0,1]."""
    if len(sketch) < k:
        return int(len(sketch))
    u_k = float(sketch[k - 1]) / float(2**64)
    return int(round((k - 1) / u_k))


def kmv_jaccard(sa: np.ndarray, sb: np.ndarray, k: int) -> float:
    """Jaccard estimate between two value sets from their bottom-k
    sketches: among the k smallest hashes of the UNION, the fraction
    present in both sketches (an unbiased estimator; error
    ~1/sqrt(k))."""
    union = np.unique(np.concatenate([sa, sb]))[:k]
    in_a = np.isin(union, sa)
    in_b = np.isin(union, sb)
    denom = max(len(union), 1)
    return float((in_a & in_b).sum()) / denom


# ------------------------------- SQL-mirrorable affine-hash tier
#
# The production sketches above hash with pandas' keyed siphash —
# fast, well-mixed, but opaque to SQL. This tier swaps the hash for an
# affine map over the Mersenne prime p = 2^31-1:
#
#     h_d(x) = ((a_d * (x mod p) + b_d) mod p) mod m
#
# which DuckDB evaluates EXACTLY in integer arithmetic, so the whole
# approximate answer — collisions, over-counts, false positives and
# all — gets a full hash-matching oracle (same promotion pattern as
# fingerprint_exact's Horner mirror). The (a_d, b_d) constants are
# mirrored verbatim in oracle SQL; never change one side alone.
# Integer-key only (the mirror needs the key representable in SQL);
# keys must be non-negative (numpy and SQL disagree on negative mod).

_AFFINE_P = 2147483647
_AFFINE_PARAMS = (
    (1000003, 12345),
    (999983, 54321),
    (1000033, 98765),
    (1000037, 13579),
)


_AFFINE_G = (1103515245, 12345)  # MINSTD-style scramble step


def affine_buckets(keys: np.ndarray, d: int, m: int) -> np.ndarray:
    """Bucket index per key for hash row ``d``. Two congruential
    levels: g(x) = (G_a·(x mod p) + G_b) mod p scrambles first — on a
    small consecutive-integer key domain a SINGLE affine level is
    injective mod m (collisions would be row-independent: zero Bloom
    false positives, degenerate Count-Min minima), but g wraps mod p
    many times even for x < 2¹⁶, so the per-row map is genuinely
    mixing. Exact int64 math throughout: G_a < 2³¹ and a_d < 2²⁰ keep
    every product under 2⁶² — DuckDB's BIGINT reproduces each step."""
    return affine_hash(keys, d) % np.int64(m)


def affine_hash(keys: np.ndarray, d: int) -> np.ndarray:
    """Full 31-bit hash for row ``d`` (before the bucket modulus) —
    the HLL register tier splits it into index and rho bits."""
    a, b = _AFFINE_PARAMS[d]
    p = np.int64(_AFFINE_P)
    k = np.asarray(keys, dtype=np.int64) % p
    g = (np.int64(_AFFINE_G[0]) * k + np.int64(_AFFINE_G[1])) % p
    return (np.int64(a) * g + np.int64(b)) % p


def build_countmin_affine(
    ds: ray.data.Dataset, *, value: str, width: int = 64, depth: int = 3
) -> np.ndarray:
    """Count-Min build identical in structure to ``build_countmin``
    (per-block depth×width partials, elementwise-sum merge) but with
    the SQL-mirrorable affine hash over an integer key column. Null
    and negative keys are skipped — the oracle filters the same rows."""
    if depth > len(_AFFINE_PARAMS):
        raise ValueError(f"depth > {len(_AFFINE_PARAMS)} affine rows available")

    def partial(t: pa.Table) -> pa.Table:
        cm = np.zeros((depth, width), dtype=np.int64)
        vals = t[value].to_numpy(zero_copy_only=False)
        vals = vals[pd.notna(vals)].astype(np.int64)
        vals = vals[vals >= 0]
        for d in range(depth):
            np.add.at(cm[d], affine_buckets(vals, d, width), 1)
        return pa.table({"_cm": pa.array([cm.tobytes()], type=pa.binary())})

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).to_pandas()
    merged = np.zeros((depth, width), dtype=np.int64)
    for blob in parts["_cm"]:
        merged += np.frombuffer(blob, dtype=np.int64).reshape(depth, width)
    return merged


def countmin_query_affine(cm: np.ndarray, items: np.ndarray) -> pd.DataFrame:
    """Point-query the affine Count-Min: (item, est_count), est = min
    over hash rows — exactly the oracle's min(COALESCE(bucket_sum, 0))."""
    depth, width = cm.shape
    items = np.asarray(items, dtype=np.int64)
    est = np.full(len(items), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        est = np.minimum(est, cm[d, affine_buckets(items, d, width)])
    return pd.DataFrame({"item": items, "est_count": est})


def build_bloom_affine(
    ds: ray.data.Dataset, *, value: str, m_bits: int = 512, hashes: int = 3
) -> np.ndarray:
    """Bloom build (per-block bitmaps, OR merge — same mergeable shape
    as ``build_bloom``) with affine bit positions so membership —
    including every false positive — is reproducible in SQL."""
    if hashes > len(_AFFINE_PARAMS):
        raise ValueError(f"hashes > {len(_AFFINE_PARAMS)} affine rows available")

    def partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        vals = t[value].to_numpy(zero_copy_only=False)
        vals = vals[pd.notna(vals)].astype(np.int64)
        vals = vals[vals >= 0]
        if len(vals):
            pos = np.concatenate(
                [affine_buckets(vals, d, m_bits) for d in range(hashes)]
            )
            np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pa.table({"_bloom": pa.array([bits.tobytes()], type=pa.binary())})

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).to_pandas()
    merged = np.zeros(m_bits // 8, dtype=np.uint8)
    for blob in parts["_bloom"]:
        merged |= np.frombuffer(blob, dtype=np.uint8)
    return merged


def bloom_contains_affine(
    bits: np.ndarray, items: np.ndarray, *, m_bits: int, hashes: int
) -> np.ndarray:
    """Membership probe: True iff every affine position's bit is set
    (the usual no-false-negative / some-false-positive contract)."""
    items = np.asarray(items, dtype=np.int64)
    ok = np.ones(len(items), dtype=bool)
    for d in range(hashes):
        pos = affine_buckets(items, d, m_bits)
        ok &= (bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
    return ok


def build_hll_affine(
    ds: ray.data.Dataset, *, value: str, p_bits: int = 6
) -> np.ndarray:
    """HLL registers with the SQL-mirrorable hash: index = low p_bits
    of the 31-bit affine hash, rho = trailing-zero count of the
    remaining bits + 1 (all-zero remainder → full width + 1) —
    trailing instead of the classic leading zeros, same geometric
    distribution, and expressible as bit_count((sub & -sub) - 1) + 1
    in DuckDB. Mergeable exactly like the production HLL: per-block
    register maxima, elementwise max combine."""
    m = 1 << p_bits
    sub_bits = 31 - p_bits

    def partial(t: pa.Table) -> pa.Table:
        regs = np.zeros(m, dtype=np.int64)
        vals = t[value].to_numpy(zero_copy_only=False)
        vals = vals[pd.notna(vals)].astype(np.int64)
        vals = vals[vals >= 0]
        if len(vals):
            h = affine_hash(vals, 0)
            idx = h % np.int64(m)
            sub = h >> np.int64(p_bits)
            rho = np.where(
                sub == 0,
                sub_bits + 1,
                _popcount64((sub & -sub) - 1) + 1,
            )
            np.maximum.at(regs, idx, rho)
        return pa.table({"_hll": pa.array([regs.tobytes()], type=pa.binary())})

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).to_pandas()
    merged = np.zeros(m, dtype=np.int64)
    for blob in parts["_hll"]:
        merged = np.maximum(merged, np.frombuffer(blob, dtype=np.int64))
    return merged


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount for non-negative int64 (numpy < 2 has no
    bit_count ufunc): unpackbits over the little-endian byte view."""
    x = np.ascontiguousarray(x, dtype=np.int64)
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(
        axis=1
    ).astype(np.int64)


# classic HLL bias constants (Flajolet et al. 2007, figure 3)
_HLL_ALPHA = {4: 0.673, 5: 0.697, 6: 0.709}


def grouped_hll_affine(
    ds: ray.data.Dataset, *, group: str, value: str, p_bits: int = 4
) -> pd.DataFrame:
    """Per-GROUP HyperLogLog distinct estimates with the SQL-mirrorable
    affine hash AND a SQL-mirrorable read-out: the RAW estimator
    est = α_m·m²/Σ2^−M[j] in fixed-operation-order doubles, WITHOUT the
    small-range linear-counting correction (ln is the one transcendental
    a SQL mirror can't pin bit-for-bit; the corrected estimator stays on
    the production siphash tier, `approx_distinct`, pytest-bounded).
    Every float step is exact or identically rounded on both sides:
    2^−rho are exact powers of two whose 16-term sum spans < 53 mantissa
    bits (order-independent exact sum), and α·m·m/S·1000 runs in the
    same left-to-right order as the oracle expression. Output:
    (group, est_milli:int64) = floor(est·1000).

    Mergeable exactly like the production HLL — per-block per-group
    register maxima, elementwise-max combine on the driver (one tiny
    m-register row per group per block; never a raw-value shuffle)."""
    if p_bits not in _HLL_ALPHA:
        raise ValueError(f"p_bits must be one of {sorted(_HLL_ALPHA)}")
    m = 1 << p_bits
    sub_bits = 31 - p_bits
    alpha = _HLL_ALPHA[p_bits]

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t[group]), pc.is_valid(t[value]))
        )
        df = t.to_pandas()
        vals_all = df[value].to_numpy().astype(np.int64)
        keep = vals_all >= 0
        df, vals_all = df[keep], vals_all[keep]
        groups, blobs = [], []
        for gval, idx in df.groupby(group, sort=False).indices.items():
            h = affine_hash(vals_all[idx], 0)
            reg = h % np.int64(m)
            sub = h >> np.int64(p_bits)
            rho = np.where(
                sub == 0, sub_bits + 1, _popcount64((sub & -sub) - 1) + 1
            )
            regs = np.zeros(m, dtype=np.int64)
            np.maximum.at(regs, reg, rho)
            groups.append(gval)
            blobs.append(regs.tobytes())
        return pa.table(
            {group: groups, "_regs": pa.array(blobs, type=pa.binary())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out_g, out_e = [], []
    for gval, g in partials.groupby(group):
        merged = np.zeros(m, dtype=np.int64)
        for blob in g["_regs"]:
            merged = np.maximum(merged, np.frombuffer(blob, dtype=np.int64))
        s = np.sum(np.power(2.0, -merged.astype(np.float64)))
        out_g.append(gval)
        out_e.append(int(np.floor(alpha * float(m) * float(m) / s * 1000.0)))
    return (
        pd.DataFrame({group: out_g, "est_milli": np.asarray(out_e, np.int64)})
        .sort_values(group, kind="mergesort")
        .reset_index(drop=True)
    )


def quantized_tdigest_quantiles(
    ds: ray.data.Dataset, *, value: str, qms=(250, 500, 900, 999)
) -> pd.DataFrame:
    """t-digest quantile READ-OUT over integer-quantized values, under
    a full SQL mirror: values are floored to integer buckets (the same
    quantize-first idiom as `signals.summary_metrics` — one IEEE floor,
    identical in numpy and DuckDB, which also BOUNDS digest cardinality
    at any corpus size), the (bucket, count) histogram reduces through
    one distributed combiner pass (`grouped_count_driver`: per-block
    Arrow partials, tiny driver merge, zero shuffle), and the weighted
    singleton centroids read out through the standard t-digest
    inverse-CDF (`tdigest_quantile`: np.interp at cumulative mid-weight
    positions) — every double op mirrored in the oracle's window-SQL in
    the same order, so the milli-floored estimates are bit-identical.
    The genuinely approximate unbounded-value tier (δ-limited merge over
    raw continuous values) stays on `build_tdigest`/
    `grouped_tdigest_quantiles`, pinned by pytest accuracy bounds and
    the `grouped_tdigest_exact_small` oracle. Output: (q:int64 milli,
    est_milli:int64)."""
    from .agg import grouped_count_driver

    def quantize(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[value]))
        v = t[value].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor(v).astype(np.int64)
        return pa.table({"_b": pa.array(b, type=pa.int64())})

    hist = grouped_count_driver(
        ds.map_batches(quantize, batch_format="pyarrow"), ["_b"], alias="_n"
    )
    qms_arr = np.asarray(qms, dtype=np.int64)
    if not len(hist):
        return pd.DataFrame(
            {"q": qms_arr, "est_milli": np.zeros(len(qms_arr), np.int64)}
        )
    hist = hist.sort_values("_b", kind="mergesort")
    means = hist["_b"].to_numpy().astype(np.float64)
    weights = hist["_n"].to_numpy().astype(np.float64)
    qs = qms_arr.astype(np.float64) / 1000.0
    est = tdigest_quantile(means, weights, qs)
    return pd.DataFrame(
        {"q": qms_arr, "est_milli": np.floor(est * 1000.0).astype(np.int64)}
    )
