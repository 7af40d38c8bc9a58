"""Deduplication operators over the ``documents`` table.

Training-data-pipeline extensions (not in the collector core — the core
is at-least-once and ships no dedup, SURVEY.md §2.4; contrib has
groupbytrace-style processors). Four tiers:

- **exact**: content-hash → hash-partitioned groupby → keep first
  (deterministic representative = min id). The groupby key is the md5
  of the content, so the shuffle moves (hash, id) pairs, and skew is
  impossible (hashes are uniform).
- **MinHash + LSH**: word-shingle → k minhashes → banded LSH keys →
  groupby band key → candidate pairs → exact-Jaccard verify. The only
  all-to-all is the groupby on (band, band_hash) — uniform keys again.
- **SimHash**: 64-bit signature; near-dup candidates via 16-bit chunk
  banding (Hamming ≤ 3 ⇒ some chunk equal, pigeonhole).
- **n-gram Jaccard (exact, blocked)**: pairwise word-set Jaccard within
  a blocking key (``lang``) — the SQL-mirrorable ground truth the
  probabilistic tiers are tested against.

Scale notes: candidate-pair verification here broadcasts the doc→token
sets when the corpus side is small (testdata); at 100 TB the verify is
a self-join: explode candidates to (doc_id, pair_id), hash-join text
back by doc_id (bucketed groupby), compute Jaccard per pair inside
map_groups. Connected components use iterated min-label propagation
(bounded rounds), never a driver-side union-find over the full corpus.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

# ------------------------------------------------------------- exact


def md5_column(batch: pa.Table, col: str = "text", out: str = "_md5") -> pa.Table:
    vals = batch[col].to_pandas().astype(str)
    hashes = [hashlib.md5(v.encode()).hexdigest() for v in vals]
    return batch.append_column(out, pa.array(hashes, type=pa.string()))


def exact_dedup(
    ds: ray.data.Dataset, col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """One row per distinct ``col`` value, keeping the min ``id_col``
    (deterministic representative — parallelism-invariant)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        return md5_column(batch, col)

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="mergesort").head(1)

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    return (
        hashed.groupby("_md5")
        .map_groups(keep_first, batch_format="pandas")
        .drop_columns(["_md5"])
    )


# --------------------------------------------------------- shingles


def _word_shingles(text: str, n: int = 3) -> set[str]:
    words = text.split()
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """crc32 of each word n-gram — deterministic, C-speed."""
    sh = _word_shingles(text, n)
    if not sh:
        return np.zeros(1, dtype=np.uint64)
    return np.fromiter(
        (zlib.crc32(s.encode()) for s in sh), dtype=np.uint64, count=len(sh)
    )


_MH_PRIME = np.uint64((1 << 61) - 1)


class MinHashStage:
    """Per-doc MinHash signature: ``num_hashes`` permutations via the
    (a*x + b) mod p family; coefficients derived from a fixed seed once
    per actor. Emits ``minhash: list<uint64>``."""

    def __init__(self, num_hashes: int = 64, shingle_n: int = 3, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, 1 << 31, size=num_hashes).astype(np.uint64)
        self.b = rng.randint(0, 1 << 31, size=num_hashes).astype(np.uint64)
        self.shingle_n = shingle_n
        self.num_hashes = num_hashes

    def signature(self, text: str) -> np.ndarray:
        x = _shingle_hashes(text, self.shingle_n)  # (S,) uint64 < 2^32
        # (S, K): a*x < 2^63, + b safe; mod Mersenne keeps exactness.
        h = (x[:, None] * self.a[None, :] + self.b[None, :]) % _MH_PRIME
        return h.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pandas()
        if len(texts) == 0:
            sigs = np.empty((0, self.num_hashes), dtype=np.uint64)
        else:
            sigs = np.stack([self.signature(t) for t in texts])
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.ravel(), type=pa.uint64()), self.num_hashes
        )
        return batch.append_column("minhash", col)


class LSHBandStage:
    """Explode each signed doc to ``bands`` rows of
    (doc_id, band, band_hash): the LSH bucketing key. Docs sharing any
    (band, band_hash) are near-dup candidates."""

    def __init__(self, bands: int = 16, id_col: str = "doc_id"):
        self.bands = bands
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    self.id_col: pa.array([], type=pa.int64()),
                    "band": pa.array([], type=pa.int64()),
                    "band_hash": pa.array([], type=pa.int64()),
                }
            )
        sigs = np.stack(batch["minhash"].to_pandas().to_numpy())  # (N, K)
        n, k = sigs.shape
        r = k // self.bands
        ids = batch[self.id_col].to_numpy()
        rows_id, rows_band, rows_hash = [], [], []
        for b in range(self.bands):
            chunk = np.ascontiguousarray(sigs[:, b * r : (b + 1) * r])
            bh = np.fromiter(
                (zlib.crc32(chunk[i].tobytes()) for i in range(n)),
                dtype=np.int64,
                count=n,
            )
            rows_id.append(ids)
            rows_band.append(np.full(n, b, dtype=np.int64))
            rows_hash.append(bh)
        return pa.table(
            {
                self.id_col: np.concatenate(rows_id),
                "band": np.concatenate(rows_band),
                "band_hash": np.concatenate(rows_hash),
            }
        )


def _bucket_pairs(g: pd.DataFrame, id_col: str) -> pd.DataFrame:
    ids = np.sort(g[id_col].unique())
    if len(ids) < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
    a, b = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})


# Per-worker-process stage cache: the stateless-task alternative to an
# actor pool when stage state is cheap to build. Worker processes are
# reused, so state still amortizes across batches — but the stage stays
# elastic and reserves no CPUs, which matters when several stages plus a
# shuffle share a small CPU budget (two fixed 2-actor pools on a 4-CPU
# session starve the groupby and deadlock the pipeline).
_STAGE_CACHE: dict = {}


def _cached_stage(key, factory):
    st = _STAGE_CACHE.get(key)
    if st is None:
        st = _STAGE_CACHE[key] = factory()
    return st


def minhash_candidates(
    docs: ray.data.Dataset,
    *,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    distinct: bool = True,
) -> ray.data.Dataset:
    """documents → candidate near-dup pairs (doc_a < doc_b)."""

    def minhash_fn(batch: pa.Table) -> pa.Table:
        st = _cached_stage(
            ("minhash", num_hashes, shingle_n),
            lambda: MinHashStage(num_hashes=num_hashes, shingle_n=shingle_n),
        )
        return st(batch)

    def band_fn(batch: pa.Table) -> pa.Table:
        st = _cached_stage(
            ("lshband", bands, id_col),
            lambda: LSHBandStage(bands=bands, id_col=id_col),
        )
        return st(batch)

    signed = docs.map_batches(minhash_fn, batch_format="pyarrow")
    banded = signed.map_batches(band_fn, batch_format="pyarrow")
    pairs = banded.groupby(["band", "band_hash"]).map_groups(
        lambda g: _bucket_pairs(g, id_col), batch_format="pandas"
    )
    if distinct:
        # distinct pairs (a doc pair can collide in several bands); a
        # second shuffle — skip it (distinct=False) when a downstream
        # step dedupes anyway (candidate sets are tiny vs the corpus)
        pairs = pairs.groupby(["doc_a", "doc_b"]).map_groups(
            lambda g: g.head(1), batch_format="pandas"
        )
    return pairs


def verify_jaccard_pairs(
    pairs: ray.data.Dataset,
    docs_lookup_ref,
    *,
    threshold: float,
    shingle_n: int = 3,
) -> ray.data.Dataset:
    """Exact word-shingle Jaccard over candidate pairs; keeps pairs with
    jaccard >= threshold. ``docs_lookup_ref`` is a ``ray.put`` handle to
    a dict id→text (broadcast small side; see module docstring for the
    100 TB join-based variant)."""

    def verify_fn(batch: pa.Table) -> pa.Table:
        import ray as _ray

        def build():
            lookup = (
                _ray.get(docs_lookup_ref)
                if isinstance(docs_lookup_ref, _ray.ObjectRef)
                else docs_lookup_ref
            )
            return {k: _word_shingles(v, shingle_n) for k, v in lookup.items()}

        key = ("jaccard_sets", getattr(docs_lookup_ref, "hex", lambda: id(docs_lookup_ref))(), shingle_n)
        sets = _cached_stage(key, build)
        da = batch["doc_a"].to_numpy()
        db = batch["doc_b"].to_numpy()
        keep = np.zeros(len(da), dtype=bool)
        for i in range(len(da)):
            sa, sb = sets[da[i]], sets[db[i]]
            union = len(sa | sb)
            keep[i] = union > 0 and len(sa & sb) / union >= threshold
        return batch.filter(pa.array(keep))

    return pairs.map_batches(verify_fn, batch_format="pyarrow")


# ----------------------------------------------------------- simhash


class SimHashStage:
    """64-bit SimHash over word-shingle crc hashes (sign-aggregated bit
    votes). Near-dups have small Hamming distance."""

    def __init__(self, shingle_n: int = 1):
        self.shingle_n = shingle_n
        self.bits = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def signature(self, text: str) -> np.uint64:
        sh = sorted(_word_shingles(text, self.shingle_n))
        if not sh:
            return np.uint64(0)
        # widen crc32 to 64 bits deterministically: crc(s) || crc(reversed s)
        h64 = np.array(
            [
                (zlib.crc32(s.encode()) << 32) | zlib.crc32(s.encode()[::-1])
                for s in sh
            ],
            dtype=np.uint64,
        )
        votes = ((h64[:, None] & self.bits[None, :]) != 0).sum(axis=0)
        sig = (votes * 2 >= len(h64)).astype(np.uint64)
        return np.uint64((sig * self.bits).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pandas()
        sigs = np.array([self.signature(t) for t in texts], dtype=np.uint64)
        return batch.append_column("simhash", pa.array(sigs, type=pa.uint64()))


# ------------------------------------------- duplicate clusters


def cluster_pairs(pairs_df, all_ids=None):
    """Verified near-dup pairs → connected components: (doc_id,
    cluster_rep) with rep = min doc_id of the component. Docs with no
    pair are their own rep (when ``all_ids`` given).

    Runs min-label propagation to fixpoint on the DRIVER — justified
    because the verified-pair graph is orders of magnitude smaller than
    the corpus (candidates post-LSH post-verify). The distributed form
    for a pathological pair set: iterate rounds of
    ``edges.groupby(node).aggregate(min(label))`` joined back to labels
    until no label changes (bounded by component diameter).
    """
    import pandas as pd

    label: dict[int, int] = {}
    for a, b in zip(pairs_df["doc_a"], pairs_df["doc_b"]):
        label.setdefault(int(a), int(a))
        label.setdefault(int(b), int(b))

    def find(x: int) -> int:
        root = x
        while label[root] != root:
            root = label[root]
        while label[x] != root:  # path compression
            label[x], x = root, label[x]
        return root

    for a, b in zip(pairs_df["doc_a"], pairs_df["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            # union by min id → deterministic representative
            lo, hi = min(ra, rb), max(ra, rb)
            label[hi] = lo
    rows = {d: find(d) for d in list(label)}
    if all_ids is not None:
        for d in all_ids:
            rows.setdefault(int(d), int(d))
    out = pd.DataFrame(
        {"doc_id": list(rows.keys()), "cluster_rep": list(rows.values())}
    ).astype("int64")
    return out.sort_values("doc_id", kind="mergesort").reset_index(drop=True)


# ----------------------------------- exact blocked n-gram Jaccard


def jaccard_pairs_blocked(
    docs: ray.data.Dataset,
    *,
    block_col: str = "lang",
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Exact pairwise word-set (1-gram) Jaccard within each block —
    SQL-mirrorable ground truth. O(block²) by construction; the block
    key bounds the quadratic term (the documented skew assumption)."""

    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        ids = g[id_col].to_numpy()
        word_sets = [set(t.split()) for t in g["text"]]
        vocab: dict[str, int] = {}
        for s in word_sets:
            for w in s:
                vocab.setdefault(w, len(vocab))
        n, v = len(ids), max(len(vocab), 1)
        # membership matrix → intersections by one matmul (the O(n²)
        # term runs in BLAS, not Python; n is bounded by the block key)
        mat = np.zeros((n, v), dtype=np.float64)
        for i, s in enumerate(word_sets):
            for w in s:
                mat[i, vocab[w]] = 1.0
        inter = mat @ mat.T
        sizes = mat.sum(axis=1)
        union = sizes[:, None] + sizes[None, :] - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            jac = np.where(union > 0, inter / union, 0.0)
        ia, ib = np.nonzero(np.triu(jac >= threshold, k=1))
        return pd.DataFrame(
            {
                "doc_a": ids[ia].astype(np.int64),
                "doc_b": ids[ib].astype(np.int64),
            }
        )

    return docs.groupby(block_col).map_groups(per_block, batch_format="pandas")
