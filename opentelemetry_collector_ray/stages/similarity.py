"""Similarity search over an embedding column (``list<float>``).

- ``brute_force_topk``: exact cosine top-k — per-batch numpy matmul
  against a broadcast query matrix, partial top-k per batch, final merge
  of the tiny partials on the driver. The dataset streams; only
  O(queries × k × blocks) partial rows ever leave workers. This is the
  baseline/oracle path.
- ``lsh_topk``: random-hyperplane LSH variant — the scale path: bucket
  every vector by sign bits once (deterministic planes), search only the
  query's bucket ± Hamming-1 probes. Recall traded for touching a
  1/2^bits fraction of the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _matrix(batch_col) -> np.ndarray:
    arr = batch_col.to_pandas().to_numpy()
    return np.stack(arr).astype(np.float64)


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BruteTopK:
    """Per-batch partial top-k: queries resolved once per actor."""

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id"):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids = np.asarray(sorted(q.keys()))
        self.qm = _norm_rows(np.stack([q[i] for i in self.qids]).astype(np.float64))
        self.k = k
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        vecs = _norm_rows(_matrix(batch["embedding"]))
        ids = batch[self.id_col].to_numpy()
        scores = self.qm @ vecs.T  # (Q, N)
        k = min(self.k, scores.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(scores.shape[0]):
            # deterministic per-batch top-k INCLUDING the documented
            # (score desc, vec_id asc) tie-break — argpartition alone
            # would keep an arbitrary subset of boundary ties and make
            # the result depend on block layout.
            order = np.lexsort((ids, -scores[qi]))[:k]
            out_q.append(np.full(k, self.qids[qi]))
            out_v.append(ids[order])
            out_s.append(scores[qi, order])
        return pa.table(
            {
                "query_id": np.concatenate(out_q),
                "vec_id": np.concatenate(out_v),
                "score": np.concatenate(out_s),
            }
        )


def brute_force_topk(
    ds: ray.data.Dataset,
    queries: dict[int, np.ndarray],
    k: int = 10,
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Exact cosine top-k: returns (query_id, rank, vec_id) — integer
    output so equality checks don't hash floats. Ties broken by
    (score desc, vec_id asc), deterministically."""
    qref = ray.put(queries)
    partials = ds.map_batches(
        BruteTopK,
        fn_constructor_kwargs={"queries_ref": qref, "k": k, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    out = []
    for qid, g in partials.groupby("query_id"):
        g = g.sort_values(
            ["score", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        out.append(
            pd.DataFrame(
                {
                    "query_id": np.full(len(g), qid, dtype=np.int64),
                    "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                    "vec_id": g["vec_id"].to_numpy(dtype=np.int64),
                }
            )
        )
    return (
        pd.concat(out, ignore_index=True)
        if out
        else pd.DataFrame(columns=["query_id", "rank", "vec_id"], dtype=np.int64)
    )


# --------------------------------------------------------------- LSH


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((bits, dim))


def lsh_bucket_batch(batch: pa.Table, planes: np.ndarray, id_col="vec_id") -> pa.Table:
    if len(batch) == 0:
        return batch.append_column("bucket", pa.array([], type=pa.int64()))
    vecs = _matrix(batch["embedding"])
    signs = (vecs @ planes.T) >= 0  # (N, bits)
    weights = (1 << np.arange(planes.shape[0]))[None, :]
    bucket = (signs * weights).sum(axis=1).astype(np.int64)
    return batch.append_column("bucket", pa.array(bucket, type=pa.int64()))


def embedding_near_dup_pairs(
    ds: ray.data.Dataset,
    all_embeddings: "np.ndarray",
    all_ids: "np.ndarray",
    *,
    threshold: float = 0.4,
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b) with
    cosine ≥ threshold.

    Shape: the full (normalized) matrix is broadcast once (`ray.put`),
    the corpus streams through `map_batches`, each batch matmuls its
    rows against the whole matrix and emits its qualifying pairs —
    exact, one pass, no shuffle. Valid while the matrix fits a worker
    (64-dim float32: ~2.4 GB per 10M vectors); beyond that, switch to
    `lsh_bucket_batch` bucketing and compare within bucket ± Hamming-1
    probes (approximate, documented trade-off).
    """
    import ray as _ray

    order = np.argsort(all_ids)
    ids_sorted = all_ids[order]
    mat = _norm_rows(all_embeddings[order].astype(np.float64))
    ref = _ray.put((ids_sorted, mat))

    def pairs(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                }
            )
        ids_all, m = _ray.get(ref)
        vecs = _norm_rows(_matrix(batch["embedding"]))
        bids = batch[id_col].to_numpy()
        scores = vecs @ m.T  # (B, N)
        hit_b, hit_n = np.nonzero(scores >= threshold)
        a = bids[hit_b]
        b = ids_all[hit_n]
        keep = a < b  # dedupe (i,j)/(j,i) and self-pairs
        return pa.table(
            {
                "id_a": a[keep].astype(np.int64),
                "id_b": b[keep].astype(np.int64),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow")


def lsh_topk(
    ds: ray.data.Dataset,
    queries: dict[int, np.ndarray],
    k: int = 10,
    bits: int = 4,
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """ANN via sign-LSH: search only buckets within Hamming distance 1 of
    each query's bucket. Approximate — compare recall against
    ``brute_force_topk`` in tests; at scale, bucket is a partition key
    (groupby bucket → per-bucket scan), so a query touches
    (bits+1)/2^bits of the data."""
    dim = len(next(iter(queries.values())))
    planes = _hyperplanes(dim, bits)
    bucketed = ds.map_batches(
        lambda b: lsh_bucket_batch(b, planes, id_col), batch_format="pyarrow"
    )
    qids = sorted(queries.keys())
    qm = np.stack([queries[i] for i in qids]).astype(np.float64)
    qsigns = (qm @ planes.T) >= 0
    weights = 1 << np.arange(bits)
    qbuckets = (qsigns * weights).sum(axis=1)
    probe: dict[int, set[int]] = {}
    for qi, qb in zip(qids, qbuckets):
        buckets = {int(qb)}
        for bit in range(bits):
            buckets.add(int(qb) ^ (1 << bit))
        probe[qi] = buckets
    allowed = sorted(set().union(*probe.values()))
    import pyarrow.compute as pc

    cand = bucketed.map_batches(
        lambda b: b.filter(pc.is_in(b["bucket"], value_set=pa.array(allowed))),
        batch_format="pyarrow",
    )
    pdf = cand.to_pandas()
    vecs = _norm_rows(np.stack(pdf["embedding"].to_numpy()).astype(np.float64))
    qn = _norm_rows(qm)
    out = []
    for qi_idx, qid in enumerate(qids):
        mask = pdf["bucket"].isin(probe[qid]).to_numpy()
        scores = qn[qi_idx] @ vecs[mask].T
        ids = pdf[id_col].to_numpy()[mask]
        order = np.lexsort((ids, -scores))[:k]
        out.append(
            pd.DataFrame(
                {
                    "query_id": np.full(len(order), qid, dtype=np.int64),
                    "rank": np.arange(1, len(order) + 1, dtype=np.int64),
                    "vec_id": ids[order].astype(np.int64),
                }
            )
        )
    return pd.concat(out, ignore_index=True)
