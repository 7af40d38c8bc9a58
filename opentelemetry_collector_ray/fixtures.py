"""Deterministic synthetic transcript fixtures.

Mirrors the reference's fixture-generator test strategy
(internal/testdata/log.go:28-42 — ``GenerateLogs(count)``: fixed pinned
timestamp, alternating record shapes with known attrs/bodies; the
generator IS the oracle, no golden files). Everything below is pure
arithmetic on the conversation index ``i`` and turn index ``j`` —
bit-stable across processes, parallelism levels and corpus sizes, and
fully vectorized (numpy) so bench-scale corpora generate at memory
bandwidth.

Schema: ``schema.TRANSCRIPT_SCHEMA``; rules documented in FIXTURES.md §1.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .schema import ACTIONS, LEVELS, ROLES, TOOLS, TRANSCRIPT_SCHEMA

# Pinned instant — same one the reference fixtures pin
# (internal/testdata/log.go:25: TestLogTimestamp = 2020-02-11T20:26:13Z).
EPOCH_US = np.int64(1581452773_000_000)

_WORDS = [
    "alpha", "beam", "cache", "delta", "epoch", "flux", "grid", "helix",
    "ion", "joule", "kernel", "lumen", "matrix",
]

# Precomputed lorem suffixes: msg for a row with word count w = (j % 13)+1
# is the first w words of _WORDS joined by spaces.
_LOREM = ["" for _ in range(14)]
for _w in range(1, 14):
    _LOREM[_w] = " ".join(_WORDS[:_w])


def n_turns(i: np.ndarray | int):
    """turns(i) = 1 + (i*7 + 3) % 12 — conversations of 1..12 turns."""
    return 1 + (i * 7 + 3) % 12


def gen_transcripts(n_conv: int, start_conv: int = 0) -> pa.Table:
    """Generate the deterministic transcript table for conversations
    ``[start_conv, start_conv + n_conv)``.

    ``start_conv`` lets callers grow a corpus by concatenating disjoint
    conversation ranges (bench scales by range, content stays stable).
    """
    i_per_conv = np.arange(start_conv, start_conv + n_conv, dtype=np.int64)
    turns = n_turns(i_per_conv)
    total = int(turns.sum())

    # Row-level conv index i and turn index j, fully vectorized.
    i = np.repeat(i_per_conv, turns)
    # j = position within conversation: global arange minus each conv's start.
    starts = np.concatenate(([0], np.cumsum(turns)[:-1]))
    j = np.arange(total, dtype=np.int64) - np.repeat(starts, turns)

    conv_id = np.char.add("conv-", np.char.zfill(i.astype("U8"), 8))

    role_idx = (i * 13 + 7 + j) % 4
    role = np.asarray(ROLES, dtype=object)[role_idx]

    level_idx = (i + j * 5) % 4
    level = np.asarray(LEVELS, dtype=object)[level_idx]
    action = np.asarray(ACTIONS, dtype=object)[(i * 3 + j) % 4]
    latency = (i * 31 + j * 17) % 5000
    lorem = np.asarray(_LOREM, dtype=object)[(j % 13) + 1]

    # ~6% of rows get non-matching free text (parse-miss path).
    miss = (i * 31 + j * 7) % 17 == 0

    text = np.where(
        miss,
        np.char.add("freeform note ", lorem.astype("U")).astype(object),
        _compose_text(level, action, latency, lorem),
    )

    tool = np.where(
        role == "tool",
        np.asarray(TOOLS, dtype=object)[(i + j) % 5],
        "",
    )

    ts = EPOCH_US + (i * 97 + j) * 1_000_000

    return pa.Table.from_arrays(
        [
            pa.array(conv_id, type=pa.string()),
            pa.array(j.astype(np.int32), type=pa.int32()),
            pa.array(role, type=pa.string()),
            pa.array(text, type=pa.string()),
            pa.array(tool, type=pa.string()),
            pa.array(ts, type=pa.timestamp("us")),
        ],
        schema=TRANSCRIPT_SCHEMA,
    )


def _compose_text(level, action, latency, lorem) -> np.ndarray:
    """``[{level}] action={action} latency_ms={n} msg={lorem}``."""
    out = np.char.add(np.char.add("[", level.astype("U")), "] action=")
    out = np.char.add(out, action.astype("U"))
    out = np.char.add(out, " latency_ms=")
    out = np.char.add(out, latency.astype("U"))
    out = np.char.add(out, " msg=")
    out = np.char.add(out, lorem.astype("U"))
    return out.astype(object)


def _write_shard(out_dir: str, f: int, start: int, cnt: int) -> str:
    import os

    import pyarrow.parquet as pq

    tbl = gen_transcripts(cnt, start_conv=start)
    p = os.path.join(out_dir, f"part-{f:05d}.parquet")
    pq.write_table(tbl, p)
    return p


_DOC_VOCAB = np.array(
    [f"{a}{b}" for a in _WORDS for b in ("", "-x", "-y", "-z")]
    + [f"tok{k:03d}" for k in range(460)],
    dtype=object,
)  # 512 distinct words


def _mix64(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — uint64 in, well-mixed uint64 out."""
    with np.errstate(over="ignore"):
        z = z * np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def gen_documents(n_docs: int, start_doc: int = 0) -> pa.Table:
    """Deterministic documents table (same shape as
    testdata/documents.parquet) with PLANTED near-duplicate clusters
    for dedup stress runs: docs come in groups of 5 by ``b = i - i%5``;
    members r ∈ {1, 2} are the base doc's text with the r-th word
    replaced (Jaccard ≈ 1 − 2/L, a near-dup of the base), members
    r ∈ {3, 4} are unrelated. Text is L = 30 + (b % 90) words drawn
    from a 512-word vocab by pure index arithmetic; the whole shard is
    vectorized (numpy index matrix → Arrow ListArray →
    ``pc.binary_join``), no per-row Python."""
    import pyarrow.compute as pc

    i = np.arange(start_doc, start_doc + n_docs, dtype=np.int64)
    r = i % 5
    b = i - r
    dup = (r == 1) | (r == 2)
    base = np.where(dup, b, i)  # content-defining index
    L = 30 + (base % 90)  # words per doc, 30..119
    maxL = int(L.max()) if n_docs else 0

    k = np.arange(maxL, dtype=np.int64)
    # word index grid: splitmix64-style mix of the distinct (base, k)
    # key, top 9 bits. The xor-shift rounds matter: a bare multiply is
    # LINEAR in k (h(k+1) = h(k) + c), which makes every doc a window
    # into one global arithmetic-progression orbit — docs at nearby
    # phases then share long identical word runs (observed cross-group
    # shingle Jaccard up to 0.79); after mixing, unrelated docs share
    # words only at the ~L²/V chance rate and shingles at ~0
    key = (base[:, None] * 131071 + k[None, :]).astype(np.uint64)
    idx = _mix64(key) >> np.uint64(55)  # 0..511
    # near-dup perturbation: replace word at position r with a doc-
    # unique token index (still inside the vocab)
    rows = np.nonzero(dup)[0]
    pert = _mix64((i[rows] * 2654435761 + 97).astype(np.uint64)) >> np.uint64(55)
    idx[rows, r[rows]] = pert

    mask = k[None, :] < L[:, None]
    flat = _DOC_VOCAB[idx[mask]]
    offsets64 = np.concatenate(([0], np.cumsum(L)))
    if offsets64[-1] >= np.iinfo(np.int32).max:
        # ListArray offsets are int32 and from_arrays does NOT
        # validate — a wrapped cumsum would land as silently-corrupt
        # parquet. Callers hit this at ~29M docs per shard; raise with
        # the fix instead of corrupting.
        raise ValueError(
            f"shard word count {offsets64[-1]} overflows int32 list "
            "offsets; raise files= in write_documents_corpus"
        )
    offsets = offsets64.astype(np.int32)
    words = pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(flat, type=pa.string())
    )
    text = pc.binary_join(words, " ")

    langs = np.asarray(["en", "de", "fr", "es"], dtype=object)
    return pa.table(
        {
            "doc_id": pa.array(i, type=pa.int64()),
            "text": text,
            "lang": pa.array(langs[(i * 7) % 4], type=pa.string()),
            "source": pa.array(
                np.char.add("src-", (i % 10).astype("U2")).astype(object),
                type=pa.string(),
            ),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        }
    )


def _write_doc_shard(out_dir: str, f: int, start: int, cnt: int) -> str:
    import os

    import pyarrow.parquet as pq

    p = os.path.join(out_dir, f"part-{f:05d}.parquet")
    pq.write_table(gen_documents(cnt, start_doc=start), p)
    return p


def write_documents_corpus(
    out_dir: str, n_docs: int, files: int = 8
) -> list[str]:
    """Deterministic documents corpus as ``files`` Parquet shards
    (parallel Ray tasks when a session is up) — the dedup-stress twin
    of ``write_transcript_corpus``."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    per = n_docs // files
    plan = []
    for f in range(files):
        start = f * per
        cnt = per if f < files - 1 else n_docs - start
        plan.append((f, start, cnt))

    import ray

    if ray.is_initialized():
        task = ray.remote(_write_doc_shard)
        return ray.get(
            [task.remote(out_dir, f, s, c) for f, s, c in plan]
        )
    return [_write_doc_shard(out_dir, f, s, c) for f, s, c in plan]


def write_transcript_corpus(
    out_dir: str, n_conv: int, files: int = 8
) -> list[str]:
    """Write a deterministic corpus as ``files`` Parquet shards.

    Shards split the conversation range evenly → deterministic layout
    for the checkpoint/resume tests (each shard = one input partition,
    the persistent-queue item analogue). Shards are generated in
    parallel as Ray tasks when a Ray session is up (content is a pure
    function of the conversation range, so parallelism cannot change
    the corpus).
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    per = n_conv // files
    plan = []
    for f in range(files):
        start = f * per
        cnt = per if f < files - 1 else n_conv - start
        plan.append((f, start, cnt))

    import ray

    if ray.is_initialized():
        task = ray.remote(_write_shard)
        return ray.get(
            [task.remote(out_dir, f, s, c) for f, s, c in plan]
        )
    return [_write_shard(out_dir, f, s, c) for f, s, c in plan]
