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
