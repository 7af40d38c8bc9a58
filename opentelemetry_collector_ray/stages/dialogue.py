"""Dialogue-structure operators over the transcript model.

The LLM-training-data view of a conversation log: extract supervised
prompt→response pairs and render whole conversations to single training
texts. Both need a turn's NEIGHBOURS (or the whole conversation) —
the same co-location contract as sessionize / groupbytrace: one sharded
shuffle on conv_id, complete conversations per shard, vectorized work
inside.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def sft_pairs(
    transcripts: ray.data.Dataset,
    *,
    prompt_role: str = "user",
    response_role: str = "assistant",
) -> ray.data.Dataset:
    """Supervised fine-tuning pair extraction: every ``prompt_role``
    turn whose IMMEDIATE successor (turn_idx + 1) in the same
    conversation is a ``response_role`` turn yields one training pair
    (conv_id, prompt_idx, prompt, response) — the lead()-over-window
    idiom. Vectorized per shard: one sort, one shifted compare; no
    per-conversation Python."""
    from ..functions.shard import sharded_group_map

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        conv = g["conv_id"].to_numpy()
        idx = g["turn_idx"].to_numpy().astype(np.int64)
        role = g["role"].to_numpy()
        same = conv[:-1] == conv[1:]
        adjacent = idx[:-1] + 1 == idx[1:]
        hit = (
            same
            & adjacent
            & (role[:-1] == prompt_role)
            & (role[1:] == response_role)
        )
        i = np.flatnonzero(hit)
        text = g["text"].to_numpy()
        return pd.DataFrame(
            {
                "conv_id": conv[i],
                "prompt_idx": idx[i].astype(np.int32),
                "prompt": text[i],
                "response": text[i + 1],
            }
        )

    return sharded_group_map(transcripts, ["conv_id"], per_shard)


def render_dialogue(
    transcripts: ray.data.Dataset, *, sep: str = "\n"
) -> ray.data.Dataset:
    """Conversation → ONE training text: turns ordered by turn_idx,
    each rendered ``role: text``, joined by ``sep`` — the chat-format
    flattening every SFT pipeline runs before tokenization. Output
    (conv_id, n_turns, dialogue). The per-conversation string join is
    inherent to emitting one string per group (same note as
    `chunk_batch`); everything around it — ordering, rendering the
    ``role: text`` lines — is vectorized."""
    from ..functions.shard import sharded_group_map

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        line = g["role"].str.cat(g["text"], sep=": ")
        agg = (
            pd.DataFrame({"conv_id": g["conv_id"], "_line": line})
            .groupby("conv_id", sort=False)["_line"]
            .agg([("n_turns", "size"), ("dialogue", sep.join)])
            .reset_index()
        )
        return agg.astype({"n_turns": "int64"})

    return sharded_group_map(transcripts, ["conv_id"], per_shard)
