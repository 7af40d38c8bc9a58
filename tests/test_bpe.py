"""BPE trainer: parity with a naive reference implementation, path
equality (driver loop vs distributed rounds), apply consistency."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from opentelemetry_collector_ray.stages.bpe import (
    EOW,
    BpeApplyStage,
    bpe_train,
)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "low lower newest widest",
    None,
    "",
]


def naive_bpe(texts, merges):
    """Straight-line Sennrich BPE over word frequencies — the
    reference the distributed trainer must reproduce exactly."""
    freqs = {}
    for t in texts:
        for w in t.split() if t else []:
            freqs[w] = freqs.get(w, 0) + 1
    vocab = [(list(w) + [EOW], c) for w, c in freqs.items()]
    out = []
    for rank in range(merges):
        pairs = {}
        for syms, c in vocab:
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                pairs[k] = pairs.get(k, 0) + c
        if not pairs:
            break
        (l, r), c = sorted(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        if c < 2:
            break
        out.append((rank, l, r, c))
        for syms, _ in vocab:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == l and syms[i + 1] == r:
                    syms[i : i + 2] = [l + r]
                else:
                    i += 1
    return pd.DataFrame(
        out, columns=["rank", "left", "right", "pair_count"]
    ).astype({"rank": np.int64, "pair_count": np.int64})


def test_bpe_train_matches_naive_reference(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"text": CORPUS})).repartition(3)
    got = bpe_train(ds, merges=15)
    want = naive_bpe(CORPUS, 15)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) >= 8  # the corpus genuinely supports many merges


def test_bpe_train_distributed_path_equals_driver_path(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"text": CORPUS})).repartition(4)
    local = bpe_train(ds, merges=10)
    dist = bpe_train(ds, merges=10, driver_words=0)
    pd.testing.assert_frame_equal(local, dist)


def test_bpe_train_partition_invariant(ray_session):
    df = pd.DataFrame({"text": CORPUS})
    a = bpe_train(ray.data.from_pandas(df).repartition(1), merges=8)
    b = bpe_train(ray.data.from_pandas(df).repartition(6), merges=8)
    pd.testing.assert_frame_equal(a, b)


def test_bpe_apply_reproduces_trained_segmentation(ray_session):
    """Applying the learned ranks lowest-first must re-derive exactly
    the segmentation training ended with — the tokenizer contract."""
    ds = ray.data.from_pandas(pd.DataFrame({"text": CORPUS}))
    merges = bpe_train(ds, merges=20)
    stage = BpeApplyStage(merges)
    # final training-state segmentation via the naive reference
    freqs = {}
    for t in CORPUS:
        for w in t.split() if t else []:
            freqs[w] = freqs.get(w, 0) + 1
    final = {w: list(w) + [EOW] for w in freqs}
    for _, row in merges.iterrows():
        l, r = row["left"], row["right"]
        for syms in final.values():
            i = 0
            while i < len(syms) - 1:
                if syms[i] == l and syms[i + 1] == r:
                    syms[i : i + 2] = [l + r]
                else:
                    i += 1
    for w, want in final.items():
        got = stage._encode_word(w)
        assert got == want, (w, got, want)
    # unseen words fall back gracefully; null/empty text -> no tokens
    out = stage(pa.table({"text": ["zzz low", None, ""]}))
    assert out["n_bpe_real"].to_pylist()[1:] == [0, 0]
    assert out["bpe_tokens"].to_pylist()[0][-1] == "low</w>"
