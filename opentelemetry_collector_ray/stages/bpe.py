"""Distributed BPE tokenizer training + application.

Corpus byte-pair encoding (Sennrich, Haddow & Birch 2016, "Neural
Machine Translation of Rare Words with Subword Units" — the public
algorithm every subword tokenizer derives from), expressed
Ray-Data-first for a 100 TB corpus:

1. ONE pass over the corpus reduces it to the word-frequency table —
   per-batch ``value_counts`` partials through a single groupby on the
   word (the only corpus-sized shuffle; everything after runs on the
   unique-word table, which is orders of magnitude smaller).
2. Each merge round is a map-only pair-count partial over the word
   table (per-batch weighted bincount of adjacent symbol pairs → ≤
   unique-pairs-per-batch tiny rows), a small groupby-sum, and a
   driver top-1 with a deterministic tie-break (max count, then
   lexicographic pair). The driver holds ONE (left, right, count)
   scalar per round — never the vocabulary.
3. The winning pair is broadcast implicitly through the next round's
   map_batches closure; applying a merge rewrites each word's symbol
   list in place. The word table is ``materialize()``d every round —
   a lazy Dataset consumed k times would re-execute its whole lineage
   k times (measured round-3 lesson, see CLAUDE.md).

Scale notes: the word table for a deduplicated web corpus is ~10⁷
rows; pair partials per round are ≤ (symbol-vocab)² bounded and
usually ~10⁵; k rounds cost k small shuffles of tiny tables. The
expensive corpus pass happens exactly once. This is the same shape as
the reference pipeline's aggregation tiers (payload aggregation →
small groupby), cited for parity: the reference has no tokenizer
trainer — this operator is part of the training-data surface the
engine adds beyond collector parity.

``bpe_apply`` is the inference side: the learned merge ranks broadcast
once via ``ray.put`` and resolved per actor, applied word-by-word with
the standard lowest-rank-first loop, memoized per unique word for the
actor's lifetime under a hard cap (corpora repeat words heavily; the
cap keeps the unbounded vocabulary tail out of the actor heap).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

# end-of-word sentinel: a real token never contains whitespace, so a
# trailing marker distinguishes "est</w>" (word end) from "est" (prefix)
EOW = "</w>"


def _word_symbols(word: str) -> list[str]:
    return list(word) + [EOW]


def word_counts(
    ds: ray.data.Dataset, *, col: str = "text", min_count: int = 1
) -> ray.data.Dataset:
    """Corpus → (word, n) frequency table: per-batch value_counts
    partials, one groupby-sum on the word. Null text contributes
    nothing. The single corpus-sized shuffle of BPE training."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        texts = t[col].to_pylist()
        words: list[str] = []
        for s in texts:
            if s:
                words.extend(s.split())
        if not words:
            return pa.table(
                {
                    "word": pa.array([], type=pa.string()),
                    "c": pa.array([], type=pa.int64()),
                }
            )
        vc = pd.Series(words).value_counts()
        return pa.table(
            {
                "word": pa.array(vc.index.to_numpy(), type=pa.string()),
                "c": pa.array(vc.to_numpy().astype(np.int64)),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("c"))
        .rename_columns({"sum(c)": "n"})
    )
    if min_count > 1:
        import pyarrow.compute as pc

        counts = counts.map_batches(
            lambda t: t.filter(pc.greater_equal(t["n"], min_count)),
            batch_format="pyarrow",
        )
    return counts


def _pair_partial(t: pa.Table) -> pa.Table:
    """Adjacent-symbol pair counts for one block of the word table,
    weighted by word frequency — ≤ unique-pairs-in-block rows out."""
    syms = t["syms"].to_pylist()
    n = t["n"].to_numpy(zero_copy_only=False)
    agg: dict[tuple[str, str], int] = {}
    for s, c in zip(syms, n):
        c = int(c)
        for i in range(len(s) - 1):
            k = (s[i], s[i + 1])
            agg[k] = agg.get(k, 0) + c
    if not agg:
        return pa.table(
            {
                "left": pa.array([], type=pa.string()),
                "right": pa.array([], type=pa.string()),
                "c": pa.array([], type=pa.int64()),
            }
        )
    lefts, rights = zip(*agg.keys())
    return pa.table(
        {
            "left": pa.array(list(lefts), type=pa.string()),
            "right": pa.array(list(rights), type=pa.string()),
            "c": pa.array(np.fromiter(agg.values(), np.int64, len(agg))),
        }
    )


def _merge_word(s: list[str], left: str, right: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def _top_pair(df: pd.DataFrame):
    """Deterministic argmax over a (left, right, c) pair table: max
    count, ties lexicographic on (left, right). None if no pair ≥ 2."""
    if not len(df):
        return None
    df = df.sort_values(
        ["c", "left", "right"],
        ascending=[False, True, True],
        kind="mergesort",
    )
    top = df.iloc[0]
    if int(top["c"]) < 2:
        return None
    return str(top["left"]), str(top["right"]), int(top["c"])


def bpe_train(
    ds: ray.data.Dataset,
    *,
    col: str = "text",
    merges: int = 40,
    min_count: int = 1,
    driver_words: int = 2_000_000,
) -> pd.DataFrame:
    """Learn ``merges`` BPE merge rules from a corpus. Returns the
    merge table (rank, left, right, pair_count) — deterministic: ties
    break on (count desc, left asc, right asc), no RNG. Stops early
    when no pair occurs twice.

    Hybrid merge loop (the driver-union-find / distributed-propagation
    pattern this repo uses for components): the corpus pass is always
    the distributed word-count reduction; if the resulting UNIQUE-word
    table fits the driver (≤ ``driver_words`` rows — a 10M-word web
    vocabulary is ~500 MB, the industrial trainers' local-loop regime)
    the k merge rounds run locally, else each round is a distributed
    pair-count partial → small groupby → driver top-1 scalar, with the
    word table materialized per round (a lazy Dataset consumed k times
    re-executes its lineage k times). Both paths share the same
    counting and merge kernels and are equality-tested."""
    from ray.data.aggregate import Sum

    words = word_counts(ds, col=col, min_count=min_count).map_batches(
        lambda t: pa.table(
            {
                "syms": pa.array(
                    [_word_symbols(w) for w in t["word"].to_pylist()],
                    type=pa.list_(pa.string()),
                ),
                "n": t["n"],
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    rows = []
    if words.count() <= driver_words:
        wdf = words.to_pandas()
        syms, n = list(wdf["syms"]), wdf["n"].to_numpy()
        syms = [list(s) for s in syms]
        for rank in range(merges):
            t = _pair_partial(
                pa.table(
                    {
                        "syms": pa.array(syms, type=pa.list_(pa.string())),
                        "n": pa.array(n),
                    }
                )
            )
            top = _top_pair(t.to_pandas())
            if top is None:
                break
            left, right, c = top
            rows.append((rank, left, right, c))
            syms = [
                _merge_word(s, left, right) if left in s else s for s in syms
            ]
    else:
        for rank in range(merges):
            pairs = (
                words.map_batches(_pair_partial, batch_format="pyarrow")
                .groupby(["left", "right"])
                .aggregate(Sum("c"))
                .rename_columns({"sum(c)": "c"})
            )
            # the grouped pair table is symbol-vocab² bounded and block-
            # reduced — a driver argmax over it is the one scalar/round
            top = _top_pair(pairs.to_pandas())
            if top is None:
                break
            left, right, c = top
            rows.append((rank, left, right, c))

            def apply(t: pa.Table, _l=left, _r=right) -> pa.Table:
                syms2 = [
                    _merge_word(s, _l, _r) if (_l in s) else s
                    for s in t["syms"].to_pylist()
                ]
                return pa.table(
                    {
                        "syms": pa.array(syms2, type=pa.list_(pa.string())),
                        "n": t["n"],
                    }
                )

            words = words.map_batches(
                apply, batch_format="pyarrow"
            ).materialize()

    return pd.DataFrame(
        rows, columns=["rank", "left", "right", "pair_count"]
    ).astype({"rank": np.int64, "pair_count": np.int64})


class BpeApplyStage:
    """Tokenize text with a learned merge table (actor pool: the merge
    ranks resolve from the object store ONCE in __init__). Standard
    lowest-rank-first application per word, memoized per unique word
    across the actor's lifetime with a hard cap (``MEMO_CAP``) so the
    long tail of a web-scale vocabulary cannot grow the actor heap
    unboundedly — appends ``n_bpe_real`` (token count) and
    ``bpe_tokens`` (list)."""

    # memo entries are (word → token list); a web-scale corpus has an
    # unbounded long tail of unique words, so the cache is CAPPED per
    # actor — when full it stops admitting, keeping the hot head (Zipf:
    # the first ~1M distinct words cover almost all tokens) without
    # growing for the actor's whole pool lifetime
    MEMO_CAP = 1_000_000

    def __init__(self, merges_ref):
        table = (
            ray.get(merges_ref)
            if isinstance(merges_ref, ray.ObjectRef)
            else merges_ref
        )
        self.rank = {
            (l, r): int(k)
            for k, l, r in zip(table["rank"], table["left"], table["right"])
        }
        self._memo: dict[str, list[str]] = {}

    def _encode_word(self, word: str) -> list[str]:
        got = self._memo.get(word)
        if got is not None:
            return got
        s = _word_symbols(word)
        while len(s) > 1:
            best, bi = None, -1
            for i in range(len(s) - 1):
                r = self.rank.get((s[i], s[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            s = _merge_word(s, s[bi], s[bi + 1])
        if len(self._memo) < self.MEMO_CAP:
            self._memo[word] = s
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        toks, counts = [], np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if not t:
                toks.append([])
                continue
            enc: list[str] = []
            for w in t.split():
                enc.extend(self._encode_word(w))
            toks.append(enc)
            counts[i] = len(enc)
        return batch.append_column(
            "bpe_tokens", pa.array(toks, type=pa.list_(pa.string()))
        ).append_column("n_bpe_real", pa.array(counts))
