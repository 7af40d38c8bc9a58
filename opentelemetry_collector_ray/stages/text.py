"""Text-analysis stages for training-data pipelines over ``documents``.

Beyond the reference's operator set (these are the large-scale
training-data extensions the engine is for): token counting, quality
scoring, language ID, and document fingerprinting. All per-batch
vectorized; the language-ID model is per-actor state (the stateful
actor-pool idiom).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ------------------------------------------------------------ tokens


def token_stats_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append n_tokens (whitespace-run tokens) and avg_word_len.

    Definitions chosen to be DuckDB-mirrorable exactly:
    ``n_tokens = array_length(regexp_extract_all(text, '\\S+'))``;
    ``avg_word_len = sum(len of non-space chars) / n_tokens`` (float64
    IEEE division, bit-stable across engines).
    """
    text = batch[col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n_tokens = pc.count_substring_regex(text, r"\S+")
    n_tokens = pc.cast(n_tokens, pa.int64())
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_spaces = pc.cast(pc.count_substring_regex(text, r"\s"), pa.int64())
    nonspace = pc.subtract(n_chars, n_spaces)
    avg = pc.divide(
        pc.cast(nonspace, pa.float64()),
        pc.cast(pc.max_element_wise(n_tokens, 1), pa.float64()),
    )
    return (
        batch.append_column("n_tokens", n_tokens)
        .append_column("avg_word_len", avg)
    )


# ----------------------------------------------------------- quality

_STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it"]


def quality_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append quality-score features: stopword_ratio and a composite
    quality bucket (short/low-stopword docs score low) — the
    heuristic-quality-filter idiom of web-scale corpus pipelines.

    stopword_count is DuckDB-mirrorable:
    ``array_length(regexp_extract_all(text, '\\b(the|a|of|to|and|in|is|it)\\b'))``.
    """
    text = batch[col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    pattern = r"\b(" + "|".join(_STOPWORDS) + r")\b"
    stop_n = pc.cast(pc.count_substring_regex(text, pattern), pa.int64())
    n_tokens = pc.cast(
        pc.count_substring_regex(text, r"\S+"), pa.int64()
    )
    ratio = pc.divide(
        pc.cast(stop_n, pa.float64()),
        pc.cast(pc.max_element_wise(n_tokens, 1), pa.float64()),
    )
    # quality bucket: integer, safe to hash-compare.
    long_enough = pc.greater_equal(n_tokens, 20)
    has_stop = pc.greater(stop_n, 0)
    score = pc.add(
        pc.cast(long_enough, pa.int64()), pc.cast(has_stop, pa.int64())
    )
    return (
        batch.append_column("stopword_count", stop_n)
        .append_column("stopword_ratio", ratio)
        .append_column("quality_score", score)
    )


# -------------------------------------------------------- vocabulary


def vocab_topk(docs, *, col: str = "text", k: int = 100):
    """Vocabulary building: global token frequencies, top-k — WordCount
    at corpus scale. Combiner shape: each batch emits its own
    ``value_counts`` partials (Arrow kernels, tokens×1 rows per batch,
    never raw tokens), one uniform-key groupby sums them, then a global
    sort+limit over the tiny (distinct-token, n) table. Deterministic
    boundary: ties at rank k break by (n desc, token asc)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        text = t[col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.list_flatten(pc.utf8_split_whitespace(text))
        vc = toks.value_counts()
        return pa.table(
            {
                "token": vc.field("values"),
                "_pc": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    partials = docs.map_batches(partial, batch_format="pyarrow")
    counts = partials.groupby("token").aggregate(Sum("_pc", alias_name="n"))
    return counts.sort(["n", "token"], descending=[True, False]).limit(k)


# ------------------------------------------------------------ redact

# RE2-safe patterns, identical semantics in pyarrow and DuckDB
REDACT_RULES: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b\d{13,16}\b", "<CARD>"),
)


def redact_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """PII scrub for training corpora: sequential regex redaction rules
    (emails, SSN-shaped, long digit runs) applied as vectorized RE2
    replacements — the attributesprocessor replace_pattern idiom at
    document scale. Emits ``text_redacted`` beside the id column."""
    text = batch[col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    for pat, rep in REDACT_RULES:
        text = pc.replace_substring_regex(text, pat, rep)
    return batch.append_column("text_redacted", text)


def normalize_batch(
    batch: pa.Table, col: str = "text", out: str | None = None
) -> pa.Table:
    """Canonical text normalization for training corpora: lowercase,
    strip non-alphanumerics (whitespace kept), collapse whitespace
    runs, trim — all vectorized RE2/utf8 kernels, zero shuffle.
    RE2-safe patterns so a DuckDB oracle computes the identical string
    (both engines are RE2-backed)."""
    out = out or f"{col}_norm"
    text = batch[col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.utf8_lower(text)
    text = pc.replace_substring_regex(text, r"[^a-z0-9\s]", "")
    text = pc.replace_substring_regex(text, r"\s+", " ")
    text = pc.utf8_trim_whitespace(text)
    return batch.append_column(out, text)


# ------------------------------------------------------------ langid


class LangIdStage:
    """Heuristic language ID: character/stopword profile scoring.

    Stateful actor-pool stage — profiles built once per actor in
    ``__init__`` (the model-load idiom). This container has no real
    langid model; profiles are small deterministic stopword sets per
    language, scored vectorized via one regex count per language.
    Output: ``lang_pred`` + ``lang_conf``.
    """

    PROFILES = {
        "en": ["the", "and", "of", "is"],
        "es": ["el", "la", "de", "que"],
        "de": ["der", "die", "und", "das"],
        "fr": ["le", "la", "et", "les"],
        "zh": ["de", "le", "shi", "bu"],
    }

    def __init__(self):
        self.patterns = {
            lang: r"\b(" + "|".join(words) + r")\b"
            for lang, words in self.PROFILES.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        langs = list(self.patterns)
        # null text → null prediction (count_substring_regex propagates
        # null, and a null-text row has no signal to score; a blind
        # to_numpy() here crashed on the first null — null-parity
        # gate finding, r4)
        valid = np.asarray(
            pc.is_valid(text).to_numpy(zero_copy_only=False), dtype=bool
        )
        scores = np.stack(
            [
                pc.fill_null(
                    pc.count_substring_regex(text, self.patterns[lang]), 0
                ).to_numpy(zero_copy_only=False)
                for lang in langs
            ],
            axis=1,
        ).astype(np.float64)
        totals = scores.sum(axis=1)
        best = scores.argmax(axis=1)
        pred = np.asarray(langs, dtype=object)[best]
        pred[~valid] = None
        conf = np.where(totals > 0, scores.max(axis=1) / np.maximum(totals, 1), 0.0)
        return batch.append_column(
            "lang_pred", pa.array(pred, type=pa.string())
        ).append_column(
            "lang_conf",
            pa.array(conf, type=pa.float64(), mask=~valid),
        )


# ------------------------------------------------------- fingerprint

_FP_MOD = np.uint64((1 << 31) - 1)  # Mersenne prime: products fit uint64
_FP_BASE = np.uint64(257)
_FP_POW_CACHE = np.array([1], dtype=np.uint64)


def _fp_powers(n: int) -> np.ndarray:
    """B^0..B^{n-1} mod p, grown on demand and cached per process."""
    global _FP_POW_CACHE
    if len(_FP_POW_CACHE) < n:
        out = np.empty(n, dtype=np.uint64)
        out[: len(_FP_POW_CACHE)] = _FP_POW_CACHE
        for i in range(len(_FP_POW_CACHE), n):
            out[i] = (out[i - 1] * _FP_BASE) % _FP_MOD
        _FP_POW_CACHE = out
    return _FP_POW_CACHE


def fingerprint_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append ``fingerprint``: a polynomial rolling hash of the text
    bytes mod 2^31-1 — deterministic across runs/processes (unlike
    Python's seeded ``hash``), cheap to recompute for lineage checks.
    One numpy reduction per document (no per-byte Python)."""
    text = batch[col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    vals = text.to_numpy(zero_copy_only=False)
    maxlen = max((len(v.encode()) for v in vals if v is not None), default=1)
    powers = _fp_powers(max(maxlen, 1))
    out = np.empty(len(vals), dtype=np.uint64)
    for i, v in enumerate(vals):
        if v is None:
            out[i] = 0
            continue
        b = np.frombuffer(v.encode(), dtype=np.uint8).astype(np.uint64)
        # fingerprint = sum(byte_i * B^(L-1-i)) mod p; each term < 2^39,
        # partial sums < len*2^39 — do a chunked mod to stay exact.
        terms = (b * powers[len(b) - 1 :: -1][: len(b)]) % _FP_MOD
        acc = np.uint64(0)
        for s in range(0, len(terms), 1 << 20):
            acc = (acc + terms[s : s + (1 << 20)].sum() ) % _FP_MOD
        out[i] = acc
    return batch.append_column("fingerprint", pa.array(out, type=pa.uint64()))


# ------------------------------------------------------- data mixing

# multiplicative hash for deterministic sampling: doc_id * A % 100 gives
# a uniform-enough, engine-exact pseudo-percentile. A is the MINSTD
# multiplier; int64 cannot overflow for doc_id < 2^63/48271 ≈ 1.9e14
# (documented bound — ids are sequence numbers, far below).
_MIX_A = 48271


def mix_sample(
    docs,
    rates: dict[str, int],
    *,
    key_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: int = 0,
):
    """Deterministic stratified sampling / data mixing: keep a document
    iff ``(doc_id * 48271) % 100 < rates[lang]`` — the per-category
    mixture-weights idiom of training-corpus assembly, with a
    seed-free, engine-exact keep rule (pure int64 math, identical in
    SQL). One stateless vectorized filter; no shuffle, no RNG state —
    re-runs and resumes keep exactly the same rows."""

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pctl = (ids * _MIX_A) % 100
        langs = t[key_col].to_numpy(zero_copy_only=False)
        thresh = np.asarray(
            [rates.get(v, default_rate) for v in langs], dtype=np.int64
        )
        return t.filter(pa.array(pctl < thresh))

    return docs.map_batches(keep, batch_format="pyarrow")


# ----------------------------------------------------- corpus TF / DF


def doc_freq(docs, *, col: str = "text", min_df: int = 5):
    """Corpus term statistics for TF-IDF weighting: per token, total
    occurrences (tf) and document frequency (df = docs containing it),
    filtered to ``df >= min_df``. Integer outputs (idf = log(N/df) is a
    trivial driver-side map; kept out so the result is bit-exact).

    Combiner shape twice over: each batch emits value_counts partials
    for tf (all tokens) and df (per-document DISTINCT tokens — distinct
    within a row, so no cross-batch state), then ONE uniform groupby on
    the token merges both. No reducer ever sees raw token streams."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        text = t[col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.utf8_split_whitespace(text)
        tf_vc = pc.list_flatten(toks).value_counts()
        df_vc = pc.list_flatten(_distinct_per_list(toks)).value_counts()
        tf_t = pa.table(
            {
                "token": tf_vc.field("values"),
                "_tf": pc.cast(tf_vc.field("counts"), pa.int64()),
                "_df": pa.nulls(len(tf_vc), pa.int64()),
            }
        )
        df_t = pa.table(
            {
                "token": df_vc.field("values"),
                "_tf": pa.nulls(len(df_vc), pa.int64()),
                "_df": pc.cast(df_vc.field("counts"), pa.int64()),
            }
        )
        return pa.concat_tables([tf_t, df_t])

    partials = docs.map_batches(partial, batch_format="pyarrow")
    merged = partials.groupby("token").aggregate(
        Sum("_tf", alias_name="tf"), Sum("_df", alias_name="df")
    )
    return merged.filter(expr=f"df >= {min_df}")


def _distinct_per_list(toks: pa.ListArray) -> pa.ListArray:
    """Row-wise distinct of a list<string> column (Arrow has no kernel
    for this; pandas unique per row is the fallback — bounded by tokens
    per document, not corpus size)."""
    vals = toks.to_pylist()
    return pa.array(
        [None if v is None else list(dict.fromkeys(v)) for v in vals],
        type=pa.list_(pa.string()),
    )


# -------------------------------------------------------- repetition

# reuse the shingle word-hash family so gram identity is deterministic
# across processes (collisions within one document merge two gram
# counts — ~grams²/2⁶⁴, negligible)
_REP_HASH_KEY = "otelray-shingles"
_REP_FNV = np.uint64(0x100000001B3)


def repetition_batch(
    batch: pa.Table, *, id_col: str = "doc_id", col: str = "text"
) -> pa.Table:
    """Gopher-style repetition signal: the dominant word-2-gram's share
    of all 2-gram occurrences per document (high share ⇒ boilerplate /
    degenerate repetition — a standard web-corpus quality gate). One
    vectorized pass: flat word hashes → rolling 2-gram combine →
    lexsort + run-length counts → per-doc segment max. No per-gram
    Python, no per-doc loop. Docs with < 2 words emit nothing."""
    import pandas as _pd

    texts = batch[col].to_pylist()
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "max_2gram": pa.array([], type=pa.int64()),
            "n_2grams": pa.array([], type=pa.int64()),
            "top_2gram_frac": pa.array([], type=pa.float64()),
        }
    )
    if not texts:
        return empty
    words_per_doc = [t.split() if t is not None else [] for t in texts]
    counts = np.fromiter(
        (len(w) for w in words_per_doc), np.int64, count=len(texts)
    )
    flat_words = [w for ws in words_per_doc for w in ws]
    if not flat_words:
        return empty
    wh = _pd.util.hash_array(
        np.asarray(flat_words, dtype=object), hash_key=_REP_HASH_KEY
    )
    m = len(wh) - 1
    if m <= 0:
        return empty
    acc = wh[:m] * _REP_FNV ^ wh[1:]
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    valid = doc_idx[:m] == doc_idx[1:]
    gh, gd = acc[valid], doc_idx[:m][valid]
    if not len(gh):
        return empty
    order = np.lexsort((gh, gd))
    gh, gd = gh[order], gd[order]
    run_start = np.r_[True, (gh[1:] != gh[:-1]) | (gd[1:] != gd[:-1])]
    starts = np.nonzero(run_start)[0]
    run_len = np.diff(np.r_[starts, len(gh)])
    run_doc = gd[starts]
    # per-doc max over its runs (runs are doc-contiguous after the sort)
    doc_start = np.r_[True, run_doc[1:] != run_doc[:-1]]
    seg = np.nonzero(doc_start)[0]
    max_per_doc = np.maximum.reduceat(run_len, seg)
    out_docs = run_doc[seg]
    totals = np.bincount(gd, minlength=len(texts))[out_docs]
    return pa.table(
        {
            id_col: pa.array(ids[out_docs], type=pa.int64()),
            "max_2gram": pa.array(max_per_doc, type=pa.int64()),
            "n_2grams": pa.array(totals, type=pa.int64()),
            "top_2gram_frac": pa.array(
                max_per_doc.astype(np.float64) / totals.astype(np.float64),
                type=pa.float64(),
            ),
        }
    )


# --------------------------------------------------- unigram LM score

import pandas as _pd  # noqa: E402  (module-level: worker-safe)
import ray.data  # noqa: E402,F401

pd = _pd  # single import, both historical aliases point at it

from ..functions.shard import mult_hash  # noqa: E402


def build_unigram_lm(docs, *, top: int = 10_000):
    """Fit a unigram language model from the corpus itself: top-k token
    frequencies (the combiner-shaped ``vocab_topk``) → log-probabilities
    plus an out-of-vocabulary floor of log(1/total). Returns the plain
    (tokens, logprobs, oov) tuple — `ray.put` it once and hand the ref
    to ``LMScoreStage`` (model broadcast once, never per batch)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.list_flatten(pc.utf8_split_whitespace(text))
        vc = toks.value_counts()
        return pa.table(
            {
                "token": vc.field("values"),
                "_pc": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    counts_ds = docs.map_batches(partial, batch_format="pyarrow").groupby(
        "token"
    ).aggregate(Sum("_pc", alias_name="n"))

    # the model must fit the driver anyway (it is broadcast), so skip
    # the global sort shuffle: deterministic blockwise partial top-k,
    # tiny driver merge — O(top × blocks) driver rows
    def block_top(t: pa.Table) -> pa.Table:
        if len(t) <= top:
            return t
        df = t.to_pandas().sort_values(
            ["n", "token"], ascending=[False, True], kind="mergesort"
        )
        return pa.Table.from_pandas(df.head(top), preserve_index=False)

    pdf = (
        counts_ds.map_batches(block_top, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["n", "token"], ascending=[False, True], kind="mergesort")
        .head(top)
    )
    total = float(pdf["n"].sum())
    logp = np.log(pdf["n"].to_numpy(dtype=np.float64) / total)
    return (
        pdf["token"].to_numpy(dtype=object),
        logp,
        float(np.log(1.0 / total)),
    )


class LMScoreStage:
    """Quality scoring by unigram LM likelihood — the batched
    model-inference archetype: the 'model' (token→logprob table) is
    resolved from its broadcast ObjectRef ONCE per actor in
    ``__init__``; ``__call__`` scores each document as the mean token
    log-probability (higher = more natural relative to the corpus;
    degenerate/gibberish text scores near the OOV floor). Vectorized:
    one flat token map per batch + segment sums, no per-doc loop.
    Emits ``lm_score`` (float64) and ``n_oov`` (int64)."""

    def __init__(self, vocab_ref):
        import ray as _ray

        state = (
            _ray.get(vocab_ref)
            if isinstance(vocab_ref, _ray.ObjectRef)
            else vocab_ref
        )
        tokens, logp, oov = state
        self.lookup = _pd.Series(logp, index=tokens)
        self.oov = oov

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        words_per_doc = [t.split() if t is not None else [] for t in texts]
        counts = np.fromiter(
            (len(w) for w in words_per_doc), np.int64, count=len(texts)
        )
        flat = [w for ws in words_per_doc for w in ws]
        offsets = np.zeros(len(texts) + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        if flat:
            lp = (
                _pd.Series(np.asarray(flat, dtype=object))
                .map(self.lookup)
                .to_numpy(dtype=np.float64, na_value=np.nan)
            )
            oov_mask = np.isnan(lp)
            lp[oov_mask] = self.oov
            sums = np.add.reduceat(
                np.r_[lp, 0.0], np.minimum(offsets[:-1], len(lp))
            )
            sums[counts == 0] = 0.0
            oovs = np.add.reduceat(
                np.r_[oov_mask.astype(np.int64), 0],
                np.minimum(offsets[:-1], len(lp)),
            )
            oovs[counts == 0] = 0
        else:
            sums = np.zeros(len(texts))
            oovs = np.zeros(len(texts), dtype=np.int64)
        score = np.where(counts > 0, sums / np.maximum(counts, 1), self.oov)
        return batch.append_column(
            "lm_score", pa.array(score, type=pa.float64())
        ).append_column("n_oov", pa.array(oovs, type=pa.int64()))


# ---------------------------------------------------------- chunking


def chunk_batch(
    batch: pa.Table,
    *,
    id_col: str = "doc_id",
    col: str = "text",
    size: int = 50,
    stride: int = 40,
) -> pa.Table:
    """Document chunking for context-window / embedding pipelines: each
    doc explodes into token windows of ``size`` tokens starting every
    ``stride`` tokens (overlap = size - stride). Stateless flat-map row
    explosion — chunks of one doc never cross batch boundaries, so the
    stage shuffles nothing and parallelism is free. Empty docs emit no
    chunks. Output: (doc_id, chunk_idx, chunk_text, n_chunk_tokens).

    Vectorized in Arrow: one split per batch, then per chunk-index k a
    ``list_slice`` + ``binary_join`` over EVERY doc that still has a
    k-th window — the loop runs max-chunks-per-doc times (tiny), never
    per row. Trim first: Arrow's split emits empty tokens for
    leading/trailing whitespace (Python's ``split()`` does not)."""
    text = batch[col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(text))
    ntok = pc.fill_null(
        pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64()), 0
    ).to_numpy(zero_copy_only=False)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    parts: list[pa.Table] = []
    k = 0
    while True:
        start = k * stride
        mask = ntok > start
        if not mask.any():
            break
        m = pa.array(mask)
        joined = pc.binary_join(
            pc.list_slice(toks.filter(m), start, start + size), " "
        )
        n_in = np.minimum(ntok[mask] - start, size)
        parts.append(
            pa.table(
                {
                    id_col: pa.array(ids[mask], type=pa.int64()),
                    "chunk_idx": pa.array(
                        np.full(int(mask.sum()), k), type=pa.int64()
                    ),
                    "chunk_text": pc.cast(joined, pa.string()),
                    "n_chunk_tokens": pa.array(n_in, type=pa.int64()),
                }
            )
        )
        k += 1
    if not parts:
        return pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "chunk_idx": pa.array([], type=pa.int64()),
                "chunk_text": pa.array([], type=pa.string()),
                "n_chunk_tokens": pa.array([], type=pa.int64()),
            }
        )
    return pa.concat_tables(parts).sort_by(
        [(id_col, "ascending"), ("chunk_idx", "ascending")]
    )


# ----------------------------------------------------------- packing


def pack_sequences(
    docs,
    *,
    budget: int = 2048,
    id_col: str = "doc_id",
    col: str = "text",
    shards: int = 64,
):
    """Training-sample sequence packing: greedily concatenate documents
    into packs of at most ``budget`` tokens (an oversized single doc
    gets its own pack) — the sample-efficiency step before batching a
    next-token training run.

    Determinism without a global order: docs are hash-sharded (the
    usual sharded groupby), packing runs greedily over each shard in
    doc_id order, and pack ids are ``shard * 2^32 + seq`` — so the
    result is a pure function of the corpus, independent of block
    layout or parallelism, and re-runs/resumes produce identical packs.
    Packing quality is within (shards/corpus)·budget of the sequential
    greedy baseline; at scale that is the right trade for a
    shuffle-free deterministic operator. ``shards`` is the partition
    knob: one shard's (doc_id, n_tokens) pairs must fit a worker
    (~16 B/doc ⇒ ~10M docs ≈ 160 MB per shard) — raise it with corpus
    size. Deliberately NOT auto-scaled (unlike ``sharded_group_map``'s
    default): the shard count is part of the pack-id definition, so an
    auto value would make pack assignment vary with cluster/estimate
    drift and break the determinism/resume contract — callers pick it
    per corpus and keep it fixed. Output: one row per pack —
    (pack_id, n_docs, n_tokens, doc_ids list)."""
    def per_shard(g: _pd.DataFrame) -> _pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        shard = int(g["_shard_id"].iloc[0])
        ids = g[id_col].to_numpy()
        ntok = g["_ntok"].to_numpy()
        packs: list[tuple[list[int], int]] = []
        cur: list[int] = []
        cur_n = 0
        for d, n in zip(ids, ntok):
            if cur and cur_n + n > budget:
                packs.append((cur, cur_n))
                cur, cur_n = [], 0
            cur.append(int(d))
            cur_n += int(n)
        if cur:
            packs.append((cur, cur_n))
        return _pd.DataFrame(
            {
                "pack_id": [
                    (shard << 32) + i for i in range(len(packs))
                ],
                "n_docs": [len(p) for p, _ in packs],
                "n_tokens": [n for _, n in packs],
                "doc_ids": [p for p, _ in packs],
            }
        )

    def tokenize(t: pa.Table) -> pa.Table:
        text = t[col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = pc.fill_null(
            pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64()), 0
        )
        return pa.table({id_col: t[id_col], "_ntok": n})

    sized = docs.map_batches(tokenize, batch_format="pyarrow")

    # the shard id must be visible inside per_shard for pack-id
    # derivation — re-tag it as a data column
    from ..functions.shard import shard_column

    tagged = sized.map_batches(
        lambda t: shard_column(t, [id_col], shards, out="_shard_id"),
        batch_format="pyarrow",
    )
    # group count is exactly `shards` (bounded) — a plain map_groups is
    # the right shape here, one vectorized pack pass per shard
    return tagged.groupby("_shard_id").map_groups(
        per_shard, batch_format="pandas"
    )


# ------------------------------------------------- BPE-ish tokenizer

# GPT-2-style pretokenizer classes, RE2-safe (no lookahead): letter
# runs, digit runs, punctuation runs — each optionally absorbing its
# leading space. This is the budget/estimation tokenizer of corpus
# pipelines (real BPE merges happen in the trainer; the pretoken count
# is the standard size proxy).
BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def bpe_token_count_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append ``n_bpe_tokens`` (GPT-2-ish pretokens) beside
    ``n_ws_tokens`` (whitespace runs) — both one vectorized RE2 count
    per batch, both DuckDB-mirrorable exactly."""
    text = batch[col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    bpe = pc.cast(pc.count_substring_regex(text, BPE_PATTERN), pa.int64())
    ws = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
    return batch.append_column("n_bpe_tokens", bpe).append_column(
        "n_ws_tokens", ws
    )


# ------------------------------------------- CCNet perplexity buckets


def perplexity_buckets(
    scored,
    *,
    lang_col: str = "lang",
    score_col: str = "lm_score",
    quant: float = 10_000.0,
):
    """The CCNet head/middle/tail split (Wenzek et al. 2020,
    arXiv:1911.00359): partition each language's documents into
    perplexity terciles — 'head' = most-probable third under the LM,
    'tail' = least. Works on any scored dataset carrying
    (lang, score) where HIGHER score = lower perplexity.

    Shape: per-batch partial histograms over integer-quantized scores
    (floor(score·quant)) merge through one tiny (lang × bins) groupby;
    the driver walks the cumulative counts per language (tiny) to find
    the tercile bin thresholds, then a stateless broadcast pass assigns
    buckets by comparing the SAME quantized integer — engine-exact, no
    float boundary ambiguity, two streaming passes, no corpus sort
    (a global per-lang sort is the naive alternative and is exactly the
    all-to-all this avoids)."""
    import ray as _ray
    from ray.data.aggregate import Sum

    def quantize(t: pa.Table) -> pa.Table:
        s = t[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column(
            "_qbin",
            pa.array(np.floor(s * quant).astype(np.int64), type=pa.int64()),
        )

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({lang_col: t[lang_col], "_qbin": t["_qbin"]})
            .group_by([lang_col, "_qbin"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns([lang_col, "_qbin", "_pn"])

    hist = (
        scored.map_batches(quantize, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
        .groupby([lang_col, "_qbin"])
        .aggregate(Sum("_pn", alias_name="n"))
        .to_pandas()
    )
    thresholds: dict[str, tuple[int, int]] = {}
    for lang, g in hist.groupby(lang_col):
        g = g.sort_values("_qbin", kind="mergesort")
        cum = g["n"].cumsum().to_numpy()
        total = cum[-1]
        bins = g["_qbin"].to_numpy()
        # lowest-score third below b33, top third at/above b66
        b33 = int(bins[np.searchsorted(cum, (total + 2) // 3)])
        b66 = int(bins[np.searchsorted(cum, (2 * total + 2) // 3)])
        thresholds[lang] = (b33, b66)
    thr_ref = _ray.put(thresholds)

    def assign(t: pa.Table) -> pa.Table:
        thr = thr_ref
        if isinstance(thr, _ray.ObjectRef):
            thr = _ray.get(thr)
        langs = _pd.Series(t[lang_col].to_numpy(zero_copy_only=False))
        qb = t["_qbin"].to_numpy(zero_copy_only=False)
        lo = (
            langs.map({k: v[0] for k, v in thr.items()})
            .fillna(0)
            .to_numpy(np.int64)
        )
        hi = (
            langs.map({k: v[1] for k, v in thr.items()})
            .fillna(0)
            .to_numpy(np.int64)
        )
        bucket = np.where(qb > hi, "head", np.where(qb > lo, "middle", "tail"))
        out = t.drop_columns(["_qbin"])
        return out.append_column(
            "ppl_bucket", pa.array(bucket.astype(object), type=pa.string())
        )

    return scored.map_batches(quantize, batch_format="pyarrow").map_batches(
        assign, batch_format="pyarrow"
    )


# -------------------------------------- temperature-weighted mixing


def temperature_mix(docs, *, key_col: str = "source", id_col: str = "doc_id"):
    """Temperature-based source rebalancing (the multilingual/domain
    sampling idiom, e.g. multilingual BERT's exponent-smoothed rates;
    temperature T=2 ⇒ keep rate ∝ (n_min/n_s)^(1/2)): down-sample large
    sources toward the smallest one so kept counts go as
    sqrt(n_min · n_s). Deterministic and engine-exact: sqrt is
    correctly-rounded IEEE (identical in DuckDB and numpy), the
    per-source rate is floored to basis points once, and the per-row
    keep rule is the seed-free integer test
    ``(doc_id · 48271) % 10000 < rate_bp[source]`` — resumes and
    re-runs keep exactly the same rows.

    Shape: one tiny uniform groupby for source counts (combiner-sized —
    sources are few), rates computed on the driver, broadcast in the
    closure, then a stateless vectorized filter. No shuffle of the
    corpus itself."""
    from ray.data.aggregate import Sum

    from ..functions.shard import NULL_KEY, fill_null_key

    def partial(t: pa.Table) -> pa.Table:
        # null keys ride the sentinel through the Ray groupby (its
        # sort can't mix None and str); the NULL group still counts
        # toward n_min — SQL GROUP BY keeps it — but gets no rate
        # entry, mirroring the oracle's `JOIN r USING (key)` which
        # drops NULL-key rows
        g = (
            fill_null_key(pa.table({key_col: t[key_col]}), key_col)
            .group_by([key_col])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns([key_col, "_pn"])

    counts = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("_pn", alias_name="n"))
        .to_pandas()
    )
    n_min = float(counts["n"].min())
    rates = {
        r[key_col]: int(np.floor(10000.0 * np.sqrt(n_min / float(r["n"]))))
        for _, r in counts.iterrows()
        if r[key_col] != NULL_KEY
    }

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pctl = (ids * _MIX_A) % 10000
        keys = t[key_col].to_numpy(zero_copy_only=False)
        thresh = np.asarray(
            [rates.get(v, 0) for v in keys], dtype=np.int64
        )
        return t.filter(pa.array(pctl < thresh))

    return docs.map_batches(keep, batch_format="pyarrow")


def tfidf_top_terms(
    docs: ray.data.Dataset,
    *,
    col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_df: int = 1,
) -> ray.data.Dataset:
    """Top-k TF-IDF terms per document. Scoring is INTEGER-exact so it
    is bit-stable across engines: ``score = (tf · 1e6 · N) // df`` —
    monotone in tf/df exactly like tf·log-idf for ranking purposes,
    with floor division mirroring SQL ``//``. Ranking tie-break is
    (score desc, token asc), 1-based rank.

    Two streaming passes: (1) `doc_freq` combiner → df table on the
    driver (bounded by vocabulary, prunable via ``min_df``), broadcast
    once; (2) per-batch tf + score + per-doc top-k — documents never
    cross batches, so the second pass needs ZERO shuffle."""
    import ray as _ray

    n_docs = docs.count()
    df_tbl = doc_freq(docs, col=col, min_df=min_df).to_pandas()
    df_ref = _ray.put(
        dict(zip(df_tbl["token"].tolist(), df_tbl["df"].tolist()))
    )

    def per_batch(t: pa.Table) -> pd.DataFrame:
        lookup = _ray.get(df_ref)
        text = t[col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        # null → "" and drop the empty tokens Arrow's split emits for
        # padded/empty text — the oracle's regexp \S+ never sees them
        text = pc.fill_null(text, "")
        toks = pc.utf8_split_whitespace(text)  # same tokenizer as doc_freq
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        tok_flat = toks.flatten().to_numpy(zero_copy_only=False)
        ids_flat = np.repeat(
            t[id_col].to_numpy(zero_copy_only=False), counts
        )
        nonempty = tok_flat != ""
        flat = pd.DataFrame(
            {id_col: ids_flat[nonempty], "token": tok_flat[nonempty]}
        )
        tf = (
            flat.groupby([id_col, "token"], sort=False)
            .size()
            .rename("tf")
            .reset_index()
        )
        dfv = tf["token"].map(lookup)
        tf = tf[dfv.notna()]
        dfv = dfv[dfv.notna()].astype(np.int64)
        score = (
            tf["tf"].to_numpy(dtype=np.int64) * 1_000_000 * n_docs
        ) // dfv.to_numpy()
        tf = tf.assign(score=score)
        tf = tf.sort_values(
            [id_col, "score", "token"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        tf["rank"] = tf.groupby(id_col, sort=False).cumcount() + 1
        out = tf[tf["rank"] <= k].reset_index(drop=True)
        return out.astype({"tf": "int64", "score": "int64", "rank": "int64"})

    return docs.map_batches(per_batch, batch_format="pyarrow")


def stratified_take(
    ds: ray.data.Dataset,
    *,
    group: str,
    id_col: str,
    n: int,
) -> ray.data.Dataset:
    """Deterministic fixed-n per-stratum sampling ("take n docs per
    language"): rows ranked inside each stratum by a seed-free
    multiplicative hash of the id (Knuth 2654435761 mod 2³²; exact in
    int64 while id < 3.5e9 — mirrorable as plain SQL arithmetic), ties
    by id; the first n win. Rate-free complement to `mix_sample`.

    Scale shape = `topk_per_group`: per-batch partial top-n, only
    O(strata·n·blocks) rows reach the shuffle. Output keeps all
    columns + the hash ``h`` and 1-based ``rank``."""
    from .window2 import topk_per_group

    def derive(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = mult_hash(ids)
        return t.append_column("h", pa.array(h, pa.int64())).append_column(
            "_hneg", pa.array(-h, pa.int64())
        )

    tagged = ds.map_batches(derive, batch_format="pyarrow")
    out = topk_per_group(
        tagged, group=group, order_by="_hneg", tiebreak=id_col, k=n
    )
    return out.map_batches(
        lambda df: df.drop(columns=["_hneg"]), batch_format="pandas"
    )


def cooccurrence_counts(
    docs: ray.data.Dataset,
    *,
    col: str = "text",
    vocab_k: int = 100,
    min_n: int = 1,
) -> _pd.DataFrame:
    """Token co-occurrence statistics over the top-``vocab_k``
    vocabulary: for every ordered token pair (a < b), the number of
    documents containing BOTH — the input to PMI/word-vector-style
    corpus analysis.

    Textbook mergeable-partial shape: the vocabulary is fixed first
    (`vocab_topk`, tiny, broadcast); each batch builds its docs×V
    0/1 membership matrix and emits ONE V×V count matrix ``MᵀM``
    (BLAS); partials merge by elementwise sum — V² floats per block
    through the merge, never a pair explosion. Diagonal = per-token
    document frequency (kept as a consistency handle)."""
    import ray as _ray

    vocab = vocab_topk(docs, col=col, k=vocab_k).to_pandas()
    # deterministic order: same (n desc, token asc) as vocab_topk
    tokens = vocab["token"].tolist()
    index = {t: i for i, t in enumerate(tokens)}
    v = len(tokens)
    idx_ref = _ray.put(index)

    def partial(t: pa.Table) -> pa.Table:
        lookup = _ray.get(idx_ref)
        text = t[col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.utf8_split_whitespace(pc.fill_null(text, ""))
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(t)), counts)
        nonempty = flat != ""
        flat, doc_idx = flat[nonempty], doc_idx[nonempty]
        col_idx = (
            _pd.Series(flat).map(lookup).fillna(-1).to_numpy(dtype=np.int64)
        )
        keep = col_idx >= 0
        m = np.zeros((len(t), v), dtype=np.float32)
        m[doc_idx[keep], col_idx[keep]] = 1.0
        cm = m.T @ m  # V×V document co-occurrence partial
        return pa.table({"_cm": pa.array([cm.tobytes()], type=pa.binary())})

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    # float64 accumulator: per-BLOCK counts stay < 2^24 (float32-exact)
    # but the cross-block total must not hit float32's integer ceiling
    total = np.zeros((v, v), dtype=np.float64)
    for blob in parts["_cm"]:
        total += np.frombuffer(blob, dtype=np.float32).reshape(v, v)
    ia, ib = np.nonzero(np.triu(total, k=1) >= min_n)
    tok_arr = np.asarray(tokens, dtype=object)
    # pair order is LEXICOGRAPHIC on the token strings (the SQL-mirror
    # convention), not vocab-index order
    a0, b0 = tok_arr[ia], tok_arr[ib]
    swap = a0 > b0
    a0[swap], b0[swap] = b0[swap], a0[swap].copy()
    return _pd.DataFrame(
        {
            "token_a": a0,
            "token_b": b0,
            "n_docs": total[ia, ib].astype(np.int64),
        }
    ).sort_values(["token_a", "token_b"], kind="mergesort").reset_index(
        drop=True
    )


def budget_select(
    docs: ray.data.Dataset,
    *,
    group: str = "source",
    weight: str = "n_chars",
    id_col: str = "doc_id",
    budget: int,
    buckets: int = 4096,
) -> ray.data.Dataset:
    """Exact per-group budget selection without a global sort: walk
    each group's docs in seed-free hash order (same multiplicative hash
    as `stratified_take`, tie → id) and keep a doc iff the running
    weight total BEFORE it is still under ``budget`` — the
    token/char-budget curation idiom ("take ~50B chars per source").

    Distributed-prefix shape: (1) per-batch partial sums per (group,
    hash-bucket) → tiny combiner groupby → the driver prefix-sums each
    group's bucket histogram to find its cutoff bucket; (2) only the
    cutoff buckets' rows (≈ corpus/``buckets`` — size the knob to the
    corpus) are collected to find each group's exact boundary (h, id)
    pair; (3) a stateless broadcast filter keeps rows strictly below
    the boundary. Three streaming passes, no corpus shuffle, exact."""
    import ray as _ray

    from ray.data.aggregate import Sum

    from ..functions.shard import NULL_KEY

    shift = max(32 - int(np.log2(buckets)), 0)

    def tag(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = mult_hash(ids)
        # internal sentinel group key: SQL PARTITION BY keeps a NULL
        # group, but Ray's sort shuffle and the driver dicts below
        # can't mix None with str — the REAL group column stays
        # untouched in the output
        gk = pc.fill_null(t[group], NULL_KEY)
        return (
            t.append_column("h", pa.array(h, pa.int64()))
            .append_column("_bk", pa.array(h >> shift, pa.int64()))
            .append_column("_gk", gk)
        )

    tagged = docs.map_batches(tag, batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"_gk": t["_gk"], "_bk": t["_bk"], "_w": t[weight]})
            .group_by(["_gk", "_bk"])
            .aggregate([("_w", "sum")])
        )
        return g.rename_columns(["_gk", "_bk", "_ws"])

    hist = (
        tagged.map_batches(partial, batch_format="pyarrow")
        .groupby(["_gk", "_bk"])
        .aggregate(Sum("_ws", alias_name="w"))
        .to_pandas()
        .sort_values(["_gk", "_bk"], kind="mergesort")
    )
    # per group: cutoff bucket = first bucket where cum weight >= budget
    cutoffs: dict = {}
    for gval, sub in hist.groupby("_gk", sort=False):
        cum = sub["w"].cumsum()
        over = cum >= budget
        if not over.any():
            continue  # whole group fits the budget
        i = int(np.argmax(over.to_numpy()))
        before = int(cum.iloc[i - 1]) if i > 0 else 0
        cutoffs[gval] = (int(sub["_bk"].iloc[i]), before)

    if cutoffs:
        cut_ref = _ray.put(cutoffs)

        def in_cut(t: pa.Table) -> pa.Table:
            cuts = _ray.get(cut_ref)
            gv = _pd.Series(t["_gk"].to_numpy(zero_copy_only=False))
            bk = t["_bk"].to_numpy(zero_copy_only=False)
            want = (
                gv.map({g: c[0] for g, c in cuts.items()})
                .fillna(-1)
                .to_numpy(dtype=np.int64)
            )
            return t.filter(pa.array(bk == want))

        edge = (
            tagged.map_batches(in_cut, batch_format="pyarrow")
            .select_columns(["_gk", "h", id_col, weight])
            .to_pandas()
            .sort_values(["_gk", "h", id_col], kind="mergesort")
        )
        # exact boundary inside the cutoff bucket: first DROPPED (h, id)
        bounds: dict = {}
        for gval, sub in edge.groupby("_gk", sort=False):
            before = cutoffs[gval][1]
            run = before + sub[weight].cumsum().shift(fill_value=0)
            dropped = sub[run >= budget]
            if len(dropped):
                bounds[gval] = (
                    cutoffs[gval][0],
                    int(dropped["h"].iloc[0]),
                    int(dropped[id_col].iloc[0]),
                )
            else:
                # budget boundary fell exactly at this bucket's end:
                # keep the whole bucket, drop every later one
                bounds[gval] = (cutoffs[gval][0] + 1, -1, -1)
        bound_ref = _ray.put(bounds)
    else:
        bound_ref = _ray.put({})

    BIG = np.int64(1) << 62  # groups with no boundary keep everything

    def keep(t: pa.Table) -> pa.Table:
        bnds = _ray.get(bound_ref)
        gv = _pd.Series(t["_gk"].to_numpy(zero_copy_only=False))
        bk = t["_bk"].to_numpy(zero_copy_only=False)
        h = t["h"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        cb = gv.map({g: b[0] for g, b in bnds.items()}).fillna(BIG).to_numpy(
            dtype=np.int64
        )
        hb = gv.map({g: b[1] for g, b in bnds.items()}).fillna(BIG).to_numpy(
            dtype=np.int64
        )
        ib = gv.map({g: b[2] for g, b in bnds.items()}).fillna(BIG).to_numpy(
            dtype=np.int64
        )
        mask = (bk < cb) | (
            (bk == cb) & ((h < hb) | ((h == hb) & (ids < ib)))
        )
        return t.filter(pa.array(mask)).drop_columns(["_bk", "_gk"])

    return tagged.map_batches(keep, batch_format="pyarrow")


SENTENCE_SPLIT_PATTERN = r"[.!?]+\s+"  # RE2-safe (no lookbehind) — the
# terminator run is consumed; mirrored verbatim by string_split_regex


def sentence_split_batch(
    batch: pa.Table, *, id_col: str = "doc_id", col: str = "text"
) -> pa.Table:
    """Sentence segmentation — explode each document into trimmed,
    non-empty sentences (one RE2 split per batch + flatten; stateless
    flat-map, zero shuffle). Output: (id, sentence)."""
    text = batch[col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    parts = pc.split_pattern_regex(
        pc.fill_null(text, ""), SENTENCE_SPLIT_PATTERN
    )
    counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
    ids = np.repeat(
        batch[id_col].to_numpy(zero_copy_only=False), counts
    )
    # DuckDB trim() strips SPACES only — mirror it exactly (a
    # unicode-whitespace trim would silently diverge on \n / \t)
    flat = pc.utf8_trim(parts.flatten(), " ")
    keep = pc.greater(pc.utf8_length(flat), 0)
    t = pa.table(
        {id_col: pa.array(ids, pa.int64()), "sentence": flat}
    )
    return t.filter(keep)


def dedup_lines_batch(
    batch: pa.Table, *, id_col: str = "doc_id", col: str = "text"
) -> pa.Table:
    """Within-document line deduplication (the C4-style cleaning rule:
    drop repeated lines inside a doc, keeping first occurrence and
    order). Stateless per batch — docs never span batches, so the
    stage shuffles nothing. Vectorized: explode lines once, mark first
    occurrences via a pandas duplicated() over (doc, line), rebuild
    each doc with one list-join kernel. Output adds ``text_dedup`` and
    ``n_dropped_lines``."""
    batch = batch.filter(pc.is_valid(batch[col]))  # SQL unnest drops NULL docs
    text = batch[col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lines = pc.split_pattern(text, "\n")
    counts = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(batch)), counts)
    flat = lines.flatten().to_numpy(zero_copy_only=False)
    firsts = ~_pd.DataFrame({"d": doc_idx, "l": flat}).duplicated().to_numpy()
    kept_counts = np.bincount(doc_idx[firsts], minlength=len(batch))
    offsets = np.r_[0, np.cumsum(kept_counts)].astype(np.int32)
    rebuilt = pc.binary_join(
        pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(flat[firsts], pa.string())
        ),
        "\n",
    )
    dropped = (counts - kept_counts).astype(np.int64)
    return batch.append_column(
        "text_dedup", pc.cast(rebuilt, pa.string())
    ).append_column("n_dropped_lines", pa.array(dropped, pa.int64()))


def trending_terms(
    ds: ray.data.Dataset,
    *,
    group: str,
    col: str = "text",
    k: int = 5,
) -> ray.data.Dataset:
    """Windowed vocabulary: top-k tokens per group (per day, per
    source, …) — the trending-terms analytics idiom. Per-batch
    (group, token) value_counts partials (Arrow), one uniform groupby
    sum, then the combiner top-k (`topk_per_group`) with (n desc,
    token asc) ties. Only O(groups·k·blocks) rows cross the final
    shuffle."""
    from ray.data.aggregate import Sum

    from .window2 import topk_per_group

    def partial(t: pa.Table) -> pa.Table:
        # pure-Arrow partial: list_flatten + parent_indices + a C++
        # group_by (the pandas groupby-per-batch form was the query's
        # hot spot — 3.8 s → Arrow kernels at sf0.1)
        text = t[col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        gcol = t[group]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        toks = pc.utf8_split_whitespace(pc.fill_null(text, ""))
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        tbl = pa.table(
            {group: gcol.take(parents), "token": flat}
        ).filter(pc.not_equal(flat, ""))
        g = tbl.group_by([group, "token"]).aggregate([([], "count_all")])
        return g.rename_columns([group, "token", "_pc"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    counts = partials.groupby([group, "token"]).aggregate(
        Sum("_pc", alias_name="n")
    )
    return topk_per_group(
        counts, group=group, order_by="n", tiebreak="token", k=k
    )


def cross_doc_line_dedup(
    docs: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    col: str = "text",
    min_docs: int = 3,
) -> "ray.data.Dataset":
    """Corpus-level boilerplate line removal — the C4 policy-line rule
    generalized across documents: a line that appears in at least
    ``min_docs`` DISTINCT documents is boilerplate (cookie banners,
    license headers) and is removed from EVERY document, keeping the
    surviving lines' order.

    Shape (two streaming passes, no all-pairs step):
    1. explode lines, per-batch distinct (line, doc) combiner, sharded
       distinct + per-line doc count (the `distinct_users` two-phase
       form — no reducer holds one line's full row set),
    2. frequent lines (count >= min_docs) are a TINY set by
       construction (boilerplate), broadcast once via ray.put; each
       batch drops members with one C++ `is_in` and rebuilds docs with
       one list-join kernel. Exact — counting groups by the full line
       string, never a hash, so no collision can drop an innocent line.
    Output adds ``text_clean`` and ``n_boilerplate_lines``.
    """
    import ray as _ray

    from ..functions.agg import grouped_count
    from ..functions.shard import sharded_group_map

    def _lines(batch: pa.Table):
        batch = batch.filter(pc.is_valid(batch[col]))
        text = batch[col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        return batch, pc.split_pattern(text, "\n")

    def pair_partial(t: pa.Table) -> pa.Table:
        id_type = t.schema.field(id_col).type
        t, lines = _lines(t)
        flat = pc.list_flatten(lines)
        parents = pc.list_parent_indices(lines)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if len(flat) == 0:
            # typed empty — an empty group_by block can surface
            # schema-less and break the downstream shard hash
            return pa.table(
                {
                    "line": pa.array([], type=pa.string()),
                    id_col: pa.array([], type=id_type),
                }
            )
        pairs = pa.table({"line": flat, id_col: ids.take(parents)})
        return pairs.group_by(["line", id_col]).aggregate([])

    pairs = docs.map_batches(pair_partial, batch_format="pyarrow")
    distinct = sharded_group_map(
        pairs, ["line"], lambda g: g.drop_duplicates(["line", id_col])
    )
    counts = grouped_count(distinct, ["line"], alias="n_docs")
    frequent = counts.map_batches(
        lambda t: t.filter(
            pc.greater_equal(t["n_docs"], min_docs)
        ).select(["line"]),
        batch_format="pyarrow",
    ).to_pandas()
    # a fully-filtered dataset can surface ZERO-block (to_pandas has no
    # columns — the CLAUDE.md empty-aggregate trap); normalize here
    freq_vals = (
        frequent["line"] if "line" in frequent.columns else []
    )
    fref = _ray.put(pa.array(freq_vals, type=pa.string()))

    def clean(t: pa.Table) -> pa.Table:
        freq = _ray.get(fref)
        t, lines = _lines(t)
        n = len(t)
        flat = pc.list_flatten(lines)
        parents = pc.list_parent_indices(lines).to_numpy(
            zero_copy_only=False
        )
        counts_per = pc.list_value_length(lines).to_numpy(
            zero_copy_only=False
        )
        drop = np.asarray(
            pc.is_in(flat, value_set=freq).to_numpy(zero_copy_only=False),
            dtype=bool,
        )
        keep = ~drop
        kept_counts = (
            np.bincount(parents[keep], minlength=n)
            if len(parents)
            else np.zeros(n, dtype=np.int64)
        )
        offsets = np.r_[0, np.cumsum(kept_counts)].astype(np.int32)
        flat_np = np.asarray(
            flat.to_numpy(zero_copy_only=False), dtype=object
        )
        rebuilt = pc.cast(
            pc.binary_join(
                pa.ListArray.from_arrays(
                    pa.array(offsets), pa.array(flat_np[keep], pa.string())
                ),
                "\n",
            ),
            pa.string(),
        )
        # SQL string_agg over zero kept lines is NULL, not "" (an
        # all-boilerplate doc) — mirror it so the oracle hash holds
        rebuilt = pc.if_else(
            pa.array(kept_counts > 0), rebuilt, pa.scalar(None, pa.string())
        )
        dropped = (counts_per - kept_counts).astype(np.int64)
        return t.append_column(
            "text_clean", rebuilt
        ).append_column("n_boilerplate_lines", pa.array(dropped, pa.int64()))

    return docs.map_batches(clean, batch_format="pyarrow")


def dsir_weights(
    docs: "ray.data.Dataset",
    *,
    target: "ray.data.Dataset",
    col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1 << 14,
) -> "ray.data.Dataset":
    """DSIR-style importance weights (Data Selection with Importance
    Resampling, arXiv:2302.03169): score every raw document by how
    target-domain-like it is under hashed unigram bag-of-words models,

        weight(doc) = mean over tokens of log p_target(h) − log p_raw(h)

    with h = crc32(token) % buckets and add-one smoothing. Selection =
    keep the top-weighted docs (or sample ∝ weight) downstream.

    Scale shape: each feature model is ONE dense vector of ``buckets``
    int64 counts — per-batch bincount partials merged by elementwise
    sum (two tiny reductions, never a vocabulary shuffle); the
    log-ratio table broadcasts once via ray.put and scoring is a
    vectorized gather + segment-sum per batch. Weights are exact
    per-document float sums (a doc's tokens never split across
    batches), so results are independent of partitioning.
    """
    import ray as _ray

    def _hash_tokens(text_col):
        toks = pc.utf8_split_whitespace(pc.fill_null(text_col, ""))
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        words = np.asarray(
            flat.to_numpy(zero_copy_only=False), dtype=object
        )
        # vectorized, process-stable string hash (fixed 16-byte key —
        # never Python hash(), which is per-process randomized)
        h = (
            _pd.util.hash_array(words, hash_key="otelray_dsir_16b")
            % np.uint64(buckets)
        ).astype(np.int64)
        return h, parents

    def count_partial(t: pa.Table) -> pa.Table:
        text = t[col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        h, _ = _hash_tokens(text)
        return pa.table(
            {"counts": pa.array([np.bincount(h, minlength=buckets)])}
        )

    def model(ds) -> np.ndarray:
        parts = ds.map_batches(
            count_partial, batch_format="pyarrow"
        ).to_pandas()["counts"]
        total = np.zeros(buckets, dtype=np.int64)
        for p in parts:
            total += np.asarray(p, dtype=np.int64)
        return total

    c_t = model(target)
    c_r = model(docs)
    # add-one smoothing; log probs in float64 (IEEE, deterministic)
    log_ratio = np.log((c_t + 1) / (c_t.sum() + buckets)) - np.log(
        (c_r + 1) / (c_r.sum() + buckets)
    )
    lref = _ray.put(log_ratio)

    def score(t: pa.Table) -> pa.Table:
        lr = _ray.get(lref)
        text = t[col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        h, parents = _hash_tokens(text)
        n = len(t)
        sums = np.zeros(n, dtype=np.float64)
        if len(h):
            np.add.at(sums, parents, lr[h])
        counts = np.bincount(parents, minlength=n) if len(h) else np.zeros(n)
        weight = sums / np.maximum(counts, 1)
        return pa.table(
            {
                id_col: t[id_col],
                "dsir_weight": pa.array(weight, type=pa.float64()),
                "n_tokens": pa.array(
                    counts.astype(np.int64), type=pa.int64()
                ),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


_DSIR_MOD = 2147483647  # 2^31-1, the fingerprint/minhash Horner modulus


# RE2's (and so DuckDB's) ``\s`` byte class, enumerated against DuckDB
# itself: {\t \n \f \r space}. NOT \x0b (vertical tab) and NOT the
# Unicode spaces (NBSP etc.) — RE2 \s is ASCII-only.
_RE2_WS_BYTES = np.zeros(256, dtype=bool)
_RE2_WS_BYTES[[0x09, 0x0A, 0x0C, 0x0D, 0x20]] = True


def _ws_tokens(text_col):
    """Whitespace tokens of a string column with empty boundary tokens
    dropped — exactly ``list_filter(string_split_regex(text, '\\s+'),
    x -> x <> '')`` in DuckDB. Returns (flat non-empty token array,
    parent row index per token).

    Implemented as a vectorized numpy pass over the flat Arrow byte
    buffer instead of ``pc.utf8_split_whitespace`` for two reasons:

    1. DETERMINISM. pyarrow 16.1.0's split kernel is nondeterministically
       WRONG on ChunkedArray inputs inside Ray workers: the identical
       single-chunk ``['', '   ']`` batch (same buffer bytes, offsets,
       addresses) split as ``[[''], ['', ' ']]`` on 66 of 300 calls and
       correctly on the rest — a phantom ``' '`` token. Plain-Array
       inputs never misbehaved (0/300). This pass reads the buffer ONCE
       into private memory and computes boundaries with numpy, so the
       result is a pure function of the bytes.
    2. ORACLE PARITY. The byte class above IS RE2's ``\\s``, so the old
       whitespace-class caveat (Arrow split on \\x0b/NBSP, DuckDB not)
       is gone: both engines now tokenize any corpus identically.
       Byte-level splitting is UTF-8-safe — multi-byte sequences never
       contain ASCII bytes — so this holds beyond ASCII too.
    """
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    arr = pc.fill_null(text_col, "")
    n = len(arr)
    empty = pa.array([], type=pa.string()), np.empty(0, dtype=np.int64)
    if n == 0:
        return empty
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off = np.frombuffer(
        arr.buffers()[1],
        dtype=odt,
        count=n + 1,
        offset=arr.offset * np.dtype(odt).itemsize,
    ).astype(np.int64)
    base, nbytes = int(off[0]), int(off[-1] - off[0])
    if nbytes == 0:
        return empty
    # .copy(): detach from the (possibly shared-object-store) mapping
    data = np.frombuffer(
        arr.buffers()[2], dtype=np.uint8, count=nbytes, offset=base
    ).copy()
    off0 = off - base
    is_tok = ~_RE2_WS_BYTES[data]
    # interior run boundaries (views, no full-array copies)...
    interior_starts = np.flatnonzero(is_tok[1:] & ~is_tok[:-1]) + 1
    interior_ends = np.flatnonzero(is_tok[:-1] & ~is_tok[1:]) + 1
    # ...plus row boundaries (a token never spans rows): the first /
    # last byte of each non-empty row is a start / end when it's a
    # token byte. O(rows), not O(bytes).
    ne = off0[:-1] != off0[1:]
    row_firsts = off0[:-1][ne]
    row_lasts = off0[1:][ne] - 1
    extra_starts = row_firsts[is_tok[row_firsts]]
    extra_ends = row_lasts[is_tok[row_lasts]] + 1
    # a boundary can be both interior and row-edge (ws before a row's
    # first token byte) — unique-merge dedups; each maximal token run
    # within a row then has exactly one start and one end, so the two
    # sorted lists align pairwise
    tok_starts = np.unique(np.concatenate([interior_starts, extra_starts]))
    tok_ends = np.unique(np.concatenate([interior_ends, extra_ends]))
    if len(tok_starts) == 0:
        return empty
    tlens = tok_ends - tok_starts
    parents = np.searchsorted(off0, tok_starts, side="right") - 1
    total = int(tlens.sum())
    out_off = np.zeros(len(tok_starts) + 1, dtype=np.int64)
    np.cumsum(tlens, out=out_off[1:])
    gather = np.repeat(tok_starts - out_off[:-1], tlens) + np.arange(
        total, dtype=np.int64
    )
    tok_bytes = data[gather]
    if total < (1 << 31):
        flat = pa.Array.from_buffers(
            pa.utf8(),
            len(tok_starts),
            [
                None,
                pa.py_buffer(out_off.astype(np.int32).tobytes()),
                pa.py_buffer(tok_bytes.tobytes()),
            ],
        )
    else:
        flat = pa.Array.from_buffers(
            pa.large_utf8(),
            len(tok_starts),
            [
                None,
                pa.py_buffer(out_off.tobytes()),
                pa.py_buffer(tok_bytes.tobytes()),
            ],
        )
    return flat, parents


def _horner_token_buckets(text_col, buckets: int):
    """Tokenize a string column on whitespace (empty boundary tokens
    dropped, matching ``list_filter(string_split_regex(text,'\\s+'),
    x -> x <> '')``) and hash each token with the Horner recurrence
    acc←(acc·257+byte) mod 2³¹−1, then % ``buckets``. Fully vectorized:
    bytes come straight from the flat Arrow buffer, and the Horner loop
    runs once per token CHARACTER POSITION (max token length ~ tens),
    not per token. Code points equal bytes on the ASCII corpus — the
    same documented caveat as ``fingerprint_exact``. Returns
    (bucket per token, parent doc index per token)."""
    flat, parents = _ws_tokens(text_col)
    odt = np.int64 if pa.types.is_large_string(flat.type) else np.int32
    off = np.frombuffer(
        flat.buffers()[1],
        dtype=odt,
        count=len(flat) + 1,
        offset=flat.offset * np.dtype(odt).itemsize,
    ).astype(np.int64)
    data_buf = flat.buffers()[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.empty(0, dtype=np.uint8)
    )
    lens = off[1:] - off[:-1]
    starts = off[:-1]
    acc = np.zeros(len(flat), dtype=np.int64)
    for j in range(int(lens.max()) if len(lens) else 0):
        m = lens > j
        acc[m] = (acc[m] * 257 + data[starts[m] + j]) % _DSIR_MOD
    return acc % buckets, parents


def dsir_exact(
    docs: "ray.data.Dataset",
    *,
    target: "ray.data.Dataset",
    col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
) -> "ray.data.Dataset":
    """The DSIR pipeline SHAPE under a full SQL oracle (the affine-tier
    idiom: same distributed machinery, integer surrogate scoring).
    Identical to :func:`dsir_weights` — two dense per-bucket model
    reductions (never a vocabulary shuffle), score table broadcast
    once, vectorized gather + segment-sum per batch — but with (a) the
    SQL-mirrorable Horner token hash instead of ``pd.util.hash_array``
    and (b) the unsmoothed INTEGER bucket-count difference

        weight_int(doc) = Σ_tokens ( count_target[h] − count_raw[h] )

    instead of the smoothed float log-ratio mean, so every value is an
    exact int64 and DuckDB reproduces the result bit-for-bit (log-prob
    floats are why ``dsir_weights`` itself stays rows-only). Ranking
    behaviour is the same family: target-heavy buckets score positive.
    """
    import ray as _ray

    def count_partial(t: pa.Table) -> pa.Table:
        text = t[col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        h, _ = _horner_token_buckets(text, buckets)
        return pa.table(
            {"counts": pa.array([np.bincount(h, minlength=buckets)])}
        )

    def model(ds) -> np.ndarray:
        parts = ds.map_batches(
            count_partial, batch_format="pyarrow"
        ).to_pandas()["counts"]
        total = np.zeros(buckets, dtype=np.int64)
        for p in parts:
            total += np.asarray(p, dtype=np.int64)
        return total

    diff = model(target) - model(docs)
    dref = _ray.put(diff)

    def score(t: pa.Table) -> pa.Table:
        d = _ray.get(dref)
        text = t[col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        h, parents = _horner_token_buckets(text, buckets)
        n = len(t)
        sums = np.zeros(n, dtype=np.int64)
        counts = np.zeros(n, dtype=np.int64)
        if len(h):
            np.add.at(sums, parents, d[h])
            counts = np.bincount(parents, minlength=n).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "dsir_weight_int": pa.array(sums, type=pa.int64()),
                "n_tokens": pa.array(counts, type=pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def lm_hits_exact(
    docs: "ray.data.Dataset",
    *,
    col: str = "text",
    id_col: str = "doc_id",
    top: int = 256,
) -> "ray.data.Dataset":
    """The unigram-LM scoring machinery under a full SQL oracle (the
    affine-tier idiom, see :func:`dsir_exact`). Same shape as
    :func:`build_unigram_lm` + ``LMScoreStage`` — combiner token-count
    reduction, deterministic blockwise partial top-k with a tiny driver
    merge, model broadcast once via ``ray.put``, per-batch flat token
    map + integer segment sums — but the score is the raw model COUNT
    sum (OOV tokens contribute 0) instead of the float mean
    log-probability, so DuckDB reproduces every value exactly:

        lm_hits(doc) = Σ_tokens vocab_n[token]   (0 if out-of-vocab)
        n_oov(doc)   = #tokens not in the top-``top`` vocabulary

    Ties at the top-k boundary break on (count desc, token asc) — the
    same rule as ``build_unigram_lm`` and ``ORDER BY n DESC, w LIMIT
    k`` in the oracle. ``top`` defaults small (256) so the truncation
    and OOV paths are genuinely exercised at test scales."""
    import ray as _ray
    from ray.data.aggregate import Sum

    def count_partial(t: pa.Table) -> pa.Table:
        flat, _ = _ws_tokens(t[col])
        vc = flat.value_counts()
        return pa.table(
            {
                "token": vc.field("values"),
                "_pc": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    counts_ds = (
        docs.map_batches(count_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("_pc", alias_name="n"))
    )

    def block_top(t: pa.Table) -> pa.Table:
        if len(t) <= top:
            return t
        df = t.to_pandas().sort_values(
            ["n", "token"], ascending=[False, True], kind="mergesort"
        )
        return pa.Table.from_pandas(df.head(top), preserve_index=False)

    vocab = counts_ds.map_batches(block_top, batch_format="pyarrow").to_pandas()
    if "n" not in vocab.columns:
        # zero-token corpus (all texts null/empty): the aggregate is a
        # ZERO-block dataset whose to_pandas() has no columns at all
        # (the CLAUDE.md normalize-at-the-consumer quirk) — an empty
        # lookup makes every token OOV, mirroring the oracle's
        # LEFT JOIN + COALESCE(0)
        vocab = _pd.DataFrame({"token": _pd.Series(dtype=object),
                               "n": _pd.Series(dtype="int64")})
    vocab = vocab.sort_values(
        ["n", "token"], ascending=[False, True], kind="mergesort"
    ).head(top)
    lookup = _pd.Series(
        vocab["n"].to_numpy(dtype=np.int64),
        index=vocab["token"].to_numpy(dtype=object),
    )
    lref = _ray.put(lookup)

    def score(t: pa.Table) -> pa.Table:
        lk = _ray.get(lref)
        flat, parents = _ws_tokens(t[col])
        n = len(t)
        hits = np.zeros(n, dtype=np.int64)
        oovs = np.zeros(n, dtype=np.int64)
        if len(flat):
            mapped = (
                _pd.Series(flat.to_numpy(zero_copy_only=False))
                .map(lk)
                .to_numpy(dtype=np.float64, na_value=np.nan)
            )
            oov_mask = np.isnan(mapped)
            # vocab counts < 2^53, so the float round-trip is lossless
            np.add.at(
                hits, parents, np.nan_to_num(mapped).astype(np.int64)
            )
            np.add.at(oovs, parents, oov_mask.astype(np.int64))
        return pa.table(
            {
                id_col: t[id_col],
                "lm_hits": pa.array(hits, type=pa.int64()),
                "n_oov": pa.array(oovs, type=pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")
