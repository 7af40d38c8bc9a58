"""Null-data parity gate.

sf0.01 — the driver's correctness scale — contains NO nulls, so the
oracle gate cannot catch null-semantics divergence (the round-2 bug
class: blind astype(int64) turns NaN into INT64_MIN, SQL sums skip
NULL terms, inner joins drop NULL keys). This suite re-runs a curated
set of null-sensitive oracle queries over a copy of sf0.001 with nulls
deterministically injected into value columns AND join keys, comparing
against the same DuckDB oracle SQL with the driver's own canon
(sorted columns, repr values, sorted rows)."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

SRC = "/root/testdata/sf0.001"

# (table, column, modulus, residue) — key columns get a small null
# share, value columns a larger one; all deterministic off an id col.
_NULL_RULES = [
    ("events", "value", "event_id", 7, 3),
    ("events", "props", "event_id", 11, 5),
    ("events", "event_type", "event_id", 19, 8),
    ("lineitem", "l_quantity", "l_linenumber", 3, 1),
    ("lineitem", "l_extendedprice", "l_linenumber", 5, 2),
    ("lineitem", "l_discount", "l_linenumber", 7, 4),
    ("lineitem", "l_orderkey", "l_linenumber", 11, 6),
    ("customer", "c_nationkey", "c_custkey", 9, 2),
    ("documents", "text", "doc_id", 13, 7),
    ("documents", "lang", "doc_id", 17, 3),
    ("documents", "source", "doc_id", 23, 11),
]

QUERIES = [
    # aggregates: SQL SUM/AVG/STDDEV skip NULL terms
    "q1_lineitem",
    "variance",
    "corr",
    "zscore_outliers",
    "summary_metrics",
    "topk_per_group",
    "gauge_last",
    "zorder",
    # series math over a null-holed value column
    "delta_cumulative",
    "delta_rate",
    "counter_resets",
    "time_weighted_avg",
    "gap_fill",
    "interval_downsample",
    "rolling_sum",
    "lag_lead",
    # conversions / JSON over null payloads
    "attributes_convert",
    "attributes_where",
    "json_parse",
    "attributes_map",
    "ottl_map_where",
    # joins: inner joins drop NULL keys; anti/semi EXISTS semantics
    "join_bucketed",
    "join_native",
    "join_salted",
    "join_broadcast",
    "join_bloom",
    "semi_join",
    "anti_join",
    # text operators over a null-holed documents.text / lang
    "quality",
    "token_stats",
    "tfidf",
    "doc_freq",
    "sentences",
    "line_dedup",
    "chunks",
    "repetition",
    "bpe_tokens",
    "trending_terms",
    "vocab_topk",
    "redact",
    "cooccurrence",
    "corpus_stats",
    "dedup_exact",
    "dup_spans",
    "contamination",
    "curate",
    "budget_select",
    "mix_sample",
    "temperature_mix",
    "stratified_take",
    "boilerplate_lines",
    # codec roundtrips over null-holed transcripts (null text from
    # null events.value/props)
    "otlp_json_flatten",
    "otlp_traces_flatten",
    "otlp_metrics_flatten",
    "otlp_metrics_histogram",
    "otlp_metrics_exphist",
    "otlp_metrics_summary",
    "otlp_ingest_pipeline",
    "chat_jsonl_roundtrip",
    "ottl_transform",
    "ottl_map_transform",
    # round-4 oracle promotions (null text/lang/action paths)
    "trace_assemble_flat",
    "dedup_clusters_exact",
    "near_dup_keep_exact",
    "langid_pred",
    "telemetry_export",
    "jaccard_pairs",  # shares the null-key drop with dedup_clusters_exact
    "heavy_hitters_exact",  # value_counts-dropna == WHERE NOT NULL
    "tail_sample_policies",  # null level/action/latency in policy rules
    "fingerprint_exact",  # null/empty text -> 0 on both sides
    "simhash_exact",  # null/whitespace-only text -> 0 on both sides
    "pack_sequences_exact",  # null text -> 0 tokens, still packed
    "minhash_exact",  # null text emits no signature rows on both sides
    "lsh_buckets_exact",
    "dsir_exact",  # null text -> 0 tokens/weight; null lang out of target
    "metrics_transform",  # null action -> null metric group; null value sum
    "lm_hits_exact",  # null text -> 0 hits / 0 oov on both sides
    # round-5 oracle promotions (the former no_oracle rows)
    "hll_distinct",  # null event_type group filtered on both sides
    "tdigest_quantiles",  # null value dropped before quantization
    "bloom_dedup",  # null text -> fingerprint 0 on both sides
]

# The affine sketch tier keys on events.user_id/event_id — columns the
# shared rule set deliberately leaves intact (the transcripts
# derivation CONTRACT is non-null user_id; injecting nulls there makes
# 20 transcript-tier queries fail loudly by design, see
# sources/transcripts.py). These three get their own fixture below.
UID_NULL_QUERIES = [
    "countmin_exact",
    "bloom_exact",
    "kmv_exact_small",
    "hll_registers_exact",
    "countmin_counts",
    "heavy_hitters",
    "hll_distinct",  # user_id-null path (also in the shared list for event_type nulls)
]


@pytest.fixture(scope="module")
def null_sf(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("null_sf"))
    rules = {}
    for tbl, col, idc, mod, res in _NULL_RULES:
        rules.setdefault(tbl, []).append((col, idc, mod, res))
    for tbl in TABLES:
        src = f"{SRC}/{tbl}.parquet"
        t = pq.read_table(src)
        for col, idc, mod, res in rules.get(tbl, []):
            idx = t.column_names.index(col)
            ids = t[idc].to_numpy(zero_copy_only=False)
            mask = (ids % mod) == res
            import numpy as np

            vals = t[col].to_pandas()
            vals = vals.where(~mask, other=None)
            arr = pa.array(vals, type=t.schema.field(col).type)
            t = t.set_column(idx, col, arr)
        pq.write_table(t, os.path.join(out, f"{tbl}.parquet"))
    return out


@pytest.fixture(scope="module")
def entry_mod():
    import __ray_entry__ as em

    return em


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(repr)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _to_df(res):
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


@pytest.fixture(scope="module")
def uid_null_sf(tmp_path_factory):
    """events copy with user_id nulled on event_id % 29 == 9 (and, on
    a second stripe, event_id itself nulled) — the columns the shared
    fixture must leave intact for the transcript tier."""
    out = str(tmp_path_factory.mktemp("uid_null_sf"))
    for tbl in TABLES:
        t = pq.read_table(f"{SRC}/{tbl}.parquet")
        if tbl == "events":
            import numpy as np

            ids = t["event_id"].to_numpy(zero_copy_only=False)
            for col, mask in (
                ("user_id", (ids % 29) == 9),
                ("event_id", (ids % 31) == 4),
            ):
                idx = t.column_names.index(col)
                vals = t[col].to_pandas().where(~mask, other=None)
                t = t.set_column(
                    idx, col, pa.array(vals, type=t.schema.field(col).type)
                )
        pq.write_table(t, os.path.join(out, f"{tbl}.parquet"))
    return out


@pytest.mark.parametrize("name", UID_NULL_QUERIES)
def test_uid_null_parity(ray_session, uid_null_sf, entry_mod, name):
    ray_df = _to_df(entry_mod.queries()[name](uid_null_sf))
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{uid_null_sf}/{tbl}.parquet')"
        )
    oracle_df = con.sql(entry_mod.oracle_sql()[name]).df()
    a, b = _canon(ray_df), _canon(oracle_df)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"{name}: rows {len(a)} vs {len(b)}"
    mism = (a != b).any(axis=1)
    if mism.any():
        i = int(mism.idxmax())
        raise AssertionError(
            f"{name}: first mismatching row {i}:\n"
            f"ray:    {a.iloc[i].to_dict()}\n"
            f"oracle: {b.iloc[i].to_dict()}"
        )


@pytest.mark.parametrize("name", QUERIES)
def test_null_parity(ray_session, null_sf, entry_mod, name):
    ray_df = _to_df(entry_mod.queries()[name](null_sf))
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{null_sf}/{tbl}.parquet')"
        )
    oracle_df = con.sql(entry_mod.oracle_sql()[name]).df()
    a, b = _canon(ray_df), _canon(oracle_df)
    assert list(a.columns) == list(b.columns), (
        f"{name}: columns {list(a.columns)} vs {list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: rows {len(a)} vs {len(b)}"
    mism = (a != b).any(axis=1)
    if mism.any():
        i = int(mism.idxmax())
        raise AssertionError(
            f"{name}: first mismatching row {i}:\n"
            f"ray:    {a.iloc[i].to_dict()}\n"
            f"oracle: {b.iloc[i].to_dict()}"
        )
