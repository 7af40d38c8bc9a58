"""Repeated-invocation safety: the driver and bench call queries()
entries multiple times in one session — results must not drift
(append-on-rerun, leaked state, nondeterminism)."""

import pandas as pd
import pytest

import __ray_entry__ as em
from tests.conftest import SF_DIR, normalize, to_pandas

REPEAT = [
    "json_roundtrip",
    "obs_counters",
    "media_decode",
    "sink_counts",
    "salted_counts",
    # rows-only queries (no value oracle — determinism is their only
    # cross-run value gate; a full 84-query double-run sweep confirmed
    # every query repeats bit-identically, these pin the risky ones)
    "minhash_pairs",
    "simhash",
    "lsh_topk",
    "ivf_topk",
    "dedup_clusters",
    "near_dup_keep",
    # pack_sequences: list-typed doc_ids column defeats normalize();
    # covered by the stronger layout-invariance test in test_ops
    "lm_score",
    "semdedup",
    "embedding_near_dup_lsh",
    "checkpoint_ledger",
]


@pytest.mark.parametrize("name", REPEAT)
def test_query_idempotent(name):
    fn = em.queries()[name]
    a = normalize(to_pandas(fn(SF_DIR)))
    b = normalize(to_pandas(fn(SF_DIR)))
    pd.testing.assert_frame_equal(a, b)
