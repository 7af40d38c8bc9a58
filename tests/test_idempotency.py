"""Repeated-invocation safety: the driver and bench call queries()
entries multiple times in one session — results must not drift
(append-on-rerun, leaked state, nondeterminism)."""

import pandas as pd
import pytest

import __ray_entry__ as em
from tests.conftest import SF_DIR, normalize, to_pandas

REPEAT = ["json_roundtrip", "obs_counters", "media_decode", "sink_counts", "salted_counts"]


@pytest.mark.parametrize("name", REPEAT)
def test_query_idempotent(name):
    fn = em.queries()[name]
    a = normalize(to_pandas(fn(SF_DIR)))
    b = normalize(to_pandas(fn(SF_DIR)))
    pd.testing.assert_frame_equal(a, b)
