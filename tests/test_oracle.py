"""Every ``queries()`` entry vs its DuckDB oracle at sf0.001.

This mirrors the driver's CORRECTNESS gate (row count + schema +
order-insensitive value equality after sorting columns by name) so
mismatches are caught locally before a round ends.
"""

import pytest

import __ray_entry__ as entrymod
from tests.conftest import assert_matches_oracle

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, duck):
    assert name in QUERIES, f"oracle_sql has {name} but queries() does not"
    assert_matches_oracle(duck, QUERIES[name], ORACLES[name])


def test_entry_smoke():
    ds = entrymod.entry()
    import ray.data

    assert isinstance(ds, ray.data.Dataset)
    assert ds.count() > 0
    names = set(ds.schema().names)
    assert {"conv_id", "turn_idx", "text", "sinks", "route", "service"} <= names
