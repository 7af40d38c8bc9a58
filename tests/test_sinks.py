import os

import pytest
import ray.data

from opentelemetry_collector_ray.sinks.writers import (
    atomic_write_parquet,
    logging_sink,
)


def test_atomic_write_and_rewrite(tmp_path):
    out = str(tmp_path / "sink")
    ds = ray.data.range(100)
    assert atomic_write_parquet(ds, out) == 100
    # idempotent rewrite (the retry path): same final state
    assert atomic_write_parquet(ds, out) == 100
    assert ray.data.read_parquet(out).count() == 100
    assert not [d for d in os.listdir(tmp_path) if d.startswith(".tmp-")]


def test_logging_sink_counts_and_samples():
    ds = ray.data.range(1000)
    rep = logging_sink(ds, sample=3, name="dbg")
    assert rep["records"] == 1000
    assert len(rep["sample"]) == 3
