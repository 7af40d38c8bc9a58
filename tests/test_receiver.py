"""Push-ingest bridge: spool receiver actor → checkpointed processing.
The receiver-semantics gap test: rows pushed to the actor appear
EXACTLY ONCE in sinks across a simulated crash/resume."""

import glob
import os

import pyarrow as pa
import pytest
import ray
import ray.data

from opentelemetry_collector_ray.state.checkpoint import run_partitioned
from opentelemetry_collector_ray.state.receiver import (
    SpoolReceiverActor,
    push_dataset,
)


def _rows(lo, hi):
    return [{"event_id": i, "val": f"v{i}"} for i in range(lo, hi)]


def test_exactly_once_across_crash_resume(tmp_path):
    spool = str(tmp_path / "spool")
    out = str(tmp_path / "out")
    actor = SpoolReceiverActor.remote(spool, max_buffer_rows=10_000)
    # three pushes, two spool files (explicit flush per micro-batch tick)
    ray.get(actor.export.remote(_rows(0, 100)))
    ray.get(actor.flush.remote())
    ray.get(actor.export.remote(_rows(100, 250)))
    ray.get(actor.export.remote(_rows(250, 300)))
    ray.get(actor.flush.remote())
    files = sorted(glob.glob(spool + "/*.parquet"))
    assert len(files) == 2

    def pipeline(paths):
        return ray.data.read_parquet(paths)

    # crash after the first newly-processed partition
    with pytest.raises(RuntimeError, match="injected crash"):
        run_partitioned(files, out, pipeline, num_partitions=4, fail_after=1)
    # resume: remaining partitions complete, no duplicates
    rep = run_partitioned(files, out, pipeline, num_partitions=4)
    assert rep["skipped"] >= 1  # the pre-crash partition was not redone
    got = sorted(
        ray.data.read_parquet(glob.glob(out + "/part-*/*.parquet")).to_pandas()["event_id"]
    )
    assert got == list(range(300))  # exactly once, nothing lost


def test_incremental_ticks_only_process_new_spool_files(tmp_path):
    spool = str(tmp_path / "spool")
    out = str(tmp_path / "out")
    actor = SpoolReceiverActor.remote(spool, max_buffer_rows=10_000)
    ray.get(actor.export.remote(_rows(0, 50)))
    ray.get(actor.flush.remote())

    def pipeline(paths):
        return ray.data.read_parquet(paths)

    run_partitioned(sorted(glob.glob(spool + "/*.parquet")), out, pipeline,
                    num_partitions=4)
    # second tick: new rows arrive
    ray.get(actor.export.remote(_rows(50, 80)))
    ray.get(actor.flush.remote())
    rep = run_partitioned(sorted(glob.glob(spool + "/*.parquet")), out,
                          pipeline, num_partitions=4)
    # only the partitions whose input set changed were reprocessed
    assert rep["processed"] <= 2 and rep["skipped"] >= 2
    got = sorted(
        ray.data.read_parquet(glob.glob(out + "/part-*/*.parquet")).to_pandas()["event_id"]
    )
    assert got == list(range(80))


def test_buffer_threshold_lands_automatically(tmp_path):
    spool = str(tmp_path / "spool")
    actor = SpoolReceiverActor.remote(spool, max_buffer_rows=100)
    ray.get(actor.export.remote(_rows(0, 60)))
    assert glob.glob(spool + "/*.parquet") == []  # below threshold
    ray.get(actor.export.remote(_rows(60, 130)))  # crosses threshold
    files = glob.glob(spool + "/*.parquet")
    assert len(files) == 1
    st = ray.get(actor.stats.remote())
    assert st["accepted"] == 130 and st["buffered_rows"] == 0


def test_receiver_restart_continues_sequence(tmp_path):
    spool = str(tmp_path / "spool")
    a1 = SpoolReceiverActor.remote(spool, max_buffer_rows=10_000)
    ray.get(a1.export.remote(_rows(0, 10)))
    ray.get(a1.flush.remote())
    ray.kill(a1)
    # torn tmp from a crashed incarnation must be cleaned on restart
    open(os.path.join(spool, ".tmp-r0-99"), "w").write("torn")
    a2 = SpoolReceiverActor.remote(spool, max_buffer_rows=10_000)
    ray.get(a2.export.remote(_rows(10, 20)))
    ray.get(a2.flush.remote())
    files = sorted(os.path.basename(f) for f in glob.glob(spool + "/*.parquet"))
    assert files == ["r0-00000000.parquet", "r0-00000001.parquet"]
    assert not glob.glob(spool + "/.tmp-*")


def test_push_dataset_streams_batches(tmp_path):
    spool = str(tmp_path / "spool")
    actor = SpoolReceiverActor.remote(spool, max_buffer_rows=500)
    ds = ray.data.from_arrow(
        pa.table({"event_id": list(range(2000)), "v": ["x"] * 2000})
    )
    n = push_dataset(ds, actor, rows_per_push=256)
    assert n == 2000
    ray.get(actor.flush.remote())
    got = ray.data.read_parquet(glob.glob(spool + "/*.parquet")).count()
    assert got == 2000


def test_durable_export_acks_after_landing(tmp_path):
    """durable=True = the reference's ack-after-acceptance contract:
    the spool file exists the moment the ack returns, even far below
    the buffer threshold — a crash right after the ack loses nothing."""
    spool = str(tmp_path / "spool")
    actor = SpoolReceiverActor.remote(spool, max_buffer_rows=10_000)
    ray.get(actor.export.remote(_rows(0, 5), True))
    files = glob.glob(spool + "/*.parquet")
    assert len(files) == 1
    got = ray.data.read_parquet(files).count()
    assert got == 5
    stats = ray.get(actor.stats.remote())
    assert stats["buffered_rows"] == 0 and stats["landed_files"] == 1
