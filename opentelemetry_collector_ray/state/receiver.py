"""Push-ingest bridge — the OTLP receiver semantics for a batch engine.

Reference: the OTLP receiver is a live gRPC/HTTP server whose Export
handler pushes each request down the consumer chain and acks only after
acceptance (receiver/otlpreceiver/otlp.go:93-172). A batch engine has
no long-lived server, so the bridge is: a **spool-receiver actor** that
accepts pushed row batches, buffers to a size threshold, and lands each
micro-batch as an ATOMIC parquet spool file (tmp + fsync + rename, the
same torn-write discipline as the checkpoint sinks); the existing
poll/checkpoint path (``state.tailer.tail_run`` →
``state.checkpoint.run_partitioned``) then processes the spool with
per-partition ledger exactly-once.

Delivery contract (mirrors the reference's queue+storage stack,
persistent_storage.go:29-50): by default ``export`` acks after the rows
are in the actor buffer — an actor crash before the next land loses
up-to-one buffer of acked rows, a WEAKER window than the reference's
ack-after-acceptance, so clients must re-push since their last durable
ack on receiver restart (at-least-once; a retried acked export
duplicates, same as OTLP). ``export(..., durable=True)`` and ``flush``
ack only after the spool file is durable — the reference's contract,
at a per-push fsync cost. From the spool onward the ledger makes
processing exactly-once across crash/resume: a landed spool file is
processed by exactly one completed partition regardless of how many
times the run is killed and resumed.

The actor is num_cpus=0 (it only buffers and writes); at cluster scale
run one receiver actor per ingest endpoint and let them share a spool
directory — spool file names are ``{receiver_id}-{seq:08d}.parquet``,
so concurrent receivers never collide. The caller must HOLD the actor
handle for the run's lifetime (a named, non-detached Ray actor dies
when its last handle drops — see CLAUDE.md).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray


@ray.remote(num_cpus=0)
class SpoolReceiverActor:
    """Buffer pushed rows; land atomic parquet micro-batches."""

    def __init__(
        self,
        spool_dir: str,
        *,
        receiver_id: str = "r0",
        max_buffer_rows: int = 65536,
    ):
        os.makedirs(spool_dir, exist_ok=True)
        self.spool_dir = spool_dir
        self.receiver_id = receiver_id
        self.max_buffer_rows = max_buffer_rows
        self.buf: list[pa.Table] = []
        self.buffered_rows = 0
        self.accepted = 0
        self.landed_files = 0
        # crash-safe restart: continue the sequence after existing spool
        # files, clean any torn tmp files from a previous incarnation
        seqs = []
        for name in os.listdir(spool_dir):
            if name.startswith(f".tmp-{receiver_id}-"):
                os.unlink(os.path.join(spool_dir, name))
            elif name.startswith(f"{receiver_id}-") and name.endswith(".parquet"):
                try:
                    seqs.append(int(name[len(receiver_id) + 1 : -8]))
                except ValueError:
                    pass
        self.seq = max(seqs) + 1 if seqs else 0

    def export(self, rows: list[dict], durable: bool = False) -> int:
        """Push a batch of row dicts (the Export RPC shape). Acks the
        cumulative accepted count; lands a spool file when the buffer
        crosses the threshold.

        Ack contract (persistent_storage.go:29-50 parity): with the
        default ``durable=False`` the ack means *buffered* — an actor
        crash before the next ``_land()`` loses up-to-one buffer of
        acked rows, so clients wanting reference semantics must either
        re-push everything since their last durable ``flush()`` ack on
        receiver restart, or pass ``durable=True`` to land
        synchronously before the ack (ack = on disk, exactly the
        reference's queue+storage acceptance — at a per-push fsync
        cost; amortize with larger pushes)."""
        if rows:
            self.buf.append(pa.Table.from_pylist(rows))
            self.buffered_rows += len(rows)
            self.accepted += len(rows)
        if durable or self.buffered_rows >= self.max_buffer_rows:
            self._land()
        return self.accepted

    def export_table(self, table: pa.Table, durable: bool = False) -> int:
        """Arrow-native push (zero object-store copies on the way in).
        Same ack contract as ``export``."""
        if len(table):
            self.buf.append(table)
            self.buffered_rows += len(table)
            self.accepted += len(table)
        if durable or self.buffered_rows >= self.max_buffer_rows:
            self._land()
        return self.accepted

    def flush(self) -> str | None:
        """Land the current buffer; returns the spool file path (None
        when the buffer is empty). Ack = the file is durable."""
        return self._land()

    def stats(self) -> dict:
        return {
            "accepted": self.accepted,
            "buffered_rows": self.buffered_rows,
            "landed_files": self.landed_files,
            "next_seq": self.seq,
        }

    def _land(self) -> str | None:
        if not self.buffered_rows:
            return None
        table = pa.concat_tables(self.buf, promote_options="default")
        name = f"{self.receiver_id}-{self.seq:08d}.parquet"
        tmp = os.path.join(self.spool_dir, f".tmp-{self.receiver_id}-{self.seq}")
        final = os.path.join(self.spool_dir, name)
        pq.write_table(table, tmp)
        with open(tmp, "rb") as f:
            os.fsync(f.fileno())
        os.rename(tmp, final)
        self.seq += 1
        self.landed_files += 1
        self.buf = []
        self.buffered_rows = 0
        return final


def push_dataset(ds, actor, *, rows_per_push: int = 8192) -> int:
    """Stream a Dataset into a receiver actor batch-by-batch (the test
    client — stands in for the gRPC client): pipelined pushes, never a
    whole-dataset materialization on the driver."""
    pending = []
    total = 0
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=rows_per_push):
        total += len(batch)
        pending.append(actor.export_table.remote(batch))
        if len(pending) > 8:  # bounded in-flight pushes (backpressure)
            ray.get(pending.pop(0))
    if pending:
        ray.get(pending)
    return total
