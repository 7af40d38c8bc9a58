"""Micro-batch tailing — the pull-source (scraper controller) analogue.

Reference: the scraper controller ticks every ``collection_interval``,
runs its scrape funcs and pushes the results down the same consumer
chain as push receivers (receiver/scraperhelper/scrapercontroller.go:
91-145,179-198). Batch restatement: poll an input directory; each tick,
hand the CURRENT file set to the incremental checkpoint runner
(state/checkpoint.py) — its hash-stable partition plan + input-drift
ledger means each tick processes exactly the partitions whose input set
changed (new or rewritten shards), nothing else. Atomic per-partition
swaps keep every tick's output consistent for concurrent readers.

Termination: a sentinel file (``stop_file``) — the batch stand-in for
SIGTERM-triggered drain (service shutdown, graph.go:302-322): the loop
runs one final tick after seeing the sentinel so everything that
arrived before the stop is processed.
"""

from __future__ import annotations

import glob
import os
import time

from .checkpoint import run_partitioned


def tail_run(
    input_glob: str,
    out_dir: str,
    pipeline_fn,
    *,
    num_partitions: int = 8,
    poll_interval: float = 1.0,
    stop_file: str | None = None,
    max_ticks: int | None = None,
    sleep=time.sleep,
) -> dict:
    """Poll-process loop. Returns cumulative stats
    ``{ticks, processed, total_rows}``."""
    ticks = 0
    processed = 0
    last = None
    while True:
        stop = stop_file is not None and os.path.exists(stop_file)
        files = sorted(glob.glob(input_glob))
        if files:
            last = run_partitioned(
                files, out_dir, pipeline_fn, num_partitions=num_partitions
            )
            processed += last["processed"]
        ticks += 1
        if stop:  # final drain tick already ran above
            break
        if max_ticks is not None and ticks >= max_ticks:
            break
        sleep(poll_interval)
    return {
        "ticks": ticks,
        "processed": processed,
        "total_rows": (last or {}).get("total_rows", 0),
        "out_dir": out_dir,
    }
