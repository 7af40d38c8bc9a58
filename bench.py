"""Benchmark harness — prints ONE JSON line for the driver.

Headline: end-to-end parse→enrich→route→aggregate throughput (turns/sec)
over a deterministic synthetic transcript corpus (~3.9M turns, generated
once into /tmp and reused), plus per-query timings of the oracle-gated
pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1).

``--scaling`` runs the headline twice in fresh interpreter sessions at
num_cpus=8 and num_cpus=32 on the same input and reports both
throughputs and the scaling efficiency (the sandbox stand-in for the
north rule's N vs 4N node-cluster criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
CORPUS_DIR = os.environ.get("GRAFT_BENCH_CORPUS", "/tmp/otel_ray_bench_corpus")
CORPUS_CONV = int(os.environ.get("GRAFT_BENCH_CONV", "4800000"))  # ~31M turns
CORPUS_FILES = 64


def ensure_corpus() -> str:
    """Generate the deterministic bench corpus once (content is a pure
    function of the conversation index — safe to reuse across runs)."""
    marker = os.path.join(CORPUS_DIR, f".complete-{CORPUS_CONV}")
    if os.path.exists(marker):
        return CORPUS_DIR
    from opentelemetry_collector_ray.fixtures import write_transcript_corpus

    write_transcript_corpus(CORPUS_DIR, CORPUS_CONV, files=CORPUS_FILES)
    with open(marker, "w") as f:
        f.write("ok")
    return CORPUS_DIR


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import __ray_entry__ as em
    from opentelemetry_collector_ray.pipelines.logs import sink_counts
    from opentelemetry_collector_ray.sources.transcripts import read_transcripts
    from opentelemetry_collector_ray.stages.enrich import enrich_batch
    from opentelemetry_collector_ray.stages.parse import parse_batch

    corpus = ensure_corpus()

    # One block per shard (~500k rows / ~55MB): per-task overhead stays
    # ≪ per-task compute, which is what makes the 8→32 CPU scaling
    # measurement reflect compute, not scheduling. (The default read
    # splits small files into ~2MB blocks → 224 ~14ms tasks, and the
    # pipeline becomes dispatch-bound.)
    read = lambda: read_transcripts(corpus, override_num_blocks=CORPUS_FILES)

    # Warm the OS page cache with a real (column-data) read so we measure
    # compute + shuffle, not the first disk read; count() alone reads only
    # parquet footers.
    n_turns = 0
    for b in read().iter_batches(batch_size=262144, batch_format="pyarrow"):
        n_turns += b.num_rows

    t0 = time.time()
    ds = read()
    ds = ds.map_batches(parse_batch, batch_format="pyarrow")
    ds = ds.map_batches(enrich_batch, batch_format="pyarrow")
    counts = sink_counts(ds)
    headline = time.time() - t0
    assert int(counts["n"].sum()) >= n_turns

    queries: dict[str, float] = {}
    for name, fn in em.queries().items():
        t0 = time.time()
        res = fn(SF_DIR)
        if hasattr(res, "to_pandas"):
            res.to_pandas()  # consume the lazy pipeline
        queries[name] = round(time.time() - t0, 3)

    ray.shutdown()
    return {
        "metric": "parse_enrich_route_aggregate_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "corpus_turns": int(n_turns),
        "turns_per_sec": round(n_turns / headline, 1),
    }


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    eff = (lo["value"] / hi["value"]) / (32 / 8)
    return {
        "metric": "scaling_efficiency_8_to_32_cpus",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "turns_per_sec_8": lo["turns_per_sec"],
        "turns_per_sec_32": hi["turns_per_sec"],
        "corpus_turns": lo["corpus_turns"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
