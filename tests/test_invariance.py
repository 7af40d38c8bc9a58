"""Parallelism-invariance: identical pipeline results regardless of
block count / execution parallelism (FIXTURES.md golden check 6; the
routed-row bit-stability hard part of SURVEY.md §7)."""

import pandas as pd

from opentelemetry_collector_ray.fixtures import gen_transcripts
from opentelemetry_collector_ray.pipelines.logs import sink_counts
from opentelemetry_collector_ray.stages.enrich import enrich_batch
from opentelemetry_collector_ray.stages.parse import parse_batch
from opentelemetry_collector_ray.stages.route import explode_sinks_batch


def _run(num_blocks: int) -> tuple[pd.DataFrame, pd.DataFrame]:
    import ray.data

    ds = ray.data.from_arrow(gen_transcripts(300)).repartition(num_blocks)
    ds = ds.map_batches(parse_batch, batch_format="pyarrow")
    ds = ds.map_batches(enrich_batch, batch_format="pyarrow")
    counts = sink_counts(ds)
    rows = (
        ds.map_batches(explode_sinks_batch, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["sink", "conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    return counts, rows


def test_results_invariant_across_block_counts():
    c1, r1 = _run(1)
    c8, r8 = _run(8)
    pd.testing.assert_frame_equal(c1, c8)
    pd.testing.assert_frame_equal(r1, r8)
    # per-turn text equality through the whole pipeline (no mutation)
    src = gen_transcripts(300).to_pandas()
    merged = r1[r1["sink"] != "errors"].merge(
        src, on=["conv_id", "turn_idx"], suffixes=("", "_src")
    )
    assert (merged["text"] == merged["text_src"]).all()


def test_random_shuffle_seed_reproducible():
    import ray.data

    ds1 = ray.data.range(1000).random_shuffle(seed=7).take_all()
    ds2 = ray.data.range(1000).random_shuffle(seed=7).take_all()
    assert ds1 == ds2
    ds3 = ray.data.range(1000).random_shuffle(seed=8).take_all()
    assert ds1 != ds3
    assert sorted(r["id"] for r in ds1) == list(range(1000))


def test_results_invariant_across_num_cpus(tmp_path):
    """FIXTURES golden check 6 literally: fresh ray sessions at two
    num_cpus levels produce byte-identical routed results."""
    import hashlib
    import subprocess
    import sys
    import textwrap

    from opentelemetry_collector_ray.fixtures import write_transcript_corpus

    corpus = str(tmp_path / "corpus")
    write_transcript_corpus(corpus, 100, files=4)

    def run(ncpu: int) -> str:
        code = textwrap.dedent(
            f"""
            import sys, hashlib
            sys.path.insert(0, "/root/repo")
            import ray
            ray.init(address="local", num_cpus={ncpu},
                     include_dashboard=False, logging_level="ERROR")
            from ray.data import DataContext
            DataContext.get_current().enable_progress_bars = False
            import __ray_entry__  # pickle-by-value registration
            from opentelemetry_collector_ray.sources.transcripts import read_transcripts
            from opentelemetry_collector_ray.stages.parse import parse_batch
            from opentelemetry_collector_ray.stages.enrich import enrich_batch
            from opentelemetry_collector_ray.stages.route import explode_sinks_batch
            ds = read_transcripts("{corpus}")
            ds = ds.map_batches(parse_batch, batch_format="pyarrow")
            ds = ds.map_batches(enrich_batch, batch_format="pyarrow")
            df = ds.map_batches(explode_sinks_batch, batch_format="pyarrow").to_pandas()
            df = df.sort_values(["sink", "conv_id", "turn_idx"], kind="mergesort")
            df = df[sorted(df.columns)].reset_index(drop=True)
            print(hashlib.md5(df.astype(str).to_csv(index=False).encode()).hexdigest())
            ray.shutdown()
            """
        )
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            check=True,
            cwd="/tmp",
        ).stdout
        return out.strip().splitlines()[-1]

    assert run(2) == run(4)


def test_curation_pipeline_invariant_across_block_counts():
    """The full curation composite (quality → dedup → mix → chunk) is
    a pure function of the corpus — identical output under different
    block layouts (dedup's min-id representative and mix's integer
    keep rule are both layout-free)."""
    import __ray_entry__ as em

    a = (
        em.queries()["curate_full"]("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    import ray.data

    from opentelemetry_collector_ray.stages.dedup import exact_dedup
    from opentelemetry_collector_ray.stages.text import (
        chunk_batch,
        mix_sample,
        quality_batch,
    )
    import pyarrow.compute as pc

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang"],
    ).repartition(13)
    scored = docs.map_batches(quality_batch, batch_format="pyarrow")
    kept = scored.map_batches(
        lambda t: t.filter(pc.equal(t["quality_score"], 2)),
        batch_format="pyarrow",
    )
    deduped = exact_dedup(kept, col="text", id_col="doc_id")
    mixed = mix_sample(deduped, {"en": 60}, default_rate=30)
    b = (
        mixed.map_batches(
            lambda t: chunk_batch(t, size=50, stride=40),
            batch_format="pyarrow",
        )
        .select_columns(["doc_id", "chunk_idx", "chunk_text"])
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
