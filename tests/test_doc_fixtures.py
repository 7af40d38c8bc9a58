"""Deterministic documents fixture (fixtures.gen_documents) — the
dedup-stress twin of the transcript generator: planted near-dup
clusters, range-concat stability, schema parity with testdata, and
MinHash actually finding the planted pairs."""

import numpy as np
import pyarrow as pa

from opentelemetry_collector_ray.fixtures import (
    gen_documents,
    write_documents_corpus,
)


def _jac(a: str, b: str) -> float:
    sa, sb = set(a.split()), set(b.split())
    return len(sa & sb) / len(sa | sb)


def test_schema_matches_testdata():
    import pyarrow.parquet as pq

    ref = pq.ParquetFile(
        "/root/testdata/sf0.001/documents.parquet"
    ).schema_arrow
    got = gen_documents(5).schema
    assert got.names == ref.names
    assert [str(f.type) for f in got] == [str(f.type) for f in ref]


def test_planted_structure_and_determinism():
    t = gen_documents(1000)
    txts = t["text"].to_pylist()
    # groups of 5 by base b: r∈{1,2} near-dup the base, r∈{3,4} don't
    for b in (0, 25, 995 - 995 % 5):
        assert _jac(txts[b], txts[b + 1]) > 0.85
        assert _jac(txts[b], txts[b + 2]) > 0.85
        assert _jac(txts[b], txts[b + 3]) < 0.2
        assert _jac(txts[b], txts[b + 4]) < 0.2
    # bit-stable and range-concatenable (corpus grows by doc range)
    assert gen_documents(1000)["text"].to_pylist() == txts
    assert (
        gen_documents(10, start_doc=990)["text"].to_pylist() == txts[990:]
    )
    assert t["n_chars"].to_pylist()[7] == len(txts[7])


def test_minhash_finds_planted_dups(ray_session, tmp_path):
    import ray.data

    from opentelemetry_collector_ray.stages.dedup import (
        minhash_candidates,
        verify_jaccard_pairs_joined,
    )

    write_documents_corpus(str(tmp_path / "docs"), 500, files=4)
    ds = ray.data.read_parquet(str(tmp_path / "docs"))
    cand = minhash_candidates(ds)
    # word-set Jaccard of a planted dup is ≥0.94, but SHINGLE-level
    # Jaccard dips to ~0.8 at the shortest L=30 docs (one changed word
    # touches 3 of 28 trigrams) — verify at 0.7 to keep every planted
    # pair while unrelated docs (shingle J ≈ 0) stay out
    pairs = verify_jaccard_pairs_joined(
        cand, ds, threshold=0.7
    ).to_pandas()
    got = {
        (int(a), int(b))
        for a, b in zip(pairs["doc_a"], pairs["doc_b"])
    }
    # every planted (b, b+1) and (b, b+2) pair recalled — one changed
    # word, shingle J ≈ (L-5)/(L+1) ≥ 0.8 ≥ threshold. (b+1, b+2)
    # differ in TWO words (shingle J ~0.65 at L=30) so they rightly
    # fall below the 0.7 verify bar for short docs; don't require them
    planted = set()
    for b in range(0, 500, 5):
        planted |= {(b, b + 1), (b, b + 2)}
    recall = len(got & planted) / len(planted)
    assert recall > 0.95, recall
    # and nothing across groups
    cross = [
        (a, b) for a, b in got if a // 5 != b // 5
    ]
    assert not cross, cross[:5]
