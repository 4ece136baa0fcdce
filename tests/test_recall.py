"""Recall floors for the APPROXIMATE dedup/similarity family, measured
against planted ground truth (fixtures/generator.py near-dup fixtures) —
a distribution-independent spec, replacing any temptation to tune
thresholds to one dataset's accidental cosine/jaccard distribution.

Everything is seeded/deterministic, so the floors are stable; they sit a
margin below the observed values to absorb library-version drift."""

import numpy as np
import pytest
import ray.data

from datax_ray.fixtures.generator import (
    gen_docs_with_near_dups,
    gen_embeddings_with_near_dups,
)


def _recall(found_pairs, planted):
    found = {tuple(sorted(p)) for p in found_pairs}
    hit = sum(1 for p in planted if tuple(sorted(p)) in found)
    return hit / max(1, len(planted))


@pytest.fixture(scope="module")
def dup_docs():
    table, planted = gen_docs_with_near_dups(n_docs=300, n_dup_pairs=30, mutate=2)
    return ray.data.from_arrow(table), table, planted


def test_minhash_recall_vs_planted(dup_docs):
    from datax_ray.functions.dedup import minhash_lsh_pairs, ngram_jaccard

    ds, table, planted = dup_docs
    texts = table["text"].to_pylist()
    # fixture sanity: every planted pair truly exceeds the threshold
    assert all(ngram_jaccard(texts[a], texts[b]) >= 0.6 for a, b in planted)
    pairs = minhash_lsh_pairs(ds, threshold=0.6).take_all()
    got = [(r["doc_a"], r["doc_b"]) for r in pairs]
    assert _recall(got, planted) >= 0.8


def test_ngram_exact_pairs_recall_and_precision(dup_docs):
    from datax_ray.functions.dedup import ngram_jaccard, ngram_jaccard_pairs

    ds, table, planted = dup_docs
    texts = table["text"].to_pylist()
    out = ngram_jaccard_pairs(ds, threshold=0.6).take_all()
    got = [(r["doc_a"], r["doc_b"]) for r in out]
    assert _recall(got, planted) >= 0.8
    # exactness: every emitted pair REALLY has jaccard >= threshold, and the
    # reported score matches a direct computation
    for r in out:
        j = ngram_jaccard(texts[r["doc_a"]], texts[r["doc_b"]])
        assert j >= 0.6 and abs(j - r["jaccard"]) < 1e-12


def test_simhash_recall_vs_planted():
    """The 4×16-bit banding GUARANTEES (pigeonhole) that any pair within
    Hamming distance 3 shares a band — recall over truly-close planted
    pairs must be exactly 1.0, not a tuned floor."""
    from datax_ray.functions.dedup import SimHasher, simhash_pairs

    table, planted = gen_docs_with_near_dups(
        n_docs=300, n_dup_pairs=30, n_tokens=120, mutate=1, seed=13
    )
    texts = table["text"].to_pylist()
    sh = SimHasher()
    close = [
        (a, b)
        for a, b in planted
        if bin(int(sh.simhash(texts[a]) ^ sh.simhash(texts[b]))).count("1") <= 3
    ]
    assert len(close) >= 5  # fixture actually produces in-guarantee pairs
    pairs = simhash_pairs(ray.data.from_arrow(table), max_hamming=3).take_all()
    got = [(r["doc_a"], r["doc_b"]) for r in pairs]
    assert _recall(got, close) == 1.0


def test_embedding_dup_recall_vs_planted():
    from datax_ray.functions.dedup import embedding_dup_pairs

    table, planted = gen_embeddings_with_near_dups(n=500, n_dup_pairs=40)
    pairs = embedding_dup_pairs(
        ray.data.from_arrow(table), threshold=0.95, num_planes=8
    ).take_all()
    got = [(r["doc_a"], r["doc_b"]) for r in pairs]
    # 8-plane single-table LSH: P(same bucket) ~ (1-θ/π)^8 ≈ 0.97 at the
    # planted cosine ≈ 0.9998; no false pairs exist above 0.95.
    assert _recall(got, planted) >= 0.85
    assert all(r["cosine"] >= 0.95 for r in pairs)


def test_exact_all_pairs_ground_truth(dup_docs):
    """ngram_pairs_exact (inverted-index all-pairs) is EXACT: recall 1.0
    over planted pairs (they all have J >= 0.6 by fixture sanity), every
    emitted score matches a direct two-doc computation, and the LSH path's
    verified output is a subset of it. Also: bucket-count invariance."""
    from datax_ray.functions.dedup import (
        ngram_jaccard,
        ngram_jaccard_pairs,
        ngram_pairs_exact,
    )

    ds, table, planted = dup_docs
    texts = table["text"].to_pylist()
    out = ngram_pairs_exact(ds, threshold=0.6).take_all()
    got = {(r["doc_a"], r["doc_b"]) for r in out}
    assert _recall(got, planted) == 1.0
    for r in out:
        j = ngram_jaccard(texts[r["doc_a"]], texts[r["doc_b"]])
        assert j >= 0.6 and abs(j - r["jaccard"]) < 1e-12
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(ds, threshold=0.6).take_all()
    }
    assert lsh <= got
    # routing-invariance: different coarse-bucket counts, identical pairs
    out512 = ngram_pairs_exact(ds, threshold=0.6, num_buckets=512).take_all()
    assert {(r["doc_a"], r["doc_b"]) for r in out512} == got
