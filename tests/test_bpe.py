"""Distributed BPE tokenizer training (functions/bpe.py): exact merge-
table agreement with the textbook sequential reference, layout
invariance, and tie-break determinism."""

import pyarrow as pa

import ray.data

from datax_ray.functions.bpe import bpe_train, bpe_train_sequential

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new low",
    "the quick brown fox the the",
    "",
]


def _as_rows(table: pa.Table):
    return [
        (r["rank"], r["left"], r["right"], r["merged"], r["cnt"])
        for r in table.to_pylist()
    ]


def test_bpe_matches_sequential_reference(ray_session):
    ds = ray.data.from_items([{"text": t} for t in CORPUS]).repartition(3)
    got = _as_rows(bpe_train(ds, n_merges=10, min_count=2, num_buckets=4))
    want = [
        (r["rank"], r["left"], r["right"], r["merged"], r["cnt"])
        for r in bpe_train_sequential(CORPUS, n_merges=10, min_count=2)
    ]
    assert got == want
    assert len(got) > 0


def test_bpe_layout_invariant(ray_session):
    rows = [{"text": t} for t in CORPUS * 3]
    a = _as_rows(bpe_train(ray.data.from_items(rows), n_merges=6, num_buckets=2))
    b = _as_rows(
        bpe_train(ray.data.from_items(rows).repartition(5), n_merges=6,
                  num_buckets=8)
    )
    assert a == b


def test_bpe_tie_break_lexicographic(ray_session):
    # "ab" and "cd" both appear exactly 3 times: ('a','b') must win the
    # first merge on lexicographic order
    ds = ray.data.from_items([{"text": "ab cd ab cd ab cd"}])
    got = _as_rows(bpe_train(ds, n_merges=1, min_count=2, num_buckets=2))
    assert got == [(0, "a", "b", "ab", 3)]


def test_bpe_min_count_stops(ray_session):
    ds = ray.data.from_items([{"text": "xy"}])  # every pair count = 1
    assert bpe_train(ds, n_merges=4, min_count=2).num_rows == 0
