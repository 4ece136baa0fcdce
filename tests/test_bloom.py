"""Bloom pre-filtered semi-join: result equality with the exact join and
actual pre-shuffle row reduction."""

import numpy as np
import pandas as pd

import ray

from datax_ray.functions.relational import (
    _bloom_hashes,
    bloom_filter_bits,
    semi_join,
)


def _sides():
    left = ray.data.from_pandas(
        pd.DataFrame(
            {
                "k": (np.arange(20_000) % 10_000).astype("int64"),
                "v": np.arange(20_000, dtype="int64"),
            }
        )
    ).repartition(8)
    right = ray.data.from_pandas(
        pd.DataFrame({"k": np.arange(100, dtype="int64"), "w": np.ones(100, "int64")})
    )
    return left, right


def _sorted(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_bloom_semi_equals_exact():
    left, right = _sides()
    plain = semi_join(left, right, on="k").to_pandas()
    bloom = semi_join(left, right, on="k", bloom_bits=1 << 16).to_pandas()
    pd.testing.assert_frame_equal(_sorted(plain), _sorted(bloom))
    assert len(bloom) == 200  # keys 0..99 appear twice each on the left


def test_bloom_filter_reduces_stream():
    _, right = _sides()
    m_bits, k = 1 << 16, 3
    bits = bloom_filter_bits(right, "k", m_bits, k)
    probe = np.arange(10_000, dtype="int64")
    pos = _bloom_hashes(probe, m_bits, k)
    member = np.ones(len(probe), dtype=bool)
    for i in range(k):
        w = bits[(pos[i] >> np.uint64(6)).astype(np.int64)]
        member &= (w >> (pos[i] & np.uint64(63))) & np.uint64(1) != 0
    # no false negatives; false positives sparse at ~10+ bits/key
    assert member[:100].all()
    assert member.sum() <= 100 + 0.05 * len(probe)
