"""Skew guard for the hash-partitioned join (relational.large_join
hot_key_salt): a zipf-hot key must not change results when its rows are
salted across aggregators."""

import numpy as np
import pandas as pd
import pytest

import ray

from datax_ray.functions.relational import large_join, semi_join


def _skewed_sides(n=20_000, n_keys=97):
    # key 7 holds half of all rows — the single-aggregator hot spot
    keys = np.where(np.arange(n) % 2 == 0, 7, np.arange(n) % n_keys)
    left = ray.data.from_pandas(
        pd.DataFrame({"k": keys.astype("int64"), "v": np.arange(n, dtype="int64")})
    ).repartition(16)
    right = ray.data.from_pandas(
        pd.DataFrame(
            {
                "k": np.arange(n_keys, dtype="int64"),
                "w": (np.arange(n_keys) * 10).astype("int64"),
            }
        )
    )
    return left, right


def _sorted(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_salted_inner_join_matches_plain():
    left, right = _skewed_sides()
    plain = large_join(left, right, on="k", num_partitions=8).to_pandas()
    salted = large_join(
        left, right, on="k", num_partitions=8, hot_key_salt=8
    ).to_pandas()
    pd.testing.assert_frame_equal(_sorted(plain), _sorted(salted))
    assert len(salted) == 20_000  # every left row matched exactly once


def test_salted_semi_anti_match_plain():
    left, right = _skewed_sides()
    # right missing key 7: the hot key must fall out of semi, into anti
    right = right.filter(lambda r: r["k"] != 7)
    semi_p = semi_join(left, right, on="k").to_pandas()
    semi_s = semi_join(left, right, on="k", hot_key_salt=8).to_pandas()
    pd.testing.assert_frame_equal(_sorted(semi_p), _sorted(semi_s))
    anti_p = semi_join(left, right, on="k", anti=True).to_pandas()
    anti_s = semi_join(left, right, on="k", anti=True, hot_key_salt=8).to_pandas()
    pd.testing.assert_frame_equal(_sorted(anti_p), _sorted(anti_s))
    # every anti row carries the dropped hot key (10k even rows + the odd
    # rows whose index % 97 == 7)
    assert (anti_s["k"] == 7).all() and len(anti_s) >= 10_000


def test_salt_rejects_right_outer():
    left, right = _skewed_sides()
    with pytest.raises(AssertionError):
        large_join(left, right, on="k", join_type="right_outer", hot_key_salt=4)
