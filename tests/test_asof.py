"""Brute-force equivalence for the Arrow-native asof_join kernel
(functions/relational.py): random (key, ts) data with deliberate
equal-ts collisions, keys with no right rows, left rows before any
right row, and string keys — compared against a per-row Python oracle.
"""

import numpy as np
import pandas as pd
import pytest

import ray

from datax_ray.functions.relational import asof_join


def _brute(left: pd.DataFrame, right: pd.DataFrame, key, lts, rts, rpay):
    """O(L*R) reference: greatest right ts <= left ts per key (inner)."""
    rows = []
    by_key = {k: g.sort_values(rts, kind="stable") for k, g in right.groupby(key)}
    for _, lrow in left.iterrows():
        g = by_key.get(lrow[key])
        if g is None:
            continue
        elig = g[g[rts] <= lrow[lts]]
        if elig.empty:
            continue
        m = elig.iloc[-1]
        rows.append({**lrow.to_dict(), **{c: m[c] for c in rpay}})
    return pd.DataFrame(rows)


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("seed,n_keys", [(0, 7), (1, 40), (2, 1)])
def test_asof_matches_bruteforce(seed, n_keys):
    rng = np.random.default_rng(seed)
    nl, nr = 400, 150
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, nl),
            "lts": rng.integers(0, 50, nl).astype(np.int64),
            "lid": np.arange(nl, dtype=np.int64),
        }
    )
    # right unique per (key, ts) — the operator's documented contract
    right = (
        pd.DataFrame(
            {
                "k": rng.integers(0, n_keys + 3, nr),  # some keys left-only
                "rts": rng.integers(0, 50, nr).astype(np.int64),
            }
        )
        .drop_duplicates(["k", "rts"])
        .reset_index(drop=True)
    )
    right["rv"] = np.arange(len(right), dtype=np.int64) * 10

    got = asof_join(
        ray.data.from_pandas(left).repartition(5),
        ray.data.from_pandas(right).repartition(3),
        key="k",
        left_ts="lts",
        right_ts="rts",
        num_buckets=4,
    ).to_pandas()
    want = _brute(left, right, "k", "lts", "rts", ["rts", "rv"])
    assert list(got.columns) == ["k", "lts", "lid", "rts", "rv"]
    pd.testing.assert_frame_equal(
        _sorted(got), _sorted(want), check_dtype=False
    )


def test_asof_equal_ts_counts_as_match_and_string_keys():
    left = pd.DataFrame(
        {"k": ["a", "a", "b", "c"], "lts": np.array([10, 5, 10, 10], np.int64)}
    )
    right = pd.DataFrame(
        {"k": ["a", "a", "b"], "rts": np.array([10, 3, 11], np.int64),
         "rv": np.array([1, 2, 3], np.int64)}
    )
    got = asof_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        key="k", left_ts="lts", right_ts="rts", num_buckets=2,
    ).to_pandas()
    got = _sorted(got)
    # a@10 matches the equal-ts right row (rv=1); a@5 matches rv=2;
    # b@10 has no right row at-or-before; c has no right rows at all.
    assert len(got) == 2
    assert set(zip(got["k"], got["lts"], got["rv"])) == {("a", 10, 1), ("a", 5, 2)}


def test_asof_no_matches_emits_typed_empty():
    left = pd.DataFrame({"k": np.array([1, 2], np.int64),
                         "lts": np.array([0, 0], np.int64)})
    right = pd.DataFrame({"k": np.array([1, 2], np.int64),
                          "rts": np.array([5, 9], np.int64),
                          "rv": np.array([7, 8], np.int64)})
    out = asof_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        key="k", left_ts="lts", right_ts="rts", num_buckets=2,
    )
    # the typed-empty guard is on the DATASET schema: every per-bucket
    # block is a 0-row table that still carries all four columns (Ray's
    # to_pandas drops columns for all-empty datasets, so assert upstream)
    assert out.schema().names == ["k", "lts", "rts", "rv"]
    assert out.count() == 0
