"""Banded-Levenshtein kernel vs a reference DP, and fuzzy_pairs vs the
brute-force all-pairs answer on the part-name vocabulary."""

import numpy as np
import pyarrow as pa
import pytest

from datax_ray.functions.fuzzy import banded_levenshtein, fuzzy_pairs


def _ref_lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev = d[0]
        d[0] = i
        for j in range(1, lb + 1):
            cur = d[j]
            d[j] = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return d[lb]


CASES = [
    ("", ""),
    ("", "ab"),
    ("abc", ""),
    ("abc", "abc"),
    ("abc", "abd"),
    ("abc", "abcd"),
    ("abcd", "abc"),
    ("kitten", "sitting"),
    ("cold rod", "blue rod"),
    ("old anvil", "cold anvil"),
    ("widget", "widgets"),
    ("small widget", "smell widget"),
    ("aaaa", "bbbb"),
]


@pytest.mark.parametrize("k", [1, 2, 3])
def test_banded_matches_reference_within_k(k):
    a = [x for x, _ in CASES]
    b = [y for _, y in CASES]
    got = banded_levenshtein(a, b, k=k)
    for (x, y), g in zip(CASES, got):
        true = _ref_lev(x, y)
        if true <= k:
            assert g == true, (x, y, k, g, true)
        else:
            assert g > k, (x, y, k, g, true)


def test_banded_random_strings_exact_within_band():
    rng = np.random.default_rng(7)
    alpha = list("abcde")
    a, b = [], []
    for _ in range(300):
        la = int(rng.integers(0, 9))
        lb = int(rng.integers(0, 9))
        a.append("".join(rng.choice(alpha, la)))
        b.append("".join(rng.choice(alpha, lb)))
    got = banded_levenshtein(a, b, k=2)
    for x, y, g in zip(a, b, got):
        true = _ref_lev(x, y)
        assert (g == true) if true <= 2 else (g > 2), (x, y, g, true)


def test_fuzzy_pairs_matches_bruteforce(ray_session):
    import ray.data

    names = [
        "cold rod", "bold rod", "blue rod", "cold rods", "old anvil",
        "cold anvil", "widget", "widgets", "wodget", "spark", "sharc",
        "small widget", "smell widget", "x", "xy", "xyz",
    ]
    # duplicate rows: fuzzy_pairs must dedup to distinct first
    ds = ray.data.from_arrow(pa.table({"name": names * 3}))
    got = fuzzy_pairs(ds, "name", k=2).to_pandas()
    got_set = {(r.name_a, r.name_b, r.dist) for r in got.itertuples()}

    want = set()
    uniq = sorted(set(names))
    for i in range(len(uniq)):
        for j in range(i + 1, len(uniq)):
            d = _ref_lev(uniq[i], uniq[j])
            if d <= 2:
                want.add((uniq[i], uniq[j], d))
    assert got_set == want
