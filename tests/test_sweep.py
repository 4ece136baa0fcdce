"""Distributed interval sweep-line (functions/ordered.py:sweep_peak):
exact agreement with a naive single-machine reference on random interval
sets, layout/bucket-width invariance, and [start, end) boundary
semantics (an end at ts frees its slot before a same-instant start)."""

import numpy as np
import pyarrow as pa

import ray.data

from datax_ray.functions.ordered import sweep_peak


def _points_table(keys, starts, ends):
    n = len(keys)
    return pa.table(
        {
            "k": pa.array(list(keys) * 2, pa.string()),
            "p": pa.array(list(starts) + list(ends), pa.int64()),
            "delta": pa.array([1] * n + [-1] * n, pa.int64()),
        }
    )


def _naive_peak(keys, starts, ends):
    out = {}
    for k in set(keys):
        pts = []
        for kk, s, e in zip(keys, starts, ends):
            if kk == k:
                pts.append((s, 1))
                pts.append((e, -1))
        pts.sort()  # (ts, delta): -1 sorts before +1 at equal ts
        run = peak = 0
        for _, d in pts:
            run += d
            peak = max(peak, run)
        out[k] = peak
    return out


def _random_case(seed, n=400, n_keys=3, span=10_000_000):
    rng = np.random.default_rng(seed)
    keys = [f"k{v}" for v in rng.integers(0, n_keys, n)]
    starts = rng.integers(0, span, n).astype(np.int64)
    ends = starts + rng.integers(1, span // 4, n).astype(np.int64)
    return keys, starts, ends


def test_sweep_peak_matches_naive(ray_session):
    for seed in (1, 2, 3):
        keys, starts, ends = _random_case(seed)
        ds = ray.data.from_arrow(_points_table(keys, starts, ends)).repartition(5)
        got = {
            r["k"]: r["peak"]
            for r in sweep_peak(
                ds, key_col="k", ts_col="p", delta_col="delta",
                bucket_us=1_000_000,
            ).take_all()
        }
        assert got == _naive_peak(keys, starts, ends), f"seed {seed}"


def test_sweep_peak_bucket_and_layout_invariant(ray_session):
    keys, starts, ends = _random_case(7, n=300)
    t = _points_table(keys, starts, ends)
    base = None
    for bucket, parts in ((500_000, 1), (2_000_000, 4), (10_000_000_000, 7)):
        ds = ray.data.from_arrow(t).repartition(parts)
        got = sorted(
            (r["k"], r["peak"])
            for r in sweep_peak(
                ds, key_col="k", ts_col="p", delta_col="delta", bucket_us=bucket
            ).take_all()
        )
        if base is None:
            base = got
        assert got == base


def test_sweep_peak_end_frees_before_start(ray_session):
    # [0, 10) then [10, 20): never concurrent — peak must be 1
    t = _points_table(["a", "a"], [0, 10], [10, 20])
    out = sweep_peak(
        ray.data.from_arrow(t), key_col="k", ts_col="p", delta_col="delta"
    ).take_all()
    assert out == [{"k": "a", "peak": 1}]
