"""Column-level LWW patch merge (stages/merge.py patch kernels).

Contract: per key, per payload column, the final value comes from the
highest-lsn event that SET that column (non-null); null means not-set.
The reduce must be associative + commutative — any batch split / merge
order yields the same final state as a sequential per-event fold.
"""

import numpy as np
import pyarrow as pa
import pytest

from datax_ray.stages.merge import (
    finalize_patches,
    reduce_patch_partials,
    to_patch_partials,
)

PAYLOAD = ("role", "text", "tool")


def _events(n, seed):
    """Random patch events: each sets a random non-empty subset of columns."""
    rng = np.random.default_rng(seed)
    keys_conv = [f"c{int(k)}" for k in rng.integers(0, 8, n)]
    keys_turn = rng.integers(0, 4, n).astype(np.int32)
    lsn = rng.permutation(n).astype(np.int64)  # unique, arbitrary order
    cols = {"conv_id": pa.array(keys_conv), "turn_idx": pa.array(keys_turn),
            "lsn": pa.array(lsn)}
    for c in PAYLOAD:
        vals = [f"{c}-{l}" if rng.random() < 0.5 else None for l in lsn]
        cols[c] = pa.array(vals, pa.string())
    # guarantee at least one fully-set event so no all-null groups surprise
    return pa.table(cols)


def _sequential_fold(t):
    """Reference: apply events one at a time in lsn order."""
    state = {}
    order = np.argsort(t["lsn"].to_numpy())
    rows = t.to_pylist()
    for i in order:
        r = rows[i]
        key = (r["conv_id"], r["turn_idx"])
        cur = state.setdefault(key, {c: None for c in PAYLOAD})
        for c in PAYLOAD:
            if r[c] is not None:
                cur[c] = r[c]
    return {
        k: tuple(v[c] for c in PAYLOAD) for k, v in state.items()
    }


def _kernel_result(t, splits):
    """Split into `splits` chunks, combine each, merge partials pairwise in
    a shuffled order (exercises associativity + commutativity)."""
    parts = []
    n = t.num_rows
    bounds = np.linspace(0, n, splits + 1).astype(int)
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        if hi > lo:
            parts.append(
                reduce_patch_partials(
                    to_patch_partials(t.slice(lo, hi - lo), PAYLOAD), PAYLOAD
                )
            )
    rng = np.random.default_rng(splits)
    rng.shuffle(parts)
    merged = parts[0]
    for p in parts[1:]:
        merged = reduce_patch_partials(pa.concat_tables([merged, p]), PAYLOAD)
    final = finalize_patches(merged, PAYLOAD)
    return {
        (r["conv_id"], r["turn_idx"]): tuple(r[c] for c in PAYLOAD)
        for r in final.to_pylist()
    }


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("splits", [1, 3, 7])
def test_patch_reduce_matches_sequential_fold(seed, splits):
    t = _events(400, seed)
    assert _kernel_result(t, splits) == _sequential_fold(t)


def test_null_means_not_set_not_overwrite():
    t = pa.table(
        {
            "conv_id": pa.array(["a", "a"]),
            "turn_idx": pa.array([0, 0], pa.int32()),
            "lsn": pa.array([1, 2], pa.int64()),
            "role": pa.array(["user", None], pa.string()),
            "text": pa.array([None, "hello"], pa.string()),
            "tool": pa.array([None, None], pa.string()),
        }
    )
    out = finalize_patches(
        reduce_patch_partials(to_patch_partials(t, PAYLOAD), PAYLOAD), PAYLOAD
    ).to_pylist()
    assert out == [
        {"conv_id": "a", "turn_idx": 0, "role": "user", "text": "hello", "tool": None}
    ]


def test_later_set_wins_regardless_of_row_order():
    for rows in ([(1, "x"), (9, "y")], [(9, "y"), (1, "x")]):
        t = pa.table(
            {
                "conv_id": pa.array(["k", "k"]),
                "turn_idx": pa.array([0, 0], pa.int32()),
                "lsn": pa.array([r[0] for r in rows], pa.int64()),
                "role": pa.array([r[1] for r in rows], pa.string()),
                "text": pa.array([None, None], pa.string()),
                "tool": pa.array([None, None], pa.string()),
            }
        )
        out = finalize_patches(
            reduce_patch_partials(to_patch_partials(t, PAYLOAD), PAYLOAD),
            PAYLOAD,
        ).to_pylist()
        assert out[0]["role"] == "y"
