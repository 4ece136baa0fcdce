"""Contrastive hard-negative mining (functions/similarity.py:
hard_negatives): recall floor vs the exact brute-force reference,
layout invariance, and the no-other-label edge case."""

import numpy as np
import pyarrow as pa

import ray.data

from datax_ray.functions.similarity import _unit, hard_negatives


def _data(n=240, n_labels=4, dim=16, seed=13):
    rng = np.random.default_rng(seed)
    centers = _unit(rng.normal(size=(6, dim)) * 3)
    cluster = rng.integers(0, 6, n)
    vecs = _unit(centers[cluster] + rng.normal(scale=0.25, size=(n, dim)))
    labels = rng.integers(0, n_labels, n)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([list(map(float, v)) for v in vecs]),
            "label": pa.array(labels.astype(np.int32)),
        }
    )
    return t, vecs, labels


def _exact(vecs, labels):
    sims = np.trunc(vecs @ vecs.T * 1000).astype(np.int64)
    out = {}
    for i in range(len(vecs)):
        mask = labels != labels[i]
        if not mask.any():
            continue
        cand = np.flatnonzero(mask)
        best_cos = sims[i, cand].max()
        best_ids = cand[sims[i, cand] == best_cos]
        out[i] = (int(best_ids.min()), int(best_cos))
    return out


def test_hard_negative_recall_floor(ray_session):
    t, vecs, labels = _data()
    got = {
        r["vec_id"]: (r["neg_id"], r["cos_milli"])
        for r in hard_negatives(
            ray.data.from_arrow(t).repartition(4), k=6, iters=4, probes=2
        ).take_all()
    }
    want = _exact(vecs, labels)
    assert set(got) == set(want)  # everyone with an other-label row gets one
    hits = sum(1 for i in want if got[i] == want[i])
    assert hits / len(want) >= 0.9, f"recall {hits / len(want):.3f}"
    # and every returned cos is <= the true best (cannot exceed exact)
    assert all(got[i][1] <= want[i][1] for i in want)


def test_hard_negative_layout_invariant(ray_session):
    t, _, _ = _data(n=150, seed=29)
    a = sorted(
        map(tuple, hard_negatives(ray.data.from_arrow(t), k=5, iters=3)
            .to_pandas().to_numpy())
    )
    b = sorted(
        map(tuple, hard_negatives(
            ray.data.from_arrow(t).repartition(7), k=5, iters=3
        ).to_pandas().to_numpy())
    )
    assert a == b


def test_hard_negative_single_label_empty(ray_session):
    t = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array([[1.0, 0.0], [0.9, 0.1], [0.8, 0.2]]),
            "label": pa.array([7, 7, 7], pa.int32()),
        }
    )
    out = hard_negatives(ray.data.from_arrow(t), k=2, iters=2).take_all()
    assert out == []
