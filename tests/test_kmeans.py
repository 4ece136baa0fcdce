"""Distributed Lloyd's k-means (functions/similarity.py:kmeans_fit).

Contract: (1) per-iteration inertia is non-increasing (Lloyd's property —
the single strongest correctness signal for an iterative clustering);
(2) the distributed combiner computes the SAME means as a sequential
single-process Lloyd's from the same deterministic seed (up to float
summation order); (3) the hash-deterministic seeding is independent of
the block layout, so two different partitionings produce the same model.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from datax_ray.functions.similarity import (
    _hash_priority,
    _unit,
    kmeans_assign,
    kmeans_fit,
)

K, ITERS, DIM, N = 6, 4, 12, 800


@pytest.fixture(scope="module")
def table():
    rng = np.random.default_rng(42)
    # planted clusters so the fit has real structure
    centers = rng.normal(size=(K, DIM))
    assign = rng.integers(0, K, N)
    mat = centers[assign] + 0.15 * rng.normal(size=(N, DIM))
    return pa.table(
        {
            "vec_id": pa.array(np.arange(N, dtype=np.int64)),
            "embedding": pa.array(list(mat.astype(np.float32))),
        }
    )


def _sequential_reference(table):
    mat = _unit(
        np.stack(table["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
    )
    ids = table["vec_id"].to_numpy()
    seed_idx = np.argsort(_hash_priority(ids.astype(np.int64)))[:K]
    c = _unit(mat[seed_idx])
    history = []
    for _ in range(ITERS):
        assign = np.argmax(mat @ c.T, axis=1)
        cos = (mat * c[assign]).sum(axis=1)
        history.append(float((2.0 - 2.0 * cos).sum()))
        new_c = c.copy()
        for j in range(K):
            members = mat[assign == j]
            if len(members):
                new_c[j] = members.mean(axis=0)
        c = _unit(new_c)
    return c, history


def test_kmeans_matches_sequential_reference(table, ray_session):
    ds = ray.data.from_arrow(table).repartition(7)
    cents, history = kmeans_fit(ds, k=K, iters=ITERS)
    ref_cents, ref_history = _sequential_reference(table)
    np.testing.assert_allclose(cents, ref_cents, atol=1e-9)
    np.testing.assert_allclose(history, ref_history, atol=1e-7)


def test_kmeans_inertia_non_increasing(table, ray_session):
    ds = ray.data.from_arrow(table).repartition(5)
    _, history = kmeans_fit(ds, k=K, iters=ITERS)
    assert all(b <= a + 1e-9 for a, b in zip(history, history[1:]))


def test_kmeans_block_layout_invariant(table, ray_session):
    a, _ = kmeans_fit(ray.data.from_arrow(table).repartition(3), k=K, iters=2)
    b, _ = kmeans_fit(ray.data.from_arrow(table).repartition(11), k=K, iters=2)
    np.testing.assert_allclose(a, b, atol=1e-9)


def test_kmeans_assign_covers_all_rows(table, ray_session):
    ds = ray.data.from_arrow(table).repartition(4)
    cents, _ = kmeans_fit(ds, k=K, iters=2)
    out = kmeans_assign(ds, cents).to_pandas()
    assert len(out) == N
    assert set(out.cluster.unique()) <= set(range(K))
    assert out.cluster.nunique() >= 2  # planted structure found
