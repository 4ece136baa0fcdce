"""triangle_counts (degree-ordered wedge join) vs a brute-force census,
and the vectorized run-pair expansion it builds on."""

from itertools import combinations

import numpy as np
import pyarrow as pa

import ray.data

from datax_ray.functions.graph import _run_pairs, triangle_counts


def test_run_pairs_matches_bruteforce():
    rng = np.random.default_rng(7)
    for _ in range(20):
        n_runs = rng.integers(1, 8)
        key = np.sort(rng.integers(0, n_runs, size=rng.integers(0, 30)))
        i, j = _run_pairs(key)
        got = sorted(zip(i.tolist(), j.tolist()))
        want = sorted(
            (a, b)
            for a, b in combinations(range(len(key)), 2)
            if key[a] == key[b]
        )
        assert got == want


def test_run_pairs_empty():
    i, j = _run_pairs(np.empty(0, dtype=np.int64))
    assert len(i) == 0 and len(j) == 0


def _brute_triangles(edge_set: set) -> dict:
    adj = {}
    for u, v in edge_set:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    counts = {}
    for u, v, w in combinations(sorted(adj), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            for x in (u, v, w):
                counts[x] = counts.get(x, 0) + 1
    return counts


def test_triangle_counts_random_graphs():
    rng = np.random.default_rng(11)
    for trial in range(3):
        n = int(rng.integers(10, 40))
        edges = set()
        for _ in range(int(rng.integers(n, 4 * n))):
            u, v = rng.integers(0, n, size=2)
            if u != v:
                edges.add((min(u, v), max(u, v)))
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "u": pa.array([e[0] for e in edges], pa.int64()),
                    "v": pa.array([e[1] for e in edges], pa.int64()),
                }
            )
        )
        got = {
            r["node"]: r["n"]
            for r in triangle_counts(ds, num_buckets=5).take_all()
        }
        assert got == _brute_triangles(edges)


def test_triangle_counts_skewed_hub():
    # one hub connected to everyone plus a ring: every ring edge closes a
    # triangle through the hub — exercises the degree-orientation path
    # where the hub must be the HIGH-rank endpoint of all its edges
    n = 30
    edges = {(i, n) for i in range(n)} | {
        (min(i, (i + 1) % n), max(i, (i + 1) % n)) for i in range(n)
    }
    ds = ray.data.from_arrow(
        pa.table(
            {
                "u": pa.array([e[0] for e in edges], pa.int64()),
                "v": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    got = {
        r["node"]: r["n"] for r in triangle_counts(ds, num_buckets=4).take_all()
    }
    assert got == _brute_triangles(edges)
