"""SemDeDup semantic dedup (functions/similarity.py:semdedup): planted
near-duplicate collapse, exact agreement with a sequential reference on
the same deterministic clustering, and layout invariance."""

import numpy as np
import pyarrow as pa

import ray.data

from datax_ray.functions.similarity import _unit, kmeans_fit, semdedup


def _planted(n_groups=12, dups_per_group=3, dim=16, seed=5):
    """n_groups well-separated base vectors; each group = one base plus
    near-copies (tiny noise, cosine > 0.99 to the base). Groups are
    pushed apart so near-dups never straddle groups."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_groups, dim))
    base += np.eye(n_groups, dim) * 12.0  # separate the groups
    base = _unit(base)
    vecs, gid = [], []
    for g in range(n_groups):
        for d in range(dups_per_group):
            v = base[g] + rng.normal(scale=1e-3, size=dim)
            vecs.append(_unit(v[None, :])[0])
            gid.append(g)
    ids = np.arange(len(vecs), dtype=np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array([list(map(float, v)) for v in vecs]),
        }
    )
    return t, np.asarray(gid)


def _reference(t, centroids, tau):
    """Sequential greedy keep-lowest-id dedup on the SAME assignment."""
    mat = _unit(np.asarray(t["embedding"].to_pylist(), dtype=np.float64))
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    assign = np.argmax(mat @ _unit(centroids).T, axis=1)
    kept = []
    for c in np.unique(assign):
        sel = np.flatnonzero(assign == c)
        sel = sel[np.argsort(ids[sel])]
        m = mat[sel]
        sims = m @ m.T
        mask = np.zeros(len(sel), dtype=bool)
        for i in range(len(sel)):
            if not mask[:i].any() or sims[i, :i][mask[:i]].max() < tau:
                mask[i] = True
        kept.extend(ids[sel[mask]].tolist())
    return sorted(kept)


def test_semdedup_collapses_planted_groups(ray_session):
    t, gid = _planted()
    ds = ray.data.from_arrow(t).repartition(4)
    out = semdedup(ds, k=12, iters=4, threshold_milli=950).to_pandas()
    survivors = sorted(out["vec_id"])
    # every planted group keeps at least one row, and the total collapses
    # well below the input (near-copies sit at cosine ~0.999)
    surv_groups = set(gid[np.asarray(survivors, dtype=int)])
    assert surv_groups == set(range(12))
    assert len(survivors) < t.num_rows
    assert len(survivors) >= 12


def test_semdedup_matches_sequential_reference(ray_session):
    t, _ = _planted(n_groups=8, dups_per_group=4)
    ds = ray.data.from_arrow(t).repartition(3)
    centroids, _hist = kmeans_fit(ds, k=8, iters=4)
    got = sorted(semdedup(ds, k=8, iters=4, threshold_milli=950)
                 .to_pandas()["vec_id"])
    want = _reference(t, centroids, 0.950)
    assert got == want


def test_semdedup_layout_invariant(ray_session):
    t, _ = _planted(n_groups=6, dups_per_group=5, seed=9)
    a = sorted(
        semdedup(ray.data.from_arrow(t), k=6, iters=3).to_pandas()["vec_id"]
    )
    b = sorted(
        semdedup(ray.data.from_arrow(t).repartition(7), k=6, iters=3)
        .to_pandas()["vec_id"]
    )
    assert a == b
