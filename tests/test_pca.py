"""Distributed PCA over embeddings (pipelines/queries.py:
pca_project_embeddings): layout-exact determinism (integer-exact moment
folds), variance ordering of the components, and agreement with a
single-machine numpy PCA on the same quantization."""

import numpy as np

from datax_ray.pipelines.queries import pca_project_embeddings

SF = "/root/testdata/sf0.001"


def _run(sf=SF):
    df = pca_project_embeddings(sf).to_pandas()
    return df.sort_values("vec_id").reset_index(drop=True)


def test_pca_deterministic_across_runs(ray_session):
    a, b = _run(), _run()
    assert a.equals(b)


def test_pca_variance_ordering(ray_session):
    df = _run()
    assert df["pc1_milli"].var() >= df["pc2_milli"].var()
    # projections are centered: mean ~ 0 at milli scale
    assert abs(df["pc1_milli"].mean()) < 1000


def test_pca_matches_numpy_reference(ray_session):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    q = np.trunc(vecs * 1000.0)
    mu = q.mean(axis=0)
    cov = (q.T @ q) / len(q) - np.outer(mu, mu)
    eigval, eigvec = np.linalg.eigh(cov)
    comps = eigvec[:, np.argsort(eigval)[::-1][:2]].T.copy()
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1
    want = np.trunc((q - mu) @ comps.T)

    df = _run()
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids)
    got = df[["pc1_milli", "pc2_milli"]].to_numpy()
    assert np.array_equal(got, want[order].astype(np.int64))
