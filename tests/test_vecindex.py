"""Persistent IVF vector index (pipelines/vecindex.py): recall floor vs
exact brute force, fingerprint incrementality, and orphan cleanup."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray

from datax_ray.pipelines.vecindex import (
    refresh_vector_index,
    search_vector_index,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def src(tmp_path):
    """Copy of the embeddings table so mtime/content edits are safe."""
    dst = tmp_path / "embeddings.parquet"
    shutil.copy(os.path.join(SF, "embeddings.parquet"), dst)
    return str(dst)


def test_build_search_and_recall(src, tmp_path):
    idx = str(tmp_path / "idx")
    stats = refresh_vector_index(src, idx, n_lists=8, sample_size=512)
    assert stats["fitted"] and stats["refreshed"] >= 1

    t = pq.read_table(src)
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    q = mat[:3]

    got = search_vector_index(idx, q, k=10, nprobe=4).to_pandas()
    assert set(got.columns) == {"query_id", "vec_id", "cosine"}
    assert got.groupby("query_id").size().max() <= 10

    # exact brute-force oracle
    qu = q / np.linalg.norm(q, axis=1, keepdims=True)
    mu = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    recalls = []
    for qi in range(len(q)):
        cos = qu[qi] @ mu.T
        exact = set(ids[np.argsort(-cos)[:10]].tolist())
        approx = set(got[got["query_id"] == qi]["vec_id"].tolist())
        recalls.append(len(exact & approx) / 10)
    assert np.mean(recalls) >= 0.5  # nprobe=4 of 8 lists


def test_refresh_is_incremental(src, tmp_path):
    idx = str(tmp_path / "idx")
    first = refresh_vector_index(src, idx, n_lists=8, sample_size=512)
    assert first["refreshed"] >= 1
    second = refresh_vector_index(src, idx, n_lists=8, sample_size=512)
    assert second["refreshed"] == 0 and second["fitted"] is False
    assert second["skipped"] == first["refreshed"]

    # touching the source invalidates its fragments (mtime in fingerprint)
    os.utime(src, None)
    third = refresh_vector_index(src, idx, n_lists=8, sample_size=512)
    assert third["refreshed"] == first["refreshed"]
    # centroids are NOT refit on refresh — assignments stay consistent
    assert third["fitted"] is False


def test_orphan_postings_removed(src, tmp_path):
    idx = str(tmp_path / "idx")
    refresh_vector_index(src, idx, n_lists=8, sample_size=512)
    orphan = os.path.join(idx, "g=deadbeefdeadbeef.parquet")
    shutil.copy(
        next(
            os.path.join(idx, f)
            for f in os.listdir(idx)
            if f.startswith("g=")
        ),
        orphan,
    )
    stats = refresh_vector_index(src, idx, n_lists=8, sample_size=512)
    assert stats["removed"] == 1
    assert not os.path.exists(orphan)


def test_sample_vectors_bounded_and_deterministic():
    from datax_ray.functions.similarity import sample_vectors

    ds = ray.data.read_parquet(
        os.path.join(SF, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    s1 = sample_vectors(ds, 64)
    s2 = sample_vectors(ds.repartition(7), 64)
    assert s1.shape[0] == 64
    # hash-priority selection is layout-independent
    assert np.allclose(np.sort(s1, axis=0), np.sort(s2, axis=0))
