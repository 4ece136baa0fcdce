"""Persistent, incrementally-refreshed IVF vector index — the embedding-side
sibling of the text inverted index (pipelines/index.py).

Layout under <idx_dir>:
  centroids.parquet          — the coarse quantizer (list_id, centroid),
                               fit ONCE from a distributed hash-priority
                               sample (functions/similarity.py:sample_vectors)
                               and reused on refresh so posting assignments
                               stay consistent across increments.
  g=<frag>.parquet           — one postings file per SOURCE FRAGMENT
                               (parquet row group), columns
                               (list_id, vec_id, embedding), SORTED BY
                               list_id so a probe's `isin(nprobe lists)`
                               filter prunes row groups before
                               decompression.
  _vecindex_state.json       — fragment fingerprint -> refresh bookkeeping.

Refresh rule (same shape as pipelines/index.py:refresh_index): a fragment
is re-assigned ONLY when its fingerprint (file size, mtime, row-group id)
changed; unchanged fragments cost zero reads. Each fragment task reads just
its own row group and writes tmp+rename, so retries are idempotent and a
crashed refresh resumes where it stopped.

At 100 TB this is the path that keeps ANN usable: the quantizer is O(lists ×
dim), the per-fragment posting files refresh independently (embarrassingly
parallel, no shuffle), and a query touches only ~nprobe/n_lists of the data
via row-group pruning.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

_STATE = "_vecindex_state.json"


def _load_state(idx_dir: str) -> dict:
    try:
        with open(os.path.join(idx_dir, _STATE)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {}


def _save_state(idx_dir: str, state: dict) -> None:
    os.makedirs(idx_dir, exist_ok=True)
    tmp = os.path.join(idx_dir, f"{_STATE}.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, os.path.join(idx_dir, _STATE))


def _source_fragments(src: str) -> list[dict]:
    """One fragment per parquet ROW GROUP of the source (file or directory
    of files): the refresh / retry / resume unit."""
    import glob

    import pyarrow.parquet as pq

    paths = (
        sorted(glob.glob(os.path.join(src, "*.parquet")))
        if os.path.isdir(src)
        else [src]
    )
    frags = []
    for path in paths:
        st = os.stat(path)
        meta = pq.ParquetFile(path).metadata
        for rg in range(meta.num_row_groups):
            key = hashlib.md5(
                f"{os.path.abspath(path)}:{rg}".encode()
            ).hexdigest()[:16]
            frags.append(
                {
                    "frag": key,
                    "path": os.path.abspath(path),
                    "rg": rg,
                    "fp": f"{st.st_size}:{st.st_mtime_ns}:{rg}:{meta.row_group(rg).num_rows}",
                }
            )
    return frags


class _FragIndexer:
    """map_batches stage over fragment rows: read ONE source row group,
    assign each vector to its inverted list, write the fragment's postings
    file sorted by list_id (tmp+rename — idempotent retries)."""

    def __init__(self, idx_dir: str, centroids_ref, vec_col: str, id_col: str):
        self.__name__ = "_FragIndexer"
        self.idx_dir = idx_dir
        self.centroids_ref = centroids_ref
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        from datax_ray.functions.similarity import IVFIndex, _as_matrix

        index = IVFIndex(ray.get(self.centroids_ref))
        out_f, out_r = [], []
        for frag, path, rg in zip(
            t["frag"].to_pylist(), t["path"].to_pylist(), t["rg"].to_pylist()
        ):
            part = pq.ParquetFile(path).read_row_group(
                rg, columns=[self.id_col, self.vec_col]
            )
            mat = _as_matrix(part[self.vec_col]).astype(np.float64)
            lists = index.assign(mat)
            order = np.argsort(lists, kind="stable")
            postings = pa.table(
                {
                    "list_id": pa.array(lists[order].astype(np.int32)),
                    "vec_id": pc.cast(part[self.id_col], pa.int64()).take(
                        pa.array(order)
                    ),
                    "embedding": pa.array(list(mat[order])),
                }
            )
            dest = os.path.join(self.idx_dir, f"g={frag}.parquet")
            tmp = f"{dest}.tmp.{os.getpid()}"
            pq.write_table(
                postings, tmp, compression="zstd", compression_level=1,
                row_group_size=4096,
            )
            os.replace(tmp, dest)
            out_f.append(frag)
            out_r.append(postings.num_rows)
        return pa.table(
            {"frag": pa.array(out_f, pa.string()), "rows": pa.array(out_r, pa.int64())}
        )


def _load_centroids(idx_dir: str) -> np.ndarray | None:
    import pyarrow.parquet as pq

    path = os.path.join(idx_dir, "centroids.parquet")
    if not os.path.exists(path):
        return None
    t = pq.read_table(path)
    return np.asarray(t["centroid"].to_pylist(), dtype=np.float64)


def refresh_vector_index(
    src: str,
    idx_dir: str,
    n_lists: int = 16,
    sample_size: int = 2048,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Bring the IVF index up to the source's state; only fragments whose
    fingerprint changed are re-assigned. Returns {"refreshed", "skipped",
    "removed", "fitted"}."""
    import glob

    import pyarrow.parquet as pq

    frags = _source_fragments(src)
    state = _load_state(idx_dir)
    os.makedirs(idx_dir, exist_ok=True)

    centroids = _load_centroids(idx_dir)
    fitted = False
    if centroids is None:
        from datax_ray.functions.similarity import ivf_fit

        ds = ray.data.read_parquet(src, columns=[id_col, vec_col])
        index = ivf_fit(
            ds, n_lists=n_lists, sample_size=sample_size,
            vec_col=vec_col, id_col=id_col,
        )
        centroids = index.centroids
        tmp = os.path.join(idx_dir, f"centroids.parquet.tmp.{os.getpid()}")
        pq.write_table(
            pa.table(
                {
                    "list_id": pa.array(range(len(centroids)), pa.int32()),
                    "centroid": pa.array(list(centroids)),
                }
            ),
            tmp,
        )
        os.replace(tmp, os.path.join(idx_dir, "centroids.parquet"))
        fitted = True

    todo, skipped = [], 0
    new_state: dict[str, str] = {}
    for f in frags:
        new_state[f["frag"]] = f["fp"]
        if state.get(f["frag"]) == f["fp"] and os.path.exists(
            os.path.join(idx_dir, f"g={f['frag']}.parquet")
        ):
            skipped += 1
        else:
            todo.append({"frag": f["frag"], "path": f["path"], "rg": f["rg"]})

    removed = 0
    live = {f["frag"] for f in frags}
    for path in glob.glob(os.path.join(idx_dir, "g=*.parquet")):
        frag = os.path.basename(path)[2:-8]
        if frag not in live:
            os.remove(path)
            removed += 1

    if todo:
        c_ref = ray.put(centroids)
        ray.data.from_items(todo).map_batches(
            _FragIndexer(idx_dir, c_ref, vec_col, id_col),
            batch_size=1,  # one row group per task: the read is the work
            batch_format="pyarrow",
        ).take_all()  # O(fragments) stat rows only
    _save_state(idx_dir, new_state)
    return {
        "refreshed": len(todo),
        "skipped": skipped,
        "removed": removed,
        "fitted": fitted,
    }


def search_vector_index(
    idx_dir: str,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
) -> ray.data.Dataset:
    """Approximate cosine top-k against the persisted index: probe each
    query's nprobe nearest lists, stream ONLY postings rows whose list_id
    survives the pushed-down isin filter (row groups are list_id-sorted, so
    pruning happens at parquet statistics level), partial top-k per batch,
    one tiny final reduce."""
    import glob

    from datax_ray.functions.similarity import (
        IVFIndex,
        _as_matrix,
        _topk_reduce,
        _unit,
    )

    index = IVFIndex(_load_centroids(idx_dir))
    qunit = _unit(np.asarray(queries, dtype=np.float64))
    probes = index.probe(qunit, nprobe)  # (Q, nprobe)
    wanted_lists = sorted({int(li) for row in probes for li in row})
    probe_sets = [set(int(li) for li in row) for row in probes]
    q_ref = ray.put((qunit, probe_sets))

    files = sorted(glob.glob(os.path.join(idx_dir, "g=*.parquet")))
    out_schema = pa.schema(
        [("query_id", pa.int64()), ("vec_id", pa.int64()), ("cosine", pa.float64())]
    )
    if not files:
        return ray.data.from_arrow(out_schema.empty_table())

    hits = ray.data.read_parquet(
        files, filter=pc.field("list_id").isin(wanted_lists)
    )

    def partial_topk(t: pa.Table) -> pa.Table:
        q, psets = ray.get(q_ref)
        lists = t["list_id"].to_numpy(zero_copy_only=False)
        mat = _unit(_as_matrix(t["embedding"]))
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        out_q, out_v, out_c = [], [], []
        for qi, pset in enumerate(psets):
            sel = np.isin(lists, list(pset))
            if not sel.any():
                continue
            sub, sub_ids = mat[sel], ids[sel]
            cos = q[qi] @ sub.T
            kk = min(k, len(cos))
            top = np.argpartition(-cos, kth=kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_v.extend(sub_ids[top].tolist())
            out_c.extend(cos[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(np.asarray(out_q, dtype=np.int64)),
                "vec_id": pa.array(np.asarray(out_v, dtype=np.int64)),
                "cosine": pa.array(np.asarray(out_c, dtype=np.float64)),
            }
        )

    out = _topk_reduce(
        hits.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True),
        k,
        "vec_id",
    )
    return out.sort(["query_id", "cosine", "vec_id"], descending=[False, True, False])
