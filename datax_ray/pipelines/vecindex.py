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
is re-assigned ONLY when its fingerprint (file size, mtime, row-group id;
size+rows on remote stores, which expose no stable mtime) changed;
unchanged fragments cost zero reads. Each fragment task reads just its own
row group and atomically puts one object through the state/fs.py storage
contract, so retries are idempotent, a crashed refresh resumes where it
stopped, and both the index dir and the source may live on an object store
(obj://, s3://).

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

_POSTINGS_SCHEMA = pa.schema(
    [
        ("list_id", pa.int32()),
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float64())),
    ]
)


def _posting_files(idx_dir: str) -> list[str]:
    """Live posting-file paths via the storage contract (obj://-safe)."""
    from datax_ray.state.fs import fs_for

    return [
        p for p in fs_for(idx_dir).list_prefix(idx_dir)
        if os.path.basename(p).startswith("g=") and p.endswith(".parquet")
    ]


def _load_state(idx_dir: str) -> dict:
    from datax_ray.state.fs import fs_for, read_json

    p = os.path.join(idx_dir, _STATE)
    return read_json(p) if fs_for(p).exists(p) else {}


def _save_state(idx_dir: str, state: dict) -> None:
    # atomic full-object put (state/fs.py storage contract)
    from datax_ray.state.fs import fs_for, json_bytes

    p = os.path.join(idx_dir, _STATE)
    fs_for(p).put(p, json_bytes(state))


def _source_paths(src: str) -> list[str]:
    """Parquet file paths of the source (file or directory of files),
    through the storage contract on remote schemes."""
    from datax_ray.state.fs import canon_path, fs_for, is_remote

    if not is_remote(src) and not os.path.isdir(src):
        return [canon_path(src)]
    if is_remote(src) and src.endswith(".parquet"):
        return [src]
    return sorted(
        canon_path(p)
        for p in fs_for(src).list_prefix(src)
        if p.endswith(".parquet")
    )


def _source_fragments(src: str) -> list[dict]:
    """One fragment per parquet ROW GROUP of the source (file or directory
    of files): the refresh / retry / resume unit. Local fingerprints carry
    mtime; remote stores expose no stable mtime, so size + per-row-group
    row count stands in (an in-place same-size rewrite is not an expected
    object-store mutation — objects are immutable there)."""
    import pyarrow.parquet as pq

    from datax_ray.state.fs import fs_for, is_remote

    frags = []
    for path in _source_paths(src):
        if is_remote(path):
            size = fs_for(path).size(path)
            stamp = f"{size}"
            meta = pq.ParquetFile(fs_for(path).open_input(path)).metadata
        else:
            st = os.stat(path)
            stamp = f"{st.st_size}:{st.st_mtime_ns}"
            meta = pq.ParquetFile(path).metadata
        for rg in range(meta.num_row_groups):
            key = hashlib.md5(f"{path}:{rg}".encode()).hexdigest()[:16]
            frags.append(
                {
                    "frag": key,
                    "path": path,
                    "rg": rg,
                    "fp": f"{stamp}:{rg}:{meta.row_group(rg).num_rows}",
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
        from datax_ray.state.fs import fs_for, is_remote, put_parquet

        index = IVFIndex(ray.get(self.centroids_ref))
        out_f, out_r = [], []
        for frag, path, rg in zip(
            t["frag"].to_pylist(), t["path"].to_pylist(), t["rg"].to_pylist()
        ):
            handle = fs_for(path).open_input(path) if is_remote(path) else path
            part = pq.ParquetFile(handle).read_row_group(
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
            put_parquet(
                postings, os.path.join(self.idx_dir, f"g={frag}.parquet"),
                compression="zstd", compression_level=1,
                row_group_size=4096,
            )
            out_f.append(frag)
            out_r.append(postings.num_rows)
        return pa.table(
            {"frag": pa.array(out_f, pa.string()), "rows": pa.array(out_r, pa.int64())}
        )


def _load_centroids(idx_dir: str) -> np.ndarray | None:
    import pyarrow.parquet as pq

    from datax_ray.state.fs import fs_for, open_parquet

    path = os.path.join(idx_dir, "centroids.parquet")
    if not fs_for(path).exists(path):
        return None
    t = pq.read_table(open_parquet(path))
    return np.asarray(t["centroid"].to_pylist(), dtype=np.float64)


def _source_dataset(src: str, columns: list[str]) -> ray.data.Dataset:
    """The source as a Dataset with column pruning: ray.data.read_parquet
    on local paths; a contract-read map chain (one task per file) on
    remote schemes."""
    from datax_ray.state.fs import fs_for, is_remote

    if not is_remote(src):
        return ray.data.read_parquet(src, columns=columns)
    paths = _source_paths(src)

    def rd(t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        return pa.concat_tables(
            [
                pq.read_table(fs_for(p).open_input(p), columns=columns)
                for p in t["path"].to_pylist()
            ],
            promote_options="permissive",
        )

    return ray.data.from_items(
        [{"path": p} for p in paths], override_num_blocks=len(paths)
    ).map_batches(rd, batch_format="pyarrow", batch_size=None)


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
    from datax_ray.state.fs import fs_for, put_parquet

    frags = _source_fragments(src)
    state = _load_state(idx_dir)
    fs = fs_for(idx_dir)

    centroids = _load_centroids(idx_dir)
    fitted = False
    if centroids is None:
        from datax_ray.functions.similarity import ivf_fit

        ds = _source_dataset(src, [id_col, vec_col])
        index = ivf_fit(
            ds, n_lists=n_lists, sample_size=sample_size,
            vec_col=vec_col, id_col=id_col,
        )
        centroids = index.centroids
        put_parquet(
            pa.table(
                {
                    "list_id": pa.array(range(len(centroids)), pa.int32()),
                    "centroid": pa.array(list(centroids)),
                }
            ),
            os.path.join(idx_dir, "centroids.parquet"),
        )
        fitted = True

    todo, skipped = [], 0
    new_state: dict[str, str] = {}
    for f in frags:
        new_state[f["frag"]] = f["fp"]
        if state.get(f["frag"]) == f["fp"] and fs.exists(
            os.path.join(idx_dir, f"g={f['frag']}.parquet")
        ):
            skipped += 1
        else:
            todo.append({"frag": f["frag"], "path": f["path"], "rg": f["rg"]})

    removed = 0
    live = {f["frag"] for f in frags}
    for path in _posting_files(idx_dir):
        frag = os.path.basename(path)[2:-8]
        if frag not in live:
            fs.delete(path)
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
    survives the isin filter (pushed down to parquet statistics on local
    paths — row groups are list_id-sorted; applied per batch after the
    contract read on remote schemes), partial top-k per batch, one tiny
    final reduce."""
    from datax_ray.functions.similarity import (
        IVFIndex,
        _as_matrix,
        _topk_reduce,
        _unit,
    )
    from datax_ray.state.fs import is_remote, read_parquet_dataset

    index = IVFIndex(_load_centroids(idx_dir))
    qunit = _unit(np.asarray(queries, dtype=np.float64))
    probes = index.probe(qunit, nprobe)  # (Q, nprobe)
    wanted_lists = sorted({int(li) for row in probes for li in row})
    probe_sets = [set(int(li) for li in row) for row in probes]
    q_ref = ray.put((qunit, probe_sets))

    files = _posting_files(idx_dir)
    out_schema = pa.schema(
        [("query_id", pa.int64()), ("vec_id", pa.int64()), ("cosine", pa.float64())]
    )
    if not files:
        return ray.data.from_arrow(out_schema.empty_table())

    if is_remote(files[0]):
        want = pa.array(wanted_lists, pa.int32())
        hits = read_parquet_dataset(files, _POSTINGS_SCHEMA).map_batches(
            lambda t: t.filter(pc.is_in(t["list_id"], value_set=want)),
            batch_format="pyarrow",
        )
    else:
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
