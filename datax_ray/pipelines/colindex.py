"""Incrementally-maintained VALUE index over one payload column — predicate
pruning for `read_lake(where=...)` reads.

`where` predicates must see the LWW WINNER of each key (sinks/lake.py), so
they cannot push into parquet row groups or file stats the way key/time
predicates can — a plain `where` read opens every range. This index closes
that gap: per partition range it stores the DISTINCT values of one payload
column in the range's LIVE merged state (`<idx>/r=NNNNN.parquet`, a single
`value` column in the lake column's type, nulls included), refreshed with
the same manifest-fingerprint incrementality as the stats MV / text index
(pipelines/mv.py): a range is re-read only when its committed file set
changed. At read time the planner keeps a range only if the predicate
value appears in its value set — and ONLY when the range's recorded
fingerprint still matches the committed manifest, so a stale index can
never prune a range that changed since the refresh (it just stops helping
until the next refresh). Purged/tombstoned rows vanish on refresh because
values derive from the live merge-read.

Sized for LOW-CARDINALITY payload columns (role, tool, lang, status): a
range's value file is O(distinct values) rows. High-cardinality columns
make the files data-sized — use the text inverted index for those.

Seventh member of the incremental-artifact family (stats MV, text index,
IVF vectors, dup-hash index, HLL register MV, near-dup shingle index).
Storage goes through the state/fs.py contract, so the index directory may
live on an object store (obj://, s3://) alongside the lake.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from datax_ray.pipelines.mv import _fingerprint, _load_state, _save_state


class _RangeValueIndexer:
    """map_batches stage over (range_id, files) rows: merge-read the
    range's live state, write its distinct-value file atomically. Content
    derives only from the committed range files ⇒ a retried task rewrites
    the identical file."""

    def __init__(self, lake_dir: str, idx_dir: str, column: str, schema_json):
        self.__name__ = "_RangeValueIndexer"
        self.lake_dir = lake_dir
        self.idx_dir = idx_dir
        self.column = column
        self.schema_json = schema_json

    def __call__(self, t: pa.Table) -> pa.Table:
        from datax_ray.sinks.lake import _merge_read_range
        from datax_ray.state.fs import put_parquet

        out_rows = []
        for rid, files_json in zip(
            t["range_id"].to_pylist(), t["files"].to_pylist()
        ):
            files = json.loads(files_json)
            live = _merge_read_range(self.lake_dir, files, self.schema_json, False)
            vals = pc.unique(live[self.column].combine_chunks())
            out = pa.table({"value": vals.sort()})
            put_parquet(
                out, os.path.join(self.idx_dir, f"r={rid:05d}.parquet"),
                compression="zstd", compression_level=1,
            )
            out_rows.append((int(rid), out.num_rows))
        return pa.table(
            {
                "range_id": pa.array([r for r, _ in out_rows], pa.int64()),
                "values": pa.array([n for _, n in out_rows], pa.int64()),
            }
        )


def refresh_value_index(lake_dir: str, idx_dir: str, column: str) -> dict:
    """Bring the value index up to the lake's committed state. The index
    is bound to ONE column; re-using a directory for a different column is
    an error (delete it or pick another). Returns
    {"column", "refreshed", "skipped", "removed"}."""
    from datax_ray.schemas import schema_to_json
    from datax_ray.sinks.lake import _range_plan, lake_schema
    from datax_ray.state.manifest import Manifest

    schema = lake_schema(lake_dir)
    if column not in schema.names:
        raise ValueError(
            f"column {column!r} is not in the lake schema {schema.names}"
        )
    state = _load_state(idx_dir)
    if state.get("column") not in (None, column):
        raise ValueError(
            f"index dir {idx_dir} is bound to column {state['column']!r}, "
            f"not {column!r}"
        )
    m = Manifest(lake_dir)
    parts = _range_plan(lake_dir, m)
    from datax_ray.state.fs import fs_for

    fs = fs_for(idx_dir)

    fps = state.get("ranges", {})
    todo, skipped = [], 0
    new_fps: dict[str, str] = {}
    for p in parts:
        rid = int(p["range_id"])
        fp = _fingerprint(p["files"])
        new_fps[str(rid)] = fp
        if fps.get(str(rid)) == fp and fs.exists(
            os.path.join(idx_dir, f"r={rid:05d}.parquet")
        ):
            skipped += 1
        else:
            todo.append({"range_id": rid, "files": json.dumps(p["files"])})

    if todo:
        ray.data.from_items(
            todo, override_num_blocks=len(todo)
        ).map_batches(
            _RangeValueIndexer(
                lake_dir, idx_dir, column,
                schema_to_json(lake_schema(lake_dir)),
            ),
            batch_format="pyarrow",
            batch_size=None,
        ).materialize()

    # drop value files for ranges no longer in the live plan (store scan,
    # not state — a crashed refresh can leave unrecorded partials)
    removed = 0
    live_rids = {int(p["range_id"]) for p in parts}
    for path in fs.list_prefix(idx_dir):
        name = os.path.basename(path)
        if not (name.startswith("r=") and name.endswith(".parquet")):
            continue
        rid = int(name[2:-8])
        if rid not in live_rids:
            fs.delete(path)
            removed += 1

    _save_state(idx_dir, {"column": column, "ranges": new_fps})
    return {
        "column": column,
        "refreshed": len(todo),
        "skipped": skipped,
        "removed": removed,
    }


def value_index_rids(
    idx_dir: str, parts: list[dict], where: dict
) -> set[int] | None:
    """Range ids that MAY satisfy the indexed column's `where` predicate,
    or None when the index cannot prune (no predicate on the indexed
    column, or missing state). Per range the answer is authoritative ONLY
    if the recorded fingerprint matches the range's current committed
    file set — stale/missing ranges are always kept, so a lagging index
    degrades to no-pruning, never to wrong results."""
    import pyarrow.parquet as pq

    from datax_ray.state.fs import fs_for, open_parquet

    state = _load_state(idx_dir)
    column = state.get("column")
    if column is None or column not in where:
        return None
    want = where[column]
    fps = state.get("ranges", {})
    fs = fs_for(idx_dir)
    keep: set[int] = set()
    for p in parts:
        rid = int(p["range_id"])
        path = os.path.join(idx_dir, f"r={rid:05d}.parquet")
        if fps.get(str(rid)) != _fingerprint(p["files"]) or not fs.exists(
            path
        ):
            keep.add(rid)  # stale or unindexed: never prune
            continue
        vals = pq.read_table(open_parquet(path))["value"]
        if want is None:
            if vals.null_count > 0:
                keep.add(rid)
        elif pc.any(
            pc.fill_null(pc.equal(vals, want), False)
        ).as_py():
            keep.add(rid)
    return keep
