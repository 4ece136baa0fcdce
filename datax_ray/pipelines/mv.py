"""Incremental materialized-view maintenance over the committed lake —
the CDC-engine capability that keeps derived aggregates fresh WITHOUT
re-reading the whole lake after every epoch (the Hudi/Delta "incremental
query" pattern, built on this engine's range-level lineage).

MV contents: per-conversation stats (conv_id, n_turns, last_ts). Storage:
one parquet file per partition RANGE (`<mv_dir>/r=NNNNN.parquet`) holding
that range's per-conv partials, plus `_mv_state.json` recording the exact
lake file set each range's partial was computed from.

Refresh rule: a range is recomputed ONLY if its committed file set changed
since the last refresh (new fragments, compaction, new base). At 10^10
scale with key-local updates most ranges are untouched by an epoch and are
skipped without reading a byte — the file-set fingerprint comes from the
manifest, not from storage. Each refreshed range is one merge-read +
groupby task (map-only over ranges, the same unit replay/compaction use;
fragment filenames are content-hashed, so the fingerprint is stable across
byte-identical rewrites).

Because a conversation's turns can salt across partitions
(stages/partitioning.py), per-range rows are PARTIALS; `read_mv` folds
them with a decomposable-aggregate combiner (sum of counts, max of ts) —
the fold moves one row per (conv, range-that-holds-it), never turn rows.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_STATE = "_mv_state.json"


def _fingerprint(files: list[str]) -> str:
    return hashlib.md5("\n".join(sorted(files)).encode()).hexdigest()


def _load_state(mv_dir: str) -> dict:
    from datax_ray.state.fs import fs_for, read_json

    p = os.path.join(mv_dir, _STATE)
    return read_json(p) if fs_for(p).exists(p) else {}


def _save_state(mv_dir: str, state: dict) -> None:
    from datax_ray.state.fs import fs_for, json_bytes

    p = os.path.join(mv_dir, _STATE)
    fs_for(p).put(p, json_bytes(state))


class _RangeRefresher:
    """map_batches stage over (range_id, files) rows: merge-read the range,
    aggregate per conv, atomically (re)write the range's MV partial file.
    Content derives only from the committed range files ⇒ a retried task
    rewrites the identical partial."""

    def __init__(self, lake_dir: str, mv_dir: str, schema_json: str):
        self.__name__ = "_RangeRefresher"
        self.lake_dir = lake_dir
        self.mv_dir = mv_dir
        self.schema_json = schema_json

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        from datax_ray.sinks.lake import _merge_read_range

        out_rows = []
        for rid, files_json in zip(
            t["range_id"].to_pylist(), t["files"].to_pylist()
        ):
            files = json.loads(files_json)
            live = _merge_read_range(self.lake_dir, files, self.schema_json, False)
            g = (
                live.select(["conv_id", "ts"])
                .group_by("conv_id")
                .aggregate([("ts", "max"), ("conv_id", "count")])
            )
            agg = pa.table(
                {
                    "conv_id": g["conv_id"],
                    "n_turns": pc.cast(g["conv_id_count"], pa.int64()),
                    "last_ts": pc.cast(g["ts_max"], pa.timestamp("us")),
                }
            )
            from datax_ray.state.fs import put_parquet

            put_parquet(agg, os.path.join(self.mv_dir, f"r={rid:05d}.parquet"),
                        compression="zstd", compression_level=1)
            out_rows.append((int(rid), agg.num_rows))
        return pa.table(
            {
                "range_id": pa.array([r for r, _ in out_rows], pa.int64()),
                "convs": pa.array([n for _, n in out_rows], pa.int64()),
            }
        )


def refresh_mv(lake_dir: str, mv_dir: str) -> dict:
    """Bring the MV up to the lake's committed state. Returns
    {"refreshed": n, "skipped": n, "removed": n}."""
    from datax_ray.schemas import schema_to_json
    from datax_ray.sinks.lake import _range_plan, lake_schema
    from datax_ray.state.manifest import Manifest

    m = Manifest(lake_dir)
    parts = _range_plan(lake_dir, m)
    state = _load_state(mv_dir)
    from datax_ray.state.fs import is_remote as _is_remote

    if not _is_remote(mv_dir):
        os.makedirs(mv_dir, exist_ok=True)

    todo, skipped = [], 0
    new_state: dict[str, str] = {}
    for p in parts:
        rid = int(p["range_id"])
        fp = _fingerprint(p["files"])
        new_state[str(rid)] = fp
        from datax_ray.state.fs import fs_for as _ffe

        if state.get(str(rid)) == fp and _ffe(mv_dir).exists(
            os.path.join(mv_dir, f"r={rid:05d}.parquet")
        ):
            skipped += 1
        else:
            todo.append({"range_id": rid, "files": json.dumps(p["files"])})

    # Remove partials for ranges no longer in the live plan — scanning the
    # DISK, not the saved state: a crashed refresh can leave a partial that
    # was never recorded in state, and read_mv globs the disk, so a stale
    # orphan would otherwise resurrect rows (incl. purged convs) forever.
    from datax_ray.state.fs import fs_for as _ff

    removed = 0
    live_rids = {int(p["range_id"]) for p in parts}
    for path in _ff(mv_dir).list_prefix(mv_dir):
        name = os.path.basename(path)
        if not (name.startswith("r=") and name.endswith(".parquet")):
            continue
        rid = int(name[2:-8])
        if rid not in live_rids:
            _ff(mv_dir).delete(path)
            removed += 1

    if todo:
        schema_json = schema_to_json(lake_schema(lake_dir))
        ray.data.from_items(todo).map_batches(
            _RangeRefresher(lake_dir, mv_dir, schema_json),
            batch_size=1,  # one range per task: the merge-read is the work
            batch_format="pyarrow",
        ).take_all()  # O(ranges) lineage rows only

    _save_state(mv_dir, new_state)
    return {"refreshed": len(todo), "skipped": skipped, "removed": removed}


def read_mv(mv_dir: str) -> ray.data.Dataset:
    """The MV as a Dataset: fold the per-range partials (sum counts, max
    ts per conv). One row per conv out; the fold input is one row per
    (conv, range) — never turn-level rows."""
    from datax_ray.functions.relational import partial_agg
    from datax_ray.state.fs import fs_for as _ffr

    files = sorted(
        p for p in _ffr(mv_dir).list_prefix(mv_dir)
        if os.path.basename(p).startswith("r=") and p.endswith(".parquet")
    )
    if not files:
        return ray.data.from_arrow(
            pa.schema(
                [
                    ("conv_id", pa.string()),
                    ("n_turns", pa.int64()),
                    ("last_ts", pa.timestamp("us")),
                ]
            ).empty_table()
        )
    from datax_ray.state.fs import read_parquet_dataset

    parts = read_parquet_dataset(files, pa.schema([]))
    return partial_agg(
        parts,
        keys=["conv_id"],
        sums={"n_turns": "n_turns"},
        maxs={"last_ts": "last_ts"},
    )
