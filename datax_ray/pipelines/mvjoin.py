"""Incrementally-maintained JOIN materialized view between TWO CDC lakes —
the THIRD MV refresh strategy (SURVEY.md §2D):

- `mv.py` (recompute): re-merge ranges whose committed file set changed.
- `mvadd.py` (additive fold): exact +post/−pre deltas, no lake reads.
- this module (delta-keyed join): the streaming-database capability the
  other two can't express — view = LEFT-final ⋈ RIGHT-final on conv_id,
  maintained in O(changed keys) per refresh, never a full re-join.

Refresh algorithm (each side advances independently):
1. Changed keys = distinct conv_ids in EITHER side's change feed since
   that side's last applied epoch (id-only read, per-batch distinct
   combiner before any exchange).
2. Live state of exactly those keys is point-read AS OF each side's
   target epoch (`read_lake(conv_ids=, as_of_epoch=)` — manifest hash
   routing + Bloom/turn-bound pruning mean unaffected ranges are never
   opened). Past `max_point_keys` the plan degrades to one streaming
   full scan per side (no driver key list), filtered in-bucket — the
   dup-heavy-epoch escape hatch; both paths feed the same fold.
3. Keys, left rows and right rows ride ONE union stream (side-tagged,
   shared null-padded schema) into conv-hash view buckets: each touched
   bucket drops its old rows for the changed keys, joins the fresh left
   and right slices in-bucket (pyarrow hash join — both sides are
   already co-located), and writes a new generation file. Untouched
   buckets keep their old file: zero reads, zero writes.

Exactly-once: bucket content is a deterministic function of (old file,
changed-key set, both lakes AS OF the target epochs), file names carry
both target epochs, and ONE atomic state-file replace publishes — a
crashed refresh rewrites identical bytes on retry, stale generations are
deleted only after the publish (same discipline as mvadd).

Join semantics are INNER on conv_id with arbitrary multiplicity (a conv
deleted on either side leaves the view on the next refresh — deletes
propagate through the feed's changed-key set). Availability is bounded
by manifest retention like any feed consumer: if vacuum dropped the
epochs since the last refresh, refresh raises and `rebuild=True`
re-derives the view from one streaming join of both live lakes.
"""

from __future__ import annotations

import glob as _glob
import json
import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_STATE = "_mvjoin_state.json"
N_BUCKETS = 64
DEFAULT_LEFT_COLS = ("turn_idx", "role", "text")
DEFAULT_RIGHT_COLS = ("text",)


def _load_state(d: str) -> dict:
    from datax_ray.state.fs import fs_for, read_json

    p = os.path.join(d, _STATE)
    return read_json(p) if fs_for(p).exists(p) else {}


def _save_state(d: str, state: dict) -> None:
    from datax_ray.state.fs import fs_for, json_bytes

    p = os.path.join(d, _STATE)
    fs_for(p).put(p, json_bytes(state))


def _view_schema(
    left_schema: pa.Schema, right_schema: pa.Schema,
    left_cols: tuple, right_cols: tuple,
) -> pa.Schema:
    fields = [pa.field("conv_id", pa.string())]
    for c in left_cols:
        fields.append(pa.field(c, left_schema.field(c).type))
    for c in right_cols:
        fields.append(pa.field(f"r_{c}", right_schema.field(c).type))
    return pa.schema(fields)


def _bucket_of(conv: pa.Array) -> pa.Array:
    from datax_ray.functions.relational import key_buckets

    return key_buckets(pa.table({"conv_id": conv}), ["conv_id"], N_BUCKETS)


def _tagged(t: pa.Table, kind: int, view: pa.Schema, src_cols: dict) -> pa.Table:
    """Null-pad `t` onto the shared union schema + (_k, _b) tags.
    src_cols maps view column name -> source column name (absent = null)."""
    n = t.num_rows
    cols = {}
    for f in view:
        src = src_cols.get(f.name)
        if src is not None:
            cols[f.name] = pc.cast(t[src], f.type)
        else:
            cols[f.name] = pa.nulls(n, f.type)
    out = pa.table(cols)
    out = out.append_column("_k", pa.array([kind] * n, pa.int8()))
    return out.append_column(
        "_b", _bucket_of(out["conv_id"].combine_chunks())
    )


class _JoinBucketFolder:
    """map_groups stage over one view bucket's union slice: drop the old
    generation's rows for the changed keys, join the fresh left/right
    slices in-bucket, write the new generation file. Deterministic
    function of (old file, group content) → retried tasks rewrite
    identical bytes at the same name."""

    def __init__(
        self, mv_dir: str, old_files: dict, suffix: str,
        view_json: bytes, left_cols: tuple, right_cols: tuple,
        rebuild: bool,
    ):
        self.__name__ = "_JoinBucketFolder"
        self.mv_dir = mv_dir
        self.old_files = old_files
        self.suffix = suffix
        self.view_json = view_json
        self.left_cols = tuple(left_cols)
        self.right_cols = tuple(right_cols)
        self.rebuild = rebuild

    def __call__(self, g: pa.Table) -> pa.Table:
        import pyarrow.ipc as ipc
        import pyarrow.parquet as pq

        view = ipc.read_schema(pa.py_buffer(self.view_json))
        b = int(g["_b"][0].as_py())
        kind = g["_k"]
        left = g.filter(pc.equal(kind, 1))
        right = g.filter(pc.equal(kind, 2))
        if self.rebuild:
            old = view.empty_table()
        else:
            keys = pc.unique(
                g.filter(pc.equal(kind, 0))["conv_id"].combine_chunks()
            )
            old_rel = self.old_files.get(str(b))
            if old_rel:
                old = pq.read_table(__import__('datax_ray.state.fs', fromlist=['open_parquet']).open_parquet(os.path.join(self.mv_dir, old_rel)))
                old = old.filter(
                    pc.invert(pc.is_in(old["conv_id"], value_set=keys))
                )
            else:
                old = view.empty_table()
            # the full-scan fallback ships unchanged convs too: keep only
            # rows of keys this refresh actually touched (no-op when the
            # point-read path already pruned to exactly those keys)
            left = left.filter(pc.is_in(left["conv_id"], value_set=keys))
            right = right.filter(pc.is_in(right["conv_id"], value_set=keys))
        lt = left.select(["conv_id", *self.left_cols])
        rt = right.select(["conv_id", *(f"r_{c}" for c in self.right_cols)])
        fresh = lt.join(rt, keys=["conv_id"], join_type="inner")
        merged = pa.concat_tables(
            [old, fresh.select(view.names).cast(view)]
        ).sort_by([(c, "ascending") for c in view.names])
        if merged.num_rows == 0:
            return pa.table(
                {
                    "bucket": pa.array([b], pa.int64()),
                    "file": pa.array([""], pa.string()),
                    "rows": pa.array([0], pa.int64()),
                }
            )
        rel = f"b={b:04d}-{self.suffix}.parquet"
        from datax_ray.state.fs import put_parquet

        put_parquet(merged, os.path.join(self.mv_dir, rel),
                    compression="zstd", compression_level=1)
        return pa.table(
            {
                "bucket": pa.array([b], pa.int64()),
                "file": pa.array([rel], pa.string()),
                "rows": pa.array([merged.num_rows], pa.int64()),
            }
        )


def _changed_keys(lake_dir: str, frm: int, to: int) -> ray.data.Dataset:
    """Distinct conv_ids of the feed window (frm, to] — id-only rows."""
    from datax_ray.pipelines.feed import read_change_feed

    def uniq(t: pa.Table) -> pa.Table:
        ids = pc.unique(t["conv_id"].combine_chunks())
        ids = ids.drop_null()
        return pa.table({"conv_id": pc.cast(ids, pa.string())})

    return read_change_feed(lake_dir, frm, to).map_batches(
        uniq, batch_format="pyarrow", batch_size=None
    )


def refresh_mv_join(
    left_lake: str,
    right_lake: str,
    mv_dir: str,
    left_cols: tuple = DEFAULT_LEFT_COLS,
    right_cols: tuple = DEFAULT_RIGHT_COLS,
    rebuild: bool = False,
    max_point_keys: int = 100_000,
) -> dict:
    """Bring the join view up to both lakes' committed heads. Returns
    {"applied_left", "applied_right", "buckets_touched", "rows"}."""
    from datax_ray.sinks.lake import lake_schema, read_lake
    from datax_ray.state.manifest import Manifest

    ml, mr = Manifest(left_lake), Manifest(right_lake)
    head_l, head_r = ml.committed_epoch(), mr.committed_epoch()
    if head_l < 0 or head_r < 0:
        raise ValueError("both lakes need a committed epoch")
    view = _view_schema(
        lake_schema(left_lake), lake_schema(right_lake), left_cols, right_cols
    )
    view_json = view.serialize().to_pybytes()
    state = _load_state(mv_dir)
    applied_l = int(state.get("applied_left", -1))
    applied_r = int(state.get("applied_right", -1))
    from datax_ray.state.fs import is_remote as _is_remote

    if not _is_remote(mv_dir):
        os.makedirs(mv_dir, exist_ok=True)
    suffix = f"l{head_l:06d}-r{head_r:06d}"

    if rebuild:
        from datax_ray.state.fs import fs_for as _ffr

        for p in _ffr(mv_dir).list_prefix(mv_dir):
            name = os.path.basename(p)
            if name.startswith("b=") and name.endswith(".parquet"):
                _ffr(mv_dir).delete(p)
        parts = [
            _make_tagged_reader(view_json, 1, "left", left_cols)(
                read_lake(left_lake, as_of_epoch=head_l)
            ),
            _make_tagged_reader(view_json, 2, "right", right_cols)(
                read_lake(right_lake, as_of_epoch=head_r)
            ),
        ]
        stream = parts[0].union(parts[1])
        folder = _JoinBucketFolder(
            mv_dir, {}, suffix, view_json, left_cols, right_cols, rebuild=True
        )
        lineage = (
            stream.groupby("_b")
            .map_groups(folder, batch_format="pyarrow")
            .take_all()
        )  # O(buckets) tiny rows
        return _publish(mv_dir, {}, lineage, head_l, head_r, state=None)

    if applied_l >= head_l and applied_r >= head_r:
        return {
            "applied_left": applied_l,
            "applied_right": applied_r,
            "buckets_touched": 0,
            "rows": int(state.get("rows", 0)),
        }
    for m, applied, side in ((ml, applied_l, "left"), (mr, applied_r, "right")):
        if applied >= 0 and m.at_epoch(applied) is None:
            raise ValueError(
                f"{side} epochs since {applied} were vacuumed — run with "
                "rebuild=True"
            )

    keys_parts = []
    if head_l > applied_l:
        keys_parts.append(_changed_keys(left_lake, applied_l, head_l))
    if head_r > applied_r:
        keys_parts.append(_changed_keys(right_lake, applied_r, head_r))
    keys_ds = keys_parts[0] if len(keys_parts) == 1 else keys_parts[0].union(
        keys_parts[1]
    )

    # Point-read plan: changed keys stay a DATASET (tiny id-only blocks,
    # materialized distributed — never the driver). The sum of per-batch
    # distinct counts upper-bounds true distinct, so a bound under
    # max_point_keys certifies the pruned point-read path and only THEN
    # do the (bounded) ids collect to feed conv_ids=. Past the bound the
    # keys route to buckets through the same groupby the data takes and
    # each side falls back to one streaming scan — an epoch touching most
    # keys never materializes the key universe driver-side (r3 review).
    keys_ds = keys_ds.materialize()
    n_bound = keys_ds.count()
    if n_bound == 0:
        _save_state(
            mv_dir,
            {
                **state,
                "applied_left": head_l,
                "applied_right": head_r,
            },
        )
        return {
            "applied_left": head_l,
            "applied_right": head_r,
            "buckets_touched": 0,
            "rows": int(state.get("rows", 0)),
        }
    point = n_bound <= max_point_keys
    if point:
        changed = sorted({r["conv_id"] for r in keys_ds.take_all()})
        l_ds = read_lake(left_lake, as_of_epoch=head_l, conv_ids=changed)
        r_ds = read_lake(right_lake, as_of_epoch=head_r, conv_ids=changed)
        key_tbl = pa.table({"conv_id": pa.array(changed, pa.string())})
        key_src = ray.data.from_arrow(
            _tagged(key_tbl, 0, view, {"conv_id": "conv_id"})
        )
    else:
        l_ds = read_lake(left_lake, as_of_epoch=head_l)
        r_ds = read_lake(right_lake, as_of_epoch=head_r)
        key_src = keys_ds.map_batches(
            lambda t: _tagged(t, 0, view, {"conv_id": "conv_id"}),
            batch_format="pyarrow",
        )
    stream = (
        key_src
        .union(_make_tagged_reader(view_json, 1, "left", left_cols)(l_ds))
        .union(_make_tagged_reader(view_json, 2, "right", right_cols)(r_ds))
    )
    old_files = dict(state.get("buckets", {}))
    folder = _JoinBucketFolder(
        mv_dir, old_files, suffix, view_json, left_cols, right_cols,
        rebuild=False,
    )
    lineage = (
        stream.groupby("_b")
        .map_groups(folder, batch_format="pyarrow")
        .take_all()
    )  # O(touched buckets) tiny rows
    return _publish(mv_dir, old_files, lineage, head_l, head_r, state)


def _make_tagged_reader(view_json: bytes, kind: int, side: str, cols: tuple):
    """Dataset→Dataset: null-pad a lake read onto the union schema."""

    def apply(ds):
        import pyarrow.ipc as ipc

        def tag(t: pa.Table) -> pa.Table:
            view = ipc.read_schema(pa.py_buffer(view_json))
            src = {"conv_id": "conv_id"}
            for c in cols:
                src[c if side == "left" else f"r_{c}"] = c
            return _tagged(t, kind, view, src)

        return ds.map_batches(tag, batch_format="pyarrow")

    return apply


def _publish(
    mv_dir: str, old_files: dict, lineage: list, head_l: int, head_r: int,
    state: dict | None,
) -> dict:
    state = dict(state or {})
    new_files = dict(old_files)
    bucket_rows = dict(state.get("bucket_rows", {}))
    for r in lineage:
        b = str(int(r["bucket"]))
        if r["file"]:
            new_files[b] = r["file"]
            bucket_rows[b] = int(r["rows"])
        else:
            new_files.pop(b, None)
            bucket_rows.pop(b, None)
    total = sum(bucket_rows.values())
    _save_state(
        mv_dir,
        {
            "applied_left": head_l,
            "applied_right": head_r,
            "buckets": new_files,
            "bucket_rows": bucket_rows,
            "rows": total,
        },
    )
    live = {os.path.join(mv_dir, f) for f in new_files.values()}
    from datax_ray.state.fs import fs_for as _ff

    for p in _ff(mv_dir).list_prefix(mv_dir):
        name = os.path.basename(p)
        if (name.startswith("b=") and name.endswith(".parquet")
                and p not in live):
            _ff(mv_dir).delete(p)
    return {
        "applied_left": head_l,
        "applied_right": head_r,
        "buckets_touched": len(lineage),
        "rows": total,
    }


def read_mv_join(mv_dir: str) -> ray.data.Dataset:
    """The join view as a Dataset — buckets are disjoint and final."""
    state = _load_state(mv_dir)
    files = [
        os.path.join(mv_dir, f)
        for f in sorted(state.get("buckets", {}).values())
    ]
    if not files:
        return ray.data.from_items([])
    from datax_ray.state.fs import read_parquet_dataset

    return read_parquet_dataset(files, pa.schema([]))
